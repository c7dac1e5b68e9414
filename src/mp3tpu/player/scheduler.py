"""Stream scheduler (SURVEY.md D6, §3.2/§3.3): batches up to hundreds of
live streams into fixed-shape device steps.

Design: S slots, each holding one stream's SymbolTensors and a granule
cursor. Every step gathers the next `win` granules from all slots into
one [S, win, ...] batch (finished/empty slots padded with zero granules
— zero spectrum decodes to silence, so masking is free), runs one
device call with per-slot carried state, and routes each slot's PCM to
its sink. Finished slots are refilled from the queue (the "elastic"
behavior of SURVEY.md §5.3) with their device state columns reset.

Batching N streams per chip is what removes the reference player's
underrun artifacts: one device step decodes seconds of audio across
the whole batch in milliseconds (BASELINE.json:5).

All streams in one scheduler share a sample rate (jit shape/table
bucket); bucket by sample rate at a higher level for mixed workloads.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..bitstream.unpack import SymbolTensors, unpack_fast
from ..kernels import pipeline as kp
from ..metrics import Metrics, record_resyncs, record_symbol_errors
from .sink import CollectSink, Sink, take_underruns


@dataclass
class _Slot:
    symbols: object = None  # SymbolSource or SymbolTensors
    cursor: int = 0                      # next granule to decode
    sink: Sink | None = None
    total_emitted: int = 0
    end_sample: int | None = None        # gapless end bound
    start_skip: int = 0                  # gapless leading samples to drop
    active: bool = False
    stream_id: object = None


def gapless_bounds_of(data: bytes, n_granules: int) -> tuple[int, int | None]:
    """(start_skip, end_sample) from the stream's LAME tag, or (0, None)."""
    from ..container import frames as fr
    from ..container.xing import parse_stream_info
    from ..dsp.gapless import gapless_bounds
    try:
        idx = fr.scan_frames(np.frombuffer(data, np.uint8))
        info = parse_stream_info(bytes(data), int(idx.offsets[0]),
                                 idx.headers[0])
        if info.gapless:
            return gapless_bounds(n_granules * 576, info.encoder_delay,
                                  info.encoder_padding)
    except Exception:
        pass
    return 0, None


class StreamScheduler:
    """Masked-batch streaming decode engine over one device."""

    def __init__(self, n_slots: int | None = None, win: int | None = None,
                 sample_rate: int = 44100):
        from ..config import get_active
        cfg = get_active().scheduler
        self.S = cfg.n_slots if n_slots is None else n_slots
        self.win = cfg.window_granules if win is None else win
        self.sample_rate = sample_rate
        self.slots = [_Slot() for _ in range(self.S)]
        self.queue: list[tuple[object, SymbolTensors, Sink, int, int | None]] = []
        self.state = kp.init_state(self.S)
        self.metrics = Metrics()
        self.trace: list[tuple[str, int]] = []  # ("dispatch"/"route", seq)
        self._seq = 0

    # ------------------------------------------------------------ intake
    def submit(self, data_or_symbols, sink: Sink | None = None,
               stream_id=None, apply_gapless: bool = True,
               bounds: tuple[int, int | None] | None = None):
        """Queue one stream (mp3 bytes or pre-unpacked SymbolTensors).
        `bounds` overrides the gapless (start_skip, end_sample) — used
        when the caller already parsed the container (e.g. the batch
        decode path, which pre-unpacks to bucket by sample rate)."""
        if isinstance(data_or_symbols, SymbolTensors):
            st = data_or_symbols
        else:
            # streaming source: container parse only — granule windows
            # are unpacked per step in _pack_dispatch (the §3.3 refill
            # loop; submit latency and host memory are O(window))
            from ..pipeline import load_source
            with self.metrics.span("host"):
                st, _info, _index = load_source(bytes(data_or_symbols))
            record_resyncs(_index.resyncs, self.metrics)
        if st.sample_rate != self.sample_rate:
            raise ValueError(
                f"scheduler is bucketed at {self.sample_rate} Hz, stream is "
                f"{st.sample_rate} Hz — use one scheduler per sample rate")
        if bounds is not None:
            start_skip, end = bounds
        elif apply_gapless and not isinstance(data_or_symbols, SymbolTensors):
            start_skip, end = gapless_bounds_of(data_or_symbols, st.n_granules)
        else:
            start_skip, end = 0, None
        self.queue.append((stream_id, st, sink or CollectSink(),
                           start_skip, end))
        self._refill()
        return self.queue and stream_id

    def _refill(self):
        import jax.numpy as jnp
        for i, slot in enumerate(self.slots):
            if slot.active or not self.queue:
                continue
            sid, st, sink, skip, end = self.queue.pop(0)
            self.slots[i] = _Slot(symbols=st, cursor=0, sink=sink,
                                  end_sample=end, start_skip=skip,
                                  active=True, stream_id=sid)
            # reset this slot's device state columns
            for k in self.state:
                self.state[k] = self.state[k].at[i].set(0.0)
            self.metrics.streams_active += 1

    @property
    def n_active(self) -> int:
        return sum(s.active for s in self.slots)

    # -------------------------------------------------------------- step
    # P4 pipeline parallelism (SURVEY.md §2.4 P4): each step is split
    # into a host phase (_pack_dispatch: pack the window, launch the
    # device call asynchronously, advance cursors/refill — all host
    # decisions are data-independent of the decoded PCM) and a blocking
    # phase (_materialize_route: wait for the PCM and route it to
    # sinks). run() keeps one dispatch in flight, so window w+1's host
    # packing executes while the device decodes window w.

    def _pack_dispatch(self):
        """Pack + asynchronously dispatch one window. Returns a routing
        plan (device array + per-slot slices) or None when idle."""
        import jax.numpy as jnp
        S, W = self.S, self.win
        self._refill()
        if self.n_active == 0:
            return None
        is_ = np.zeros((S, W, 2, 576), np.int16)
        exp = np.zeros((S, W, 2, 64), np.int16)
        bt = np.zeros((S, W, 2), np.int8)
        mx = np.zeros((S, W, 2), bool)
        sm = np.zeros((S, W, 64), np.uint8)
        entries = []  # (slot_idx, sink, channels, n, lo, hi)
        with self.metrics.span("host"):
            for i, slot in enumerate(self.slots):
                if not slot.active:
                    continue
                st = slot.symbols
                n = min(W, st.n_granules - slot.cursor)
                if n <= 0:
                    continue
                # windowed refill: SymbolSource unpacks [cursor, cursor+n)
                # here (overlapping the in-flight device step — P4);
                # pre-unpacked SymbolTensors return a view
                ck = st.granules(slot.cursor, slot.cursor + n)
                # fault accounting: the ERR_* flags of exactly the
                # granules this step decodes (cursor is monotonic, so
                # each granule is counted once — SURVEY.md §5.3/§5.5)
                record_symbol_errors(ck.errors, ck.granules_per_frame,
                                     self.metrics)
                is_[i, :n] = ck.is_
                exp[i, :n] = ck.exp
                bt[i, :n] = ck.block_type
                mx[i, :n] = ck.mixed
                sm[i, :n] = ck.smode
                # emission bounds are known at pack time (gapless trim
                # depends on the cursor, never on decoded data)
                pos0 = slot.cursor * 576
                lo = max(slot.start_skip - pos0, 0)
                hi = n * 576
                if slot.end_sample is not None:
                    hi = min(hi, slot.end_sample - pos0)
                entries.append((i, slot.sink, st.channels, n, lo, hi))
                slot.cursor += n
                slot.total_emitted += max(hi - lo, 0)
                self.metrics.granules_decoded += n
                done = slot.cursor >= st.n_granules or (
                    slot.end_sample is not None
                    and pos0 + hi >= slot.end_sample)
                if done:
                    slot.active = False
                    self.metrics.streams_active -= 1
                    self.metrics.streams_finished += 1
        # async dispatch: returns immediately with uncommitted arrays;
        # the refill below enqueues state-column resets AFTER this call's
        # reads (functional arrays — the dispatched call holds the old
        # buffers), so correctness does not depend on timing
        pcm16_dev, self.state = kp.decode_window_i16(
            jnp.asarray(is_), jnp.asarray(exp), jnp.asarray(bt),
            jnp.asarray(mx), jnp.asarray(sm), self.state, self.sample_rate)
        seq = self._seq
        self._seq += 1
        self.trace.append(("dispatch", seq))
        self._refill()
        return {"pcm": pcm16_dev, "entries": entries, "seq": seq}

    def _materialize_route(self, plan) -> int:
        """Block on the dispatched window's PCM and route it to sinks."""
        with self.metrics.span("device"):
            pcm16 = np.asarray(plan["pcm"])  # blocks until device done
        self.trace.append(("route", plan["seq"]))
        emitted = 0
        for i, sink, channels, n, lo, hi in plan["entries"]:
            out = pcm16[i, : n * 576, :channels]
            if hi > lo:
                sink.push(out[lo:hi])
                emitted += hi - lo
            # aggregate sink-level starvation into the books (§5.5)
            u = take_underruns(sink)
            if u:
                from ..metrics import record_underruns
                record_underruns(u, self.metrics)
        self.metrics.samples_out += emitted
        return emitted

    def step(self) -> int:
        """One batched device step; returns samples emitted (all slots)."""
        plan = self._pack_dispatch()
        return 0 if plan is None else self._materialize_route(plan)

    def run(self, max_steps: int | None = None,
            checkpoint_every: int | None = None,
            on_checkpoint=None) -> int:
        """Step until all queued streams drain, keeping one device call
        in flight so host packing overlaps device compute (P4).

        checkpoint_every=N calls on_checkpoint(self.snapshot()) after
        every N routed windows (SURVEY.md §5.4: batch jobs checkpoint so
        a multi-stream decode resumes mid-file). The snapshot is taken
        at a window boundary — no dispatch is in flight over it."""
        total = 0
        steps = 0
        pending = self._pack_dispatch()
        while pending is not None:
            steps += 1
            take_ckpt = (checkpoint_every is not None
                         and on_checkpoint is not None
                         and steps % checkpoint_every == 0)
            nxt = None
            if (max_steps is None or steps < max_steps) and not take_ckpt:
                nxt = self._pack_dispatch()  # overlaps pending's compute
            total += self._materialize_route(pending)
            if take_ckpt:
                on_checkpoint(self.snapshot())
                if max_steps is None or steps < max_steps:
                    nxt = self._pack_dispatch()
            pending = nxt
        return total

    # ------------------------------------------------- checkpoint/resume
    def snapshot(self) -> dict:
        """Serializable batch checkpoint (SURVEY.md §5.4): per-slot
        progress + the explicit device state columns + queued stream
        ids. Stream CONTENT is not stored — restore() takes a resolver
        mapping stream_id back to bytes/SymbolTensors, exactly like
        seek rebuilds Player state from the file. Must be called at a
        window boundary (no dispatch in flight)."""
        return {
            "version": 1,
            "sample_rate": self.sample_rate,
            "win": self.win,
            "S": self.S,
            "slots": [
                {"stream_id": s.stream_id, "cursor": s.cursor,
                 "total_emitted": s.total_emitted,
                 "end_sample": s.end_sample, "start_skip": s.start_skip,
                 "active": s.active}
                for s in self.slots
            ],
            "state": {k: np.asarray(v) for k, v in self.state.items()},
            "queue": [
                {"stream_id": sid, "start_skip": skip, "end_sample": end}
                for sid, _st, _sink, skip, end in self.queue
            ],
        }

    def restore(self, snap: dict, resolve, sink_for=None) -> None:
        """Rebuild this scheduler from snapshot(). `resolve(stream_id)`
        returns the stream's mp3 bytes or SymbolTensors; `sink_for`
        (optional) returns a fresh Sink per stream_id (default:
        CollectSink — note sinks restart empty; previously-emitted
        samples are counted in the snapshot's total_emitted)."""
        import jax.numpy as jnp
        from ..pipeline import load_source
        if snap.get("version") != 1:
            raise ValueError("unknown scheduler snapshot version")
        if (snap["S"], snap["win"], snap["sample_rate"]) != \
                (self.S, self.win, self.sample_rate):
            raise ValueError("snapshot shape/rate mismatch with scheduler")

        def _symbols(sid):
            data = resolve(sid)
            if isinstance(data, SymbolTensors) or hasattr(data, "granules"):
                return data
            return load_source(bytes(data))[0]

        self.slots = []
        for rec in snap["slots"]:
            slot = _Slot()
            if rec["active"]:
                slot = _Slot(symbols=_symbols(rec["stream_id"]),
                             cursor=rec["cursor"],
                             sink=(sink_for(rec["stream_id"]) if sink_for
                                   else CollectSink()),
                             total_emitted=rec["total_emitted"],
                             end_sample=rec["end_sample"],
                             start_skip=rec["start_skip"], active=True,
                             stream_id=rec["stream_id"])
            self.slots.append(slot)
        self.state = {k: jnp.asarray(v) for k, v in snap["state"].items()}
        self.queue = [
            (q["stream_id"], _symbols(q["stream_id"]),
             sink_for(q["stream_id"]) if sink_for else CollectSink(),
             q["start_skip"], q["end_sample"])
            for q in snap["queue"]
        ]
        self.metrics.streams_active = sum(s.active for s in self.slots)


def decode_batch_streams(paths_or_bytes, n_slots: int = 64, win: int = 32,
                         gapless: bool = True, return_info: bool = False):
    """Convenience batched decode: returns list of (pcm, sample_rate)
    aligned with the inputs (SURVEY.md §3.2). Honors each stream's LAME
    gapless tag like single-file decode does (same trim, same lengths).
    return_info=True returns (results, [StreamInfo]) so callers that
    need container metadata (decode_files' device-handle fallback) do
    not re-parse every file."""
    from ..pipeline import load_source
    datas = []
    for p in paths_or_bytes:
        if isinstance(p, (bytes, bytearray)):
            datas.append(bytes(p))
        else:
            with open(p, "rb") as f:
                datas.append(f.read())
    # load_source skips ID3 regions and a leading Xing/Info metadata
    # frame, exactly like single-file decode — then materializes the
    # stream (batch throughput path wants whole-file symbols)
    loaded = [load_source(d) for d in datas]
    infos = [info for _src, info, _index in loaded]
    # container resyncs are booked HERE: submit() only records them for
    # byte inputs (it never sees the index when handed SymbolTensors) —
    # found by test_batch_fast_path_chaos_all_kinds' books-parity check
    for _src, _info, index in loaded:
        record_resyncs(index.resyncs)
    symbols = [src.whole() for src, _info, _index in loaded]
    rates = {st.sample_rate for st in symbols}
    out: list = [None] * len(datas)
    for rate in sorted(rates):
        idxs = [i for i, st in enumerate(symbols) if st.sample_rate == rate]
        sched = StreamScheduler(n_slots=min(n_slots, len(idxs)), win=win,
                                sample_rate=rate)
        sinks = {}
        for i in idxs:
            sinks[i] = CollectSink()
            bounds = (gapless_bounds_of(datas[i], symbols[i].n_granules)
                      if gapless else (0, None))
            sched.submit(symbols[i], sink=sinks[i], stream_id=i,
                         bounds=bounds)
        sched.run()
        for i in idxs:
            out[i] = (sinks[i].pcm, rate)
    return (out, infos) if return_info else out
