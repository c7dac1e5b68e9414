"""Player/session engine (SURVEY.md D5, §3.3).

Headless play/seek/loop engine matching the reference's repeat-listening
usage (play a clip, loop a segment, slow re-listen): open -> play /
seek(t) / loop(a, b) / stop, with exact-sample seek (reservoir-correct
pre-roll) and checkpoint/resume via snapshot()/restore().

The decode cursor advances in fixed granule windows; device state
(IMDCT overlap + synthesis history) is explicit and tiny, so seek is
"reset state + pre-roll" and snapshots are a few KB (SURVEY.md §5.4).
"""
from __future__ import annotations

import io
from dataclasses import dataclass

import numpy as np

from ..bitstream.unpack import SymbolTensors
from ..container import frames as fr
from ..container.id3 import Id3Info, parse_id3v1, parse_id3v2
from ..container.seek import SeekTable
from ..container.xing import StreamInfo
from ..dsp.gapless import gapless_bounds
from ..kernels import pipeline as kp
from ..metrics import Metrics, record_resyncs, record_symbol_errors
from .sink import CollectSink, Sink, take_underruns

WINDOW_GRANULES = 32  # must match pipeline.WINDOW for bit-identity
GROUP_WINDOWS = 8     # must match pipeline.GROUP_WINDOWS (shared scan program)


GAIN_RAMP = 256  # samples of linear amplitude ramp on a gain change (D3)


def _emit_dsp(x, gain0, gain1, eq_state, kernel):
    """Jitted gain -> EQ(FIR) -> int16 chain. Module-level (shared jit
    cache across Player instances); gains and the EQ kernel are traced
    arguments, so one compile covers any gain/EQ setting at a given
    shape. A length-1 kernel means "no EQ". Gain changes ramp linearly
    over GAIN_RAMP samples (zipper-free, dsp/gain.py semantics); with
    gain0 == gain1 the ramp is exactly constant, so steady-state output
    is bit-identical to a plain scalar multiply."""
    import jax
    import jax.numpy as jnp
    r = min(GAIN_RAMP, x.shape[0])
    ramp = jnp.concatenate([
        jnp.linspace(gain0, gain1, r, dtype=jnp.float32),
        jnp.full((x.shape[0] - r,), gain1, jnp.float32)])
    x = x * ramp[:, None]
    if kernel.shape[-1] > 1:
        xx = jnp.concatenate([eq_state, x], axis=0)
        lhs = xx.T[:, None, :]
        rhs = kernel[None, None, ::-1]
        out = jax.lax.conv_general_dilated(
            lhs, rhs, window_strides=(1,), padding=[(0, 0)],
            precision=jax.lax.Precision.HIGHEST)
        x = out[:, 0, :].T
        new_state = xx[-(kernel.shape[-1] - 1):]
    else:
        new_state = eq_state
    return kp.quantize_i16(x), new_state


_emit_dsp_jit = None


def _emit_dsp_multi(prev, cur, off, gain0, gain1, eq_state, kernel, nch,
                    e, m):
    """Device-resident emit: m consecutive e-sample blocks starting
    `off` samples into group buffer `prev`, spilling into group `cur`
    (lax.dynamic_slice with a TRACED start and STATIC size/count, so
    every block offset shares one executable per m; for blocks fully
    inside one group the caller passes the same buffer twice). The DSP
    body is _emit_dsp itself, applied per block with the EQ tail (and
    the gain ramp's completion) carried block to block — exactly the
    sequence m per-block dispatches would compute, in ONE dispatch and
    one int16 download. Every intermediate EQ tail is returned so a
    stop() between pushed blocks can rewind to any block boundary.
    PCM never leaves the device as float32."""
    import jax.numpy as jnp
    from jax import lax
    cat = jnp.concatenate([prev[:, :nch], cur[:, :nch]], axis=0)

    def step(carry, i):
        eq, g0 = carry
        x = lax.dynamic_slice(cat, (off + i * e, 0), (e, nch))
        i16, eq2 = _emit_dsp(x, g0, gain1, eq, kernel)
        return (eq2, gain1), (i16, eq2)

    (eq_fin, _), (i16s, eqs) = lax.scan(
        step, (eq_state, gain0), jnp.arange(m))
    return i16s, eqs, eq_fin


_emit_dsp_multi_jit = None


@dataclass
class Track:
    """Parsed container + streaming symbol source for one stream.

    The source unpacks granule windows on demand (O(window) first-audio
    latency and host memory — SURVEY.md §3.3 refill loop; VERDICT
    round-1 item 4), instead of unpacking the whole file at open."""
    source: object  # SymbolSource (duck-typed with SymbolTensors)
    index: fr.FrameIndex
    id3: Id3Info
    id3v1: dict
    stream_info: StreamInfo
    seek_table: SeekTable
    first_audio_frame: int = 0

    @property
    def sample_rate(self) -> int:
        return self.source.sample_rate

    @property
    def channels(self) -> int:
        return self.source.channels


def open_track(path_or_bytes) -> Track:
    from ..pipeline import load_source
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    id3 = parse_id3v2(data)
    id3v1 = parse_id3v1(data)
    source, info, index = load_source(data)
    return Track(source=source, index=index, id3=id3, id3v1=id3v1,
                 stream_info=info, seek_table=SeekTable(index, info),
                 first_audio_frame=0)


class Player:
    """Single-stream playback session."""

    def __init__(self, path_or_bytes, sink: Sink | None = None,
                 gain_db: float | None = None, eq_gains_db=None,
                 apply_gapless: bool = True, speed: float | None = None):
        from ..config import get_active
        cfg = get_active()
        if cfg.decode.window_granules != WINDOW_GRANULES:
            # the shared 32-granule partition IS the bit-exactness
            # contract between play/seek/decode (CLAUDE.md invariant)
            raise ValueError(
                "Player requires decode.window_granules == "
                f"{WINDOW_GRANULES} (got {cfg.decode.window_granules})")
        if gain_db is None:
            gain_db = cfg.player.gain_db
        if eq_gains_db is None and cfg.player.eq_gains_db:
            eq_gains_db = list(cfg.player.eq_gains_db)
        self.track = open_track(path_or_bytes)
        self.sink = sink or CollectSink()
        self.metrics = Metrics()
        record_resyncs(self.track.index.resyncs, self.metrics)
        self.gain_db = gain_db
        self._applied_gain_db = gain_db  # last gain the DSP chain emitted at
        self._eq = None
        self._eq_state = None
        if eq_gains_db is not None:
            from ..dsp.eq import GraphicEQ
            self._eq = GraphicEQ(eq_gains_db, self.track.sample_rate)
        self._speed = 1.0
        self._stretch = None  # TimeStretch, active iff a speed was set
        # pending-emission state must exist BEFORE set_speed below: a
        # speed that quantizes to unity (e.g. 1.0005) takes set_speed's
        # disengage branch, which flushes pending PCM (ADVICE r3)
        self._pending: list = []      # PCM awaiting block-aligned emission
        self._pending_n = 0
        if speed is None:
            speed = cfg.player.speed
        if speed != 1.0:
            self.set_speed(speed)
        st = self.track.source
        self.ngr_per_frame = 1 if st.version != fr.VERSION_MPEG1 else 2
        self.spf = 576  # samples per granule
        info = self.track.stream_info
        if apply_gapless and info.gapless:
            total = st.n_granules * self.spf
            self._start, self._end = gapless_bounds(
                total, info.encoder_delay, info.encoder_padding)
        else:
            self._start, self._end = 0, st.n_granules * self.spf
        self._pos = self._start       # absolute decoded-sample position
        self._state = None
        self._state_granule = None    # granule the device state is valid for
        # decoded groups kept on device, newest-last, capped at two so a
        # loop() segment spanning a group boundary stays fully cached:
        #   q -> [device_pcm [K*32*576, 2], n_valid_granules,
        #         upto_windows, host_pcm_or_None]
        self._group_cache: dict = {}
        # incrementally accumulated symbols for ONE group (host unpack
        # stays linear when a group is decoded in growing prefixes):
        self._group_syms = None       # (q, SymbolTensors, n_granules)
        self._err_counted = {}        # group q -> granules already booked
        self._segments = None         # (param_key, [(start_s, end_s)])
        self.stopped = False

    # ------------------------------------------------------------- info
    @property
    def duration(self) -> float:
        return (self._end - self._start) / self.track.sample_rate

    @property
    def position(self) -> float:
        return (self._pos - self._start) / self.track.sample_rate

    @property
    def metadata(self) -> dict:
        md = dict(self.track.id3.frames)
        for k, v in self.track.id3v1.items():
            md.setdefault(f"v1:{k}", v)
        return md

    # ------------------------------------------------------------ decode
    # The file is decoded in fixed window partitions [w*32, (w+1)*32) of
    # granules, grouped GROUP_WINDOWS windows per device dispatch — the
    # same single scan program decode_file runs, so play/seek output is
    # bit-identical to full-file decode (XLA numerics are only stable
    # within one compiled executable; SURVEY.md §7.5). Partial groups
    # ride the scan's prefix property: zero-pad the unrequested windows,
    # the real windows' PCM is unchanged.
    def _group_symbols(self, q: int, n: int):
        """Symbols for the first n granules of group q, accumulated
        incrementally so repeated prefix requests unpack each granule
        once (SymbolSource does not cache)."""
        src = self.track.source
        GG = GROUP_WINDOWS * WINDOW_GRANULES
        g0 = q * GG
        cached = self._group_syms
        if cached is not None and cached[0] == q and cached[2] >= n:
            return cached[1].slice_granules(0, n) if cached[2] != n else cached[1]
        with self.metrics.span("host"):
            if cached is not None and cached[0] == q:
                ext = src.granules(g0 + cached[2], g0 + n)
                st = SymbolTensors.concat([cached[1], ext])
            else:
                st = src.granules(g0, g0 + n)
        # fault accounting on NEVER-BOOKED granules only: a replay loop
        # or backward seek re-unpacks evicted groups, and re-counting
        # them would report phantom escalating corruption — the per-
        # group high-water mark makes the books count each granule once
        # per player, like the scheduler's monotonic cursor does
        c = self._err_counted.get(q, 0)
        if n > c:
            record_symbol_errors(st.errors[c:], st.granules_per_frame,
                                 self.metrics)
            self._err_counted[q] = n
        self._group_syms = (q, st, n)
        return st

    def _decode_group_dev(self, q: int, upto: int):
        """Decode the first `upto` windows of group q via the shared
        group-scan program; device state must sit at the group start.
        Returns (device_pcm [GROUP*32*576, 2], n_valid_granules). State
        advances to group q+1 ONLY when the full group was real (a
        prefix decode pads with zero windows, whose state is garbage but
        never consumed — re-requests rerun from the same state-in)."""
        import jax.numpy as jnp
        src = self.track.source
        W, K = WINDOW_GRANULES, GROUP_WINDOWS
        GG = K * W
        g0 = q * GG
        assert self._state is not None and self._state_granule == g0
        n_avail = min(GG, src.n_granules - g0)
        n = min(upto * W, n_avail)
        st = self._group_symbols(q, n)

        def prep(a):
            if n != GG:  # zero-pad unrequested windows / the EOF tail
                width = ((0, GG - n),) + tuple((0, 0) for _ in a.shape[1:])
                a = np.pad(a, width)
            return jnp.asarray(a[None])

        from ..utils.profiling import annotate
        with annotate(f"mp3tpu.player_group[{q}]"):
            pcm, new_state = kp.decode_window_group(
                prep(st.is_), prep(st.exp), prep(st.block_type),
                prep(st.mixed), prep(st.smode), self._state,
                st.sample_rate, K)
        if n == GG:  # full real group: state is valid at q+1
            self._state = new_state
            self._state_granule = g0 + GG
        self.metrics.granules_decoded += n
        dev = pcm[0]
        self._group_cache.pop(q, None)
        self._group_cache[q] = [dev, n, -(-n // W), None]
        while len(self._group_cache) > 2:  # evict oldest
            self._group_cache.pop(next(iter(self._group_cache)))
        return dev, n

    def _cached_or_decode_group(self, q: int):
        """Fully-decoded device PCM for group q: served from the
        two-entry group cache when it covers every available granule
        (so a loop() over a segment — even one spanning a group
        boundary — re-dispatches NOTHING after its first iteration),
        else decoded. The cache carries no device state; a later chain
        into group q+1 re-establishes state with a one-window pre-roll
        (_ensure_state_at_group)."""
        src = self.track.source
        GG = GROUP_WINDOWS * WINDOW_GRANULES
        n_avail = min(GG, src.n_granules - q * GG)
        c = self._group_cache.get(q)
        if c is not None and c[1] >= n_avail:
            return c[0]
        self._ensure_state_at_group(q)
        dev, _n = self._decode_group_dev(q, GROUP_WINDOWS)
        return dev

    def _window_pcm(self, w: int) -> np.ndarray:
        """Host PCM for window w: sliced from the cached HOST copy of
        the group (downloaded once per group — np.asarray of the same
        device Array is cached, and host-side slicing avoids compiling
        a device slice executable per (offset, length))."""
        src = self.track.source
        W, K = WINDOW_GRANULES, GROUP_WINDOWS
        q, wi = divmod(w, K)
        c = self._group_cache.get(q)
        if c is None or c[2] <= wi:
            self._ensure_state_at_group(q)
            # first touch of a group decodes the minimal prefix (the
            # O(window) first-audio path); any LATER growth decodes the
            # whole group, so sink-paced sub-block reads cost at most
            # two dispatches + two downloads per group rather than one
            # full prefix re-decode + full-buffer re-download per window
            # (any prefix is bit-identical by the scan's prefix property)
            self._decode_group_dev(q, wi + 1 if c is None else K)
            c = self._group_cache[q]
        dev, n_valid, _upto, host = c
        n = min(W, n_valid - wi * W)
        if n <= 0:
            return np.zeros((0, src.channels), np.float32)
        if host is None:  # one full-group download, reused across reads
            host = np.asarray(dev)
            c[3] = host
        return host[wi * W * 576: wi * W * 576 + n * 576, : src.channels]

    def _ensure_state_at_group(self, q: int):
        """Make device state valid at group q's start: either it is
        already there, or reset and pre-roll. The carried state after a
        window depends only on THAT window's symbols (overlap/hist are
        tails of the current window's output), so the pre-roll unpacks
        ONE window — the last of group q-1 — and runs it in the LAST
        scan slot of the same group program: O(window) host work, one
        dispatch (SURVEY.md §5.4)."""
        W, K = WINDOW_GRANULES, GROUP_WINDOWS
        GG = K * W
        g0 = q * GG
        if self._state is not None and self._state_granule == g0:
            return
        self._state = kp.init_state(1)
        self._state_granule = 0
        if q > 0:
            import jax.numpy as jnp
            src = self.track.source
            with self.metrics.span("host"):
                st = src.granules(g0 - W, g0)

            def prep(a):
                pad = np.zeros((GG - W,) + a.shape[1:], a.dtype)
                return jnp.asarray(np.concatenate([pad, a])[None])

            _pcm, self._state = kp.decode_window_group(
                prep(st.is_), prep(st.exp), prep(st.block_type),
                prep(st.mixed), prep(st.smode), self._state,
                st.sample_rate, K)
            self._state_granule = g0
        self.metrics.seeks += 1

    EMIT_BLOCK = WINDOW_GRANULES * 576  # fixed DSP-emit shape (jit reuse)

    def _emit(self, pcm: np.ndarray):
        """Queue PCM and emit in fixed-size blocks so the jitted DSP
        chain compiles for exactly one shape (plus one tail shape per
        track end) — shape diversity is expensive on remote-compile
        backends. The tail is flushed when playback reaches the end.
        With a speed set, decoded PCM first passes through the streaming
        phase vocoder (tempo changes, pitch does not — dsp/timestretch);
        the stretcher holds its own residue, so possibly nothing is
        queued this call."""
        if self._stretch is not None:
            pcm = self._stretch.process(pcm)
            if not len(pcm):
                return
        self._pending.append(pcm)
        self._pending_n += len(pcm)
        while self._pending_n >= self.EMIT_BLOCK:
            buf = np.concatenate(self._pending) if len(self._pending) > 1                 else self._pending[0]
            block, rest = buf[: self.EMIT_BLOCK], buf[self.EMIT_BLOCK:]
            self._pending = [rest] if len(rest) else []
            self._pending_n = len(rest)
            self._emit_block(block)

    def _flush_pending(self):
        if self._pending_n:
            buf = np.concatenate(self._pending) if len(self._pending) > 1                 else self._pending[0]
            self._pending = []
            self._pending_n = 0
            self._emit_block(buf)

    def _emit_block(self, pcm: np.ndarray):
        import jax
        import jax.numpy as jnp
        global _emit_dsp_jit
        if _emit_dsp_jit is None:
            _emit_dsp_jit = jax.jit(_emit_dsp)
        gain0 = jnp.float32(10.0 ** (self._applied_gain_db / 20.0))
        gain1 = jnp.float32(10.0 ** (self.gain_db / 20.0))
        if self._eq is not None:
            if self._eq_state is None:
                self._eq_state = self._eq.init_state(pcm.shape[1])
            kernel = self._eq.h
            eq_state = self._eq_state
        else:
            kernel = jnp.ones((1,), jnp.float32)
            eq_state = jnp.zeros((0, pcm.shape[1]), jnp.float32)
        i16, new_eq_state = _emit_dsp_jit(
            jnp.asarray(pcm), gain0, gain1, eq_state, kernel)
        self._applied_gain_db = self.gain_db
        if self._eq is not None:
            self._eq_state = new_eq_state
        self._push_i16(np.asarray(i16))

    def _push_i16(self, i16: np.ndarray):
        self.sink.push(i16)
        self.metrics.samples_out += len(i16)
        u = take_underruns(self.sink)
        if u:  # aggregate sink-level starvation (§5.5)
            from ..metrics import record_underruns
            record_underruns(u, self.metrics)

    def _emit_multi_dev(self, prev, cur, off: int, m: int):
        """Dispatch m EMIT_BLOCKs through the device-resident DSP chain
        (same values and executable body as _emit_block, minus the
        float32 device->host->device round trip). prev/cur are decoded
        GROUP buffers (the same buffer twice when no block spills into
        the next group). Returns (int16 [m, E, nch] device array,
        per-block EQ tails); the caller downloads asynchronously."""
        import jax
        import jax.numpy as jnp
        global _emit_dsp_multi_jit
        if _emit_dsp_multi_jit is None:
            _emit_dsp_multi_jit = jax.jit(_emit_dsp_multi,
                                          static_argnums=(7, 8, 9))
        nch = self.track.source.channels
        gain0 = jnp.float32(10.0 ** (self._applied_gain_db / 20.0))
        gain1 = jnp.float32(10.0 ** (self.gain_db / 20.0))
        if self._eq is not None:
            if self._eq_state is None:
                self._eq_state = self._eq.init_state(nch)
            kernel = self._eq.h
            eq_state = self._eq_state
        else:
            kernel = jnp.ones((1,), jnp.float32)
            eq_state = jnp.zeros((0, nch), jnp.float32)
        i16s, eqs, eq_fin = _emit_dsp_multi_jit(
            prev, cur, jnp.int32(off), gain0, gain1, eq_state, kernel,
            nch, self.EMIT_BLOCK, m)
        self._applied_gain_db = self.gain_db
        if self._eq is not None:
            self._eq_state = eq_fin
        return i16s, eqs

    # -------------------------------------------------------------- api
    def play(self, until_sample: int | None = None, max_samples: int | None = None):
        """Decode from the current position to `until_sample` (absolute,
        default end), pushing PCM to the sink. `max_samples` bounds how
        many SOURCE samples this call advances — also what the return
        value counts; with a speed set the sink receives ~1/speed times
        as many stretched samples.

        Every complete EMIT_BLOCK is produced by the device fast path
        (_play_blocks_device): PCM stays on device through the DSP
        chain, only int16 crosses to host (one download per multi-block
        dispatch), and one dispatch's download is kept in flight behind
        the next dispatch (SURVEY.md §2.4 P4). The sub-block tail (and
        sub-block requests) use the host path below; both paths run the
        SAME group-scan decode program and the _emit_dsp math. At unity
        gain / no EQ the DSP is elementwise, so output is bit-identical
        either way (what the play==decode tests pin); with EQ on, the
        FIR runs in differently-composed executables across the two
        paths, so cross-path agreement there is <=ULP, not bit-pinned
        (memory: XLA numerics are only stable within one program).
        Live gain/EQ changes from sink callbacks take effect at the
        next multi-block dispatch — up to ~2 dispatches (~16 blocks)
        of latency vs ~2 blocks with per-block emission."""
        boundary = (self._end if until_sample is None
                    else min(until_sample, self._end))
        end = boundary
        if max_samples is not None:
            end = min(end, self._pos + max_samples)
        wspan = WINDOW_GRANULES * self.spf
        emitted = 0
        hit_eof = False
        self.stopped = False
        if (not self._pending_n and self.EMIT_BLOCK == wspan
                and end - self._pos >= self.EMIT_BLOCK
                and self._stretch is None):
            # the device int16 path can't host the vocoder (stretching
            # changes length); with a speed set everything below routes
            # through _emit -> TimeStretch on the host path
            emitted += self._play_blocks_device(end)
        while self._pos < end and not self.stopped:
            w = self._pos // wspan
            pcm = self._window_pcm(w)
            if len(pcm) == 0:
                hit_eof = True
                break
            lo = self._pos - w * wspan
            hi = min(len(pcm), end - w * wspan)
            if hi > lo:
                self._emit(pcm[lo:hi])
                emitted += hi - lo
            self._pos = min((w + 1) * wspan, end)
        # a play that REACHED its requested endpoint (track end, an
        # explicit until_sample, or EOF) delivers the vocoder's held
        # tail too, so the stretched output covers the full range; a
        # paced call (max_samples bound first) or a stop() keeps the
        # stretcher streaming for the continuation
        if (self._stretch is not None and not self.stopped
                and (hit_eof or self._pos >= boundary)):
            tail = self._stretch.flush()
            if len(tail):
                self._pending.append(tail)
                self._pending_n += len(tail)
        # deliver everything the caller asked for before returning
        self._flush_pending()
        return emitted

    def _push_blocks(self, inflight):
        """Push one downloaded multi-block dispatch (ONE int16 D2H for
        all its blocks); a stop() from a sink callback between blocks
        leaves the cursor after the last delivered block and rewinds the
        EQ tail to that boundary. Returns (samples, interrupted)."""
        i16s, eqs, _eq_before, _gain_before, m = inflight
        arr = np.asarray(i16s)
        E = self.EMIT_BLOCK
        for j in range(m):
            self._push_i16(arr[j])
            self._pos += E
            if self.stopped and j + 1 < m:
                if self._eq is not None and eqs is not None:
                    import jax.numpy as jnp
                    self._eq_state = jnp.asarray(np.asarray(eqs[j]))
                return (j + 1) * E, True
        return m * E, False

    def _play_blocks_device(self, end: int) -> int:
        """Emit every complete EMIT_BLOCK in [self._pos, end) via the
        device group path: ONE decode dispatch per GROUP_WINDOWS
        windows, ONE emit dispatch + ONE int16 download per up-to-
        GROUP_WINDOWS blocks (a multi-block dispatch may spill into the
        next group: off + 8 blocks < two group spans always). Advances
        self._pos per PUSHED block, so a stop() from a sink callback
        leaves the cursor exactly after the last delivered block (the
        dispatch kept in flight behind the pushes is discarded and its
        DSP state unwound)."""
        E = self.EMIT_BLOCK
        GG = GROUP_WINDOWS * WINDOW_GRANULES
        gspan = GG * self.spf
        dpos = self._pos  # dispatch cursor (one dispatch ahead of _pos)
        q = dpos // gspan
        cur_grp = self._cached_or_decode_group(q)
        nxt_grp = None
        inflight = None  # (i16s, eqs, eq_before, gain_before, m)
        interrupted = False
        emitted = 0
        while not self.stopped:
            blocks_left = (end - dpos) // E
            if blocks_left <= 0:
                break
            off = dpos - q * gspan
            m = min(GROUP_WINDOWS, blocks_left)
            eq_before = self._eq_state
            gain_before = self._applied_gain_db
            if off + m * E > gspan and nxt_grp is None:
                nxt_grp = self._cached_or_decode_group(q + 1)
            i16s, eqs = self._emit_multi_dev(
                cur_grp, cur_grp if nxt_grp is None else nxt_grp, off, m)
            try:
                i16s.copy_to_host_async()
            except Exception:
                pass
            if inflight is not None:
                got, interrupted = self._push_blocks(inflight)
                emitted += got
            dpos += m * E
            if dpos >= (q + 1) * gspan:  # m*E <= gspan: at most one cross
                q += 1
                if nxt_grp is not None:
                    cur_grp, nxt_grp = nxt_grp, None
                elif (end - dpos) // E > 0 and not self.stopped:
                    # the dispatch ended exactly on the boundary
                    cur_grp = self._cached_or_decode_group(q)
            inflight = (i16s, eqs, eq_before, gain_before, m)
        if inflight is not None:
            if self.stopped:
                # the look-ahead dispatch was never pushed: the applied
                # gain rolls back to what the last PUSHED dispatch left
                # (== the discarded dispatch's gain_before) in both stop
                # flavors; the EQ tail is restored here only when no
                # push was interrupted (an interrupted _push_blocks
                # already rewound it to the delivered block boundary)
                self._applied_gain_db = inflight[3]
                if not interrupted:
                    self._eq_state = inflight[2]
            else:
                got, _ = self._push_blocks(inflight)
                emitted += got
        return emitted

    def seek(self, seconds: float):
        """Exact-sample seek (reservoir correctness is inherent: symbols
        were unpacked with full reservoir context; the filterbank state
        is rebuilt by a full-window pre-roll)."""
        sample = self._start + int(round(seconds * self.track.sample_rate))
        self._pos = max(self._start, min(sample, self._end))
        # playback is discontinuous: drop queued PCM, reset the EQ tail
        # and the vocoder's carried phase/overlap (its speed is kept)
        self._pending = []
        self._pending_n = 0
        self._eq_state = None
        if self._stretch is not None:
            self._stretch.reset()

    def loop(self, a: float, b: float, times: int = 1):
        """Repeat-listen the segment [a, b) seconds `times` times —
        the reference's core usage pattern (README.md:46)."""
        for _ in range(times):
            self.seek(a)
            end = self._start + int(round(b * self.track.sample_rate))
            self.play(until_sample=end)

    def segments(self, refresh: bool = False, **kw) -> list:
        """Sentence boundaries [(start_s, end_s), ...] on the playback
        timeline (same clock as seek/loop), found by silence analysis
        (dsp/segment.py) — the navigation half of the reference's
        "play a few sentences at a time" usage (README.md:46).

        The track is scanned once through the SAME window decode the
        player plays from (bit-identical PCM, device group dispatches);
        only the tiny 50 Hz energy envelope is accumulated on host, so
        the scan is O(envelope) extra memory for any track length.
        The result is cached per parameter set; the playback cursor is
        untouched."""
        from ..dsp.segment import (HOP_S, env_db_from_power, sample_power,
                                   segments_from_envelope)
        key = tuple(sorted(kw.items()))
        if not refresh and getattr(self, "_segments", None) is not None \
                and self._segments[0] == key:
            return self._segments[1]
        sr = self.track.sample_rate
        wspan = WINDOW_GRANULES * self.spf
        hop = max(1, int(round(sr * kw.pop("hop_s", HOP_S))))
        env, res = [], np.zeros((0,), np.float32)
        pos = self._start
        while pos < self._end:
            w = pos // wspan
            pcm = self._window_pcm(w)
            if not len(pcm):
                break
            lo = pos - w * wspan
            hi = min(len(pcm), self._end - w * wspan)
            res = np.concatenate([res, sample_power(pcm[lo:hi])])
            F = len(res) // hop
            if F:
                env.append(env_db_from_power(res[: F * hop], hop))
                res = res[F * hop:]
            pos = min((w + 1) * wspan, self._end)
        env = np.concatenate(env) if env else np.zeros(0, np.float32)
        segs = segments_from_envelope(env, hop, sr,
                                      total=self._end - self._start, **kw)
        out = [(s / sr, e / sr) for s, e in segs]
        self._segments = (key, out)
        return out

    def play_segment(self, i: int, times: int = 1,
                     speed: float | None = None):
        """Replay sentence `i` (from segments()) `times` times, at an
        optional pitch-preserving speed — the reference's full
        repeat-listening gesture in one call."""
        segs = self.segments()
        if not 0 <= i < len(segs):
            raise IndexError(f"segment {i} of {len(segs)}")
        if speed is not None:
            self.set_speed(speed)
        a, b = segs[i]
        self.loop(a, b, times=times)

    def practice(self, times: int = 3, gap_s: float = 0.0,
                 speed: float | None = None, start: int = 0,
                 stop: int | None = None) -> list:
        """Sentence-by-sentence study session — the reference's whole
        described method (/root/reference/README.md:46: play an article
        a few sentences at a time, replay each sentence repeatedly,
        slow listening) as one call. For each detected sentence in
        [start, stop), replay it `times` times at the pitch-preserving
        `speed`, inserting `gap_s` seconds of silence after every
        repetition — a shadowing window for the learner to speak into.
        A stop() from a sink callback ends the session between
        repetitions. Returns the practiced [(start_s, end_s), ...]."""
        segs = self.segments()
        lo = max(0, start)
        hi = len(segs) if stop is None else min(stop, len(segs))
        if speed is not None:
            self.set_speed(speed)
        gap = int(round(gap_s * self.track.sample_rate))
        nch = self.track.channels
        for a, b in segs[lo:hi]:
            for _ in range(times):
                self.loop(a, b, times=1)
                if gap:
                    self._push_i16(np.zeros((gap, nch), np.int16))
                if self.stopped:
                    return segs[lo:hi]
        return segs[lo:hi]

    def stop(self):
        self.stopped = True

    def pause(self):  # cursor simply stops advancing; resume with play()
        self.stopped = True

    @property
    def speed(self) -> float:
        """Effective playback tempo (pitch-preserving; 1.0 = off)."""
        return self._speed

    def set_speed(self, speed: float):
        """Pitch-preserving tempo change (the reference's "slow
        listening" control — SURVEY.md §0.1). Takes effect at the next
        processed chunk; a mid-play change keeps the vocoder's carried
        phase/overlap state, so the tempo glides without a click.
        speed == 1.0 returns to the direct (device int16) emit path."""
        from ..dsp.timestretch import TimeStretch
        if speed != 1.0:
            if self._stretch is None:
                self._stretch = TimeStretch(self.track.channels, speed)
            else:
                self._stretch.set_speed(speed)
            if self._stretch.speed != 1.0:
                self._speed = self._stretch.speed
                return
            # the request quantized to unity (e.g. 1.0005): fall through
            # and disengage — p.speed == 1.0 must mean the direct path
        if self._stretch is not None:
            tail = self._stretch.flush()
            if len(tail):
                self._pending.append(tail)
                self._pending_n += len(tail)
            self._stretch = None
            self._flush_pending()  # the tail reaches the sink NOW, not
            # only if the caller happens to play() again
        self._speed = 1.0

    # ------------------------------------------------- checkpoint/resume
    def snapshot(self) -> bytes:
        """Serialize the session cursor + DSP/device state (~KBs)."""
        buf = io.BytesIO()
        state = self._state or kp.init_state(1)
        extra = {}
        if self._stretch is not None:
            # vocoder state rides along (prefixed keys), so a resumed
            # stretched session continues bit-identically
            extra = {f"ts_{k}": np.asarray(v)
                     for k, v in self._stretch.state_blob().items()}
        np.savez(buf, pos=self._pos,
                 state_granule=(-1 if self._state_granule is None
                                else self._state_granule),
                 overlap=np.asarray(state["overlap"]),
                 hist=np.asarray(state["hist"]),
                 eq_state=(np.asarray(self._eq_state)
                           if self._eq_state is not None else np.zeros(0)),
                 gain_db=self.gain_db, speed=self._speed, **extra)
        return buf.getvalue()

    def restore(self, blob: bytes):
        import jax.numpy as jnp
        z = np.load(io.BytesIO(blob))
        self._pos = int(z["pos"])
        sg = int(z["state_granule"])
        self._state_granule = None if sg < 0 else sg
        self._state = {"overlap": jnp.asarray(z["overlap"]),
                       "hist": jnp.asarray(z["hist"])}
        if z["eq_state"].size and self._eq is not None:
            self._eq_state = jnp.asarray(z["eq_state"])
        else:
            # the snapshot carried no EQ tail: a stale one from playback
            # since the snapshot would corrupt the continuation
            self._eq_state = None
        # restore is discontinuous, like seek(): drop queued PCM
        self._pending = []
        self._pending_n = 0
        self.gain_db = float(z["gain_db"])
        self._applied_gain_db = self.gain_db
        self._speed = float(z["speed"]) if "speed" in z.files else 1.0
        self._stretch = None
        if "ts_ha" in z.files:
            from ..dsp.timestretch import TimeStretch
            self._stretch = TimeStretch(self.track.channels, self._speed)
            self._stretch.restore_blob(
                {k[3:]: z[k] for k in z.files if k.startswith("ts_")})
        elif self._speed != 1.0:
            self.set_speed(self._speed)
