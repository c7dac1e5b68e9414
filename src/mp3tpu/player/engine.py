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
from ..metrics import Metrics
from .sink import CollectSink, Sink

WINDOW_GRANULES = 32  # must match pipeline.WINDOW for bit-identity


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


def _emit_dsp_pair(prev, cur, off, gain0, gain1, eq_state, kernel, nch):
    """Device-resident emit: one EMIT_BLOCK starting `off` samples into
    window `prev`, spilling into window `cur` (lax.dynamic_slice with a
    TRACED start and a STATIC size, so every block offset shares one
    executable). The DSP body is _emit_dsp itself on the same float
    values the host path would upload — the int16 output is identical;
    PCM never leaves the device as float32."""
    import jax.numpy as jnp
    from jax import lax
    cat = jnp.concatenate([prev[:, :nch], cur[:, :nch]], axis=0)
    x = lax.dynamic_slice(cat, (off, 0), (prev.shape[0], nch))
    return _emit_dsp(x, gain0, gain1, eq_state, kernel)


_emit_dsp_pair_jit = None


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
                 apply_gapless: bool = True):
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
        self.gain_db = gain_db
        self._applied_gain_db = gain_db  # last gain the DSP chain emitted at
        self._eq = None
        self._eq_state = None
        if eq_gains_db is not None:
            from ..dsp.eq import GraphicEQ
            self._eq = GraphicEQ(eq_gains_db, self.track.sample_rate)
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
        self._pending: list = []      # PCM awaiting block-aligned emission
        self._pending_n = 0
        self._state = None
        self._state_granule = None    # granule the device state is valid for
        self._win_cache = None        # (w, device_pcm [E, CH], n_granules)
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
    # granules — the same partition decode_file uses, so play/seek output
    # is bit-identical to full-file decode (XLA reduction order is only
    # stable for identical executables+shapes; SURVEY.md §7.5).
    def _decode_window_idx(self, w: int) -> np.ndarray:
        """Decode window w; device state must sit at w*32. Returns PCM of
        the window's real granules and advances state to (w+1)*32. Host
        symbols for the window are pulled from the streaming source here
        (the §3.3 refill step)."""
        import jax.numpy as jnp
        src = self.track.source
        W = WINDOW_GRANULES
        g0 = w * W
        assert self._state is not None and self._state_granule == g0
        n = min(W, src.n_granules - g0)
        with self.metrics.span("host"):
            st = src.granules(g0, g0 + n)

        def prep(a):
            if n != W:  # zero-pad the final partial window
                width = ((0, W - n),) + tuple((0, 0) for _ in a.shape[1:])
                a = np.pad(a, width)
            return jnp.asarray(a[None])

        from ..utils.profiling import annotate
        with annotate(f"mp3tpu.player_window[{w}]"):
            pcm, self._state = kp.decode_window(
                prep(st.is_), prep(st.exp), prep(st.block_type),
                prep(st.mixed), prep(st.smode), self._state, st.sample_rate)
        self._state_granule = g0 + W
        self.metrics.granules_decoded += n
        self._win_cache = (w, pcm[0], n)
        return np.asarray(pcm[0, : n * 576, : st.channels])

    def _decode_window_dev(self, w: int):
        """As _decode_window_idx but keeps the PCM on device: returns
        (device_pcm [E, CH], n_granules). Also caches the window so a
        following host-path access (the sub-block tail of a play())
        downloads it instead of re-decoding."""
        src = self.track.source
        W = WINDOW_GRANULES
        g0 = w * W
        assert self._state is not None and self._state_granule == g0
        n = min(W, src.n_granules - g0)
        import jax.numpy as jnp
        with self.metrics.span("host"):
            st = src.granules(g0, g0 + n)

        def prep(a):
            if n != W:
                width = ((0, W - n),) + tuple((0, 0) for _ in a.shape[1:])
                a = np.pad(a, width)
            return jnp.asarray(a[None])

        from ..utils.profiling import annotate
        with annotate(f"mp3tpu.player_window[{w}]"):
            pcm, self._state = kp.decode_window(
                prep(st.is_), prep(st.exp), prep(st.block_type),
                prep(st.mixed), prep(st.smode), self._state, st.sample_rate)
        self._state_granule = g0 + W
        self.metrics.granules_decoded += n
        dev = pcm[0]
        self._win_cache = (w, dev, n)
        return dev, n

    def _window_pcm(self, w: int) -> np.ndarray:
        """Host PCM for window w: served from the device window cache
        when possible (no re-decode, no state reset), else decoded."""
        st = self.track.source
        if self._win_cache is not None and self._win_cache[0] == w:
            _w, dev, n = self._win_cache
            return np.asarray(dev)[: n * 576, : st.channels]
        self._ensure_state_at_window(w)
        return self._decode_window_idx(w)

    def _ensure_state_at_window(self, w: int):
        """Make device state valid at window w's start: either it is
        already there, or reset and pre-roll one full window (32 granules
        >> the 2-granule overlap+FIFO warmup; SURVEY.md §5.4)."""
        g0 = w * WINDOW_GRANULES
        if self._state is not None and self._state_granule == g0:
            return
        w0 = max(0, w - 1)
        self._state = kp.init_state(1)
        self._state_granule = w0 * WINDOW_GRANULES
        if w0 < w:
            self._decode_window_idx(w0)  # discard pre-roll PCM
        self.metrics.seeks += 1

    EMIT_BLOCK = WINDOW_GRANULES * 576  # fixed DSP-emit shape (jit reuse)

    def _emit(self, pcm: np.ndarray):
        """Queue PCM and emit in fixed-size blocks so the jitted DSP
        chain compiles for exactly one shape (plus one tail shape per
        track end) — shape diversity is expensive on remote-compile
        backends. The tail is flushed when playback reaches the end."""
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

    def _emit_pair_dev(self, prev, cur, off: int):
        """Dispatch one EMIT_BLOCK through the device-resident DSP chain
        (same values and executable body as _emit_block, minus the
        float32 device->host->device round trip). Returns the int16
        device array; the caller downloads it asynchronously."""
        import jax
        import jax.numpy as jnp
        global _emit_dsp_pair_jit
        if _emit_dsp_pair_jit is None:
            _emit_dsp_pair_jit = jax.jit(_emit_dsp_pair,
                                         static_argnums=(7,))
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
        i16, new_eq = _emit_dsp_pair_jit(prev, cur, jnp.int32(off),
                                         gain0, gain1, eq_state, kernel,
                                         nch)
        self._applied_gain_db = self.gain_db
        if self._eq is not None:
            self._eq_state = new_eq
        return i16

    # -------------------------------------------------------------- api
    def play(self, until_sample: int | None = None, max_samples: int | None = None):
        """Decode from the current position to `until_sample` (absolute,
        default end), pushing PCM to the sink. `max_samples` bounds how
        many samples this call emits.

        Every complete EMIT_BLOCK is produced by the device fast path
        (_play_blocks_device): PCM stays on device through the DSP
        chain, only int16 crosses to host, and one block's download is
        kept in flight behind the next block's dispatch (SURVEY.md
        §2.4 P4). The sub-block tail (and sub-block requests) use the
        per-window host path below; both paths share the 32-granule
        window partition and the _emit_dsp math, so output is
        bit-identical either way."""
        end = self._end if until_sample is None else min(until_sample, self._end)
        if max_samples is not None:
            end = min(end, self._pos + max_samples)
        wspan = WINDOW_GRANULES * self.spf
        emitted = 0
        self.stopped = False
        if (not self._pending_n and self.EMIT_BLOCK == wspan
                and end - self._pos >= self.EMIT_BLOCK):
            emitted += self._play_blocks_device(end)
        while self._pos < end and not self.stopped:
            w = self._pos // wspan
            pcm = self._window_pcm(w)
            if len(pcm) == 0:
                break
            lo = self._pos - w * wspan
            hi = min(len(pcm), end - w * wspan)
            if hi > lo:
                self._emit(pcm[lo:hi])
                emitted += hi - lo
            self._pos = min((w + 1) * wspan, end)
        # deliver everything the caller asked for before returning
        self._flush_pending()
        return emitted

    def _play_blocks_device(self, end: int) -> int:
        """Emit every complete EMIT_BLOCK in [self._pos, end) via the
        device pair-slice path. Advances self._pos per PUSHED block, so
        a stop() from a sink callback leaves the cursor exactly after
        the last delivered block (the one block dispatched ahead is
        discarded and its DSP state unwound)."""
        E = self.EMIT_BLOCK
        wspan = WINDOW_GRANULES * self.spf
        n_blocks = (end - self._pos) // E
        w = self._pos // wspan
        off = self._pos - w * wspan
        self._ensure_state_at_window(w)
        prev, _n = self._decode_window_dev(w)
        inflight = None   # (i16_dev, eq_state_before, applied_gain_before)
        emitted = 0
        for k in range(n_blocks):
            if self.stopped:
                break
            eq_before = self._eq_state
            gain_before = self._applied_gain_db
            if off == 0:
                cur = prev
            else:
                cur, _n = self._decode_window_dev(w + 1)
            i16 = self._emit_pair_dev(prev, cur, off)
            try:
                i16.copy_to_host_async()
            except Exception:
                pass
            if inflight is not None:
                self._push_i16(np.asarray(inflight[0]))
                self._pos += E
                emitted += E
            if off == 0:
                w += 1
                if k + 1 < n_blocks and not self.stopped:
                    self._ensure_state_at_window(w)
                    prev, _n = self._decode_window_dev(w)
            else:
                prev = cur
                w += 1
            inflight = (i16, eq_before, gain_before)
        if inflight is not None:
            if self.stopped:
                # the look-ahead block was never pushed: unwind its DSP
                # state so a resumed play() re-emits it identically
                self._eq_state = inflight[1]
                self._applied_gain_db = inflight[2]
            else:
                self._push_i16(np.asarray(inflight[0]))
                self._pos += E
                emitted += E
        return emitted

    def seek(self, seconds: float):
        """Exact-sample seek (reservoir correctness is inherent: symbols
        were unpacked with full reservoir context; the filterbank state
        is rebuilt by a full-window pre-roll)."""
        sample = self._start + int(round(seconds * self.track.sample_rate))
        self._pos = max(self._start, min(sample, self._end))
        # playback is discontinuous: drop queued PCM, reset the EQ tail
        self._pending = []
        self._pending_n = 0
        self._eq_state = None

    def loop(self, a: float, b: float, times: int = 1):
        """Repeat-listen the segment [a, b) seconds `times` times —
        the reference's core usage pattern (README.md:46)."""
        for _ in range(times):
            self.seek(a)
            end = self._start + int(round(b * self.track.sample_rate))
            self.play(until_sample=end)

    def stop(self):
        self.stopped = True

    def pause(self):  # cursor simply stops advancing; resume with play()
        self.stopped = True

    # ------------------------------------------------- checkpoint/resume
    def snapshot(self) -> bytes:
        """Serialize the session cursor + DSP/device state (~KBs)."""
        buf = io.BytesIO()
        state = self._state or kp.init_state(1)
        np.savez(buf, pos=self._pos,
                 state_granule=(-1 if self._state_granule is None
                                else self._state_granule),
                 overlap=np.asarray(state["overlap"]),
                 hist=np.asarray(state["hist"]),
                 eq_state=(np.asarray(self._eq_state)
                           if self._eq_state is not None else np.zeros(0)),
                 gain_db=self.gain_db)
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
