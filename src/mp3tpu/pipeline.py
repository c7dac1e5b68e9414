"""File-level decode orchestration: host unpack -> device windows -> PCM.

Single-file decode runs as [S=1, G] windows with explicit state carry;
batched decode stacks streams on the S axis (SURVEY.md §3.1/§3.2).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .bitstream.unpack import SymbolTensors, unpack_fast
from .container import frames as fr
from .container.id3 import parse_id3v2
from .container.xing import StreamInfo, is_metadata_frame, parse_stream_info
from .kernels import pipeline as kp

# One canonical window shape for all single-stream paths: identical jit
# executables produce bit-identical PCM (XLA reduction order varies with
# shape, so shape consistency IS the determinism contract; SURVEY.md §7.5).
WINDOW = 32


def _read(path_or_bytes) -> bytes:
    if isinstance(path_or_bytes, (bytes, bytearray)):
        return bytes(path_or_bytes)
    with open(path_or_bytes, "rb") as f:
        return f.read()


def decode_symbols_device(st: SymbolTensors, state=None,
                          window: int = WINDOW) -> np.ndarray:
    """Run the TPU pipeline over all granules of one stream.

    Returns float32 PCM [n, channels].
    """
    from .utils.profiling import annotate
    G = st.n_granules
    if state is None:
        state = kp.init_state(1)
    out = []
    for start in range(0, G, window):
        g = min(window, G - start)
        sl = slice(start, start + g)

        def prep(a):
            a = a[sl]
            if g != window:  # zero-pad the final partial window
                width = ((0, window - g),) + tuple((0, 0) for _ in a.shape[1:])
                a = np.pad(a, width)
            return jnp.asarray(a[None])  # add S axis

        with annotate(f"mp3tpu.decode_window[{start}:{start + g}]"):
            pcm, state = kp.decode_window(
                prep(st.is_), prep(st.exp), prep(st.block_type), prep(st.mixed),
                prep(st.smode), state, st.sample_rate)
        out.append(np.asarray(pcm[0, : g * 576]))
    pcm = np.concatenate(out, axis=0)
    return pcm[:, : st.channels]


def load_symbols(data: bytes):
    """Container parse + unpack: (SymbolTensors, StreamInfo, FrameIndex).

    Skips ID3v2 regions and a leading Xing/Info/VBRI metadata frame
    (which carries no audio)."""
    id3 = parse_id3v2(data)
    buf = np.frombuffer(data, np.uint8)
    index = fr.scan_frames(buf, start=id3.size)
    info = parse_stream_info(data, int(index.offsets[0]), index.headers[0])
    st = unpack_fast(data)
    if is_metadata_frame(info):
        n = index.headers[0].n_granules
        st = SymbolTensors(
            is_=st.is_[n:], exp=st.exp[n:], block_type=st.block_type[n:],
            mixed=st.mixed[n:], smode=st.smode[n:], errors=st.errors[n:],
            huff_slack=st.huff_slack[n:], lines_used=st.lines_used[n:],
            sample_rate=st.sample_rate, channels=st.channels,
            version=st.version)
        index = fr.FrameIndex(
            offsets=index.offsets[1:], headers=index.headers[1:],
            junk_bytes=index.junk_bytes, sample_rate=index.sample_rate,
            channels=index.channels, version=index.version)
    return st, info, index


def load_source(data: bytes):
    """Container parse + STREAMING symbol source: (SymbolSource,
    StreamInfo, FrameIndex). Unlike load_symbols, no audio is unpacked
    up front — the player's refill loop pulls granule windows on demand
    (first-audio latency and host memory O(window); SURVEY.md §3.3)."""
    from .bitstream.source import SymbolSource
    id3 = parse_id3v2(data)
    body = data[id3.size:] if id3.size else data
    buf = np.frombuffer(body, np.uint8)
    index = fr.scan_frames(buf)
    info = parse_stream_info(body, int(index.offsets[0]), index.headers[0])
    skip = 1 if is_metadata_frame(info) else 0
    src = SymbolSource(body, index=index, skip_frames=skip)
    if skip:
        index = fr.FrameIndex(
            offsets=index.offsets[1:], headers=index.headers[1:],
            junk_bytes=index.junk_bytes, sample_rate=index.sample_rate,
            channels=index.channels, version=index.version)
    return src, info, index


def decode_file(path_or_bytes, output: str | None = None,
                gapless: bool | None = None):
    """decode(path) -> (pcm, sample_rate) [SURVEY.md §3.1].

    output: "int16" (default, spec-rounded) or "float32".
    gapless: trim encoder delay/padding per the LAME tag when present,
    so decode(encode(x)) is sample-aligned with x.
    Unset parameters fall back to the active Config (mp3tpu.init —
    SURVEY.md §5.6); device windows run under §5.1 trace annotations
    (MP3TPU_TRACE_DIR wraps them in a jax.profiler trace).
    """
    from .config import get_active
    from .utils.profiling import device_trace
    cfg = get_active().decode
    output = cfg.output if output is None else output
    gapless = cfg.gapless if gapless is None else gapless
    data = _read(path_or_bytes)
    st, info, _index = load_symbols(data)
    with device_trace():
        pcm = decode_symbols_device(st, window=cfg.window_granules)
    if gapless and info.gapless:
        from .dsp.gapless import gapless_bounds
        a, b = gapless_bounds(len(pcm), info.encoder_delay, info.encoder_padding)
        pcm = pcm[a:b]
    if output == "int16":
        pcm = np.asarray(kp.quantize_i16(jnp.asarray(pcm)))
    return pcm, st.sample_rate


def decode_files(paths, gapless: bool = True):
    """Batched multi-stream decode (int16 PCM); see player.scheduler for
    the streaming masked-batch engine. Returns a list of
    (pcm, sample_rate) aligned with the inputs. Applies the same LAME
    gapless trim as decode_file, so batch and single paths agree on
    output lengths."""
    from .player.scheduler import decode_batch_streams
    return decode_batch_streams(paths, gapless=gapless)


def decode_symbols_chunked(st: SymbolTensors, chunk_granules: int = 128,
                           halo: int = 2) -> np.ndarray:
    """Sequence-parallel decode of ONE long stream (SURVEY.md P3, §5.7).

    The granule chain is finite-window linear: IMDCT overlap-add couples
    adjacent granules and the synthesis FIR reads 15 prior steps — both
    inside a 2-granule halo. So a long file is decoded as a BATCH of
    independent chunks, each pre-rolled with `halo` redundant granules
    whose output is discarded. One device call decodes the whole file;
    no collectives, no scan — the ring-attention analog is a static halo
    (SURVEY.md §2.4 P3).
    """
    G = st.n_granules
    n_chunks = max(1, -(-G // chunk_granules))
    W = halo + chunk_granules
    S = n_chunks

    def gather(a, fill=0):
        out = np.zeros((S, W) + a.shape[1:], a.dtype)
        for c in range(n_chunks):
            lo = c * chunk_granules - halo
            for w in range(W):
                g = lo + w
                if 0 <= g < G:
                    out[c, w] = a[g]
        return jnp.asarray(out)

    state = kp.init_state(S)
    pcm, _ = kp.decode_window(gather(st.is_), gather(st.exp),
                              gather(st.block_type), gather(st.mixed),
                              gather(st.smode), state, st.sample_rate)
    pcm = np.asarray(pcm)[:, halo * 576:]          # drop halo output
    out = pcm.reshape(S * chunk_granules * 576, 2)[: G * 576]
    return out[:, : st.channels]
