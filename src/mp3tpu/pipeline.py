"""File-level decode orchestration: host unpack -> device windows -> PCM.

Single-file decode runs as [S=1, G] windows with explicit state carry;
batched decode stacks streams on the S axis (SURVEY.md §3.1/§3.2).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .bitstream.unpack import SymbolTensors, unpack_fast
from .container import frames as fr
from .kernels import pipeline as kp

# jit-signature buckets for the granule axis
_BUCKETS = (16, 32, 64, 128, 256)
_WINDOW = 256  # max granules per device call


def _bucket(g: int) -> int:
    for b in _BUCKETS:
        if g <= b:
            return b
    return _BUCKETS[-1]


def _read(path_or_bytes) -> bytes:
    if isinstance(path_or_bytes, (bytes, bytearray)):
        return bytes(path_or_bytes)
    with open(path_or_bytes, "rb") as f:
        return f.read()


def decode_symbols_device(st: SymbolTensors, state=None) -> np.ndarray:
    """Run the TPU pipeline over all granules of one stream.

    Returns float32 PCM [n, channels].
    """
    G = st.n_granules
    if state is None:
        state = kp.init_state(1)
    out = []
    for start in range(0, G, _WINDOW):
        g = min(_WINDOW, G - start)
        gb = _bucket(g)
        sl = slice(start, start + g)
        pad = ((0, gb - g),)

        def prep(a, fill=0):
            a = a[sl]
            if gb != g:
                width = pad + tuple((0, 0) for _ in a.shape[1:])
                a = np.pad(a, width, constant_values=fill)
            return jnp.asarray(a[None])  # add S axis

        pcm, state = kp.decode_window(
            prep(st.is_), prep(st.exp), prep(st.block_type), prep(st.mixed),
            prep(st.smode), state, st.sample_rate)
        out.append(np.asarray(pcm[0, : g * 576]))
    pcm = np.concatenate(out, axis=0)
    return pcm[:, : st.channels]


def decode_file(path_or_bytes, output: str = "int16"):
    """decode(path) -> (pcm, sample_rate) [SURVEY.md §3.1].

    output: "int16" (default, spec-rounded) or "float32".
    """
    data = _read(path_or_bytes)
    st = unpack_fast(data)
    pcm = decode_symbols_device(st)
    if output == "int16":
        pcm = np.asarray(kp.quantize_i16(jnp.asarray(pcm)))
    return pcm, st.sample_rate


def decode_files(paths, output: str = "int16"):
    """Batched multi-stream decode; see player.scheduler for the streaming
    masked-batch engine. This convenience API decodes each stream and
    returns a list of (pcm, sample_rate)."""
    from .player.scheduler import decode_batch_streams
    return decode_batch_streams(paths, output=output)
