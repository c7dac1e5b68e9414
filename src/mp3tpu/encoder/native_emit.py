"""ctypes glue for the native batched granule emitter (SURVEY.md E5/E6).

encode_rows_native emits R granule-channel rows through the C++
emitter (native/encode_rows.cpp) and wraps the results as CodedGranule
objects — bit-for-bit what huffcode.encode_granule produces (tested
row-for-row). The Python emitter stays the semantics reference and the
fallback when the native library is unavailable.
"""
from __future__ import annotations

import ctypes

import numpy as np

from ..bitstream import native as _nat
from ..bitstream.bitwriter import BitWriter
from .huffcode import CodedGranule

_CAP = 520  # bytes per row: part2_3_length is a 12-bit field (<= 4095
#             bits = 512 bytes); 520 leaves slack for the overflow flag

_SR9 = {44100: 0, 48000: 1, 32000: 2}  # MPEG-1 rows of SR_LIST


def available() -> bool:
    lib = _nat._load()
    return lib is not None and hasattr(lib, "mp3tpu_encode_rows")


def encode_rows_native(ix: np.ndarray, block_type: np.ndarray,
                       use_sf: np.ndarray, long_sf: np.ndarray,
                       short_sf: np.ndarray, sbg: np.ndarray,
                       gg: np.ndarray, tsel: np.ndarray,
                       c1table: np.ndarray, sample_rate: int):
    """Emit all rows; returns list[CodedGranule] or None if unavailable.

    ix [R,576]; block_type [R]; use_sf [R] (transmit scalefactors —
    the psy path's bt 0/2 rows); long_sf [R,21]; short_sf [R,3,12];
    sbg [R,3]; gg [R]; tsel [R,3]; c1table [R].
    """
    lib = _nat._load()
    if lib is None or not hasattr(lib, "mp3tpu_encode_rows"):
        return None
    R = len(ix)
    ix16 = np.ascontiguousarray(ix, np.int16)
    bt8 = np.ascontiguousarray(block_type, np.uint8)
    us8 = np.ascontiguousarray(use_sf, np.uint8)
    lsf = np.ascontiguousarray(long_sf, np.int16)
    ssf = np.ascontiguousarray(short_sf.reshape(R, 36), np.int16)
    ts = np.ascontiguousarray(tsel, np.int16)
    c1 = np.ascontiguousarray(c1table, np.uint8)
    bits = np.zeros((R, _CAP), np.uint8)
    meta = np.zeros((R, 6), np.int32)
    p = lambda a: a.ctypes.data_as(ctypes.c_void_p)
    fn = lib.mp3tpu_encode_rows
    fn.restype = ctypes.c_int
    r = fn(p(ix16), p(bt8), p(us8), p(lsf), p(ssf), p(ts), p(c1),
           ctypes.c_int32(_SR9[sample_rate]), ctypes.c_int32(R),
           p(bits), ctypes.c_int32(_CAP), p(meta))
    if r != 0:
        return None
    out = []
    unpacked = np.unpackbits(bits, axis=1)
    for i in range(R):
        g = CodedGranule(
            part2_3_length=int(meta[i, 0]),
            big_values=int(meta[i, 1]),
            global_gain=int(gg[i]),
            scalefac_compress=int(meta[i, 2]),
            window_switching=1 if block_type[i] else 0,
            block_type=int(block_type[i]),
            table_select=(int(ts[i, 0]), int(ts[i, 1]), int(ts[i, 2])),
            subblock_gain=tuple(int(s) for s in sbg[i]),
            region0_count=int(meta[i, 3]),
            region1_count=int(meta[i, 4]),
            count1table_select=int(c1[i]),
        )
        w = BitWriter()
        w.bits = unpacked[i, : meta[i, 0]].tolist()
        g.bits = w
        out.append(g)
    return out
