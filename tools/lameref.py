"""ctypes wrapper for the system libmp3lame — test/build-time fixture
generator ONLY (real-world MPEG-1 Layer III encodings to validate the
mp3tpu decoder against; the framework itself never depends on LAME).
"""
from __future__ import annotations

import ctypes

import numpy as np

_LIB = "/usr/lib/x86_64-linux-gnu/libmp3lame.so.0"
_lame = None


def _load():
    global _lame
    if _lame is None:
        lib = ctypes.CDLL(_LIB)
        lib.lame_init.restype = ctypes.c_void_p
        for fn in ("lame_set_in_samplerate", "lame_set_out_samplerate",
                   "lame_set_num_channels", "lame_set_brate", "lame_set_mode",
                   "lame_set_quality", "lame_set_VBR", "lame_set_VBR_q",
                   "lame_set_bWriteVbrTag", "lame_set_force_ms",
                   "lame_set_disable_reservoir"):
            getattr(lib, fn).argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.lame_init_params.argtypes = [ctypes.c_void_p]
        lib.lame_encode_buffer.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_short),
            ctypes.POINTER(ctypes.c_short), ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int]
        lib.lame_encode_flush.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
        lib.lame_close.argtypes = [ctypes.c_void_p]
        _lame = lib
    return _lame


def encode(pcm: np.ndarray, sample_rate: int, bitrate: int = 128,
           mode: str = "jstereo", vbr: bool = False, vbr_q: int = 4,
           quality: int = 2, write_vbr_tag: bool = True,
           force_ms: bool = False, disable_reservoir: bool = False) -> bytes:
    """Encode float PCM [-1,1] of shape [n] or [n, ch] to MP3 bytes."""
    lib = _load()
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, ch = pcm.shape
    i16 = np.clip(np.round(pcm * 32767.0), -32768, 32767).astype(np.int16)
    gf = lib.lame_init()
    try:
        lib.lame_set_in_samplerate(gf, sample_rate)
        lib.lame_set_out_samplerate(gf, sample_rate)
        lib.lame_set_num_channels(gf, ch)
        lib.lame_set_brate(gf, bitrate)
        modes = {"stereo": 0, "jstereo": 1, "dual": 2, "mono": 3}
        lib.lame_set_mode(gf, modes[mode if ch == 2 else "mono"])
        lib.lame_set_quality(gf, quality)
        lib.lame_set_VBR(gf, 4 if vbr else 0)
        if vbr:
            lib.lame_set_VBR_q(gf, vbr_q)
        lib.lame_set_bWriteVbrTag(gf, 1 if write_vbr_tag else 0)
        if force_ms:
            lib.lame_set_force_ms(gf, 1)
        if disable_reservoir:
            lib.lame_set_disable_reservoir(gf, 1)
        assert lib.lame_init_params(gf) >= 0
        left = np.ascontiguousarray(i16[:, 0])
        right = np.ascontiguousarray(i16[:, 1] if ch == 2 else i16[:, 0])
        out = ctypes.create_string_buffer(n * 4 + 65536)
        m = lib.lame_encode_buffer(
            gf, left.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
            right.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
            n, out, len(out))
        assert m >= 0, f"lame encode error {m}"
        out2 = ctypes.create_string_buffer(65536)
        m2 = lib.lame_encode_flush(gf, out2, len(out2))
        data = out.raw[:m] + out2.raw[:m2]
        if write_vbr_tag:
            # backfill the Xing/Info+LAME tag frame (gapless delay/padding
            # + seek TOC); the streaming API emits only a placeholder
            try:
                lib.lame_get_lametag_frame.restype = ctypes.c_size_t
                lib.lame_get_lametag_frame.argtypes = [
                    ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t]
                tag = ctypes.create_string_buffer(8192)
                tn = lib.lame_get_lametag_frame(gf, tag, len(tag))
                if 0 < tn <= len(data):
                    data = tag.raw[:tn] + data[tn:]
            except AttributeError:
                pass
        return data
    finally:
        lib.lame_close(gf)
