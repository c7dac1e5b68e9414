"""ctypes wrapper for the system libmpg123 — used ONLY as a test/build-time
ground-truth oracle ("trust anchor") for the mp3tpu framework. The runtime
framework never depends on it.

mpg123 is the de-facto reference MPEG audio decoder; we use it to
  (a) behaviorally recover ISO 11172-3 Annex B.7 Huffman code tables
      (pure spec data) during the build, and
  (b) cross-validate mp3tpu's decoder output in tests.
"""
from __future__ import annotations

import ctypes
import numpy as np

_LIB = "/usr/lib/x86_64-linux-gnu/libmpg123.so.0"

# mpg123.h constants
MPG123_OK = 0
MPG123_DONE = -12
MPG123_NEW_FORMAT = -11
MPG123_NEED_MORE = -10
MPG123_ENC_FLOAT_32 = 0x200
MPG123_MONO = 1
MPG123_STEREO = 2


class MPG123Error(RuntimeError):
    pass


_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(_LIB)
    lib.mpg123_init()
    lib.mpg123_new.restype = ctypes.c_void_p
    lib.mpg123_new.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
    lib.mpg123_open_feed.argtypes = [ctypes.c_void_p]
    lib.mpg123_format_none.argtypes = [ctypes.c_void_p]
    lib.mpg123_format.argtypes = [ctypes.c_void_p, ctypes.c_long, ctypes.c_int, ctypes.c_int]
    lib.mpg123_decode.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_void_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_size_t),
    ]
    lib.mpg123_getformat.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.mpg123_delete.argtypes = [ctypes.c_void_p]
    lib.mpg123_param.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_long, ctypes.c_double]
    _lib = lib
    return lib


def decode(mp3_bytes: bytes, quiet: bool = True):
    """Decode an MP3 byte string with libmpg123.

    Returns (pcm float32 ndarray [n, channels], sample_rate).
    """
    lib = _load()
    err = ctypes.c_int(0)
    mh = lib.mpg123_new(None, ctypes.byref(err))
    if not mh:
        raise MPG123Error(f"mpg123_new failed: {err.value}")
    try:
        # MPG123_ADD_FLAGS=2 ; MPG123_QUIET=0x20, MPG123_FORCE_FLOAT=0x400
        lib.mpg123_param(mh, 2, (0x20 if quiet else 0) | 0x400, 0.0)
        if lib.mpg123_open_feed(mh) != MPG123_OK:
            raise MPG123Error("open_feed failed")
        lib.mpg123_format_none(mh)
        # accept any rate/channels in float32
        for rate in (8000, 11025, 12000, 16000, 22050, 24000, 32000, 44100, 48000):
            for ch in (MPG123_MONO, MPG123_STEREO):
                lib.mpg123_format(mh, rate, ch, MPG123_ENC_FLOAT_32)

        out = bytearray()
        buf = (ctypes.c_char * 65536)()
        done = ctypes.c_size_t(0)
        rate_ = ctypes.c_long(0)
        ch_ = ctypes.c_int(0)
        enc_ = ctypes.c_int(0)
        channels = None
        rate = None

        ret = lib.mpg123_decode(mh, mp3_bytes, len(mp3_bytes), None, 0, ctypes.byref(done))
        if ret == MPG123_NEW_FORMAT:
            lib.mpg123_getformat(mh, ctypes.byref(rate_), ctypes.byref(ch_), ctypes.byref(enc_))
            channels, rate = ch_.value, rate_.value
        while True:
            ret = lib.mpg123_decode(mh, None, 0, buf, len(buf), ctypes.byref(done))
            if done.value:
                out += bytes(buf[: done.value])
            if ret == MPG123_NEW_FORMAT:
                lib.mpg123_getformat(mh, ctypes.byref(rate_), ctypes.byref(ch_), ctypes.byref(enc_))
                channels, rate = ch_.value, rate_.value
                continue
            if ret in (MPG123_NEED_MORE, MPG123_DONE):
                break
            if ret != MPG123_OK:
                break
        if channels is None:
            # no frame decoded at all
            return np.zeros((0, 1), np.float32), 0
        pcm = np.frombuffer(bytes(out), dtype=np.float32).reshape(-1, channels)
        return pcm, rate
    finally:
        lib.mpg123_delete(mh)
