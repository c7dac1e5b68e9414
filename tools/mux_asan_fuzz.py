"""ASan fuzz of mp3tpu_mux_stream (run: make -C src/mp3tpu/native asan && LD_PRELOAD=$(g++ -print-file-name=libasan.so) ASAN_OPTIONS=detect_leaks=0 python tools/mux_asan_fuzz.py).
Calls it with randomized (but walk-valid) inputs + edge shapes; ASan aborts on any OOB."""
import ctypes, numpy as np
lib = ctypes.CDLL("/root/repo/src/mp3tpu/native/libmp3tpu_native_asan.so")
lib.mp3tpu_mux_stream.restype = ctypes.c_int64
lib.mp3tpu_mux_stream.argtypes = (
    [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
    + [ctypes.c_void_p] * 11 + [ctypes.c_int32] * 6
    + [ctypes.c_void_p, ctypes.c_int64])
pp = lambda a: a.ctypes.data_as(ctypes.c_void_p)
rng = np.random.default_rng(0)
for trial in range(300):
    nch = int(rng.integers(1, 3))
    n_frames = int(rng.integers(1, 40))
    n_gc = n_frames * 2 * nch
    cap = int(rng.integers(1, 521))
    sr = [44100, 48000, 32000][int(rng.integers(3))]
    br = [32, 128, 320][int(rng.integers(3))]
    cap_bits = (144 * br * 1000 // sr - 36) * 8 // (2 * nch)
    p23 = rng.integers(0, min(cap_bits, min(cap * 8, 4095)) + 1,
                       n_gc).astype(np.int32)
    if trial % 7 == 0:
        p23[:] = 0
    if trial % 11 == 0:
        p23[:] = min(cap * 8, 4095)  # may overdraft -> must return -3 cleanly
    bits = rng.integers(0, 256, (n_gc, cap), dtype=np.uint8)
    i32 = lambda hi, shape=n_gc: rng.integers(0, hi, shape).astype(np.int32)
    tsel = i32(32, (n_gc, 3)); sbg = i32(8, (n_gc, 3))
    ms = rng.integers(0, 2, n_frames).astype(np.uint8)
    out_cap = n_frames * (144 * br * 1000 // sr + 1)
    out = np.zeros(out_cap, np.uint8)
    r = lib.mp3tpu_mux_stream(
        pp(bits), n_gc, cap, pp(p23), pp(i32(512)), pp(i32(256)),
        pp(i32(16)), pp(i32(4)), pp(tsel), pp(sbg), pp(i32(16)),
        pp(i32(8)), pp(i32(2)), pp(ms), nch, 0, int(rng.integers(16)),
        sr, br * 1000, 400, pp(out), out_cap)
    assert r <= out_cap, (trial, r)
print("ASAN MUX OK (300 trials)")
