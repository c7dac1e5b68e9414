"""Rate-loop iteration telemetry: the outer-loop iteration histogram
per granule class (VERDICT r4 task 3a; docs/rate_loop_notes.md).

Runs the production `encode_batch` on the bench chirp-mix fixture with
MP3TPU_ITER_HIST=1 (the jits carry a per-row iteration counter — 1
byte/row of extra D2H — folded into `vloop_device.ITER_STATS` by every
download path, including device-emit) and prints one JSON line:
per-class histogram, percentiles, unconverged fraction, plus the
encode phase profile.

Usage:  PYTHONPATH=src:tools python tools/rate_loop_hist.py [B] [secs]
        (defaults B=64, 10 s streams, 128 kbps joint stereo)
"""
import json
import os
import sys
import time

os.environ["MP3TPU_ITER_HIST"] = "1"
os.environ.setdefault("MP3TPU_ENCODE_PROFILE", "1")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _signal(seconds, sr=44100):
    # bench_configs._signal: exponential chirp mix + noise floor
    n = int(seconds * sr)
    t = np.arange(n) / sr
    k = np.log(15000.0 / 40.0)
    ph = 2 * np.pi * 40.0 * (np.exp(t / t[-1] * k) - 1) * t[-1] / k
    rng = np.random.default_rng(7)
    sig = 0.35 * np.sin(ph) + 0.15 * np.sin(2.1 * ph) + \
        0.02 * rng.standard_normal(n)
    return np.stack([sig, 0.8 * sig + 0.05 * np.sin(3.3 * ph)], 1)


def _q16(a):
    return (np.clip(a, -1, 1) * 32767).astype(np.int16).astype(np.float32) \
        / 32768.0


def summarize(hist):
    h = np.asarray(hist, np.int64)
    n = int(h.sum())
    if not n:
        return None
    idx = np.arange(len(h))
    cum = np.cumsum(h)
    pct = {p: int(idx[np.searchsorted(cum, n * p / 100.0)])
           for p in (50, 90, 99)}
    mx = int(idx[h > 0][-1])
    return {"rows": n, "mean": round(float((h * idx).sum() / n), 2),
            "p50": pct[50], "p90": pct[90], "p99": pct[99],
            "max": mx, "at_max_frac": round(float(h[mx] / n), 4),
            "hist": h.tolist()}


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    secs = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    from mp3tpu.encoder import encode_batch
    from mp3tpu.encoder import vloop_device as vd

    pcm = _q16(_signal(secs))
    streams = [pcm] * B
    encode_batch(streams[:1], 44100, bitrate=128)   # warm compiles
    vd.ITER_STATS.clear()
    vd.PROF.clear()
    t0 = time.perf_counter()
    encode_batch(streams, 44100, bitrate=128)
    wall = time.perf_counter() - t0
    out = {"B": B, "stream_s": secs, "wall_s": round(wall, 3),
           "x_aggregate": round(B * secs / wall, 1),
           "classes": {k: summarize(v) for k, v in
                       sorted(vd.ITER_STATS.items())},
           "prof": {k: (round(v, 3) if isinstance(v, float) else v)
                    for k, v in vd.PROF.items()}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
