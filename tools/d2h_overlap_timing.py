"""Measure the segmented-dispatch D2H overlap (VERDICT r2 task 4 /
SURVEY.md §2.4 P4) on the public decode_files fast path.

Same setup as bench.py's api_decode_batch_x figure (64-stream batch of
the 10 s joint-stereo fixture, PCM download included), swept over
DecodeConfig.d2h_segments — K scan dispatches with copy_to_host_async
of segment k-1's PCM while segment k computes, vs the single-dispatch
baseline (K=1). Run alone on the TPU (single-tenant tunnel).

Run: python tools/d2h_overlap_timing.py [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (os.path.join(_REPO, "src"), os.path.join(_REPO, "tools"),
          os.path.join(_REPO, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import jax
    import lameref
    from mp3tpu.config import Config, DecodeConfig, set_active
    from mp3tpu.pipeline import decode_files

    print("backend:", jax.default_backend(), flush=True)
    sr = 44100
    n = sr * 10
    t = np.arange(n) / sr
    k = np.log(15000.0 / 40.0)
    ph = 2 * np.pi * 40.0 * (np.exp(t / t[-1] * k) - 1) * t[-1] / k
    rng = np.random.default_rng(7)
    sig = 0.35 * np.sin(ph) + 0.15 * np.sin(2.1 * ph) \
        + 0.02 * rng.standard_normal(n)
    pcm = np.stack([sig, 0.8 * sig + 0.05 * np.sin(3.3 * ph)], 1)
    mp3 = lameref.encode(np.clip(pcm, -0.99, 0.99), sr,
                         bitrate=128, mode="jstereo")
    batch = [mp3] * 64

    # interleave settings round-robin so tunnel-weather drift (swings
    # of 2x over minutes are normal here) hits every K equally
    KS = (1, 2, 4, 8)
    ref = None
    walls = {k: [] for k in KS}
    audio = None
    for k in KS:                      # warm each K's jit shapes
        set_active(Config(decode=DecodeConfig(d2h_segments=k)))
        decode_files([mp3] * 4)
    for r in range(reps):
        for k in KS:
            set_active(Config(decode=DecodeConfig(d2h_segments=k)))
            t0 = time.perf_counter()
            out = decode_files(batch)
            walls[k].append(time.perf_counter() - t0)
            if audio is None:
                audio = sum(len(p) / s for p, s in out)
                ref = out
            elif r == 0:
                for (a, _), (b, _) in zip(ref, out):
                    assert np.array_equal(a, b), f"K={k} output differs"
    for k in KS:
        print(json.dumps({
            "d2h_segments": k,
            "audio_s": round(audio, 1),
            "walls_s": [round(w, 3) for w in walls[k]],
            "best_x": round(audio / min(walls[k]), 1),
            "median_x": round(audio / sorted(walls[k])[len(walls[k]) // 2], 1),
        }), flush=True)


if __name__ == "__main__":
    main()
