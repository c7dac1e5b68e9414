"""Spike: can H2D staging overlap a running device dispatch on this
tunnel? (encode_batch's last transfer wall — docs/encode_batch_notes.md
puts staged-PCM H2D at ~4-6 s of the ~12 s B=64 wall, next to ~4 s of
loop compute. If the tunnel moves bytes while the TPU executes, a
sub-batch pipeline would hide most of one term behind the other.)

Protocol (run alone on the TPU; tunnel is single-tenant):
  A) serial    : block-stage 56 MB int16 (2 MB pieces), then run a ~2 s
                 compute dispatch to completion. wall = stage + compute.
  B) overlapped: dispatch the compute FIRST (async), then stage the
                 same 56 MB while it runs, then block both.
  C) reverse   : issue the device_put pieces first, then the dispatch,
                 then block both (queue-order sensitivity).
Overlap works iff B (or C) ≈ max(stage, compute) instead of the sum.

Run: python tools/h2d_overlap_timing.py [reps]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.join(_REPO, "src") not in sys.path:
    sys.path.insert(0, os.path.join(_REPO, "src"))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import jax
    import jax.numpy as jnp
    from jax import lax

    print("backend:", jax.default_backend(), flush=True)

    N = 2048
    ITERS = 4000

    @jax.jit
    def burn(x):
        w = jnp.eye(N, dtype=jnp.float32) * 0.999 + 0.001
        def body(_, a):
            a = a @ w
            return a / (jnp.max(jnp.abs(a)) + 1e-6)
        return lax.fori_loop(0, ITERS, body, x)

    def sync(a):
        # block_until_ready is observed near-instant over this tunnel
        # even for multi-TFLOP dispatches; a 1-element D2H is the only
        # reliable completion fence here
        np.asarray(jax.numpy.ravel(a)[:1])

    x0 = jax.device_put(np.random.default_rng(0)
                        .standard_normal((N, N)).astype(np.float32))
    sync(burn(x0))                        # compile + load program

    host = np.random.default_rng(1).integers(
        -32768, 32767, size=(28, 1 << 20), dtype=np.int16)  # 28 x 2 MB

    def stage():
        return [jax.device_put(host[i]) for i in range(host.shape[0])]

    def sync_parts(parts):
        for a in parts:
            sync(a)

    sync_parts(stage())   # warm the put path (post-program-load regime)

    for r in range(reps):
        t0 = time.perf_counter()
        sync_parts(stage())
        t_stage = time.perf_counter() - t0

        t0 = time.perf_counter()
        sync(burn(x0))
        t_burn = time.perf_counter() - t0

        t0 = time.perf_counter()
        res = burn(x0)
        parts = stage()
        sync(res)
        sync_parts(parts)
        t_b = time.perf_counter() - t0

        t0 = time.perf_counter()
        parts = stage()
        res = burn(x0)
        sync(res)
        sync_parts(parts)
        t_c = time.perf_counter() - t0

        print(f"rep {r}: stage={t_stage:.2f}s burn={t_burn:.2f}s "
              f"serial={t_stage + t_burn:.2f}s "
              f"B(dispatch-then-stage)={t_b:.2f}s "
              f"C(stage-then-dispatch)={t_c:.2f}s", flush=True)


if __name__ == "__main__":
    main()
