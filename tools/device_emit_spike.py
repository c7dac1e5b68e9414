"""Device bit-packing spike (round 4): can the TPU pack per-row
variable-length Huffman fields into MSB-first words fast enough to
replace the encode path's ix download + host emit?

The emission chain's only uncertain primitive is the final pack:
F fields per row (value <= 19 bits, length 0..19, offsets = exclusive
cumsum of lengths, sorted by construction) -> [W] int32 words.
Candidates measured here on real hardware:

  A. scatter-add (.at[w].add(c)) — disjoint bits make add == or
  B. one-hot matmul with 16-bit hi/lo split (f32 exact < 2^16 sums)
  C. segment_sum over sorted word ids

All three share the same per-field frame math: a field of length L at
bit offset o contributes (v << (64 - r - L)) to the 64-bit frame
starting at word w = o >> 5, r = o & 31; hi/lo 32-bit halves go to
words w and w+1. Correctness is checked against a numpy bit-blit.

Run: PYTHONPATH=src python tools/device_emit_spike.py [R] [F] [iters]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def make_inputs(R: int, F: int, seed: int = 0):
    """Field sets shaped like real granule emission: mean length ~2.5
    bits (128 kbps rows average ~720 bits over ~300 live fields; the
    rest are zero-length), values < 2^L."""
    rng = np.random.default_rng(seed)
    L = rng.integers(0, 6, (R, F)).astype(np.int32)
    L[:, : F // 8] = rng.integers(6, 20, (R, F // 8))  # some long codes
    live = rng.random((R, F)) < 0.6
    L = np.where(live, L, 0).astype(np.int32)
    V = (rng.integers(0, 1 << 19, (R, F)) & ((1 << L) - 1)).astype(np.int32)
    return V, L


def pack_numpy(V: np.ndarray, L: np.ndarray, W: int) -> np.ndarray:
    """Reference MSB-first pack."""
    R, F = V.shape
    out = np.zeros((R, W), np.uint64)
    off = np.cumsum(L, axis=1) - L
    w = off >> 5
    r = off & 31
    frame = V.astype(np.uint64) << (64 - r - L).astype(np.uint64)
    frame[L == 0] = 0
    hi = (frame >> 32).astype(np.uint64)
    lo = (frame & 0xFFFFFFFF).astype(np.uint64)
    for i in range(R):
        np.add.at(out[i], w[i], hi[i])
        np.add.at(out[i], np.minimum(w[i] + 1, W - 1), lo[i])
    return out.astype(np.int64) & 0xFFFFFFFF


def main():
    import jax
    import jax.numpy as jnp

    R = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    F = int(sys.argv[2]) if len(sys.argv) > 2 else 2196
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    V, L = make_inputs(R, F)
    total_bits = int(L.sum(1).max())
    W = (total_bits + 31) // 32 + 2
    print(f"R={R} F={F} max_bits={total_bits} W={W} "
          f"platform={jax.devices()[0].platform}")
    ref = pack_numpy(V, L, W)

    def frame_parts(V, L):
        off = jnp.cumsum(L, axis=1) - L
        w = (off >> 5).astype(jnp.int32)
        r = off & 31
        sh = (32 - r - L).astype(jnp.int32)      # hi-word shift, may be <0
        v = V.astype(jnp.uint32)
        hi = jnp.where(sh >= 0, v << sh, v >> (-sh)).astype(jnp.uint32)
        lo = jnp.where(sh >= 0, jnp.uint32(0),
                       v << (32 + sh)).astype(jnp.uint32)
        dead = L == 0
        hi = jnp.where(dead, jnp.uint32(0), hi)
        lo = jnp.where(dead, jnp.uint32(0), lo)
        return w, hi, lo

    @jax.jit
    def pack_scatter(V, L):
        w, hi, lo = frame_parts(V, L)
        out = jnp.zeros((V.shape[0], W), jnp.uint32)
        rows = jnp.arange(V.shape[0])[:, None]
        out = out.at[rows, w].add(hi, mode="drop")
        out = out.at[rows, jnp.minimum(w + 1, W - 1)].add(lo, mode="drop")
        return out

    @jax.jit
    def pack_matmul(V, L):
        w, hi, lo = frame_parts(V, L)
        oh = (w[:, :, None] == jnp.arange(W)[None, None]).astype(jnp.float32)
        oh2 = (w[:, :, None] + 1 == jnp.arange(W)[None, None]).astype(
            jnp.float32)

        def split_mm(c, o):
            chi = (c >> 16).astype(jnp.float32)
            clo = (c & 0xFFFF).astype(jnp.float32)
            shi = jnp.einsum("rf,rfw->rw", chi, o)
            slo = jnp.einsum("rf,rfw->rw", clo, o)
            return (shi.astype(jnp.uint32) << 16) + slo.astype(jnp.uint32)

        return split_mm(hi, oh) + split_mm(lo, oh2)

    @jax.jit
    def pack_segsum(V, L):
        w, hi, lo = frame_parts(V, L)

        def one(wr, hir, lor):
            a = jax.ops.segment_sum(hir, wr, num_segments=W,
                                    indices_are_sorted=True)
            b = jax.ops.segment_sum(lor, wr + 1, num_segments=W,
                                    indices_are_sorted=True)
            return a + b

        return jax.vmap(one)(w, hi, lo)

    Vd, Ld = jnp.asarray(V), jnp.asarray(L)
    for name, fn in [("scatter", pack_scatter), ("matmul", pack_matmul),
                     ("segsum", pack_segsum)]:
        try:
            out = np.asarray(jax.block_until_ready(fn(Vd, Ld)))
        except Exception as e:  # noqa: BLE001 — spike reports and moves on
            print(f"{name}: FAILED {type(e).__name__}: {e}")
            continue
        ok = np.array_equal(out.astype(np.int64) & 0xFFFFFFFF, ref)
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(Vd, Ld))
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        # one row = one granule-channel = 576/44100/2 s of stereo audio
        per_row_us = best / R * 1e6
        print(f"{name}: exact={ok} best={best*1000:.1f} ms "
              f"({per_row_us:.2f} us/row; ix D2H equivalent ~16 us/row)")


if __name__ == "__main__":
    main()
