"""Pallas vs XLA full-pipeline timing + parity on real TPU hardware
(SURVEY.md §7.3 M7 win-or-retire measurement; run alone — the tunnel
is single-tenant).

Decodes [S x G] windows of a real fixture through decode_window_i16
both ways (use_pallas False/True), interleaved min-of-N timing, and
reports max int16 PCM LSB delta.

Run: python tools/pallas_timing.py [S] [reps]
"""
from __future__ import annotations

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
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    import jax
    import jax.numpy as jnp
    import fixtures
    from mp3tpu.bitstream.unpack import unpack
    from mp3tpu.kernels import pipeline as kp

    print("backend:", jax.default_backend(), flush=True)
    st = unpack(fixtures.lame_fixture("sweep", ch=2, bitrate=128,
                                      mode="jstereo"))
    G = 32
    tile = lambda a: jnp.asarray(np.broadcast_to(
        np.asarray(a[:G])[None], (S,) + a[:G].shape).copy())
    args = (tile(st.is_), tile(st.exp), tile(st.block_type),
            tile(st.mixed), tile(st.smode))
    state = kp.init_state(S)

    fx = kp._jitted_for(44100, True, False)
    fp = kp._jitted_for(44100, True, True)

    t0 = time.time()
    ax, sx = fx(*args, state)
    jax.block_until_ready(ax)
    print(f"xla compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    ap, sp_ = fp(*args, state)
    jax.block_until_ready(ap)
    print(f"pallas compile+run {time.time()-t0:.1f}s", flush=True)

    d = np.abs(np.asarray(ax, np.int32) - np.asarray(ap, np.int32))
    print("parity: max int16 LSB delta =", int(d.max()),
          " frac>1LSB =", float((d > 1).mean()), flush=True)

    tx, tp = [], []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fx(*args, state)[0])
        tx.append(time.time() - t0)
        t0 = time.time()
        jax.block_until_ready(fp(*args, state)[0])
        tp.append(time.time() - t0)
    ms = lambda ts: 1e3 * min(ts)
    audio_s = S * G * 576 / 44100.0
    print(f"S={S} G={G} audio={audio_s:.1f}s")
    print(f"xla    full pipeline: {ms(tx):7.2f} ms  ({audio_s/min(tx):7.0f}x)")
    print(f"pallas full pipeline: {ms(tp):7.2f} ms  ({audio_s/min(tp):7.0f}x)")
    print(f"pallas/xla: {min(tp)/min(tx):.3f}")
    print("all xla   :", [round(1e3 * t, 2) for t in tx])
    print("all pallas:", [round(1e3 * t, 2) for t in tp])


if __name__ == "__main__":
    main()
