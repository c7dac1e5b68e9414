"""Volume / gain with zipper-free ramping (SURVEY.md D3)."""
from __future__ import annotations

import jax.numpy as jnp


def apply_gain(pcm, gain_db: float, prev_gain_db: float | None = None,
               ramp_samples: int = 256):
    """Scale PCM [n, ch] by gain_db; if prev_gain_db differs, ramp
    linearly (in amplitude) over ramp_samples to avoid zipper noise."""
    g1 = 10.0 ** (gain_db / 20.0)
    if prev_gain_db is None or prev_gain_db == gain_db:
        return pcm * jnp.float32(g1)
    g0 = 10.0 ** (prev_gain_db / 20.0)
    n = pcm.shape[0]
    r = min(ramp_samples, n)
    ramp = jnp.concatenate([
        jnp.linspace(g0, g1, r, dtype=jnp.float32),
        jnp.full((n - r,), g1, jnp.float32)])
    return pcm * ramp[:, None]
