"""Rational polyphase resampler (SURVEY.md D2) — e.g. 44.1k -> 48k (147:160).

TPU-idiomatic: the windowed-sinc prototype is designed once in float64
(Kaiser window), then resampling is one `lax.conv_general_dilated` with
input dilation L and stride M — pure MXU/VPU work, no per-sample Python.
Streaming state is the filter tail (explicit, checkpoint-friendly).
"""
from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def _rational(sr_in: int, sr_out: int) -> tuple[int, int]:
    g = math.gcd(sr_in, sr_out)
    return sr_out // g, sr_in // g  # L (up), M (down)


@lru_cache(maxsize=None)
def design_filter(L: int, M: int, taps_per_phase: int = 24,
                  beta: float = 12.0) -> np.ndarray:
    """Kaiser-windowed sinc prototype, length L*taps_per_phase (float64)."""
    n = L * taps_per_phase
    cutoff = min(1.0 / L, 1.0 / M)  # in units of the upsampled Nyquist
    t = np.arange(n) - (n - 1) / 2.0
    h = cutoff * np.sinc(cutoff * t) * np.kaiser(n, beta)
    return h * (L / h.sum())  # unity passband gain after L-fold dilation


class Resampler:
    """Streaming rational resampler for PCM [n, ch] float32."""

    def __init__(self, sr_in: int, sr_out: int, taps_per_phase: int = 24):
        self.sr_in, self.sr_out = sr_in, sr_out
        self.L, self.M = _rational(sr_in, sr_out)
        h = design_filter(self.L, self.M, taps_per_phase)
        self.n_taps = len(h)
        self.kernel = jnp.asarray(h, jnp.float32)
        self.state_len = self.n_taps // self.L  # input samples of history

    def init_state(self, channels: int):
        return jnp.zeros((self.state_len, channels), jnp.float32)

    def __call__(self, pcm, state=None):
        """Resample PCM [n, ch] -> ([m, ch], new_state)."""
        ch = pcm.shape[1]
        if state is None:
            state = self.init_state(ch)
        x = jnp.concatenate([state, pcm], axis=0)
        # conv over time: lhs [batch=ch, feat=1, time], dilation L, stride M
        lhs = x.T[:, None, :]
        rhs = self.kernel[None, None, ::-1]
        out = jax.lax.conv_general_dilated(
            lhs, rhs, window_strides=(self.M,), padding=[(0, 0)],
            lhs_dilation=(self.L,), precision=jax.lax.Precision.HIGHEST)
        new_state = x[-self.state_len:] if self.state_len else state
        return out[:, 0, :].T, new_state


def resample(pcm, sr_in: int, sr_out: int):
    """One-shot resample of PCM [n, ch]."""
    if sr_in == sr_out:
        return pcm
    r = Resampler(sr_in, sr_out)
    out, _ = r(jnp.asarray(pcm, jnp.float32))
    return out
