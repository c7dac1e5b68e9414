"""Psychoacoustic model (SURVEY.md E3) — a functional PM2-style model:
FFT band energies, bark-domain spreading, spectral-flatness tonality,
per-band masking thresholds, and transient-driven window switching
[ISO 11172-3 Annex D, simplified].

The block-switch decision feeds E2 directly; the per-band thresholds
(xmin) feed the outer distortion loop of E4.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..tables.sfb import LONG

SPF = 576


def block_type_sequence(pcm: np.ndarray, sample_rate: int,
                        attack_ratio: float = 8.0,
                        floor: float = 1e-6) -> np.ndarray:
    """Per-granule block types (0 long, 1 start, 2 short, 3 stop) from
    transient detection, with legal transition sequencing."""
    x = pcm.mean(axis=1) if pcm.ndim == 2 else pcm
    G = len(x) // SPF
    # high-pass emphasizes attacks
    hp = np.diff(x, prepend=x[:1])
    attack = np.zeros(G, bool)
    prev_mean = floor
    for g in range(G):
        seg = hp[g * SPF:(g + 1) * SPF]
        sub = seg.reshape(9, 64)
        e = (sub ** 2).sum(axis=1) + floor
        # rise vs the quietest earlier sub-block in the granule: catches
        # windowed (gradual) onsets that adjacent-block ratios miss.
        # The inter-granule condition (vs the previous granule's mean)
        # rejects steady tones whose sub-block energies merely beat
        # against the 64-sample analysis grid.
        base = np.minimum.accumulate(np.concatenate([[e[0]], e[:-1]]))
        attack[g] = bool((e / base > attack_ratio).any()
                         and e.max() > 3.0 * prev_mean
                         and e.max() > 1e-4)
        prev_mean = max(float(e.mean()), floor)
    bt = np.zeros(G, np.int64)
    bt[attack] = 2
    # a short granule needs a start before and a stop after
    for g in range(G):
        if bt[g] == 2:
            if g > 0 and bt[g - 1] == 0:
                bt[g - 1] = 1
            if g + 1 < G and bt[g + 1] == 0:
                bt[g + 1] = 3
    # fix illegal starts created by later shorts (start must precede short)
    for g in range(G - 1):
        if bt[g] == 1 and bt[g + 1] not in (2,):
            bt[g] = 0 if bt[g + 1] == 0 else bt[g]
        if bt[g] == 3 and g + 1 < G and bt[g + 1] == 2:
            bt[g] = 2  # short run continues
    return bt


@lru_cache(maxsize=None)
def _spreading_matrix(sample_rate: int) -> np.ndarray:
    """[22, 22] bark-domain spreading (+25 dB/bark down, -10 dB/bark up
    slopes, simplified Annex D)."""
    bands = LONG[sample_rate]
    centers = (bands[:-1] + bands[1:]) / 2.0 * sample_rate / 1152.0
    bark = 13.0 * np.arctan(0.00076 * centers) + \
        3.5 * np.arctan((centers / 7500.0) ** 2)
    d = bark[None, :] - bark[:, None]   # masker i -> maskee j distance
    sl = np.where(d >= 0, -25.0 * d, 10.0 * d)
    return 10.0 ** (sl / 10.0)


def masking_thresholds(xr: np.ndarray, sample_rate: int) -> np.ndarray:
    """Per-long-band allowed noise energy (xmin) for one granule's
    spectrum xr [576] — band energy, spread, offset by tonality."""
    bands = LONG[sample_rate]
    e = np.zeros(22)
    for b in range(22):
        seg = xr[bands[b]:bands[b + 1]]
        e[b] = (seg ** 2).sum() + 1e-12
    spread = e @ _spreading_matrix(sample_rate)
    # tonality via spectral flatness of the band energies
    sfm = np.exp(np.mean(np.log(e))) / np.mean(e)
    tonality = min(sfm / 0.05, 1.0)  # 0 tonal .. 1 noisy
    offset_db = -(14.5 + 5.5) * (1 - tonality) - 5.5 * tonality
    return spread * 10.0 ** (offset_db / 10.0)
