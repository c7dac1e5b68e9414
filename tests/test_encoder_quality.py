"""Encoder quality regression floors (SURVEY.md §4.2's trust-anchor
philosophy applied to the encoder; VERDICT r2 task 7).

Two axes, two referees:

* Head-to-head vs the system LAME at equal bitrate, both decoded by
  the NEUTRAL referee (system libmpg123): segmental SNR must land
  within a fixed margin of LAME's on every fixture class. Today
  mp3tpu BEATS LAME q2 on tonal and mixed content and matches on
  noise/transients (see tools/quality_bench.py for the full table).

* PM2 payoff: noise shaping cannot win on plain SNR (it deliberately
  spends noise where the model says it is masked), so the on-vs-off
  assertion uses noise-to-mask exceedance — the quantity the outer
  loop actually minimizes. PM2 on must strictly reduce it on
  transient-heavy content.

Floors are set ~1.5 dB under measured values to catch regressions,
not environment noise.
"""
import numpy as np
import pytest

import quality_bench as qb
from mp3tpu.encoder import encode_pcm
from mp3tpu.pipeline import decode_file

SR = qb.SR


def _seg_vs_lame(name, seconds=1.5, bitrate=128):
    lameref = pytest.importorskip("lameref")
    mpg123ref = pytest.importorskip("mpg123ref")
    sig = qb.FIXTURES[name](seconds)
    res = {}
    for enc, mp3 in (
        ("mp3tpu", encode_pcm(sig, SR, bitrate=bitrate)),
        ("lame", lameref.encode(sig, SR, bitrate=bitrate, quality=2)),
    ):
        pcm, rate = mpg123ref.decode(mp3)
        assert rate == SR
        if pcm.shape[1] == 1:
            pcm = np.repeat(pcm, 2, 1)
        res[enc], _ = qb.seg_snr(sig, pcm.astype(np.float64))
    return res


@pytest.mark.parametrize("name,margin", [
    ("tonal", -5.0),      # we beat LAME by ~9 dB here; margin is slack
    ("noise", 1.5),       # LAME leads by <0.3 dB; allow 1.5
    ("chirpmix", -1.0),   # we lead by ~2.8 dB
])
def test_seg_snr_within_margin_of_lame(name, margin):
    """segmental SNR >= LAME - margin (negative margin = must beat)."""
    r = _seg_vs_lame(name)
    assert r["mp3tpu"] >= r["lame"] - margin, r


def test_pm2_reduces_noise_to_mask_exceedance():
    """Noise shaping must strictly reduce the energy poking above the
    masking threshold on transient content (the pre-echo fixture) —
    the non-vacuous 'psymodel 2 pays off' check."""
    for name, floor in (("transient", 1.0), ("chirpmix", 0.3)):
        sig = qb.FIXTURES[name](1.5)
        ex = {}
        for ns in (True, False):
            mp3 = encode_pcm(sig, SR, bitrate=128, noise_shaping=ns)
            pcm, _ = decode_file(mp3, output="float32")
            ex[ns] = qb.nmr_exceedance(sig, pcm.astype(np.float64))
        assert ex[True] < ex[False] - floor, (name, ex)


def test_absolute_quality_floors():
    """Coarse absolute floors through the neutral referee — a broken
    transform/labeler (e.g. the 1/3-amplitude short MDCT bug this
    round fixed) craters these by >10 dB."""
    mpg123ref = pytest.importorskip("mpg123ref")
    sig = qb.FIXTURES["tonal"](1.5)
    mp3 = encode_pcm(sig, SR, bitrate=128)
    pcm, _ = mpg123ref.decode(mp3)
    seg, psnr = qb.seg_snr(sig, pcm.astype(np.float64))
    assert seg > 30.0 and psnr > 45.0, (seg, psnr)
