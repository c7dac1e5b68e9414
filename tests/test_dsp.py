"""DSP unit tests vs analytic references (SURVEY.md §4.4 kernel level)."""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from mp3tpu.dsp.eq import GraphicEQ
from mp3tpu.dsp.gain import apply_gain
from mp3tpu.dsp.gapless import gapless_bounds
from mp3tpu.dsp.resample import Resampler, resample


def test_resample_441_to_480_sine():
    sr_in, sr_out = 44100, 48000
    f = 1000.0
    n = sr_in // 2
    t = np.arange(n) / sr_in
    x = np.sin(2 * np.pi * f * t).astype(np.float32)[:, None]
    y = np.asarray(resample(x, sr_in, sr_out))[:, 0]
    # compare against the ideal resampled sine (skip filter edges)
    m = len(y)
    ty = np.arange(m) / sr_out
    # output is delayed by the filter group delay (in output samples)
    r = Resampler(sr_in, sr_out)
    # output is shifted by the state history minus the filter group delay
    delay_in = r.state_len - (r.n_taps - 1) / 2 / r.L  # input samples
    ref = np.sin(2 * np.pi * f * (ty - delay_in / sr_in))
    lo, hi = 3000, m - 3000
    err = np.abs(y[lo:hi] - ref[lo:hi])
    assert err.max() < 1e-3, err.max()


def test_resample_preserves_duration():
    x = np.random.default_rng(0).standard_normal((44100, 2)).astype(np.float32)
    y = resample(x, 44100, 48000)
    assert abs(y.shape[0] - 48000) < 50
    assert y.shape[1] == 2


def test_gain_ramp():
    x = np.ones((1000, 2), np.float32)
    y = np.asarray(apply_gain(jnp.asarray(x), 0.0, prev_gain_db=-20.0,
                              ramp_samples=100))
    assert abs(y[0, 0] - 0.1) < 1e-3
    assert abs(y[-1, 0] - 1.0) < 1e-6
    assert np.all(np.diff(y[:100, 0]) > 0)


def test_eq_band_gains():
    sr = 44100
    # plateau gains (isolated one-band notches are smoothed by the FIR
    # window; plateaus are the accuracy contract)
    gains = [0.0, 0.0, 0.0, -12.0, -12.0, -12.0, 6.0, 6.0, 6.0, 0.0]
    eq = GraphicEQ(gains, sr)
    n = 1 << 15
    for f, g_db in ((500.0, -12.0), (4000.0, 6.0), (62.0, 0.0)):
        t = np.arange(n) / sr
        x = np.sin(2 * np.pi * f * t).astype(np.float32)[:, None]
        y, _ = eq(jnp.asarray(x))
        y = np.asarray(y)[eq.n_taps:n - eq.n_taps, 0]
        rms_in = np.sqrt(0.5)
        rms_out = np.sqrt((y ** 2).mean())
        got_db = 20 * np.log10(rms_out / rms_in)
        assert abs(got_db - g_db) < 1.0, (f, got_db, g_db)


def test_eq_streaming_equals_oneshot():
    sr = 44100
    eq = GraphicEQ([3.0] * 10, sr)
    x = np.random.default_rng(1).standard_normal((8192, 2)).astype(np.float32)
    y1, _ = eq(jnp.asarray(x))
    st = eq.init_state(2)
    parts = []
    for lo in range(0, 8192, 1024):
        p, st = eq(jnp.asarray(x[lo:lo + 1024]), st)
        parts.append(np.asarray(p))
    y2 = np.concatenate(parts)
    assert np.allclose(np.asarray(y1), y2, atol=1e-5)


def test_gapless_bounds():
    start, end = gapless_bounds(10 * 1152, encoder_delay=576, encoder_padding=1105)
    assert start == 576 + 529
    assert end == 10 * 1152 - (1105 - 529)


def test_resampler_streaming_exact_any_chunking():
    """Chained Resampler calls (+flush) == one-shot, bit-for-bit, for
    arbitrary chunk sizes — the streaming state carries the fractional
    block so the output phase never resets (the window length need NOT
    be a multiple of M)."""
    rng = np.random.default_rng(11)
    x = (rng.standard_normal((60000, 2)) * 0.3).astype(np.float32)
    rs = Resampler(44100, 48000)
    ref = np.asarray(resample(x, 44100, 48000))
    for chunks in ([18432, 18432, 18432], [147] * 40, [999, 5, 30000, 17000]):
        st, outs, pos = None, [], 0
        for c in chunks:
            y, st = rs(x[pos:pos + c], st)
            pos += c
            outs.append(np.asarray(y))
        outs.append(np.asarray(rs.flush(st)))
        got = np.concatenate(outs)
        want = np.asarray(resample(x[:pos], 44100, 48000))
        assert got.shape == want.shape
        assert np.array_equal(got, want)
        assert np.array_equal(got, ref[:len(got)])
