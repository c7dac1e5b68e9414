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


def test_block_type_sequence_short_input():
    """Input shorter than one granule yields an empty block-type array
    (public-contract edge: must not IndexError on the context window)."""
    bt = block_type_sequence(np.zeros(100, np.float32), SR)
    assert bt.shape == (0,)
    bt = block_type_sequence(np.zeros((0, 2), np.float32), SR)
    assert bt.shape == (0,)


def test_psymodel2_tonality():
    """PM2 (SURVEY.md E3): the FFT unpredictability measure must call a
    steady sine tonal (high tb -> large TMN offset) and white noise
    noisy (low tb) in the tone's partitions."""
    from mp3tpu.encoder.psymodel import get_model
    m = get_model(SR)
    n = 576 * 20
    t = np.arange(n) / SR
    tone = 0.5 * np.sin(2 * np.pi * 1000 * t)
    noise = 0.2 * np.random.default_rng(1).standard_normal(n)
    bts = np.zeros(20, np.int64)
    tb_tone = m.analyze(tone, bts).tonality
    tb_noise = m.analyze(noise, bts).tonality
    # partitions around 1 kHz (bin 23 of 1024-pt FFT at 44.1k)
    p1k = int(m.part_l[int(round(1000 * 1024 / SR))])
    assert tb_tone[5:, p1k].mean() > 0.9, tb_tone[5:, p1k].mean()
    assert tb_noise[5:, p1k].mean() < 0.5, tb_noise[5:, p1k].mean()


def test_psymodel2_pre_echo_control():
    """A sudden attack after silence may not raise the masking threshold
    beyond RPELEV1 x the previous (quiet) granule's threshold — the
    guard that keeps quantization noise from smearing ahead of attacks."""
    from mp3tpu.encoder.psymodel import RPELEV1, get_model
    m = get_model(SR)
    n = 576 * 12
    sig = np.zeros(n)
    g_atk = 8
    sig[g_atk * 576:] = 0.8 * np.sin(
        2 * np.pi * 2000 * np.arange(n - g_atk * 576) / SR)
    out = m.analyze(sig, np.zeros(12, np.int64))
    nb = out.nb_l
    assert (nb[g_atk] <= RPELEV1 * nb[g_atk - 1] * (1 + 1e-9)).all()
    # in the tone's partition: silence allows ~ATH, the settled tone far
    # more — so the attack granule (limited by the quiet past) sits well
    # below the settled threshold
    p2k = int(m.part_l[int(round(2000 * 1024 / SR))])
    assert nb[g_atk - 1, p2k] < 1e-3 * nb[g_atk + 3, p2k]
    assert nb[g_atk, p2k] < 1e-2 * nb[g_atk + 3, p2k]


def test_short_block_noise_shaping():
    """Short (window-switched) granules must transmit per-window
    scalefactors under the default noise shaping, keep exact bit
    accounting, and decode to the exact length."""
    sig = _transients(SR)
    mp3 = encode_pcm(sig, SR, bitrate=128)
    st = unpack(mp3)
    short = st.block_type[:, 0] == 2
    assert short.any()
    # short band-slot exponents vary within the granule -> real
    # scalefactors made it into the stream
    sl = st.exp[:, 0, 22:61]
    assert (sl[short].std(axis=1) > 0).all()
    full = st.lines_used >= 573
    bad = (st.huff_slack != 0) & ~full
    assert int(bad[:, : st.channels].sum()) == 0
    assert int((st.errors != 0).sum()) == 0
    pcm, _ = decode_file(mp3, output="float32")
    assert len(pcm) == len(sig)


def test_outer_loop_scalefactors_roundtrip():
    """Noise shaping emits real per-band scalefactors; the stream must
    stay conformant (decoded by our own decoder AND spec-accounted)."""
    sig = _tone(SR)
    mp3 = encode_pcm(sig, SR, bitrate=96, short_blocks=False,
                     noise_shaping=True)
    st = unpack(mp3)
    # at least some granules transmit scalefactors
    assert (st.exp[:, 0, :21] != st.exp[:, 0, 21:22]).any()
    full = st.lines_used >= 573
    bad = (st.huff_slack != 0) & ~full
    assert int(bad[:, : st.channels].sum()) == 0
    pcm, _ = decode_file(mp3, output="float32")
    d = pcm[:, 0] - sig
    snr = 10 * np.log10((sig ** 2).mean() / (d ** 2).mean())
    assert snr > 20.0, snr


def test_own_fixture_generator():
    """F5: fixtures generated by our own encoder decode cleanly and pass
    bit accounting — the self-hosted fixture path needs no system LAME."""
    import fixtures as fx
    mp3 = fx.own_fixture("tonal", seconds=0.5, bitrate=128)
    st = unpack(mp3)
    full = st.lines_used >= 573
    bad = (st.huff_slack != 0) & ~full
    assert int(bad[:, : st.channels].sum()) == 0
    pcm, sr = decode_file(mp3)
    assert sr == 44100 and len(pcm) == int(0.5 * 44100)


def test_device_transform_encode():
    """E1+E2 on the device (SURVEY.md §3.4) produces equivalent streams."""
    sig = _tone(SR // 2, ch=2)
    a = encode_pcm(sig, SR, bitrate=128, device_transform=False)
    b = encode_pcm(sig, SR, bitrate=128, device_transform=True)
    pa, _ = decode_file(a, output="float32")
    pb, _ = decode_file(b, output="float32")
    # f32 vs f64 transform: decoded outputs agree closely
    n = min(len(pa), len(pb))
    assert np.abs(pa[:n] - pb[:n]).max() < 2e-2

    def snr(p):
        d = p[: len(sig)] - sig
        return 10 * np.log10((sig ** 2).mean() / (d ** 2).mean())

    # the device transform must not cost meaningful quality vs the f64
    # numpy transform (the absolute level depends on the noise-shaping
    # bit-allocation policy; 43.5 dB floors the current deterministic
    # two-pass allocator on this 0.5s clip)
    assert abs(snr(pa) - snr(pb)) < 0.5, (snr(pa), snr(pb))
    assert snr(pb) > 43.5, snr(pb)


def test_bit_reservoir_roundtrip():
    """Reservoir coding (E6): borrowed-capacity streams must keep exact
    bit accounting, decode to the exact length, and beat (or match) the
    reservoir-off SNR."""
    sig = _transients(SR)
    snrs = {}
    for res in (False, True):
        mp3 = encode_pcm(sig, SR, bitrate=96, reservoir=res)
        st = unpack(mp3)
        full = st.lines_used >= 573
        bad = (st.huff_slack != 0) & ~full
        assert int(bad[:, : st.channels].sum()) == 0
        # reservoir streams must actually use back-pointers
        if res:
            import fixtures  # noqa: F401  (path setup)
            from mp3tpu.container import frames as fr
            from mp3tpu.bitstream.bits import BitReader
            from mp3tpu.bitstream.sideinfo import parse_side_info
            buf = np.frombuffer(mp3, np.uint8)
            idx = fr.scan_frames(buf)
            mdbs = []
            for off, h in zip(idx.offsets[1:], idx.headers[1:]):
                si = parse_side_info(BitReader(
                    buf[int(off) + 4: int(off) + 4 + h.side_info_bytes]), h)
                mdbs.append(si.main_data_begin)
            assert max(mdbs) > 0, "no reservoir usage"
        pcm, _ = decode_file(mp3, output="float32")
        assert len(pcm) == len(sig)
        d = pcm[:, 0] - sig
        snrs[res] = 10 * np.log10((sig ** 2).mean() / (d ** 2).mean())
    assert snrs[True] >= snrs[False] - 0.5


def test_vbr_encode():
    """Constant-quality VBR (varying per-frame bitrate + reservoir):
    smaller files at higher q, exact lengths, exact bit accounting, and
    a mix of frame bitrates actually used."""
    sig = _tone(SR)
    sizes, snrs = [], []
    for q in (2, 8):
        mp3 = encode_pcm(sig, SR, vbr_quality=q)
        st = unpack(mp3)
        full = st.lines_used >= 573
        bad = (st.huff_slack != 0) & ~full
        assert int(bad[:, : st.channels].sum()) == 0
        pcm, _ = decode_file(mp3, output="float32")
        assert len(pcm) == len(sig)
        d = pcm[:, 0] - sig
        snrs.append(10 * np.log10((sig ** 2).mean() / (d ** 2).mean()))
        sizes.append(len(mp3))
    assert sizes[0] > sizes[1]      # better quality -> bigger file
    assert snrs[0] > snrs[1] + 5    # and higher SNR


def test_conformance_sweep_configs():
    """Randomized breadth: encoder configs across bitrates, sample
    rates, channel modes, VBR and feature toggles must all produce
    streams libmpg123 decodes exactly like our decoder (<=5e-6)."""
    mpg123ref = pytest.importorskip("mpg123ref")
    rng = np.random.default_rng(42)

    def sig_for(sr, ch, seconds=0.6):
        t = np.arange(int(sr * seconds)) / sr
        x = (0.4 * np.sin(2 * np.pi * 330 * t)
             + 0.15 * np.sin(2 * np.pi * 4100 * t + 0.5)
             + 0.03 * rng.standard_normal(len(t)))
        if ch == 1:
            return x
        return np.stack([x, np.roll(x, 13)], 1)

    configs = [
        dict(sr=44100, ch=2, kw=dict(bitrate=96)),
        dict(sr=44100, ch=1, kw=dict(bitrate=64)),
        dict(sr=48000, ch=2, kw=dict(bitrate=192)),
        dict(sr=32000, ch=2, kw=dict(bitrate=128)),
        dict(sr=44100, ch=2, kw=dict(bitrate=256, noise_shaping=False)),
        dict(sr=44100, ch=2, kw=dict(bitrate=128, joint_stereo=False)),
        dict(sr=44100, ch=2, kw=dict(bitrate=128, reservoir=False)),
        dict(sr=44100, ch=2, kw=dict(bitrate=128, vbr_quality=4)),
    ]
    for cfg in configs:
        sig = sig_for(cfg["sr"], cfg["ch"])
        mp3 = encode_pcm(sig, cfg["sr"], **cfg["kw"])
        ref, rsr = mpg123ref.decode(mp3)
        assert rsr == cfg["sr"], cfg
        raw, _ = decode_file(mp3, output="float32", gapless=False)
        # mpg123 feed mode does not skip the Xing frame (1152 samples)
        off = 1152 if len(ref) >= len(raw) + 1000 else 0
        a = ref[off:, 0]
        b = np.asarray(raw)[: len(a), 0]
        k = min(len(a), len(b))
        assert k > 10000, cfg
        d = float(np.abs(a[:k] - b[:k]).max())
        assert d < 5e-6, (cfg, d)


def test_mdct_legal_sequence_perfect_reconstruction():
    """The forward MDCT matrices invert the decoder's windowed IMDCT
    through overlap-add for a LEGAL block sequence (long, start, short,
    stop) — pins the 4/12 short sub-MDCT scale (a 4/36 transpose is
    only exact for long blocks; shorts came out at 1/3 amplitude)."""
    from mp3tpu.encoder.filterbank import mdct_matrices
    from mp3tpu.tables import filterbank as dfb
    inv = dfb.imdct_block_matrices()
    fwd = mdct_matrices()
    rng = np.random.default_rng(0)
    seq = [0, 0, 1, 2, 2, 2, 3, 0, 1, 2, 3, 0]
    sub = rng.standard_normal((len(seq), 18))
    ov = np.zeros(18)
    for g, bt in enumerate(seq):
        prev = sub[g - 1] if g else np.zeros(18)
        X = np.concatenate([prev, sub[g]]) @ fwd[bt]
        z = X @ inv[bt]
        out = z[:18] + ov
        ov = z[18:].copy()
        if g >= 2:
            assert np.abs(out - sub[g - 1]).max() < 1e-12, (g, bt)


def test_attack_granule_reconstructs():
    """End-to-end: an abrupt interior onset decodes cleanly through the
    short-block granules — pins MDCT_ALIGN label alignment (labels land
    on the granule whose SPECTRUM holds the attack) plus the short MDCT
    scale. Both bugs made the onset granules decode as garbage."""
    sig = np.zeros(SR)
    sig[5000:] = 0.5 * np.sin(2 * np.pi * 440 * np.arange(SR - 5000) / SR)
    mp3 = encode_pcm(sig, SR, bitrate=192, short_blocks=True)
    pcm, _ = decode_file(mp3, output="float32")
    d = pcm[:, 0] - sig
    G = len(sig) // 576
    eg = (d[: G * 576].reshape(G, 576) ** 2).mean(1)
    sg = (sig[: G * 576].reshape(G, 576) ** 2).mean(1)
    # every granule with signal decodes within -17 dB of its energy
    # (the attack granule itself is the binding case)
    m = sg > 1e-6
    assert (eg[m] < 0.02 * sg[m]).all(), \
        np.nonzero(~(eg[m] < 0.02 * sg[m]))[0]


def test_psy_device_align_matches_host_shift():
    """Device psymodel with align=MDCT_ALIGN == host analyze on an
    align_to_mdct-shifted copy (the batch path shares the staged
    unshifted PCM with the MDCT and shifts gather indices instead)."""
    jax = pytest.importorskip("jax")
    from mp3tpu.encoder.psy_device import analyze_batch
    from mp3tpu.encoder.psymodel import (MDCT_ALIGN, align_to_mdct,
                                         get_model)
    rng = np.random.default_rng(1)
    G = 8
    pcm = rng.standard_normal(G * 576) * 0.2
    # encoder inputs always end in >= ENCODER_DELAY+529 padding zeros;
    # a zero tail is where host shift (drops samples) and device index
    # shift (reads them) agree
    pcm[-1024:] = 0.0
    bts = np.zeros((1, G), np.int64)
    bts[0, 3] = 2
    rl_dev, rs_dev = analyze_batch(pcm[None], bts, SR, align=MDCT_ALIGN)
    model = get_model(SR)
    host = model.analyze(align_to_mdct(pcm), bts[0])
    assert np.allclose(rl_dev[0], host.ratio_l, rtol=1e-2, atol=2e-5)
    sm = bts[0] == 2
    assert np.allclose(rs_dev[0, sm], host.ratio_s[sm], rtol=1e-2,
                       atol=2e-5)
