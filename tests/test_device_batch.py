"""Public device-resident batch decode (SURVEY.md §3.2/L5, BASELINE
config 3; VERDICT r4 task 3): decode_batch(..., output="device")
returns a DecodedBatch handle whose PCM stays in HBM; .numpy() equals
the output="pcm" result exactly, and device consumers (levels/
segments) ride the handle. Plus the playable-peak contract (task 7):
normalization's clipping clamp uses the gapless-trimmed peak."""
import numpy as np
import pytest

import mp3tpu
from mp3tpu.pipeline import decode_file, decode_files, track_levels

import fixtures


@pytest.fixture(scope="module")
def batch_files():
    pytest.importorskip("lameref")
    return [
        fixtures.lame_fixture("sweep", ch=2, bitrate=128, mode="jstereo"),
        fixtures.lame_fixture("tonal", seconds=1.2, bitrate=160),
        fixtures.lame_fixture("sweep", ch=1, bitrate=96, mode="mono"),
        fixtures.own_fixture("transients", seconds=1.0),
    ]


def test_handle_numpy_matches_pcm(batch_files):
    """Same executables, same trims: the handle's materialization is
    element-for-element the output="pcm" result."""
    ref = decode_files(batch_files, gapless=True)
    handle = mp3tpu.decode_batch(batch_files, output="device")
    assert isinstance(handle, mp3tpu.DecodedBatch)
    assert len(handle) == len(batch_files)
    got = handle.numpy()
    for (p0, r0), (p1, r1) in zip(ref, got):
        assert r0 == r1
        assert np.array_equal(p0, p1)
    # single-stream materialization agrees with the list form
    p, r = handle.numpy(1)
    assert np.array_equal(p, ref[1][0]) and r == ref[1][1]


def test_handle_gapless_false(batch_files):
    ref = decode_files(batch_files, gapless=False)
    got = mp3tpu.decode_batch(batch_files, gapless=False,
                              output="device").numpy()
    for (p0, r0), (p1, r1) in zip(ref, got):
        assert r0 == r1 and np.array_equal(p0, p1)


def test_handle_device_residency(batch_files):
    """When the native fast path runs, the PCM really is a device
    array shared per chunk — the serving-pipeline contract."""
    from mp3tpu.bitstream import native as nat
    if not nat.available():
        pytest.skip("native unpacker unavailable")
    import jax
    handle = mp3tpu.decode_batch(batch_files, output="device")
    devs = set()
    for i in range(len(handle)):
        arr, row, lo, hi, nch = handle.device_pcm(i)
        assert isinstance(arr, jax.Array)
        assert hi > lo and nch in (1, 2)
        devs.add(id(arr))
    # 44.1k streams share one chunk array (one scan dispatch)
    assert len(devs) <= 2


def test_handle_host_fallback(batch_files):
    """With the native path disabled the handle carries host records
    and every method still behaves identically."""
    from mp3tpu.config import resolve, set_active
    set_active(resolve(decode={"use_native": False}))
    try:
        ref = decode_files(batch_files, gapless=True)
        handle = decode_files(batch_files, gapless=True, output="device")
        for (p0, r0), (p1, r1) in zip(ref, handle.numpy()):
            assert r0 == r1 and np.array_equal(p0, p1)
        lv = handle.levels()
        assert len(lv) == len(batch_files)
    finally:
        set_active(resolve())


def test_handle_levels_matches_single(batch_files):
    handle = mp3tpu.decode_batch(batch_files, gapless=False,
                                 output="device")
    got = handle.levels()
    for mp3, (ld, pk) in zip(batch_files, got):
        ld1, pk1 = track_levels(mp3)
        assert abs(ld - ld1) < 0.6, (ld, ld1)
        # batch peaks are measured on the quantized int16 PCM (clamped
        # at full scale), singles on float32: above 0 dBFS both clamp
        # the normalization boost to zero, so compare the clamped value
        assert abs(min(pk, 0.0) - min(pk1, 0.0)) < 0.3, (pk, pk1)


def test_handle_segments_matches_segment_file():
    pytest.importorskip("lameref")
    from mp3tpu.pipeline import segment_file
    mp3 = fixtures.lame_fixture("bursts", bitrate=128)
    handle = mp3tpu.decode_batch([mp3, mp3], gapless=False,
                                 output="device")
    segs = handle.segments(gapless=True)
    ref = segment_file(mp3, gapless=True)
    assert segs[0] == segs[1]
    assert len(segs[0]) == len(ref)
    for (a, b), (a1, b1) in zip(segs[0], ref):
        assert abs(a - a1) < 0.02 and abs(b - b1) < 0.02


def test_handle_numpy_returns_owned_copy(batch_files):
    """Mutating a materialized result must not corrupt the handle's
    stored PCM — device chunks and host-fallback records alike."""
    from mp3tpu.config import resolve, set_active
    for native in (True, False):
        set_active(resolve(decode={"use_native": native}))
        try:
            handle = decode_files(batch_files, output="device")
            p0, _ = handle.numpy(0)
            orig = p0.copy()
            p0[:] = 0
            p1, _ = handle.numpy(0)
            assert np.array_equal(p1, orig)
        finally:
            set_active(resolve())


def test_levels_segments_over_budget_fallback(batch_files):
    """Streams over the staging budget take the per-file device-envelope
    path in the batch levels/segments consumers (KBs of D2H) instead of
    a full-PCM host fallback they would immediately reduce away."""
    from mp3tpu.config import resolve, set_active
    from mp3tpu.pipeline import segment_files, track_levels_batch
    ref_lv = track_levels_batch(batch_files)
    ref_sg = segment_files(batch_files)
    set_active(resolve(decode={"batch_max_mb": 0}))  # force over-budget
    try:
        got_lv = track_levels_batch(batch_files)
        got_sg = segment_files(batch_files)
    finally:
        set_active(resolve())
    for (l0, p0), (l1, p1) in zip(ref_lv, got_lv):
        assert abs(l0 - l1) < 0.6
        assert abs(min(p0, 0.0) - min(p1, 0.0)) < 0.3
    assert [len(s) for s in got_sg] == [len(s) for s in ref_sg]


def test_handle_rejects_bad_output(batch_files):
    with pytest.raises(ValueError, match="output"):
        decode_files(batch_files, output="hbm")


# ---------------------------------------------------------------------
# Playable peak (VERDICT r4 task 7)

def _patch_padding(mp3: bytes, padding: int) -> bytes:
    """Rewrite the LAME tag's 12-bit encoder_padding field."""
    i = mp3.find(b"LAME3.100")
    assert i > 0
    dp = mp3[i + 21:i + 24]
    v = (dp[0] << 16) | (dp[1] << 8) | dp[2]
    v = (v & ~0xFFF) | (padding & 0xFFF)
    return mp3[:i + 21] + bytes([(v >> 16) & 0xFF, (v >> 8) & 0xFF,
                                 v & 0xFF]) + mp3[i + 24:]


@pytest.fixture(scope="module")
def loud_tail_mp3():
    """A quiet track whose final 2205 samples are a full-scale burst,
    with the LAME tag patched to claim that tail as encoder padding:
    the burst exists on the decoded timeline but is NOT playable."""
    from mp3tpu.encoder import encode_pcm
    sr = 44100
    n = sr  # 1 s
    t = np.arange(n) / sr
    sig = 0.08 * np.sin(2 * np.pi * 440 * t)
    sig[-2205:] = 0.95 * np.sin(2 * np.pi * 1000 * t[:2205])
    mp3 = encode_pcm(np.stack([sig, sig], 1), sr, bitrate=128)
    return _patch_padding(mp3, 4095)


def test_playable_peak_excludes_trimmed_tail(loud_tail_mp3):
    ld, pk_db = track_levels(loud_tail_mp3)
    # the peak matches the PLAYABLE PCM's, not the loud trimmed tail
    pcm = decode_file(loud_tail_mp3, output="float32", gapless=True)[0]
    ref_db = 20 * np.log10(np.abs(pcm).max() + 1e-12)
    assert abs(pk_db - ref_db) < 0.2, (pk_db, ref_db)
    # and the full (untrimmed) timeline's peak is much louder
    full = decode_file(loud_tail_mp3, output="float32", gapless=False)[0]
    full_db = 20 * np.log10(np.abs(full).max() + 1e-12)
    assert full_db > pk_db + 10.0


def test_playable_peak_increases_normalization_boost(loud_tail_mp3):
    """The whole point: a quiet track with a loud artifact in the
    trimmed region now gets the boost its audible content allows."""
    from mp3tpu.dsp.loudness import normalization_gain_db
    ld, pk_db = track_levels(loud_tail_mp3)
    boost_playable = normalization_gain_db(ld, -14.0, peak_db=pk_db)
    full = decode_file(loud_tail_mp3, output="float32", gapless=False)[0]
    full_db = 20 * np.log10(np.abs(full).max() + 1e-12)
    boost_untrimmed = normalization_gain_db(ld, -14.0, peak_db=full_db)
    assert boost_playable > boost_untrimmed + 6.0


def test_playable_peak_batch_matches_single(loud_tail_mp3):
    (ld_b, pk_b), = mp3tpu.levels_batch([loud_tail_mp3])
    ld_s, pk_s = track_levels(loud_tail_mp3)
    assert abs(pk_b - pk_s) < 0.3, (pk_b, pk_s)
    assert abs(ld_b - ld_s) < 0.6
