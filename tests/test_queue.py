"""PlayQueue tests: gapless multi-track splice == per-file decode
concat (bit-exact), navigation, settings carry, checkpoint/resume."""
import numpy as np
import pytest

from mp3tpu.pipeline import decode_file
from mp3tpu.player import PlayQueue

import fixtures


@pytest.fixture(scope="module")
def two_tracks():
    pytest.importorskip("lameref")
    a = fixtures.lame_fixture("sweep", ch=2, bitrate=128, mode="jstereo")
    b = fixtures.lame_fixture("tonal", seconds=1.2, bitrate=160)
    return [a, b]


def test_queue_gapless_equals_decode_concat(two_tracks):
    """Playing the queue == decoding each file alone and concatenating,
    bit-for-bit (the D1 gapless trim makes the splice seamless)."""
    q = PlayQueue(two_tracks)
    q.play()
    got = q.sink.pcm
    ref = np.concatenate([decode_file(p)[0] for p in two_tracks])
    assert got.shape == ref.shape
    assert np.array_equal(got, ref)
    assert q.current == 1  # ended on the last track


def test_queue_navigation(two_tracks):
    q = PlayQueue(two_tracks)
    assert q.n_tracks == 2 and q.current == 0
    assert q.next() and q.current == 1
    assert not q.next()
    assert q.prev() and q.current == 0
    assert not q.prev()
    q.play(tracks=1)          # exactly one track
    n1 = len(q.sink.pcm)
    assert n1 == len(decode_file(two_tracks[0])[0])
    assert q.current == 1
    q.play()                  # the rest
    assert len(q.sink.pcm) > n1


def test_queue_speed_carries_across_tracks(two_tracks):
    from mp3tpu.dsp.timestretch import N_FFT
    q = PlayQueue(two_tracks, speed=0.5)
    q.play()
    n_src = sum(len(decode_file(p)[0]) for p in two_tracks)
    # each track flushes its own vocoder tail: one hop tolerance per track
    assert abs(len(q.sink.pcm) - n_src / 0.5) <= 2 * N_FFT


def test_loudness_statistic():
    from mp3tpu.dsp.loudness import loudness_db, normalization_gain_db
    sr, hop = 44100, 576
    quiet = np.full(400, -30.0, np.float32)
    loud = np.full(400, -20.0, np.float32)
    assert abs(loudness_db(loud, hop, sr)
               - loudness_db(quiet, hop, sr) - 10.0) < 1e-3
    assert loudness_db(np.full(40, -120.0, np.float32), hop, sr) \
        == float("-inf")
    assert normalization_gain_db(float("-inf")) == 0.0
    assert normalization_gain_db(-40.0) == 12.0   # boost cap
    assert normalization_gain_db(-10.0) == -4.0   # attenuation uncapped


def test_queue_normalize():
    """normalize=True matches tracks mastered ~12 dB apart; the scan
    runs on the device envelope (no PCM download)."""
    pytest.importorskip("lameref")
    import lameref
    sr = 44100
    sig = fixtures.tonal_stereo(1.2, sr)
    loud = lameref.encode(np.clip(sig, -1, 1), sr, bitrate=160)
    quiet = lameref.encode(np.clip(0.25 * sig, -1, 1), sr, bitrate=160)

    def rms_db(x):
        return 20 * np.log10(
            np.sqrt(np.mean((x / 32768.0) ** 2)) + 1e-12)

    n0 = len(decode_file(loud)[0])
    q0 = PlayQueue([loud, quiet])
    q0.play()
    gap0 = rms_db(q0.sink.pcm[:n0]) - rms_db(q0.sink.pcm[n0:])
    q1 = PlayQueue([loud, quiet], normalize=True)
    q1.play()
    gap1 = rms_db(q1.sink.pcm[:n0]) - rms_db(q1.sink.pcm[n0:])
    assert gap0 > 10.0       # unnormalized: ~12 dB apart
    assert abs(gap1) < 2.0   # normalized: matched
    # user gain carries separately from the per-track offsets
    assert q1._gain_db in (None, 0.0) or abs(q1._gain_db) < 1e-9


def test_queue_snapshot_resume(two_tracks):
    ref = PlayQueue(two_tracks)
    ref.play()
    full = ref.sink.pcm

    q1 = PlayQueue(two_tracks)
    q1.play(tracks=1)                 # finish track 0, cursor on track 1
    q1.seek(0.4)
    q1.player.play(max_samples=32 * 576)
    blob = q1.snapshot()

    q2 = PlayQueue(two_tracks)
    q2.restore(blob)
    assert q2.current == 1
    q2.play()
    sr = q2.player.track.sample_rate
    start = int(round(0.4 * sr)) + 32 * 576
    ref_tail = decode_file(two_tracks[1])[0][start:]
    assert np.array_equal(q2.sink.pcm, ref_tail)

    # and the plain full-queue output matches per-file concat (sanity
    # that the snapshot path didn't depend on queue internals)
    assert np.array_equal(full, np.concatenate(
        [decode_file(p)[0] for p in two_tracks]))


def test_queue_restore_discards_live_playback(two_tracks):
    """restore() over an in-progress queue must not merge the discarded
    pre-restore playback into the session metrics, nor carry the live
    player's gain/speed over the snapshot's (ADVICE r3)."""
    q1 = PlayQueue(two_tracks)
    q1.player.play(max_samples=32 * 576)
    blob = q1.snapshot()

    q2 = PlayQueue(two_tracks)
    q2.player.play(max_samples=2 * 32 * 576)  # pre-restore playback
    q2.player.gain_db = -6.0                  # live setting to discard
    q2.set_speed(0.5)
    q2.restore(blob)
    assert q2.metrics.samples_out == 0        # discarded, not merged
    assert q2.player.gain_db == 0.0           # snapshot's, not -6
    assert q2.player.speed == 1.0
    q2.play()
    # the sink keeps the 2 pre-restore blocks (sinks are external);
    # the post-restore output continues from the snapshot position
    ref = np.concatenate([decode_file(p)[0] for p in two_tracks])
    assert np.array_equal(q2.sink.pcm[2 * 32 * 576:], ref[32 * 576:])


def test_queue_empty_iterator_rejected():
    with pytest.raises(ValueError, match="empty queue"):
        PlayQueue(iter([]))
    with pytest.raises(ValueError, match="empty queue"):
        PlayQueue([])


def test_queue_rejects_mixed_formats():
    """A queue shares ONE sink whose rate/channel layout is fixed by
    the first track; a mismatched later track must fail loudly, not
    splice garbled PCM."""
    pytest.importorskip("lameref")
    stereo = fixtures.lame_fixture("sweep", ch=2, bitrate=128)
    mono = fixtures.lame_fixture("sweep", ch=1, bitrate=96, mode="mono")
    q = PlayQueue([stereo, mono])
    with pytest.raises(ValueError, match="share sample rate"):
        q.play()


def test_queue_explicit_unity_speed_sticks(two_tracks):
    """set_speed(1.0) is an explicit choice; the next track must stay
    at 1.0 rather than reverting to the config default speed."""
    from mp3tpu.config import resolve, set_active
    set_active(resolve(player={"speed": 0.5}))
    try:
        q = PlayQueue(two_tracks)       # opens at the 0.5 config default
        assert q.player.speed == 0.5
        q.set_speed(1.0)                # back to normal tempo, explicitly
        q.play(tracks=1)
        assert q.player.speed == 1.0    # track 1 did NOT revert to 0.5
    finally:
        set_active(resolve())


def test_queue_metrics_aggregate(two_tracks):
    """Queue metrics cover the whole session, not just the last track."""
    q = PlayQueue(two_tracks)
    q.play()
    n = sum(len(decode_file(p)[0]) for p in two_tracks)
    assert q.metrics.samples_out == n


def test_normalization_gain_peak_clamp():
    from mp3tpu.dsp.loudness import normalization_gain_db
    # quiet track (-26) wants +12, but its peak at -4 dBFS caps at +4
    assert normalization_gain_db(-26.0, -14.0, peak_db=-4.0) == 4.0
    # already-clipping peak never forces attenuation by itself
    assert normalization_gain_db(-26.0, -14.0, peak_db=1.0) == 0.0
    # attenuation is untouched by the peak clamp
    assert normalization_gain_db(-10.0, -14.0, peak_db=-0.5) == -4.0


def test_track_levels_peak():
    """track_levels' device-reduced peak matches the PLAYABLE decoded
    PCM's (gapless-trimmed — the range the listener hears)."""
    pytest.importorskip("lameref")
    from mp3tpu.pipeline import track_levels
    mp3 = fixtures.lame_fixture("tonal", seconds=1.2, bitrate=160)
    ld, pk_db = track_levels(mp3)
    pcm = decode_file(mp3, output="float32", gapless=True)[0]
    ref = 20 * np.log10(np.abs(pcm).max() + 1e-12)
    assert abs(pk_db - ref) < 0.1
    assert ld < pk_db  # loudness is a mean-square statistic


def test_normalization_clamp_accounts_for_base_gain():
    """The 'never clips' promise bounds the TOTAL gain (base + offset):
    with 2 dB of base gain and 4 dB of peak headroom only +2 dB of
    normalization boost fits."""
    from mp3tpu.dsp.loudness import normalization_gain_db
    assert normalization_gain_db(-26.0, -14.0, peak_db=-4.0,
                                 base_gain_db=2.0) == 2.0
    # base alone exceeding headroom: offset collapses to 0, the base
    # stays the caller's explicit choice
    assert normalization_gain_db(-26.0, -14.0, peak_db=-4.0,
                                 base_gain_db=6.0) == 0.0


def test_levels_batch_matches_single():
    """Batched levels (fused-envelope fast path, int16 peak) agree with
    the per-file scan within the quantization/timeline margins."""
    pytest.importorskip("lameref")
    import mp3tpu
    from mp3tpu.pipeline import track_levels
    files = [fixtures.lame_fixture("tonal", seconds=1.2, bitrate=160),
             fixtures.lame_fixture("bursts", seconds=2.0, bitrate=128),
             fixtures.lame_fixture("sweep", ch=1, bitrate=96, mode="mono")]
    batch = mp3tpu.levels_batch(files)
    for f, (ld, pk) in zip(files, batch):
        ld1, pk1 = track_levels(f)
        assert abs(ld - ld1) < 0.3, (ld, ld1)
        assert abs(pk - pk1) < 0.3, (pk, pk1)
