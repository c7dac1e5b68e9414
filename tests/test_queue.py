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
