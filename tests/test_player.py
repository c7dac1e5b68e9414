"""Player engine tests: seek-vs-slice equality, loop, checkpoint/resume,
scheduler batch == single (SURVEY.md §4.4 integration/batch levels)."""
import numpy as np
import pytest

from mp3tpu.pipeline import decode_file
from mp3tpu.player import CollectSink, Player, StreamScheduler, decode_batch_streams

import fixtures


@pytest.fixture(scope="module")
def mp3():
    pytest.importorskip("lameref")
    return fixtures.lame_fixture("sweep", ch=2, bitrate=128, mode="jstereo")


def test_play_full_matches_decode(mp3):
    p = Player(mp3, apply_gapless=False)
    p.play()
    got = p.sink.pcm
    ref, sr = decode_file(mp3, gapless=False)
    n = min(len(got), len(ref))
    assert n > 80000
    assert np.array_equal(got[:n], ref[:n])


def test_seek_equals_slice(mp3):
    """seek(t)+play == decode-then-slice, bit-exact (SURVEY.md §7.5 #3)."""
    ref, sr = decode_file(mp3, gapless=False)
    p = Player(mp3, apply_gapless=False)
    t = 0.73
    p.seek(t)
    p.play(until_sample=int(t * sr) + 4096)
    got = p.sink.pcm
    start = int(round(t * sr))
    ref_slice = ref[start:start + len(got)]
    assert len(got) >= 4000
    assert np.array_equal(got, ref_slice)


def test_loop_segment(mp3):
    p = Player(mp3, apply_gapless=False)
    p.loop(0.5, 0.6, times=3)
    sr = p.track.sample_rate
    seg = int(round(0.6 * sr)) - int(round(0.5 * sr))
    got = p.sink.pcm
    assert len(got) == 3 * seg
    assert np.array_equal(got[:seg], got[seg:2 * seg])


def test_snapshot_restore(mp3):
    p1 = Player(mp3, apply_gapless=False)
    p1.play(until_sample=40000)
    blob = p1.snapshot()
    p1.play(until_sample=80000)
    tail1 = p1.sink.pcm[-30000:]

    p2 = Player(mp3, apply_gapless=False)
    p2.restore(blob)
    p2.play(until_sample=80000)
    tail2 = p2.sink.pcm[-30000:]
    assert np.array_equal(tail1, tail2)


def test_metadata_and_duration(mp3):
    p = Player(mp3)
    assert p.track.sample_rate == 44100
    assert 1.5 < p.duration < 2.5


def test_scheduler_batch_equals_single(mp3):
    """Batch decode matches single-stream decode. Different batch shapes
    compile to different XLA reduction orders, so the cross-shape
    contract is <=1 LSB (same-shape runs are bit-identical)."""
    pytest.importorskip("lameref")
    mp3b = fixtures.lame_fixture("transients", ch=2, bitrate=128, mode="jstereo")
    singles = [decode_file(m, gapless=False)[0] for m in (mp3, mp3b, mp3)]
    batch = decode_batch_streams([mp3, mp3b, mp3])
    for (pcm, sr), ref in zip(batch, singles):
        n = min(len(pcm), len(ref))
        assert n > 50000
        d = np.abs(pcm[:n].astype(np.int32) - ref[:n].astype(np.int32))
        assert d.max() <= 1
        assert (d == 0).mean() > 0.99


def test_scheduler_elastic_refill(mp3):
    """More streams than slots: slots must drain and refill."""
    sched = StreamScheduler(n_slots=2, win=16, sample_rate=44100)
    sinks = [CollectSink() for _ in range(5)]
    for i, snk in enumerate(sinks):
        sched.submit(mp3, sink=snk, stream_id=i)
    sched.run()
    ref, _ = decode_file(mp3, gapless=False)
    for snk in sinks:
        n = min(len(snk.pcm), len(ref))
        d = np.abs(snk.pcm[:n].astype(np.int32) - ref[:n].astype(np.int32))
        assert d.max() <= 1 and (d == 0).mean() > 0.99
    assert sched.metrics.streams_finished == 5
