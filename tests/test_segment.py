"""Silence-based sentence segmentation tests (dsp/segment.py + the
Player's segments()/play_segment() — the reference's "play a few
sentences at a time" navigation, SURVEY.md §0.1)."""
import numpy as np
import pytest

from mp3tpu.dsp.segment import split_silence

import fixtures
from fixtures import BURST_SPANS

SR = 44100
TOL = 0.09  # boundary tolerance (envelope hop + pad + codec smear)


def _check_spans(segs_s, spans=BURST_SPANS, tol=TOL):
    assert len(segs_s) == len(spans), segs_s
    for (ga, gb), (ea, eb) in zip(segs_s, spans):
        assert abs(ga - ea) <= tol, (ga, ea)
        assert abs(gb - eb) <= tol, (gb, eb)


def test_split_bursts_clean():
    pcm = fixtures.bursts(0, SR)
    segs = split_silence(pcm, SR)
    _check_spans([(a / SR, b / SR) for a, b in segs])


def test_split_with_noise_floor():
    """A -45 dB noise floor must not create or destroy segments (the
    threshold adapts to the floor)."""
    rng = np.random.default_rng(3)
    pcm = fixtures.bursts(0, SR) + 0.005 * rng.standard_normal(
        (int(fixtures.BURST_TOTAL * SR), 2))
    segs = split_silence(pcm, SR)
    _check_spans([(a / SR, b / SR) for a, b in segs])


def test_blip_dropped_and_pause_merged():
    # two tones around a 2 s silence with a 40 ms click in the middle:
    # the click is >= min_silence from both neighbors (no merge), and
    # shorter than min_segment -> dropped
    t = np.arange(4 * SR) / SR
    tone = 0.4 * np.sin(2 * np.pi * 300 * t)
    pcm = np.zeros((4 * SR, 1), np.float32)
    pcm[: SR, 0] = tone[: SR]
    pcm[3 * SR:, 0] = tone[3 * SR:]
    pcm[2 * SR: 2 * SR + int(0.04 * SR)] = 0.5
    segs = split_silence(pcm, SR)
    assert len(segs) == 2
    assert segs[0][1] < 1.2 * SR and segs[1][0] > 2.8 * SR
    # a 120 ms pause INSIDE sentence 0 must not split it
    pcm = fixtures.bursts(0, SR).copy()
    j = int(0.65 * SR)
    pcm[j:j + int(0.12 * SR)] = 0.0
    segs = split_silence(pcm, SR)
    assert len(segs) == len(BURST_SPANS)


def test_edge_cases():
    assert split_silence(np.zeros((SR, 2), np.float32), SR) == []
    assert split_silence(np.zeros((0, 2), np.float32), SR) == []
    # constant tone: no pauses -> one segment spanning everything
    t = np.arange(SR) / SR
    tone = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    segs = split_silence(tone, SR)
    assert segs == [(0, SR)]


def test_mostly_silent_track_still_splits():
    """A recording that is >90% silence with one short sentence: the
    adaptive threshold derives the active level from NON-silent frames,
    so the sentence is found (ADVICE r3 — the unconditional 90th
    percentile sat below the floor and returned nothing)."""
    n = 20 * SR
    pcm = np.zeros((n, 1), np.float32)
    t = np.arange(SR) / SR
    pcm[9 * SR: 10 * SR, 0] = 0.4 * np.sin(2 * np.pi * 440 * t)
    segs = split_silence(pcm, SR)
    assert len(segs) == 1
    a, b = segs[0]
    assert abs(a / SR - 9.0) <= TOL and abs(b / SR - 10.0) <= TOL


def test_out_of_phase_stereo():
    """Inverted-phase stereo must not read as silence — the envelope
    sums channel POWER; an amplitude downmix would cancel L = -R."""
    pcm = fixtures.bursts(0, SR)
    pcm[:, 1] *= -1.0
    segs = split_silence(pcm, SR)
    _check_spans([(a / SR, b / SR) for a, b in segs])


def test_segments_disjoint_and_ordered():
    segs = split_silence(fixtures.bursts(0, SR), SR)
    for (a0, b0), (a1, b1) in zip(segs, segs[1:]):
        assert a0 < b0 <= a1 < b1


def test_property_random_inputs():
    """Structural invariants hold for arbitrary PCM: segments are
    in-bounds, ordered, disjoint, and at least min_segment long."""
    rng = np.random.default_rng(11)
    for _ in range(25):
        n = int(rng.integers(1, 4 * SR))
        kind = rng.integers(0, 3)
        if kind == 0:
            pcm = rng.standard_normal((n, 2)).astype(np.float32) * 0.3
        elif kind == 1:
            pcm = np.zeros((n, 2), np.float32)
        else:  # gated noise
            pcm = rng.standard_normal((n, 2)).astype(np.float32) * 0.3
            gate = rng.random(n) < 0.5
            run = rng.integers(100, 20000)
            gate = np.repeat(gate[::run][:, None],
                             run, axis=1).ravel()[:n]
            pcm *= gate[:, None]
        segs = split_silence(pcm, SR)
        prev_end = 0
        for a, b in segs:
            assert 0 <= a < b <= n
            assert a >= prev_end
            assert b - a >= 0.29 * SR  # min_segment minus pad rounding
            prev_end = b


# ---------------------------------------------------------------- player

@pytest.fixture(scope="module")
def mp3():
    pytest.importorskip("lameref")
    return fixtures.lame_fixture("bursts", ch=2, bitrate=128, mode="jstereo")


def test_segment_file_device_envelope(mp3):
    """mp3tpu.segment(): envelope reduced ON DEVICE (PCM never crosses
    D2H) — boundaries match the fixture and the Player's host scan."""
    import mp3tpu
    from mp3tpu.player import Player
    segs = mp3tpu.segment(mp3)
    _check_spans(segs)
    ref = Player(mp3).segments()
    assert len(segs) == len(ref)
    for (a, b), (c, d) in zip(segs, ref):  # different hop (576 vs 882):
        assert abs(a - c) < 0.06 and abs(b - d) < 0.06


def test_segment_batch_edge_materials():
    import mp3tpu
    pytest.importorskip("lameref")
    mono = fixtures.lame_fixture("bursts", ch=1, bitrate=64, mode="mono")
    quiet = fixtures.lame_fixture("silence", seconds=1.0, bitrate=128)
    tone = fixtures.lame_fixture("tonal", seconds=1.0, bitrate=128)
    res = mp3tpu.segment_batch([mono, quiet, tone])
    _check_spans(res[0])                      # mono decodes + splits
    assert res[1] == []                       # silence: nothing
    assert len(res[2]) == 1                   # continuous: one span
    a, b = res[2][0]
    assert a < 0.1 and b > 0.85


def test_player_segments(mp3):
    from mp3tpu.player import Player
    p = Player(mp3)  # gapless: LAME tag aligns the timeline with the PCM
    segs = p.segments()
    _check_spans(segs)
    assert p.segments() is segs          # cached
    assert p.segments(refresh=True) == segs
    assert p.position == 0.0             # the scan didn't move the cursor


def test_player_play_segment(mp3):
    from mp3tpu.player import Player
    p = Player(mp3)
    segs = p.segments()
    a, b = segs[1]
    n = p.play_segment(1, times=2)  # noqa: F841 (returns None; sink holds pcm)
    sr = p.track.sample_rate
    expect = 2 * (int(round(b * sr)) - int(round(a * sr)))
    assert abs(len(p.sink.pcm) - expect) <= 2
    # the replayed audio is actually the sentence (non-silent)
    x = p.sink.pcm.astype(np.float32) / 32768.0
    assert float(np.sqrt(np.mean(x ** 2))) > 0.05
    with pytest.raises(IndexError):
        p.play_segment(99)


def test_player_play_segment_slow(mp3):
    """The full reference gesture: replay sentence 0 at 0.75x — output
    duration is span/0.75 within a vocoder hop."""
    from mp3tpu.dsp.timestretch import N_FFT
    from mp3tpu.player import Player
    p = Player(mp3)
    a, b = p.segments()[0]
    p.play_segment(0, speed=0.75)
    sr = p.track.sample_rate
    span = int(round(b * sr)) - int(round(a * sr))
    assert abs(len(p.sink.pcm) - span / 0.75) <= N_FFT


def test_player_practice(mp3):
    """The full study session (reference README.md:46) in one call:
    every sentence x2 at unity speed with a 0.2 s shadowing gap —
    output length == sum of (2*span + 2*gap) per sentence; a `stop`
    bound limits which sentences play."""
    from mp3tpu.player import Player
    p = Player(mp3)
    segs = p.practice(times=2, gap_s=0.2)
    assert segs == p.segments()
    sr = p.track.sample_rate
    gap = int(round(0.2 * sr))
    expect = sum(2 * (int(round(b * sr)) - int(round(a * sr))) + 2 * gap
                 for a, b in segs)
    assert abs(len(p.sink.pcm) - expect) <= 2 * len(segs)
    # the gaps really are silence: the last pushed chunk ends dead quiet
    assert int(np.abs(p.sink.pcm[-gap // 2:]).max()) == 0

    p2 = Player(mp3)
    only = p2.practice(times=1, start=1, stop=2)
    a, b = p2.segments()[1]
    span = int(round(b * sr)) - int(round(a * sr))
    assert abs(len(p2.sink.pcm) - span) <= 2
    assert only == p2.segments()[1:2]


def test_segment_file_hop_s_rejected():
    """segment_file's device envelope has a fixed granule hop; a
    hop_s that cannot be honored fails loudly instead of being
    silently ignored (Player.segments is the tunable-hop surface)."""
    import pytest
    pytest.importorskip("lameref")
    from mp3tpu.pipeline import ENV_HOP, segment_file
    mp3 = fixtures.lame_fixture("bursts", seconds=2.0, bitrate=128)
    with pytest.raises(ValueError, match="fixed"):
        segment_file(mp3, hop_s=0.01)
    # the native hop is accepted (and equals the default result)
    assert segment_file(mp3, hop_s=ENV_HOP / 44100.0) == segment_file(mp3)


def test_split_file_wav(tmp_path):
    """split writes one WAV per sentence whose samples ARE the decoded
    slice (same clock as segment_file/decode_file)."""
    import wave
    pytest.importorskip("lameref")
    from mp3tpu.pipeline import decode_file, segment_file, split_file
    mp3 = fixtures.lame_fixture("bursts", seconds=2.0, bitrate=128)
    paths = split_file(mp3, str(tmp_path), fmt="wav", stem="s")
    segs = segment_file(mp3)
    assert len(paths) == len(segs) == len(BURST_SPANS)
    pcm, sr = decode_file(mp3)
    for p, (a, b) in zip(paths, segs):
        w = wave.open(p)
        clip = np.frombuffer(w.readframes(w.getnframes()),
                             np.int16).reshape(-1, w.getnchannels())
        ref = pcm[int(round(a * sr)): int(round(b * sr))]
        assert np.array_equal(clip, ref)


def test_split_file_mp3_roundtrip(tmp_path):
    """mp3 clips (ONE batched re-encode) decode back to the sentence:
    right duration, and the audio correlates with the source slice."""
    pytest.importorskip("lameref")
    from mp3tpu.pipeline import decode_file, segment_file, split_file
    mp3 = fixtures.lame_fixture("bursts", seconds=2.0, bitrate=128)
    paths = split_file(mp3, str(tmp_path), fmt="mp3", bitrate=128)
    segs = segment_file(mp3)
    assert len(paths) == len(segs)
    pcm, sr = decode_file(mp3)
    for p, (a, b) in zip(paths, segs):
        clip, csr = decode_file(p)
        ref = pcm[int(round(a * sr)): int(round(b * sr))]
        assert csr == sr
        assert abs(len(clip) - len(ref)) <= 1  # gapless tag: sample-aligned
        n = min(len(clip), len(ref))
        x = clip[:n, 0].astype(np.float64)
        y = ref[:n, 0].astype(np.float64)
        corr = (x * y).sum() / (np.linalg.norm(x) * np.linalg.norm(y)
                                + 1e-12)
        assert corr > 0.95, corr


def test_segment_batch_does_not_mutate_kwargs():
    """hop_s validation must not pop from the caller's dict (batched
    paths validate the SAME kwargs against every chunk's rate)."""
    import mp3tpu
    pytest.importorskip("lameref")
    mp3_a = fixtures.lame_fixture("bursts", seconds=2.0, bitrate=128)
    kw = {"hop_s": 576 / 44100.0}
    res = mp3tpu.segment_batch([mp3_a, mp3_a], **kw)
    assert kw == {"hop_s": 576 / 44100.0}
    assert res[0] == res[1] == mp3tpu.segment(mp3_a)
