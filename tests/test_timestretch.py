"""Time-stretch (phase vocoder) tests: duration contract, pitch
preservation, chunking invariance, state snapshot/resume, and the
Player's speed control (SURVEY.md §0.1 "slow listening"; §5.4)."""
import math

import numpy as np
import pytest

from mp3tpu.dsp.timestretch import (
    F_CHUNK, HOP_SYN, N_FFT, TimeStretch, stretch)

import fixtures


def _sine(freq=1000.0, sr=44100, secs=1.0, ch=1):
    t = np.arange(int(sr * secs)) / sr
    x = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    return np.repeat(x[:, None], ch, axis=1)


def _peak_hz(x, sr):
    w = np.hanning(len(x))
    spec = np.abs(np.fft.rfft(x * w))
    return np.argmax(spec) * sr / len(x)


@pytest.mark.parametrize("speed", [0.5, 0.75, 1.25, 2.0])
def test_duration_contract(speed):
    """Lifetime output is ceil(n/ha)*HOP_SYN — duration == input/speed
    to within one synthesis hop."""
    x = _sine(secs=0.7)
    out = stretch(x, speed)
    ha = int(round(HOP_SYN * speed))
    assert len(out) == math.ceil(len(x) / ha) * HOP_SYN
    assert abs(len(out) - len(x) / speed) <= N_FFT


@pytest.mark.parametrize("speed", [0.5, 1.5])
def test_pitch_preserved(speed):
    """A 1 kHz tone stays 1 kHz after the tempo change (the whole point
    vs a plain resampler, which would move it to speed*1 kHz)."""
    sr = 44100
    x = _sine(1000.0, sr=sr, secs=1.0)
    out = stretch(x[:, 0], speed)
    mid = out[len(out) // 4: len(out) // 4 + 8192]
    assert abs(_peak_hz(mid, sr) - 1000.0) < 15.0
    # and amplitude survives WOLA normalization (steady-state RMS)
    rms = float(np.sqrt(np.mean(mid ** 2)))
    assert 0.25 < rms < 0.45  # input RMS = 0.354


def test_chunking_invariance():
    """Feeding the same samples in any block sizes yields bit-identical
    output (the streaming-state contract)."""
    rng = np.random.default_rng(7)
    x = _sine(440.0, secs=0.5, ch=2)
    ref = stretch(x, 0.75)
    ts = TimeStretch(2, 0.75)
    outs, i = [], 0
    while i < len(x):
        n = int(rng.integers(1, 5000))
        outs.append(ts.process(x[i:i + n]))
        i += n
    outs.append(ts.flush())
    got = np.concatenate(outs)
    assert got.shape == ref.shape
    assert np.array_equal(got, ref)


def test_state_blob_resume():
    """snapshot -> restore into a fresh instance -> identical
    continuation (SURVEY.md §5.4 checkpoint/resume)."""
    x = _sine(880.0, secs=0.6, ch=2)
    cut = len(x) // 2
    ts = TimeStretch(2, 0.5)
    head = ts.process(x[:cut])
    blob = ts.state_blob()
    ref_tail = np.concatenate([ts.process(x[cut:]), ts.flush()])
    ts2 = TimeStretch(2, 1.0)
    ts2.restore_blob(blob)
    got_tail = np.concatenate([ts2.process(x[cut:]), ts2.flush()])
    assert np.array_equal(got_tail, ref_tail)
    full = stretch(x, 0.5)
    assert np.array_equal(np.concatenate([head, ref_tail]), full)


def test_speed_quantization_and_bounds():
    ts = TimeStretch(1, 0.75)
    assert ts.speed == 0.75  # ha=384 exact
    with pytest.raises(ValueError):
        ts.set_speed(0.1)
    with pytest.raises(ValueError):
        TimeStretch(1, 5.0)


def test_empty_and_flush_only():
    ts = TimeStretch(2)
    assert ts.process(np.zeros((0, 2), np.float32)).shape == (0, 2)
    assert ts.flush().shape == (0, 2)


def test_slow_down_mid_stream_keeps_tail():
    """Regression: residue buffered before a slow-down is consumed at
    the NEW speed — stale frame accounting used to make flush() return
    empty and truncate the audible ending."""
    x = _sine(500.0, secs=1.0)
    ts = TimeStretch(1, 1.4)
    a = ts.process(x[:30000])
    ts.set_speed(0.6)
    b = ts.process(x[30000:])
    expect = -(-len(ts._buf) // ts._ha) * HOP_SYN  # ceil(residue/ha)*HS
    tail = ts.flush()
    assert len(tail) == expect and expect > 0
    # the flushed tail is real signal, not padding silence
    assert float(np.sqrt(np.mean(tail[:HOP_SYN] ** 2))) > 0.05
    # no truncation: total exceeds the all-fast lower bound
    assert len(a) + len(b) + len(tail) > len(x) / 1.4


def test_mid_stream_speed_change_glides():
    """set_speed mid-stream keeps carried state: no discontinuity spike
    at the change point."""
    x = _sine(500.0, secs=0.8)
    ts = TimeStretch(1, 0.6)
    a = ts.process(x[:30000])
    ts.set_speed(1.4)
    b = np.concatenate([ts.process(x[30000:]), ts.flush()])
    out = np.concatenate([a, b])[:, 0]
    # a click would show as a sample-to-sample jump far beyond the
    # tone's max slope (2*pi*500/44100*0.5 ~ 0.036/sample)
    assert float(np.max(np.abs(np.diff(out)))) < 0.2


def test_phase_locking_preserves_transients():
    """Identity phase locking keeps clicks vertical: at a generic ratio
    the unlocked vocoder smears a click train (crest collapses ~4x),
    the locked one keeps it sharp. (At integer ratios like 0.5 the
    unlocked vocoder is accidentally coherent — 0.7 is the honest
    case.)"""
    import jax
    import mp3tpu.dsp.timestretch as tsm
    sr = 44100
    clicks = np.zeros(int(1.2 * sr), np.float32)
    for i in range(2205, len(clicks) - 2205, 4410):
        clicks[i:i + 8] = 0.9

    def run(lock):
        old = tsm.PHASE_LOCK
        try:
            tsm.PHASE_LOCK = lock
            tsm._scan_jit = None
            jax.clear_caches()  # jit caches key on the fn OBJECT, not
            # the flag it closes over — without this the first trace
            # would serve both settings
            return tsm.stretch(clicks, 0.7)
        finally:
            tsm.PHASE_LOCK = old
            tsm._scan_jit = None
            jax.clear_caches()

    def crest(y):
        core = y[len(y) // 6: -len(y) // 6]
        return float(np.max(np.abs(core))
                     / (np.sqrt(np.mean(core ** 2)) + 1e-12))

    c_locked, c_unlocked = crest(run(True)), crest(run(False))
    assert tsm.PHASE_LOCK  # locking is the production default
    assert c_locked > 2.0 * c_unlocked, (c_locked, c_unlocked)
    assert c_locked > 20.0  # input crest ~23: clicks stay clicks


# ---------------------------------------------------------------- player

@pytest.fixture(scope="module")
def mp3():
    pytest.importorskip("lameref")
    return fixtures.lame_fixture("sweep", ch=2, bitrate=128, mode="jstereo")


def test_player_speed_duration(mp3):
    from mp3tpu.player import Player
    p = Player(mp3, apply_gapless=False, speed=0.5)
    assert p.speed == 0.5
    p.play()
    n_src = p._end - p._start
    got = len(p.sink.pcm)
    assert abs(got - n_src / 0.5) <= N_FFT  # duration == src/speed +- hop


def test_player_speed_change_and_seek(mp3):
    from mp3tpu.player import Player
    p = Player(mp3, apply_gapless=False)
    assert p.speed == 1.0
    p.set_speed(2.0)
    p.play(max_samples=65536)          # paced: vocoder keeps streaming
    mid = len(p.sink.pcm)
    assert mid > 0
    p.seek(0.25)                        # discontinuity: vocoder resets
    p.set_speed(0.75)
    p.play(until_sample=p._start + int(0.5 * p.track.sample_rate))
    assert len(p.sink.pcm) > mid
    p.set_speed(1.0)                    # back to the direct device path
    assert p._stretch is None


def test_player_set_speed_unity_semantics(mp3):
    from mp3tpu.player import Player
    p = Player(mp3, apply_gapless=False)
    p.set_speed(1.0005)  # quantizes to ha == HOP_SYN: must NOT engage
    assert p.speed == 1.0 and p._stretch is None
    # the same quantize-to-unity speed at CONSTRUCTION time: set_speed's
    # disengage branch flushes pending PCM, which must already be
    # initialized (ADVICE r3 — crashed with AttributeError before)
    p = Player(mp3, apply_gapless=False, speed=1.0005)
    assert p.speed == 1.0 and p._stretch is None
    p.play(max_samples=32 * 576)
    assert len(p.sink.pcm) > 0
    p = Player(mp3, apply_gapless=False, speed=0.5)
    p.play(max_samples=4 * 32 * 576)    # paced: stretcher holds residue
    before = len(p.sink.pcm)
    p.set_speed(1.0)                    # tail reaches the sink NOW
    assert len(p.sink.pcm) > before


def test_player_speed_snapshot_resume(mp3):
    """Paced play -> snapshot -> restore into a fresh Player -> the
    continuation matches an uninterrupted stretched play bit-for-bit
    (vocoder state rides the snapshot; emit blocking is elementwise at
    unity gain so block boundaries don't matter)."""
    from mp3tpu.player import Player
    ref = Player(mp3, apply_gapless=False, speed=0.75)
    ref.play()
    full = ref.sink.pcm

    p1 = Player(mp3, apply_gapless=False, speed=0.75)
    p1.play(max_samples=4 * 32 * 576)   # max_samples binds: no flush
    head = p1.sink.pcm
    blob = p1.snapshot()

    p2 = Player(mp3, apply_gapless=False)  # speed comes from the blob
    p2.restore(blob)
    assert p2.speed == 0.75
    p2.play()
    got = np.concatenate([head, p2.sink.pcm])
    assert got.shape == full.shape
    assert np.array_equal(got, full)
