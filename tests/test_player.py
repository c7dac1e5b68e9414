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


def test_play_max_samples(mp3):
    p = Player(mp3, apply_gapless=False)
    emitted = p.play(max_samples=10000)
    assert emitted == 10000
    assert len(p.sink.pcm) == 10000
    ref, _ = decode_file(mp3, gapless=False)
    assert np.array_equal(p.sink.pcm, ref[:10000])
    # playback resumes exactly where it stopped
    p.play(max_samples=5000)
    assert np.array_equal(p.sink.pcm, ref[:15000])


def test_gain_change_ramps(mp3):
    """A mid-playback gain change must ramp, not step (D3 zipper-noise
    contract): the first emitted block after the change starts at the
    old gain and reaches the new one within GAIN_RAMP samples."""
    from mp3tpu.player.engine import GAIN_RAMP
    ref, _ = decode_file(mp3, gapless=False, output="float32")
    refi, _ = decode_file(mp3, gapless=False)
    p = Player(mp3, apply_gapless=False)
    n0 = 36864  # two emit blocks
    p.play(max_samples=n0)
    p.gain_db = -12.0
    p.play(max_samples=n0)
    got = p.sink.pcm.astype(np.float32) / 32768.0
    g1 = 10.0 ** (-12.0 / 20.0)
    # before the change: unity gain, bit-exact int16
    assert np.array_equal(p.sink.pcm[:n0], refi[:n0])
    # well after the ramp: steady at the new gain (1 LSB tolerance)
    steady = slice(n0 + 4 * GAIN_RAMP, 2 * n0)
    d = np.abs(got[steady] - ref[steady] * g1)
    assert d.max() <= 1.5 / 32768
    # inside the ramp: gain is strictly between old and new on average
    ramp_zone = got[n0:n0 + GAIN_RAMP // 2]
    ref_zone = ref[n0:n0 + GAIN_RAMP // 2]
    mask = np.abs(ref_zone) > 0.05
    if mask.any():
        ratio = np.abs(ramp_zone[mask]) / np.abs(ref_zone[mask])
        assert ratio.mean() > g1 + 0.05  # not an instant step to g1
        assert ratio.mean() < 1.0 - 0.05  # but already below unity


def test_restore_clears_stale_eq_tail(mp3):
    """Restoring a pre-EQ snapshot into a player that has since played
    with EQ must clear the stale FIR tail (ADVICE round-1)."""
    eq = [6.0, 3.0, 0.0, -3.0, -6.0, 0.0, 3.0, 0.0, -2.0, 1.0]
    p1 = Player(mp3, apply_gapless=False, eq_gains_db=eq)
    blob = p1.snapshot()  # taken before any EQ processing
    p1.play(until_sample=40000)
    tail1 = np.copy(p1.sink.pcm)

    p1.restore(blob)
    assert p1._eq_state is None
    p2 = Player(mp3, apply_gapless=False, eq_gains_db=eq)
    p2.restore(blob)
    p2.play(until_sample=40000)
    assert np.array_equal(tail1, p2.sink.pcm[-len(tail1):] if len(
        p2.sink.pcm) > len(tail1) else p2.sink.pcm)


def test_player_first_audio_is_o_window(mp3):
    """Opening a track must NOT unpack the whole file: the first emitted
    window costs O(window) host unpack (VERDICT round-1 item 4)."""
    p = Player(mp3, apply_gapless=False)
    src = p.track.source
    assert src.granules_unpacked == 0  # open() did no audio unpack
    p.play(max_samples=1000)
    total = src.n_granules
    from mp3tpu.player.engine import WINDOW_GRANULES
    assert total > 4 * WINDOW_GRANULES  # fixture long enough to matter
    assert src.granules_unpacked <= 2 * WINDOW_GRANULES


def test_group_scan_contract(mp3):
    """The single-stream decode program is shared: player and pipeline
    agree on the window/group partition, and a partial-group (prefix)
    decode is bit-identical to the full-group run on the windows it
    covers (the property the player's incremental path relies on)."""
    import jax.numpy as jnp
    from mp3tpu import pipeline as pl
    from mp3tpu.kernels import pipeline as kp
    from mp3tpu.player import engine as eng
    assert pl.WINDOW == eng.WINDOW_GRANULES
    assert pl.GROUP_WINDOWS == eng.GROUP_WINDOWS
    st, info, _ = pl.load_symbols(mp3)
    K, W = pl.GROUP_WINDOWS, pl.WINDOW
    GG = K * W
    n = min(2 * W, st.n_granules)  # two real windows

    def prep(a, g):
        a = a[:g]
        width = ((0, GG - g),) + tuple((0, 0) for _ in a.shape[1:])
        return jnp.asarray(np.pad(a, width)[None])

    def run(g):
        state = kp.init_state(1)
        pcm, _ = kp.decode_window_group(
            prep(st.is_, g), prep(st.exp, g), prep(st.block_type, g),
            prep(st.mixed, g), prep(st.smode, g), state,
            st.sample_rate, K)
        return np.asarray(pcm[0, : n * 576])

    full = run(min(GG, st.n_granules))
    prefix = run(n)
    assert np.array_equal(full, prefix)


def test_player_forward_unpack_is_linear(mp3):
    """Sequential playback must unpack each granule once — the player's
    per-group symbol accumulation keeps host unpack linear even when a
    group is decoded in growing prefixes (sub-block play calls)."""
    p = Player(mp3, apply_gapless=False)
    src = p.track.source
    step = 5000
    while p.play(max_samples=step):
        pass
    from mp3tpu.player.engine import WINDOW_GRANULES
    assert src.granules_unpacked <= src.n_granules + WINDOW_GRANULES


def test_subblock_play_bounded_group_decodes(mp3):
    """Sink-paced sub-block reads (always under EMIT_BLOCK) must not
    re-decode the group prefix once per window: the first touch of a
    group runs the O(window) first-audio prefix, any later growth
    decodes the WHOLE group — at most two group-scan dispatches (and
    two full-buffer downloads) per group, output still bit-exact."""
    ref, sr = decode_file(mp3, gapless=False)
    p = Player(mp3, apply_gapless=False)
    calls = []
    orig = p._decode_group_dev

    def counted(q, upto):
        calls.append(q)
        return orig(q, upto)

    p._decode_group_dev = counted
    for _ in range(10000):
        if not p.play(max_samples=4096):
            break
    got = p.sink.pcm
    n = min(len(got), len(ref))
    assert n > 80000
    assert np.array_equal(got[:n], ref[:n])
    from collections import Counter
    per_group = Counter(calls)
    assert per_group and max(per_group.values()) <= 2


def test_loop_reuses_decoded_group(mp3):
    """loop() over a segment must not re-decode after its first pass:
    the device group cache serves every later iteration (the reference's
    repeat-listen pattern costs zero decode dispatches at steady state)."""
    p = Player(mp3, apply_gapless=False)
    p.loop(0.2, 0.7, times=1)
    first = p.metrics.granules_decoded
    assert first > 0
    p.loop(0.2, 0.7, times=3)
    assert p.metrics.granules_decoded == first
    # and the output is still per-iteration identical
    sr = p.track.sample_rate
    seg = int(round(0.7 * sr)) - int(round(0.2 * sr))
    got = p.sink.pcm
    assert np.array_equal(got[:seg], got[-seg:])


def test_loop_across_group_boundary_reuses_cache():
    """A loop() segment SPANNING a group boundary must also re-dispatch
    nothing after its first pass — the group cache holds two entries."""
    pytest.importorskip("lameref")
    import fixtures as fx
    mp3 = fx.lame_fixture("sweep", ch=2, bitrate=128, mode="jstereo",
                          seconds=4.0)
    p = Player(mp3, apply_gapless=False)
    from mp3tpu.player.engine import GROUP_WINDOWS, WINDOW_GRANULES
    gspan = GROUP_WINDOWS * WINDOW_GRANULES * 576
    sr = p.track.sample_rate
    b = (gspan + 30000) / sr           # segment end past the boundary
    a = b - 1.2
    assert a * sr < gspan < b * sr      # really crosses
    p.loop(a, b, times=1)
    first = p.metrics.granules_decoded
    p.loop(a, b, times=2)
    assert p.metrics.granules_decoded == first
    seg = int(round(b * sr)) - int(round(a * sr))
    got = p.sink.pcm
    assert np.array_equal(got[:seg], got[-seg:])


def test_stop_mid_multiblock_resumes_exact(mp3):
    """A sink-callback stop() between blocks of one multi-block emit
    dispatch must leave the cursor at the delivered boundary; a resumed
    play() re-emits the rest bit-identically (the in-flight dispatch is
    discarded and the DSP state rewound)."""
    from mp3tpu.player import CallbackSink
    ref, _ = decode_file(mp3, gapless=False)
    chunks = []

    def cb(pcm):
        chunks.append(np.array(pcm))
        if len(chunks) == 2:  # stop mid-run, between pushed blocks
            p.stop()

    p = Player(mp3, CallbackSink(cb), apply_gapless=False)
    p.play()
    assert p.stopped
    p.play()  # resume to end
    got = np.concatenate(chunks)
    n = min(len(got), len(ref))
    assert n > 80000
    assert np.array_equal(got[:n], ref[:n])


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
    batch = decode_batch_streams([mp3, mp3b, mp3], gapless=False)
    for (pcm, sr), ref in zip(batch, singles):
        n = min(len(pcm), len(ref))
        assert n > 50000
        d = np.abs(pcm[:n].astype(np.int32) - ref[:n].astype(np.int32))
        assert d.max() <= 1
        assert (d == 0).mean() > 0.99


def test_batch_decode_gapless_matches_single(mp3):
    """decode_files must honor the LAME gapless tag exactly like
    decode_file: same trimmed output, same lengths (VERDICT round-1
    item 7)."""
    pytest.importorskip("lameref")
    from mp3tpu.pipeline import decode_files
    mp3b = fixtures.lame_fixture("transients", ch=2, bitrate=128,
                                 mode="jstereo")
    singles = [decode_file(m)[0] for m in (mp3, mp3b)]
    batch = decode_files([mp3, mp3b])
    for (pcm, sr), ref in zip(batch, singles):
        assert len(pcm) == len(ref), (len(pcm), len(ref))
        d = np.abs(pcm.astype(np.int32) - ref.astype(np.int32))
        assert d.max() <= 1 and (d == 0).mean() > 0.99


def test_scheduler_pipelines_dispatch_before_route(mp3):
    """P4: run() must dispatch window w+1 before materializing window w
    — the host pack of the next step overlaps the device compute of the
    current one (VERDICT round-1 item 3)."""
    sched = StreamScheduler(n_slots=2, win=8, sample_rate=44100)
    snk = CollectSink()
    sched.submit(mp3, sink=snk, stream_id=0, apply_gapless=False)
    sched.run()
    tr = sched.trace
    assert len(tr) >= 6  # multi-window run
    pos = {ev: i for i, ev in enumerate(tr)}
    n_windows = sum(1 for kind, _ in tr if kind == "dispatch")
    for w in range(n_windows - 1):
        assert pos[("dispatch", w + 1)] < pos[("route", w)], tr
    # and the pipelined decode is still correct
    ref, _ = decode_file(mp3, gapless=False)
    n = min(len(snk.pcm), len(ref))
    d = np.abs(snk.pcm[:n].astype(np.int32) - ref[:n].astype(np.int32))
    assert n > 50000 and d.max() <= 1 and (d == 0).mean() > 0.99


def test_scheduler_elastic_refill(mp3):
    """More streams than slots: slots must drain and refill."""
    sched = StreamScheduler(n_slots=2, win=16, sample_rate=44100)
    sinks = [CollectSink() for _ in range(5)]
    for i, snk in enumerate(sinks):
        sched.submit(mp3, sink=snk, stream_id=i, apply_gapless=False)
    sched.run()
    ref, _ = decode_file(mp3, gapless=False)
    for snk in sinks:
        n = min(len(snk.pcm), len(ref))
        d = np.abs(snk.pcm[:n].astype(np.int32) - ref[:n].astype(np.int32))
        assert d.max() <= 1 and (d == 0).mean() > 0.99
    assert sched.metrics.streams_finished == 5


def test_scheduler_checkpoint_resume():
    """SURVEY.md §5.4: a batch decode checkpointed mid-run and resumed
    on a FRESH scheduler produces bit-identical remaining output, and
    checkpoint+resume output equals the uninterrupted run."""
    import numpy as np
    from mp3tpu.player.scheduler import StreamScheduler, gapless_bounds_of
    from mp3tpu.player.sink import CollectSink
    import fixtures

    datas = {}
    for i, name in enumerate(["sweep", "transients", "tonal"]):
        kw = {} if name == "tonal" else {"ch": 2}
        datas[f"s{i}"] = fixtures.lame_fixture(name, bitrate=128,
                                               mode="jstereo", **kw)

    def build():
        sched = StreamScheduler(n_slots=2, win=8, sample_rate=44100)
        sinks = {}
        for sid, d in datas.items():
            sinks[sid] = CollectSink()
            sched.submit(d, sink=sinks[sid], stream_id=sid)
        return sched, sinks

    # uninterrupted reference
    ref_sched, ref_sinks = build()
    ref_sched.run()
    ref = {sid: np.asarray(s.pcm) for sid, s in ref_sinks.items()}

    # run a few windows, snapshot, resume on a FRESH scheduler
    sched, sinks = build()
    snaps = []
    sched.run(max_steps=3, checkpoint_every=3,
              on_checkpoint=lambda s: snaps.append(s))
    assert snaps, "checkpoint callback did not fire"
    head = {sid: np.asarray(s.pcm) for sid, s in sinks.items()}

    resumed = StreamScheduler(n_slots=2, win=8, sample_rate=44100)
    tail_sinks = {}

    def sink_for(sid):
        tail_sinks[sid] = CollectSink()
        return tail_sinks[sid]

    resumed.restore(snaps[-1], resolve=lambda sid: datas[sid],
                    sink_for=sink_for)
    resumed.run()
    for sid in datas:
        tail = (np.asarray(tail_sinks[sid].pcm)
                if sid in tail_sinks and len(tail_sinks[sid].pcm)
                else np.zeros((0, 2), np.int16))
        got = np.concatenate([head.get(sid, np.zeros((0, 2), np.int16)),
                              tail])
        assert got.shape == ref[sid].shape, (sid, got.shape, ref[sid].shape)
        assert np.array_equal(got, ref[sid]), sid


def test_decode_batch_fast_path_matches_single():
    """The packed fast path behind mp3tpu.decode_batch: exact lengths
    (gapless like single-file decode), <=1 LSB vs single decode (the
    cross-shape determinism contract), ragged batches, mono+stereo."""
    import numpy as np
    from mp3tpu.pipeline import decode_file, decode_files
    import fixtures

    st = fixtures.lame_fixture("sweep", ch=2, bitrate=128, mode="jstereo")
    mo = fixtures.lame_fixture("tonal", bitrate=96, mode="jstereo")
    out = decode_files([st, mo, st])
    for data, (pcm, sr) in zip((st, mo, st), out):
        ref, rsr = decode_file(data)
        assert sr == rsr
        pcm = np.asarray(pcm)
        ref = np.asarray(ref)
        assert pcm.shape == ref.shape, (pcm.shape, ref.shape)
        d = np.abs(pcm.astype(np.int32) - ref.astype(np.int32))
        assert d.max() <= 1
        assert (d == 0).mean() > 0.97


def test_decode_batch_fast_path_mpeg25():
    """LSF/MPEG-2.5 content through the batch fast path: the byte-
    exponent fallback chain must keep it <=1 LSB vs single decode."""
    import os
    import numpy as np
    import pytest
    from mp3tpu.pipeline import decode_file, decode_files
    p = ('/opt/venv/lib/python3.12/site-packages/pygame/examples/data/'
         'house_lo.mp3')
    if not os.path.exists(p):
        pytest.skip("real-world MPEG-2.5 sample unavailable")
    single = np.asarray(decode_file(p)[0])
    got = np.asarray(decode_files([p, p])[0][0])
    assert got.shape == single.shape
    d = np.abs(single.astype(np.int32) - got.astype(np.int32))
    assert d.max() <= 1 and (d == 0).mean() > 0.97


def test_decode_batch_fast_path_plane_fallback():
    """Dense 320 kbps content overflows the 4-bit sideband: the fast
    path must widen its packed planes transparently and still match
    single decode to <=1 LSB."""
    import numpy as np
    from mp3tpu.pipeline import decode_file, decode_files
    import fixtures
    hot = fixtures.lame_fixture("sweep", ch=2, bitrate=320, mode="stereo")
    ref = np.asarray(decode_file(hot)[0])
    got = np.asarray(decode_files([hot])[0][0])
    assert got.shape == ref.shape
    d = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert d.max() <= 1 and (d == 0).mean() > 0.97
