"""CLI surface tests (src/mp3tpu/cli.py): every subcommand except
bench driven end-to-end through main(argv) on generated fixtures."""
import json
import wave

import numpy as np
import pytest

from mp3tpu import cli

import fixtures


@pytest.fixture(scope="module")
def mp3_path(tmp_path_factory):
    pytest.importorskip("lameref")
    p = tmp_path_factory.mktemp("cli") / "bursts.mp3"
    p.write_bytes(fixtures.lame_fixture("bursts", ch=2, bitrate=128,
                                        mode="jstereo"))
    return str(p)


def _last_json(capsys):
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_info(mp3_path, capsys):
    cli.main(["info", mp3_path])
    d = _last_json(capsys)
    assert d["sample_rate"] == 44100 and d["channels"] == 2
    assert d["version"] == "MPEG-1" and d["gapless"]
    assert d["decode_errors"] == 0


def test_decode(mp3_path, tmp_path, capsys):
    out = str(tmp_path / "out.wav")
    cli.main(["decode", mp3_path, "-o", out])
    capsys.readouterr()
    w = wave.open(out)
    assert w.getframerate() == 44100 and w.getnchannels() == 2
    assert w.getnframes() > 3.0 * 44100


def test_play_loop_to_wav(mp3_path, tmp_path, capsys):
    out = str(tmp_path / "loop.wav")
    cli.main(["play", mp3_path, "--loop", "0.3:0.8", "--times", "2",
              "-o", out])
    d = _last_json(capsys)
    assert d["metrics"]["samples_out"] == 2 * int(0.5 * 44100)
    w = wave.open(out)
    assert w.getnframes() == 2 * int(0.5 * 44100)


def test_play_segment_slow(mp3_path, tmp_path, capsys):
    from mp3tpu.dsp.timestretch import N_FFT
    out = str(tmp_path / "seg.wav")
    cli.main(["play", mp3_path, "--segments"])
    segs = _last_json(capsys)["segments"]
    assert len(segs) == len(fixtures.BURST_SPANS)
    cli.main(["play", mp3_path, "--segment", "0", "--speed", "0.5",
              "-o", out])
    capsys.readouterr()
    span = segs[0][1] - segs[0][0]
    w = wave.open(out)
    assert abs(w.getnframes() - span * 44100 / 0.5) <= N_FFT


def test_transcode_subcommand(mp3_path, tmp_path, capsys):
    """Batched re-encode at a new bitrate through the device-resident
    handle path: outputs decode to the same audio."""
    cli.main(["transcode", mp3_path, "-b", "96", "-d", str(tmp_path)])
    d = _last_json(capsys)
    assert len(d["outputs"]) == 1
    import mp3tpu
    p0, r0 = mp3tpu.decode(mp3_path)
    p1, r1 = mp3tpu.decode(d["outputs"][0])
    assert r1 == r0
    n = min(len(p0), len(p1))
    a = p0[:n].astype(np.float64)
    b = p1[:n].astype(np.float64)
    ref = np.sqrt(np.mean(a ** 2)) + 1e-9
    assert np.sqrt(np.mean((a - b) ** 2)) / ref < 0.25


def test_practice_subcommand(mp3_path, tmp_path, capsys):
    """The whole study session as one command: every sentence x2 with
    a 0.1 s shadowing gap, written to a WAV."""
    out = str(tmp_path / "practice.wav")
    cli.main(["practice", mp3_path, "--times", "2", "--gap", "0.1",
              "-o", out])
    d = _last_json(capsys)
    assert len(d["sentences"]) == len(fixtures.BURST_SPANS)
    assert d["times"] == 2 and d["speed"] == 1.0
    sr, gap = 44100, int(0.1 * 44100)
    expect = sum(2 * (int(round(b * sr)) - int(round(a * sr))) + 2 * gap
                 for a, b in d["sentences"])
    w = wave.open(out)
    # sentences are reported rounded to 1 ms: up to ~23 samples of slop
    # per played edge (2 edges x 2 times x 3 sentences)
    assert abs(w.getnframes() - expect) <= 23 * 2 * 2 * len(d["sentences"])


def test_play_queue(mp3_path, tmp_path, capsys):
    out = str(tmp_path / "q.wav")
    cli.main(["play", mp3_path, mp3_path, "-o", out])
    d = _last_json(capsys)
    assert d["tracks"] == 2
    w = wave.open(out)
    assert w.getnframes() > 6.5 * 44100  # two gapless 3.7 s tracks


def test_play_queue_flag_conflict(mp3_path):
    with pytest.raises(SystemExit):
        cli.main(["play", mp3_path, mp3_path, "--seek", "1.0"])


def test_segments_subcommand(mp3_path, capsys):
    cli.main(["segments", mp3_path])
    d = _last_json(capsys)
    assert len(d[mp3_path]) == len(fixtures.BURST_SPANS)


def test_encode_roundtrip(mp3_path, tmp_path, capsys):
    wav = str(tmp_path / "in.wav")
    cli.main(["decode", mp3_path, "-o", wav])
    capsys.readouterr()
    out = str(tmp_path / "re.mp3")
    cli.main(["encode", wav, "-o", out, "-b", "128"])
    capsys.readouterr()
    cli.main(["info", out])
    d = _last_json(capsys)
    assert d["sample_rate"] == 44100 and d["decode_errors"] == 0
    assert abs(d["duration_s"] - 3.7) < 0.1

def test_loudness_subcommand(mp3_path, capsys):
    cli.main(["loudness", mp3_path, "--target", "-14"])
    d = _last_json(capsys)
    t = d["tracks"][mp3_path]
    assert t["peak_db"] > t["loudness_db"]     # peak above mean-square
    assert t["gain_db"] <= max(0.0, -t["peak_db"]) + 1e-6  # clipping-safe
    # API surface agrees with the CLI numbers
    import mp3tpu
    ld, pk = mp3tpu.levels(mp3_path)
    assert abs(ld - t["loudness_db"]) < 0.01
    assert abs(pk - t["peak_db"]) < 0.01


def test_split_subcommand(mp3_path, tmp_path, capsys):
    cli.main(["split", mp3_path, "-d", str(tmp_path), "-f", "wav"])
    d = _last_json(capsys)
    assert len(d["clips"]) == len(fixtures.BURST_SPANS)
    w = wave.open(d["clips"][0])
    assert w.getframerate() == 44100 and w.getnframes() > 0
