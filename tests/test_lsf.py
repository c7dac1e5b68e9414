"""LSF (MPEG-2 / MPEG-2.5) decode, end-to-end on EVERY host (VERDICT r4
task 4 / SURVEY.md §4.3): the fixtures are self-hosted — real spectral
content entropy-coded by our own Huffman emitter and wrapped in
hand-assembled LSF frames (fixtures.lsf_fixture) — so nothing here
depends on an external sample file. libmpg123 additionally anchors the
decode where the library is present; the oracle (f64 host reference)
and the public API paths are asserted unconditionally.
"""
import numpy as np
import pytest

import fixtures

LSF_RATES = (11025, 22050, 24000, 16000, 8000, 12000)


@pytest.mark.parametrize("sr", LSF_RATES)
def test_lsf_fixture_decodes_all_rates(sr):
    """Public decode at each MPEG-2 and MPEG-2.5 rate: right rate,
    right length (frames x 576 mono samples), audible, not clipped."""
    from mp3tpu.pipeline import decode_file
    mp3 = fixtures.lsf_fixture(sample_rate=sr, frames=12)
    pcm, got_sr = decode_file(mp3, output="float32")
    pcm = np.asarray(pcm)
    assert got_sr == sr
    assert len(pcm) == 12 * 576
    assert 0.01 < np.abs(pcm).max() < 1.0


@pytest.mark.parametrize("sr", (11025, 22050, 16000))
def test_lsf_fixture_vs_libmpg123(sr):
    """Trust-anchor parity on the self-hosted LSF streams (float path,
    tolerance as the MPEG-1 anchor tests)."""
    mpg123ref = pytest.importorskip("mpg123ref")
    from mp3tpu.pipeline import decode_file
    mp3 = fixtures.lsf_fixture(sample_rate=sr, frames=12)
    ref, rsr = mpg123ref.decode(mp3)
    assert rsr == sr
    pcm = np.asarray(decode_file(mp3, output="float32")[0])
    n = min(len(ref), len(pcm))
    assert n >= 11 * 576
    assert np.abs(ref[:n, 0] - pcm[:n, 0]).max() < 5e-5


def test_lsf_fixture_vs_oracle():
    """Device pipeline (public float path) vs the f64 oracle on LSF
    content (MPEG-2.5) — the oracle-parity contract (SURVEY.md F4)
    extended to a self-hosted LSF stream."""
    from mp3tpu.bitstream.unpack import unpack
    from mp3tpu.oracle.decoder import decode_symbols as oracle_decode
    from mp3tpu.pipeline import decode_file
    mp3 = fixtures.lsf_fixture(sample_rate=11025, frames=6)
    got = np.asarray(decode_file(mp3, output="float32")[0])
    ref = oracle_decode(unpack(mp3))
    n = min(len(got), len(ref))
    assert n >= 5 * 576
    assert np.abs(got[:n, 0] - ref[:n, 0]).max() < 3e-6


def test_decode_batch_fast_path_mpeg25_always():
    """LSF/MPEG-2.5 content through the batch fast path matches single
    decode — on the self-hosted fixture, so this NEVER skips."""
    from mp3tpu.pipeline import decode_file, decode_files
    mp3 = fixtures.lsf_fixture(sample_rate=11025, frames=12)
    single = np.asarray(decode_file(mp3)[0])
    outs = decode_files([mp3, mp3])
    for pcm, got_sr in outs:
        assert got_sr == 11025
        got = np.asarray(pcm)
        assert got.shape == single.shape
        d = np.abs(single.astype(np.int32) - got.astype(np.int32))
        assert d.max() <= 1 and (d == 0).mean() > 0.97
