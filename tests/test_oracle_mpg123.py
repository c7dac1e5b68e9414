"""Oracle decoder vs the reference decoder (libmpg123) — SURVEY.md §4.2.

The float64 oracle must reproduce mpg123's float output to float32
rounding precision on real-world files and LAME-encoded fixtures
covering mono/stereo/joint/MS/VBR/short-block/LSF material.
"""
import os

import numpy as np
import pytest

from mp3tpu.oracle.decoder import decode_symbols
from mp3tpu.pipeline import load_symbols

import fixtures

TOL = 5e-6  # float32 output rounding + accumulation headroom


def _compare(mp3: bytes):
    import mpg123ref
    ref, _rate = mpg123ref.decode(mp3)
    # mpg123 skips a leading Xing/Info metadata frame AND applies the
    # LAME-tag gapless trim — mirror both so the streams align
    st, info, _ = load_symbols(mp3)
    mine = decode_symbols(st)
    if info.gapless:
        from mp3tpu.dsp.gapless import gapless_bounds
        a, b = gapless_bounds(len(mine), info.encoder_delay,
                              info.encoder_padding)
        mine = mine[a:b]
    n = min(len(ref), len(mine))
    assert n > 0
    d = np.abs(ref[:n] - mine[:n])
    assert d.max() < TOL, d.max()


def test_real_world_house_lo():
    p = "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.mp3"
    if not os.path.exists(p):
        pytest.skip("file not present")
    _compare(open(p, "rb").read())


@pytest.mark.parametrize("name,kw", [
    ("sweep", dict(ch=1, bitrate=128, mode="mono")),
    ("sweep", dict(ch=2, bitrate=128, mode="jstereo")),
    ("transients", dict(ch=2, bitrate=128, mode="jstereo")),
    ("tonal", dict(bitrate=96, mode="jstereo", force_ms=True)),
    ("sweep", dict(ch=2, vbr=True, mode="jstereo")),
    ("sweep", dict(ch=2, bitrate=64, mode="jstereo", sr=22050)),
])
def test_oracle_matches_mpg123(name, kw):
    pytest.importorskip("mpg123ref")
    pytest.importorskip("lameref")
    _compare(fixtures.lame_fixture(name, **kw))
