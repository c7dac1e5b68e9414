"""C++ fast-path unpacker must produce bit-identical SymbolTensors to the
pure-Python reference path (SURVEY.md B2/B4 fallback contract)."""
import numpy as np
import pytest

from mp3tpu.bitstream.native import unpack_native, available
from mp3tpu.bitstream.unpack import unpack

import fixtures

FIELDS = ("is_", "exp", "block_type", "mixed", "smode", "errors",
          "huff_slack", "lines_used")


@pytest.mark.parametrize("name,kw", [
    ("sweep", dict(ch=2, bitrate=128, mode="jstereo")),
    ("transients", dict(ch=2, bitrate=128, mode="jstereo")),
    ("tonal", dict(bitrate=96, mode="jstereo", force_ms=True)),
    ("sweep", dict(ch=2, vbr=True, mode="jstereo")),
    ("sweep", dict(ch=1, bitrate=128, mode="mono")),
    ("sweep", dict(ch=2, bitrate=64, mode="jstereo", sr=22050)),
])
def test_native_identical(name, kw):
    if not available():
        pytest.skip("native unpacker unavailable")
    mp3 = fixtures.lame_fixture(name, **kw)
    a, b = unpack(mp3), unpack_native(mp3)
    for f in FIELDS:
        assert np.array_equal(getattr(a, f), getattr(b, f)), f
    assert (a.sample_rate, a.channels, a.version) == (b.sample_rate, b.channels, b.version)


# ---- windowed incremental unpack (SURVEY.md §3.3; VERDICT r1 item 4) ----

def _windowed_py(mp3, window_frames):
    from mp3tpu.bitstream.unpack import WindowedUnpacker
    u = WindowedUnpacker(mp3)
    chunks = []
    while u.cursor < u.n_frames:
        chunks.append(u.unpack_frames(min(u.cursor + window_frames, u.n_frames)))
    return chunks


@pytest.mark.parametrize("wf", [1, 7, 16])
def test_windowed_python_equals_wholefile(wf):
    pytest.importorskip("lameref")
    mp3 = fixtures.lame_fixture("transients", ch=2, bitrate=128, mode="jstereo")
    ref = unpack(mp3)
    chunks = _windowed_py(mp3, wf)
    for f in FIELDS:
        got = np.concatenate([getattr(c, f) for c in chunks])
        assert np.array_equal(got, getattr(ref, f)), (wf, f)


def test_windowed_native_equals_wholefile():
    if not available():
        pytest.skip("native unpacker unavailable")
    pytest.importorskip("lameref")
    from mp3tpu.bitstream.native import NativeWindowState, unpack_native_window
    from mp3tpu.bitstream.unpack import WindowedUnpacker
    mp3 = fixtures.lame_fixture("transients", ch=2, bitrate=128, mode="jstereo")
    ref = unpack(mp3)
    nfr = WindowedUnpacker(mp3).n_frames
    st = NativeWindowState()
    chunks = []
    f0 = 0
    while f0 < nfr:
        f1 = min(f0 + 16, nfr)
        c = unpack_native_window(mp3, f0, f1, st)
        assert c is not None
        chunks.append(c)
        f0 = f1
    for f in FIELDS:
        got = np.concatenate([getattr(c, f) for c in chunks])
        assert np.array_equal(got, getattr(ref, f)), f


def test_midstream_restart_is_exact():
    """restart_at(f) (reservoir re-seed, no decode) must reproduce the
    exact rows of a sequential whole-file unpack — the seek path."""
    pytest.importorskip("lameref")
    from mp3tpu.bitstream.unpack import WindowedUnpacker
    mp3 = fixtures.lame_fixture("sweep", ch=2, bitrate=128, mode="jstereo")
    ref = unpack(mp3)
    u = WindowedUnpacker(mp3)
    for f0 in (3, 17, 40):
        u.restart_at(f0)
        mid = u.unpack_frames(min(f0 + 8, u.n_frames))
        for f in FIELDS:
            a = getattr(mid, f)
            b = getattr(ref, f)[f0 * 2: f0 * 2 + len(a)]
            assert np.array_equal(a, b), (f0, f)


def test_symbol_source_random_access_and_stats():
    """SymbolSource: random granule ranges match whole-file rows; a
    fresh source that reads one window has done O(window) host work."""
    pytest.importorskip("lameref")
    from mp3tpu.bitstream.source import SymbolSource
    mp3 = fixtures.lame_fixture("transients", ch=2, bitrate=128, mode="jstereo")
    ref = unpack(mp3)
    src = SymbolSource(mp3)
    for g0, g1 in ((0, 32), (32, 64), (10, 42), (100, 101), (0, 16)):
        ck = src.granules(g0, g1)
        for f in FIELDS:
            assert np.array_equal(getattr(ck, f), getattr(ref, f)[g0:g1]), (g0, g1, f)
    fresh = SymbolSource(mp3)
    fresh.granules(0, 32)
    assert fresh.granules_unpacked <= 32  # O(window), not O(file)
