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
