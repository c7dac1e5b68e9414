"""Host unpack validation: exact Huffman bit-accounting on real-world and
LAME-encoded streams (SURVEY.md §4.4 integration level).

part2_3_length is an exact per-granule checksum of the scalefactor +
Huffman decode: any table or parser error desynchronizes it.
"""
import numpy as np
import pytest

from mp3tpu.bitstream.unpack import unpack

import fixtures

REAL_FILES = [
    "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.mp3",
    "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3",
]


def _assert_exact_accounting(st):
    full = st.lines_used >= 573
    bad = (st.huff_slack != 0) & ~full
    assert int(bad[:, : st.channels].sum()) == 0
    assert int((st.errors != 0).sum()) == 0


@pytest.mark.parametrize("path", REAL_FILES)
def test_real_world_bit_accounting(path):
    import os
    if not os.path.exists(path):
        pytest.skip("real-world file not present")
    st = unpack(open(path, "rb").read())
    _assert_exact_accounting(st)


@pytest.mark.parametrize("name,kw", [
    ("sweep", dict(ch=1, bitrate=128, mode="mono")),
    ("sweep", dict(ch=2, bitrate=128, mode="jstereo")),
    ("transients", dict(ch=2, bitrate=128, mode="jstereo")),
    ("sweep", dict(ch=2, vbr=True, mode="jstereo")),
    ("sweep", dict(ch=2, bitrate=128, mode="jstereo", sr=48000)),
    ("transients", dict(ch=2, bitrate=48, mode="jstereo", sr=32000)),
])
def test_lame_fixture_bit_accounting(name, kw):
    pytest.importorskip("lameref")
    st = unpack(fixtures.lame_fixture(name, **kw))
    _assert_exact_accounting(st)


def test_vbri_header_parse():
    """VBRI variant of the stream-info frame (A5): synthesized header."""
    import struct
    from mp3tpu.container.frames import parse_header
    from mp3tpu.container.xing import parse_stream_info
    # minimal MPEG-1 frame with a VBRI tag at header+36
    hdr = struct.pack(">I", (0x7FF << 21) | (0b11 << 19) | (0b01 << 17) |
                      (1 << 16) | (9 << 12) | (0 << 10) | (0b11 << 6))
    frame = bytearray(417)
    frame[:4] = hdr
    p = 4 + 32
    frame[p:p + 4] = b"VBRI"
    ents = 4
    frame[p + 4:p + 26] = struct.pack(">HHHIIHHHH", 1, 0, 80, 417 * 10, 10,
                                      ents, 1, 2, 2)
    struct.pack_into(">" + "H" * ents, frame, p + 26, 417, 417, 417, 417)
    h = parse_header(int.from_bytes(hdr, "big"))
    info = parse_stream_info(bytes(frame), 0, h)
    assert info.kind == "vbri"
    assert info.n_frames == 10 and info.n_bytes == 4170
    assert info.toc is not None and len(info.toc) == 100


def test_parallel_long_file_unpack_equals_serial():
    """SURVEY.md §5.7 host side: one long VBR file chunked at
    reservoir-safe frame boundaries and unpacked by a thread pool must
    be bit-identical to the serial whole-file unpack."""
    pytest.importorskip("lameref")
    import numpy as np
    import fixtures
    from mp3tpu.bitstream.source import unpack_parallel
    from mp3tpu.bitstream.unpack import unpack
    mp3 = fixtures.lame_fixture("sweep", ch=2, vbr=True, mode="jstereo",
                                seconds=8.0)
    ref = unpack(mp3)
    got = unpack_parallel(mp3, chunk_granules=64, max_workers=4)
    for f in ("is_", "exp", "block_type", "mixed", "smode", "errors",
              "huff_slack", "lines_used"):
        assert np.array_equal(getattr(got, f), getattr(ref, f)), f
    assert got.n_granules == ref.n_granules
