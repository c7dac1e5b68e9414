"""Short/mixed block conformance via crafted probes (SURVEY.md C3-C5).

LAME emits short/start/stop blocks (covered by fixture tests) but NEVER
mixed blocks, so the mixed paths (band maps, 36-line long region,
1-boundary alias, per-subband window split, mixed scalefactor layout)
are validated here against libmpg123 with hand-crafted frames.
"""
import numpy as np
import pytest

from mp3tpu.bitstream.unpack import unpack
from mp3tpu.oracle.decoder import decode_symbols
from mp3tpu.tables.sfb import SLEN1, SLEN2

craft = pytest.importorskip("craft")
from craft import GranuleSpec, craft_stream  # noqa: E402


def _compare(g, tol=5e-5):
    mpg123ref = pytest.importorskip("mpg123ref")
    st = craft_stream(g)
    ref, _ = mpg123ref.decode(st)
    mine = decode_symbols(unpack(st))
    n = min(len(ref), len(mine))
    assert n > 1000
    assert np.abs(ref[:n, 0] - mine[:n, 0]).max() < tol


PAIRS_12 = ("000" + "00") * 12
PAIRS_30 = ("000" + "00") * 30


def test_pure_short_block():
    _compare(GranuleSpec(part2_3_length=len(PAIRS_12), big_values=12,
                         window_switching=1, block_type=2, mixed_block_flag=0,
                         table_select=(1, 1, 0), main_bits=PAIRS_12))


@pytest.mark.parametrize("payload,bv", [(PAIRS_12, 12), (PAIRS_30, 30)])
def test_mixed_block(payload, bv):
    _compare(GranuleSpec(part2_3_length=len(payload), big_values=bv,
                         window_switching=1, block_type=2, mixed_block_flag=1,
                         table_select=(1, 1, 0), main_bits=payload))


def test_short_block_subblock_gains():
    _compare(GranuleSpec(part2_3_length=len(PAIRS_30), big_values=30,
                         window_switching=1, block_type=2, mixed_block_flag=0,
                         subblock_gain=(1, 2, 0), table_select=(1, 1, 0),
                         main_bits=PAIRS_30))


def test_mixed_block_with_scalefactors():
    s1, s2 = int(SLEN1[9]), int(SLEN2[9])
    bits = "".join(format(v % (1 << s1), f"0{s1}b") for v in [1, 2, 3, 0, 1, 2, 3, 0])
    bits += "".join(format(v % (1 << s1), f"0{s1}b") for v in range(9))
    bits += "".join(format(v % (1 << s2), f"0{s2}b") for v in range(18))
    _compare(GranuleSpec(part2_3_length=len(bits) + len(PAIRS_30), big_values=30,
                         window_switching=1, block_type=2, mixed_block_flag=1,
                         scalefac_compress=9, table_select=(1, 1, 0),
                         main_bits=bits + PAIRS_30))
