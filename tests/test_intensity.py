"""Intensity-stereo conformance via crafted probe streams (SURVEY.md C2).

No real-world encoder emits intensity stereo (LAME never does), so the
only way to validate it is hand-crafted joint-stereo frames compared
against the reference decoder. These probes established empirically:
  * intensity coefficients follow the tan(is_pos*pi/12) scheme and are
    NEVER scaled by 1/sqrt2, even in MS+intensity frames;
  * is_pos == 7 (illegal): passthrough in intensity-only frames, MS in
    MS+intensity frames;
  * bands below the right channel's zero boundary are LR / MS by frame
    mode; the boundary is respected per band.
"""
import numpy as np
import pytest

from mp3tpu.bitstream.unpack import unpack
from mp3tpu.oracle.decoder import decode_symbols
from mp3tpu.tables.sfb import SLEN1, SLEN2

craft = pytest.importorskip("craft")
from craft import GranuleSpec, craft_stream_stereo  # noqa: E402


def _ch0(pairs: int) -> GranuleSpec:
    payload = ("000" + "00") * pairs  # table-1 (1,1) pairs, positive
    return GranuleSpec(part2_3_length=len(payload), big_values=pairs,
                       table_select=(1, 1, 1), region0_count=6,
                       region1_count=7, main_bits=payload)


def _ch1_sf(positions, sfc=9) -> GranuleSpec:
    s1, s2 = int(SLEN1[sfc]), int(SLEN2[sfc])
    bits = "".join(format(p, f"0{s1}b") for p in positions[:11])
    bits += "".join(format(p, f"0{s2}b") for p in positions[11:21])
    return GranuleSpec(part2_3_length=len(bits), big_values=0,
                       scalefac_compress=sfc, main_bits=bits)


def _compare(gr_pair, mode_ext, tol=5e-5):
    mpg123ref = pytest.importorskip("mpg123ref")
    stream = craft_stream_stereo(gr_pair, mode=1, mode_ext=mode_ext)
    ref, _ = mpg123ref.decode(stream)
    mine = decode_symbols(unpack(stream))
    n = min(len(ref), len(mine))
    assert n > 1000
    assert np.abs(ref[:n] - mine[:n]).max() < tol


POS = [1, 2, 0, 3, 1, 2, 0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 0, 1, 2, 3, 1]


@pytest.mark.parametrize("mode_ext", [0b01, 0b10, 0b11])
def test_joint_stereo_modes(mode_ext):
    _compare((_ch0(10), _ch1_sf(POS)), mode_ext)


@pytest.mark.parametrize("mode_ext", [0b01, 0b11])
def test_illegal_position(mode_ext):
    # sfc=4: slen1=3 bits so is_pos=7 (illegal) is expressible
    bits = "".join(format(7, "03b") for _ in range(11))
    g1 = GranuleSpec(part2_3_length=len(bits), big_values=0,
                     scalefac_compress=4, main_bits=bits)
    _compare((_ch0(10), g1), mode_ext)


@pytest.mark.parametrize("mode_ext", [0b01, 0b11])
def test_partial_zero_boundary(mode_ext):
    """Right channel occupies low bands: those stay LR/MS, bands above
    its zero boundary become intensity."""
    sf = _ch1_sf(POS)
    payload1 = ("000" + "00") * 3
    g1 = GranuleSpec(part2_3_length=sf.part2_3_length + len(payload1),
                     big_values=3, scalefac_compress=9,
                     table_select=(1, 1, 1), region0_count=6, region1_count=7,
                     main_bits=sf.main_bits + payload1)
    _compare((_ch0(10), g1), mode_ext)


# ---------------------------------------------------------------- LSF

def _lsf_ch0(pairs=10):
    payload = ("000" + "00") * pairs
    return GranuleSpec(part2_3_length=len(payload), big_values=pairs,
                       table_select=(1, 1, 1), region0_count=6,
                       region1_count=7, main_bits=payload)


def _lsf_ch1(positions, intensity_scale):
    """LSF intensity channel: scalefac_compress = (129<<1)|scale gives
    slen (3,3,3) with nsfb (7,7,7,0) — 21 three-bit is_pos values."""
    sfc = (129 << 1) | intensity_scale
    bits = "".join(format(p, "03b") for p in positions[:21])
    return GranuleSpec(part2_3_length=len(bits), big_values=0,
                       scalefac_compress=sfc, main_bits=bits)


def _compare_lsf(gr_pair, mode_ext, tol=5e-5):
    mpg123ref = pytest.importorskip("mpg123ref")
    from craft import craft_stream_lsf_stereo
    stream = craft_stream_lsf_stereo(gr_pair, mode=1, mode_ext=mode_ext)
    ref, rate = mpg123ref.decode(stream)
    assert rate == 22050
    mine = decode_symbols(unpack(stream))
    n = min(len(ref), len(mine))
    assert n > 1000
    assert np.abs(ref[:n] - mine[:n]).max() < tol


@pytest.mark.parametrize("isc", [0, 1])
def test_lsf_intensity_scales(isc):
    """io = 2^(-(isc+1)/4); odd is_pos scales L, even scales R —
    probe-verified against libmpg123 for all positions 0..6."""
    _compare_lsf((_lsf_ch0(), _lsf_ch1([1, 2, 3, 4, 0, 5, 6] + [1] * 14, isc)),
                 0b01)


def test_lsf_ms_plus_intensity():
    _compare_lsf((_lsf_ch0(), _lsf_ch1([1, 2, 3, 4, 0, 5, 6] + [1] * 14, 0)),
                 0b11)


@pytest.mark.parametrize("mode_ext", [0b01, 0b11])
def test_lsf_illegal_position(mode_ext):
    """LSF illegal marker = (1<<slen)-1 = 7 for 3-bit scalefactors."""
    _compare_lsf((_lsf_ch0(), _lsf_ch1([7] * 21, 0)), mode_ext)
