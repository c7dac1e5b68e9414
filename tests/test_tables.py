"""Structural validation of the spec tables (SURVEY.md §4.4 unit level)."""
import numpy as np
import pytest

from mp3tpu.tables import huffman, sfb, synth_window


def _all_tree_ids():
    return [t for t in range(32) if huffman.TABLE_INFO[t] is not None]


@pytest.mark.parametrize("tid", _all_tree_ids())
def test_huffman_complete_prefix_code(tid):
    lens, codes, xl, yl, _ = huffman.table_arrays(tid)
    if tid == 0:
        return
    assert len(lens) == xl * yl
    # Kraft equality: complete code
    assert abs(sum(2.0 ** -int(l) for l in lens) - 1.0) < 1e-12
    # prefix-freeness & distinctness
    as_bits = [format(int(c), f"0{int(l)}b") for c, l in zip(codes, lens)]
    assert len(set(as_bits)) == len(as_bits)
    for a in as_bits:
        for b in as_bits:
            if a is not b and len(a) < len(b):
                assert not b.startswith(a), (tid, a, b)
    assert max(lens) <= 19


def test_huffman_linbits():
    expect16 = {16: 1, 17: 2, 18: 3, 19: 4, 20: 6, 21: 8, 22: 10, 23: 13}
    expect24 = {24: 4, 25: 5, 26: 6, 27: 7, 28: 8, 29: 9, 30: 11, 31: 13}
    for t, lb in {**expect16, **expect24}.items():
        assert huffman.TABLE_INFO[t][3] == lb


def test_count1_tables():
    # complete prefix codes over 16 quadruples
    for lens, codes in [(huffman.COUNT1A_LENS, huffman.COUNT1A_CODES),
                        (huffman.COUNT1B_LENS, huffman.COUNT1B_CODES)]:
        assert abs(sum(2.0 ** -l for l in lens) - 1.0) < 1e-12
        bits = [format(c, f"0{l}b") for c, l in zip(codes, lens)]
        assert len(set(bits)) == 16


def test_sfb_tables_structure():
    for sr, tab in sfb.LONG.items():
        assert tab[0] == 0 and tab[-1] == 576 and len(tab) == 23
        assert (np.diff(tab) > 0).all()
    for sr, tab in sfb.SHORT.items():
        assert tab[0] == 0 and tab[-1] == 192 and len(tab) == 14
        assert (np.diff(tab) > 0).all()
    assert len(sfb.PRETAB) == 22
    assert len(sfb.SLEN1) == len(sfb.SLEN2) == 16


def test_synth_window_shape():
    w = synth_window.ENWINDOW_HALF_X65536
    assert w.shape == (257,)
    assert w[0] == 0 and abs(w[256]) == 75038
