"""Lockstep encoder machinery (vcount/vloop) vs the scalar reference:
row-for-row equality of bit counting, region splitting, and the
rate/distortion loops — the contract that makes the two-phase batched
bit allocation's predictions exact (encoder/__init__.py)."""
import numpy as np
import pytest

from mp3tpu.encoder.huffcode import (count_granule_bits, encode_granule,
                                     split_spectrum)
from mp3tpu.encoder.quantize import (IX_MAX, inner_rate_loop,
                                     outer_distortion_loop,
                                     outer_distortion_loop_short, quantize)
from mp3tpu.encoder import vcount, vloop

SR = 44100


def _rows(n=200, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        xr = rng.normal(0, rng.uniform(0.01, 2.0), 576) * \
            (rng.uniform(0, 1, 576) > 0.3)
        xr[rng.integers(20, 576):] = 0
        q = quantize(xr, int(rng.integers(120, 235)))
        if np.abs(q).max() <= IX_MAX:
            out.append(q)
    z = np.zeros(576, np.int32)
    out.append(z.copy())
    z[0] = 1
    out.append(z.copy())
    z[:] = 0
    z[574] = -1
    out.append(z.copy())
    z[:] = 1
    out.append(z.copy())
    z[:] = 0
    z[10] = 8000         # deep linbits escape
    out.append(z.copy())
    z[:] = 0
    z[:6] = [1, -1, 0, 1, 1, -1]
    out.append(z.copy())
    return np.stack(out)


def test_split_rows_equals_scalar():
    ix = _rows()
    bv, c1 = vcount.split_rows(ix)
    for i, row in enumerate(ix):
        sb, sc = split_spectrum(row)
        assert (sb, sc) == (bv[i], c1[i]), i


@pytest.mark.parametrize("bt", [0, 2])
def test_count_rows_equals_scalar(bt):
    ix = _rows()
    ref = np.array([count_granule_bits(r, SR, bt) for r in ix])
    got = vcount.count_bits_rows(ix, SR, bt)
    assert np.array_equal(ref, got)


def test_count_equals_emitted_length():
    """The allocator's reservoir replay relies on count == emission."""
    ix = _rows(60, seed=4)
    bits, sel = vcount.count_bits_rows_full(ix, SR, 0)
    for i, row in enumerate(ix):
        g = encode_granule(row, 180, SR, 0)
        assert g.part2_3_length == bits[i], i
        assert g.table_select == (sel["t0"][i], sel["t1"][i], sel["t2"][i]), i
        assert g.count1table_select == sel["c1table"][i], i


def test_inner_rate_rows_equals_scalar():
    rng = np.random.default_rng(1)
    R = 32
    xr = np.zeros((R, 576))
    for i in range(R):
        n = int(rng.integers(30, 576))
        xr[i, :n] = rng.normal(0, rng.uniform(0.05, 5.0), n)
    budgets = rng.integers(500, 3500, R)
    vix, vgg = vloop.inner_rate_rows(xr, budgets, SR, 0)
    for i in range(R):
        six, sgg = inner_rate_loop(xr[i], int(budgets[i]), SR, 0)
        assert sgg == vgg[i]
        assert np.array_equal(six, vix[i])


def test_outer_rows_equals_scalar():
    rng = np.random.default_rng(2)
    R = 24
    xr = np.zeros((R, 576))
    for i in range(R):
        n = int(rng.integers(30, 576))
        xr[i, :n] = rng.normal(0, rng.uniform(0.05, 5.0), n)
    budgets = rng.integers(500, 3500, R)
    xmin = np.abs(rng.normal(0, 1e-3, (R, 21))) * \
        10 ** rng.uniform(-3, 2, (R, 21))
    vix, vgg, vsf = vloop.outer_rows(xr, xmin, budgets, SR)
    for i in range(R):
        six, sgg, ssf = outer_distortion_loop(xr[i], xmin[i],
                                              int(budgets[i]), SR)
        assert sgg == vgg[i]
        assert np.array_equal(ssf, vsf[i])
        assert np.array_equal(six, vix[i])


def test_outer_rows_short_equals_scalar():
    rng = np.random.default_rng(3)
    R = 24
    xr = np.zeros((R, 576))
    for i in range(R):
        n = int(rng.integers(30, 576))
        xr[i, :n] = rng.normal(0, rng.uniform(0.05, 5.0), n)
    budgets = rng.integers(500, 3500, R)
    xmin = np.abs(rng.normal(0, 1e-3, (R, 3, 12))) * \
        10 ** rng.uniform(-3, 2, (R, 3, 12))
    vix, vgg, vsf, vsbg = vloop.outer_rows_short(xr, xmin, budgets, SR)
    for i in range(R):
        six, sgg, ssf, ssbg = outer_distortion_loop_short(
            xr[i], xmin[i], int(budgets[i]), SR)
        assert sgg == vgg[i]
        assert np.array_equal(ssf, vsf[i])
        assert np.array_equal(ssbg, vsbg[i])
        assert np.array_equal(six, vix[i])


def test_put_array_equals_put():
    from mp3tpu.bitstream.bitwriter import BitWriter
    rng = np.random.default_rng(5)
    lens = rng.integers(0, 14, 300)
    vals = np.array([int(rng.integers(0, 1 << L)) if L else 0 for L in lens])
    a = BitWriter()
    for v, L in zip(vals, lens):
        a.put(int(v), int(L))
    b = BitWriter()
    b.put_array(vals, lens)
    assert a.bits == b.bits
    assert a.to_bytes() == b.to_bytes()


def test_outer_rows_switched_equals_scalar():
    """Start/stop (bt 1/3) shaping: lockstep outer loop == scalar with
    the window-switched region split in the bit counter."""
    rng = np.random.default_rng(7)
    R = 16
    xr = np.zeros((R, 576))
    for i in range(R):
        n = int(rng.integers(30, 576))
        xr[i, :n] = rng.normal(0, rng.uniform(0.05, 5.0), n)
    budgets = rng.integers(500, 3500, R)
    xmin = np.abs(rng.normal(0, 1e-3, (R, 21))) * \
        10 ** rng.uniform(-3, 2, (R, 21))
    for bt in (1, 3):
        vix, vgg, vsf = vloop.outer_rows(xr, xmin, budgets, SR,
                                         block_type=bt)
        for i in range(R):
            six, sgg, ssf = outer_distortion_loop(
                xr[i], xmin[i], int(budgets[i]), SR, block_type=bt)
            assert sgg == vgg[i]
            assert np.array_equal(ssf, vsf[i])
            assert np.array_equal(six, vix[i])


def test_gathered_wire_packing_matches_eager():
    """The gathered dispatch path ships ix over the wire as an int8
    plane + COO escape sideband (D2H is the measured encode wall);
    reconstruction must be bit-exact vs the unpacked eager path —
    including rows with MANY |v|>127 escapes, which overflow the
    sideband and ride the raw-row patch (vloop_device._ESC_K)."""
    import jax.numpy as jnp
    from mp3tpu.encoder import vloop_device as vd
    rng = np.random.default_rng(9)
    R = 96
    xr = np.zeros((R, 576), np.float32)
    for i in range(R):
        n_loud = int(rng.integers(0, 40))  # up to ~40 potential escapes
        pos = rng.choice(288, n_loud, replace=False)
        xr[i, pos] = rng.uniform(200.0, 4000.0, n_loud) * \
            rng.choice([-1.0, 1.0], n_loud)
        xr[i] += rng.normal(0, 1.0, 576) * (rng.uniform(0, 1, 576) > 0.5)
    budgets = np.full(R, 3800, np.int64)
    idx = np.arange(R)
    xr_dev = jnp.asarray(xr)
    got = vd.rate_rows_gathered(xr_dev, idx, budgets, SR, 0)
    ref = vd.rate_rows_device(xr, budgets, SR, 0)
    for g, r, name in zip(got, ref, ("gg", "has", "ix", "bits", "ts", "c1")):
        assert np.array_equal(np.asarray(g), np.asarray(r)), name
    # the fixture really exercised the overflow patch
    n_esc = (np.abs(got[2]) > 127).sum(axis=1)
    assert (n_esc > vd._ESC_K).any(), "fixture produced no overflow rows"


def test_pack_unpack_ix_roundtrip():
    import jax.numpy as jnp
    from mp3tpu.encoder import vloop_device as vd
    rng = np.random.default_rng(4)
    ix = rng.integers(-120, 120, (64, 576)).astype(np.int16)
    ix[3, :10] = 8191          # escapes
    ix[3, 20:25] = -8000
    ix[7] = 0
    plane, pos, vals, nesc = vd._jit_pack_ix()(jnp.asarray(ix))
    out = vd._unpack_ix_host(np.asarray(plane), np.asarray(pos),
                             np.asarray(vals))
    assert np.array_equal(out, ix)
    assert int(np.asarray(nesc)[3]) == 15
