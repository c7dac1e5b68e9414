"""Property-based kernel tests (SURVEY.md §4.4: hypothesis)."""
import numpy as np
import pytest

hyp = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

from mp3tpu.bitstream.bits import BitReader
from mp3tpu.bitstream.huffdec import GranuleBits
from mp3tpu.oracle.decoder import requantize
from mp3tpu.tables import filterbank as fb
from mp3tpu.tables import maps as tmaps


@given(st.lists(st.tuples(st.integers(0, (1 << 24) - 1), st.integers(1, 24)),
                min_size=1, max_size=40))
@settings(max_examples=50, deadline=None)
def test_bitreader_roundtrip(fields):
    """Writing fields MSB-first and reading them back is the identity."""
    from mp3tpu.bitstream.bitwriter import BitWriter
    w = BitWriter()
    for v, n in fields:
        w.put(v & ((1 << n) - 1), n)
    data = w.to_bytes()
    r = BitReader(data)
    for v, n in fields:
        assert r.read(n) == (v & ((1 << n) - 1))
    g = GranuleBits(data, 0, len(data) * 8)
    for v, n in fields:
        assert g.read(n) == (v & ((1 << n) - 1))


@given(st.integers(0, 8206), st.integers(0, 8205))
@settings(max_examples=100, deadline=None)
def test_requantize_monotone(a, b):
    """|is| -> |xr| is strictly monotone at fixed exponent."""
    lo, hi = sorted((a, b))
    if lo == hi:
        hi += 1
    is_row = np.zeros(576, np.int32)
    is_row[0], is_row[1] = lo, hi
    exp_row = np.zeros(64, np.int32)
    bm = tmaps.get_maps(44100)[0][0]
    xr = requantize(is_row, exp_row, bm)
    assert abs(xr[1]) > abs(xr[0]) or lo == hi


@given(st.integers(0, 3).filter(lambda b: b != 2))
@settings(max_examples=4, deadline=None)
def test_imdct_tdac_roundtrip(bt):
    """forward MDCT then windowed IMDCT + overlap-add reconstructs
    (TDAC) for steady long-window sequences."""
    rng = np.random.default_rng(0)
    inv = fb.imdct_block_matrices()[0]      # steady-state: normal windows
    fwd = (4.0 / 36.0) * inv.T
    n = 6
    sub = rng.standard_normal((n, 18))      # subband time blocks
    # analysis: granule g sees [prev, cur]
    outs = []
    for g in range(1, n):
        wide = np.concatenate([sub[g - 1], sub[g]])
        X = wide @ fwd
        outs.append(X @ inv)                # [36]
    # overlap-add consecutive 36-blocks
    rec = np.zeros(18 * n)
    for g, z in enumerate(outs, start=1):
        rec[(g - 1) * 18: (g + 1) * 18] += z
    ref = sub.ravel()
    err = np.abs(rec[18:18 * (n - 1)] - ref[18:18 * (n - 1)]).max()
    assert err < 1e-9


def test_alias_matrix_orthogonal():
    """Alias butterflies are rotations: A @ A.T == I."""
    from mp3tpu.oracle.decoder import alias_reduce
    eye = np.eye(576)
    A = np.stack([alias_reduce(eye[r].reshape(32, 18), 31).ravel()
                  for r in range(576)])
    assert np.abs(A @ A.T - np.eye(576)).max() < 1e-12


def test_synthesis_fir_matches_fifo():
    """FIR reformulation == spec V-FIFO on random sequences."""
    from mp3tpu.oracle.synth import SynthFIFO
    G = fb.synthesis_fir()
    rng = np.random.default_rng(1)
    S = rng.standard_normal((40, 32))
    fifo = SynthFIFO(1)
    ref = np.stack([fifo.step(S[t][None])[0] for t in range(40)])
    out = np.zeros_like(ref)
    for t in range(40):
        for d in range(16):
            if t - d >= 0:
                out[t] += S[t - d] @ G[d]
    assert np.abs(out - ref).max() < 1e-9
