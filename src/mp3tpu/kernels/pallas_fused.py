"""Pallas fused granule front-end (SURVEY.md §7.3 M7).

Fuses C1-C4 for a tile of granule-pairs with everything resident in
VMEM: requantize (exp2/log2-seeded Newton x^4/3, band exponents via
one-hot matmul), the FULL stereo stage (palette one-hot -> 2x2 mixing
rows -> band->line expansion — previously XLA-side prep that
materialized an [S*G, 3, 576, 4] HBM tensor), and the composed
reorder+alias [576,576] constant matmul, flavor-predicated (pl.when)
so all-long tiles run 1 matmul instead of 3.

Per-row HBM traffic: 576 B spectrum + 128 B exponents + ~0.5 KB of
band mixing rows in, 2.3 KB natural-order spectrum out — the earlier
revision streamed a 9.2 KB/row pre-expanded mixing tensor from XLA
(the [S*G, 3, 576, 4] m_flav chain), which is why it lost to the
plain XLA path by ~15%.

Constants in VMEM: 3x[576,576] RA (4 MB), band one-hots (442 KB) —
inside the 16 MB budget with a TILE=64-pair working set (TILE=256
exceeds scoped VMEM; TILE=128 measured slower).

STATUS: RETIRED EXPERIMENT (SURVEY.md §7.3 M7 "win or retire" —
retired, with the measurements that decided it).

Round-2 measurement (v5e, [256 x 32] windows, interleaved min-of-6):
isolated front-end C1-C4: Pallas 5.0 ms vs XLA 5.8 ms (the kernel
itself wins); FULL pipeline: ~5-7% behind — XLA's global fusion of
the back-end (IMDCT/overlap-add/synthesis) with the front-end beats
the kernel-boundary materialization of the natural-order spectrum.

Round-3 extension (fused_pipeline_z below): the IMDCT was folded INTO
the kernel as a composed [576, 1152] block-diagonal constant matmul
per flavor (see the comment block above fused_pipeline_z) so Mosaic
never sees a lane reshape — the hypothesis was that removing the
kernel/XLA boundary before C5 would flip the sign. Measured
(tools/pallas_timing.py, real v5e, [256 x 32] windows, min-of-6,
sweep fixture with short blocks present):

    XLA    full pipeline: 36.2 ms  (2958x realtime)
    Pallas full pipeline: 38.6 ms  (2771x realtime)   1.067x slower
    parity: max 3 int16 LSB, 4.8% of samples > 1 LSB

Why it loses: composing RA (576x576) with the block-diagonal IMDCT
(576x1152) makes each flavor matmul 2x the FLOPs of XLA's RA matmul,
and the tiny per-subband 18->36 IMDCT einsums the composition
replaces are nearly free in XLA's fusion — so when short blocks are
present the kernel does ~2x the MXU work to save HBM traffic the
pipeline doesn't pay anyway at these sizes. Parity also degrades to
3 LSB (MXU accumulation order over 1152-wide rows), outside the
<=1 LSB contract every production path honors.

Verdict: the XLA path IS the production path (there is no env
toggle); `granule_pipeline(..., use_pallas=True)` remains only so
tests/test_pallas.py can re-measure parity if the kernel is ever
revisited. The decode bench wall is host unpack, not device compute
(BENCH_r02 detail) — device-side wins of this size are not where the
next 2x lives.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 64  # granule-pairs per program (128 rows)


def _kernel(is_ref, e_ref, fl_ref, mb_ref, flm_ref,
            ra0_ref, ra1_ref, ra2_ref, bandoh_ref, nat_ref):
    """One tile: [T2=TILE*2 rows, 576] spectrum -> natural-order,
    alias-reduced spectrum [T2, 576] (C1-C4 fused in VMEM)."""
    f32 = jnp.float32
    HI = jax.lax.Precision.HIGHEST
    iv = is_ref[:].astype(f32)                       # [T2, 576]
    # --- requantize (cbrt has no Pallas TPU lowering: exp2/log2 seed +
    # two Newton steps converge to the same fixed point as the XLA path)
    a = jnp.abs(iv)
    safe = jnp.maximum(a, 1e-30)
    y = jnp.exp2(jnp.log2(safe) * (1.0 / 3.0))
    for _ in range(2):
        y2 = y * y
        y = y - (y2 * y - safe) / (3.0 * y2)
    y = jnp.where(a > 0, y, 0.0)
    mag = a * y
    # band exponents: e [T2, 64] -> per line, flavor-selected expansion
    fl = fl_ref[:]                                   # [T2, 1] int32
    ef = e_ref[:].astype(f32)
    e0 = jnp.dot(ef, bandoh_ref[0], preferred_element_type=f32, precision=HI)
    e1 = jnp.dot(ef, bandoh_ref[1], preferred_element_type=f32, precision=HI)
    e2 = jnp.dot(ef, bandoh_ref[2], preferred_element_type=f32, precision=HI)
    e_line = jnp.where(fl == 0, e0, jnp.where(fl == 1, e1, e2))
    xr = jnp.sign(iv) * mag * jnp.exp2(0.25 * e_line)

    # --- stereo: per-band 2x2 mixing rows arrive as [TILE*4, 64]
    # (palette lookup is a small XLA-side einsum); the HEAVY band->line
    # expansion — a [TILE*4, 64] x [64, 576] matmul per flavor, selected
    # by the pair's channel-0 flavor — runs here in VMEM. (The previous
    # revision expanded lines in XLA and streamed 9.2 KB/row of mixing
    # tensor into the kernel, which is why it lost to plain XLA.)
    mb = mb_ref[:]                                   # [TILE*4, 64]
    # all three 64-deep expansions are cheap next to the 576x576 RA
    # matmuls; compute-and-select keeps the kernel branch-free here
    m0 = jnp.dot(mb, bandoh_ref[0], preferred_element_type=f32, precision=HI)
    m1 = jnp.dot(mb, bandoh_ref[1], preferred_element_type=f32, precision=HI)
    m2 = jnp.dot(mb, bandoh_ref[2], preferred_element_type=f32, precision=HI)
    # flavor column per mb row arrives pre-replicated from XLA (lane-
    # dim reshapes and 2-minor-dim broadcasts are unsupported by Mosaic)
    flm = flm_ref[:]                                 # [TILE*4, 1]
    m_line = jnp.where(flm == 0, m0, jnp.where(flm == 1, m1, m2))
    mp = m_line.reshape(TILE, 4, 576)
    xp = xr.reshape(TILE, 2, 576)
    x0 = xp[:, 0]
    x1 = xp[:, 1]
    l = mp[:, 0] * x0 + mp[:, 1] * x1
    r = mp[:, 2] * x0 + mp[:, 3] * x1
    xr = jnp.stack([l, r], axis=1).reshape(TILE * 2, 576)

    # --- reorder+alias: flavor-selected constant matmul. Long blocks
    # dominate real content, so short/mixed matmuls are predicated out
    # for all-long tiles (pl.when) — 1 matmul instead of 3.
    nat_ref[:] = jnp.dot(xr, ra0_ref[:], preferred_element_type=f32,
                         precision=HI)

    @pl.when(jnp.any(fl != 0))
    def _():
        n1 = jnp.dot(xr, ra1_ref[:], preferred_element_type=f32, precision=HI)
        n2 = jnp.dot(xr, ra2_ref[:], preferred_element_type=f32, precision=HI)
        nat_ref[:] = jnp.where(fl == 0, nat_ref[:],
                               jnp.where(fl == 1, n1, n2))


@functools.lru_cache(maxsize=None)
def _fused_call(sample_rate: int):
    from .pipeline import build_tables
    t = build_tables(sample_rate)
    # constants stay numpy: pallas_call embeds them per-trace, avoiding
    # cached-tracer leaks when the first call happens under jit
    band_oh = np.asarray(t.band_oh)                  # [3,64,576]
    ra = np.asarray(t.ra)
    consts = dict(ra0=ra[0], ra1=ra[1], ra2=ra[2], bandoh=band_oh)

    def call(is_rows, e_rows, fl_rows, mb_rows, flm_rows):
        R = is_rows.shape[0]         # rows = 2 * granule-pairs
        tiles = R // (2 * TILE)
        grid = (tiles,)
        T2 = 2 * TILE
        bspec = lambda shape, rows: pl.BlockSpec(
            (rows,) + shape, lambda i: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM)
        cspec = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                         memory_space=pltpu.VMEM)
        consts_j = {k: jnp.asarray(v, jnp.float32) for k, v in consts.items()}
        out = pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[
                bspec((576,), T2), bspec((64,), T2),
                bspec((1,), T2), bspec((64,), TILE * 4),
                bspec((1,), TILE * 4),
                cspec(consts_j["ra0"]), cspec(consts_j["ra1"]),
                cspec(consts_j["ra2"]), cspec(consts_j["bandoh"]),
            ],
            out_specs=bspec((576,), T2),
            out_shape=jax.ShapeDtypeStruct((R, 576), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=R * 576 * 576 * 2,
                bytes_accessed=R * 576 * 8, transcendentals=R * 576 * 2),
        )(is_rows, e_rows, fl_rows, mb_rows, flm_rows,
          consts_j["ra0"], consts_j["ra1"], consts_j["ra2"],
          consts_j["bandoh"])
        return out

    return call


def fused_frontend(is_, exp, block_type, mixed, smode, tables, sample_rate: int):
    """Drop-in C1-C4 replacement: same inputs as granule_pipeline,
    returns the natural-order alias-reduced spectrum [S, G, 2, 576].
    XLA-side prep is only the small palette lookup ([.., 64, 4] band
    rows, 1 KB/pair) — the 64->576 line expansion runs in the kernel."""
    S, G = is_.shape[:2]
    bt = block_type.astype(jnp.int32)
    short = bt == 2
    fl = jnp.where(short, jnp.where(mixed, 2, 1), 0)

    # palette index -> 2x2 mixing rows per band (small einsum)
    oh = (smode[..., None] == jnp.arange(tables.palette4.shape[0])
          ).astype(jnp.float32)
    m_band = jnp.einsum("sgbp,pq->sgqb", oh, tables.palette4)   # [S,G,4,64]

    R = S * G * 2
    Rp = -(-R // (2 * TILE)) * (2 * TILE)  # pad rows to a tile multiple
    pad = lambda a: jnp.pad(a, ((0, Rp - R),) + ((0, 0),) * (a.ndim - 1))
    padm = lambda a: jnp.pad(a, ((0, Rp * 2 - S * G * 4),) +
                             ((0, 0),) * (a.ndim - 1))
    is_rows = pad(is_.reshape(R, 576))
    e_rows = pad(exp.reshape(R, 64))
    fl_rows = pad(fl.reshape(R, 1).astype(jnp.int32))
    mb_rows = padm(m_band.reshape(S * G * 4, 64))
    flm_rows = padm(jnp.repeat(fl[:, :, 0].reshape(S * G, 1), 4, axis=1)
                    .reshape(S * G * 4, 1).astype(jnp.int32))

    nat = _fused_call(sample_rate)(is_rows, e_rows, fl_rows, mb_rows,
                                   flm_rows)
    return nat[:R].reshape(S, G, 2, 576)


# ---------------------------------------------------------------------
# Full fusion through C5 (SURVEY.md §7.3 M7): reorder+alias AND the
# per-subband windowed IMDCT as ONE composed [576, 1152] constant
# matmul per flavor, so Mosaic never sees a lane-dim reshape — the
# [*, 576] -> [*, 32, 18] view that blocked extending the old kernel
# becomes a block-diagonal structure inside the constant:
#
#   z_row[36*sb + j] = sum_k v_row[18*sb + k] * IMDCT[k, j]
#   ==> z = v @ BD,  BD[576, 1152] block-diagonal (32 blocks [18, 36])
#   ==> z = xr @ (RA_flavor @ BD)            (composed once, f64, host)
#
# Window handling: long/start/stop share the UNWINDOWED IMDCT-36 and
# differ only in the 36-point window, which applies to the OUTPUT as
# an elementwise multiply by a 36-periodic row vector (w tiled x32) —
# so one composed matrix covers bt 0/1/3 and the window select is a
# cheap VPU where(). The short composite matrix is windowed internally
# (3 sub-MDCTs); the mixed matrix folds the bt-0 window into its two
# long subband blocks. XLA keeps C6-C7 (overlap-add is a scan-carried
# dependency along granules; synthesis FIR fuses fine there).

TILE_Z = 32  # granule-pairs per program for the z-kernel (64 rows);
#              3 x [576,1152] f32 constants = 8 MB of VMEM, so the
#              working set gets the smaller tile


def _kernel_z(is_ref, e_ref, fl_ref, bt_ref, mb_ref, flm_ref,
              c0_ref, c1_ref, c2_ref, bandoh_ref, w013_ref, z_ref):
    """One tile: [T2 rows, 576] spectrum -> windowed IMDCT output
    [T2, 1152] (C1-C5 fused in VMEM; subband-major 36-sample blocks)."""
    f32 = jnp.float32
    HI = jax.lax.Precision.HIGHEST
    iv = is_ref[:].astype(f32)
    a = jnp.abs(iv)
    safe = jnp.maximum(a, 1e-30)
    y = jnp.exp2(jnp.log2(safe) * (1.0 / 3.0))
    for _ in range(2):
        y2 = y * y
        y = y - (y2 * y - safe) / (3.0 * y2)
    y = jnp.where(a > 0, y, 0.0)
    mag = a * y
    fl = fl_ref[:]                                   # [T2, 1] int32
    ef = e_ref[:].astype(f32)
    e0 = jnp.dot(ef, bandoh_ref[0], preferred_element_type=f32, precision=HI)
    e1 = jnp.dot(ef, bandoh_ref[1], preferred_element_type=f32, precision=HI)
    e2 = jnp.dot(ef, bandoh_ref[2], preferred_element_type=f32, precision=HI)
    e_line = jnp.where(fl == 0, e0, jnp.where(fl == 1, e1, e2))
    xr = jnp.sign(iv) * mag * jnp.exp2(0.25 * e_line)

    mb = mb_ref[:]                                   # [T*4, 64]
    m0 = jnp.dot(mb, bandoh_ref[0], preferred_element_type=f32, precision=HI)
    m1 = jnp.dot(mb, bandoh_ref[1], preferred_element_type=f32, precision=HI)
    m2 = jnp.dot(mb, bandoh_ref[2], preferred_element_type=f32, precision=HI)
    flm = flm_ref[:]                                 # [T*4, 1]
    m_line = jnp.where(flm == 0, m0, jnp.where(flm == 1, m1, m2))
    mp = m_line.reshape(TILE_Z, 4, 576)
    xp = xr.reshape(TILE_Z, 2, 576)
    x0 = xp[:, 0]
    x1 = xp[:, 1]
    l = mp[:, 0] * x0 + mp[:, 1] * x1
    r = mp[:, 2] * x0 + mp[:, 3] * x1
    xr = jnp.stack([l, r], axis=1).reshape(TILE_Z * 2, 576)

    # ---- composed reorder+alias+IMDCT; window select for bt 0/1/3
    bt = bt_ref[:]                                   # [T2, 1] int32
    wrow = jnp.where(bt == 0, w013_ref[0:1],
                     jnp.where(bt == 1, w013_ref[1:2], w013_ref[2:3]))
    z_ref[:] = jnp.dot(xr, c0_ref[:], preferred_element_type=f32,
                       precision=HI) * wrow

    @pl.when(jnp.any(fl != 0))
    def _():
        z1 = jnp.dot(xr, c1_ref[:], preferred_element_type=f32, precision=HI)
        z2 = jnp.dot(xr, c2_ref[:], preferred_element_type=f32, precision=HI)
        z_ref[:] = jnp.where(fl == 0, z_ref[:],
                             jnp.where(fl == 1, z1, z2))


def _block_diag(M: np.ndarray) -> np.ndarray:
    """[18, 36] -> [576, 1152] with 32 copies on the block diagonal."""
    out = np.zeros((576, 1152))
    for sb in range(32):
        out[sb * 18:(sb + 1) * 18, sb * 36:(sb + 1) * 36] = M
    return out


@functools.lru_cache(maxsize=None)
def _fused_z_call(sample_rate: int):
    from ..tables import filterbank as fb
    from .pipeline import build_tables
    t = build_tables(sample_rate)
    band_oh = np.asarray(t.band_oh)
    ra = np.asarray(t.ra, np.float64)
    m36 = fb.imdct36_matrix()                        # [18,36] unwindowed
    mats = fb.imdct_block_matrices()                 # [4,18,36] windowed
    c0 = ra[0] @ _block_diag(m36)          # long layout: window applied
    #                                        elementwise per row's bt
    c1 = ra[1] @ _block_diag(mats[2])      # short: windowed internally
    bdm = _block_diag(mats[2])             # mixed: sb 0/1 long windowed
    bdm[:36, :72] = _block_diag(mats[0])[:36, :72]
    c2 = ra[2] @ bdm
    w013 = np.stack([np.tile(fb.imdct_window(b), 32) for b in (0, 1, 3)])
    consts = dict(c0=c0, c1=c1, c2=c2, bandoh=band_oh, w013=w013)

    def call(is_rows, e_rows, fl_rows, bt_rows, mb_rows, flm_rows):
        R = is_rows.shape[0]
        tiles = R // (2 * TILE_Z)
        T2 = 2 * TILE_Z
        bspec = lambda shape, rows: pl.BlockSpec(
            (rows,) + shape, lambda i: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM)
        cspec = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                         memory_space=pltpu.VMEM)
        cj = {k: jnp.asarray(v, jnp.float32) for k, v in consts.items()}
        return pl.pallas_call(
            _kernel_z,
            grid=(tiles,),
            in_specs=[
                bspec((576,), T2), bspec((64,), T2),
                bspec((1,), T2), bspec((1,), T2),
                bspec((64,), TILE_Z * 4), bspec((1,), TILE_Z * 4),
                cspec(cj["c0"]), cspec(cj["c1"]), cspec(cj["c2"]),
                cspec(cj["bandoh"]), cspec(cj["w013"]),
            ],
            out_specs=bspec((1152,), T2),
            out_shape=jax.ShapeDtypeStruct((R, 1152), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=R * 576 * 1152 * 2,
                bytes_accessed=R * (576 * 2 + 64 * 2 + 1152 * 4),
                transcendentals=R * 576 * 2),
        )(is_rows, e_rows, fl_rows, bt_rows, mb_rows, flm_rows,
          cj["c0"], cj["c1"], cj["c2"], cj["bandoh"], cj["w013"])

    return call


def fused_pipeline_z(is_, exp, block_type, mixed, smode, tables,
                     sample_rate: int):
    """C1-C5 in one kernel: returns the windowed IMDCT output
    z [S, G, 2, 32, 36] ready for _backend (overlap-add + synthesis).
    The [*, 1152] -> [*, 32, 36] view happens in XLA, where reshapes
    are free — Mosaic never sees one."""
    S, G = is_.shape[:2]
    bt = block_type.astype(jnp.int32)
    short = bt == 2
    fl = jnp.where(short, jnp.where(mixed, 2, 1), 0)

    oh = (smode[..., None] == jnp.arange(tables.palette4.shape[0])
          ).astype(jnp.float32)
    m_band = jnp.einsum("sgbp,pq->sgqb", oh, tables.palette4)

    R = S * G * 2
    Rp = -(-R // (2 * TILE_Z)) * (2 * TILE_Z)
    pad = lambda a: jnp.pad(a, ((0, Rp - R),) + ((0, 0),) * (a.ndim - 1))
    padm = lambda a: jnp.pad(a, ((0, Rp * 2 - S * G * 4),) +
                             ((0, 0),) * (a.ndim - 1))
    is_rows = pad(is_.reshape(R, 576))
    e_rows = pad(exp.reshape(R, 64))
    fl_rows = pad(fl.reshape(R, 1).astype(jnp.int32))
    bt_rows = pad(bt.reshape(R, 1))
    mb_rows = padm(m_band.reshape(S * G * 4, 64))
    flm_rows = padm(jnp.repeat(fl[:, :, 0].reshape(S * G, 1), 4, axis=1)
                    .reshape(S * G * 4, 1).astype(jnp.int32))

    z = _fused_z_call(sample_rate)(is_rows, e_rows, fl_rows, bt_rows,
                                   mb_rows, flm_rows)
    return z[:R].reshape(S, G, 2, 32, 36)
