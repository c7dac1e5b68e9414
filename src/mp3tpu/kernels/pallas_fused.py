"""Pallas fused granule front-end (SURVEY.md §7.3 M7).

Fuses C1-C5 for a tile of granule-pairs with everything resident in
VMEM: requantize (cbrt+Newton x^4/3, exp2 band exponents via one-hot
matmul), per-band stereo mixing, the composed reorder+alias [576,576]
constant matmul (flavor-selected with lax.switch — one matmul executes
instead of the XLA path's compute-all-3-then-select), and the windowed
IMDCT. The XLA path materializes ~6 HBM-sized intermediates per stage;
this kernel reads symbols once and writes only the [32,36] z output
that overlap-add consumes.

Constants kept in VMEM: 3x[576,576] RA (4 MB), band one-hots, IMDCT
mats, windows — ~4.8 MB, comfortably inside the 16 MB VMEM budget with
a TILE=8 granule-pair working set.

Status (measured on v5e, [256 streams x 32 granules] windows): the
fused kernel reaches ~12.2kx realtime vs ~14.4kx for the XLA path —
XLA's own fusion of this chain is already near bandwidth-optimal, so
the Pallas path is OPT-IN (MP3TPU_PALLAS=1 / use_pallas=True) and kept
as the foundation for deeper fusion (overlap-add + synthesis FIR in
VMEM). Parity vs the XLA path is ~1e-4 (≈4 PCM LSB): Mosaic's MXU
tiling accumulates the [576,576] matmuls in a different order.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 64  # granule-pairs per program (128 rows)


def _kernel(is_ref, e_ref, fl_ref, m_ref,
            ra0_ref, ra1_ref, ra2_ref, bandoh_ref, nat_ref):
    """One tile: [T2=TILE*2 rows, 576] spectrum -> natural-order,
    alias-reduced spectrum [T2, 576] (C1-C4 fused in VMEM)."""
    f32 = jnp.float32
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
    HI = jax.lax.Precision.HIGHEST
    ef = e_ref[:].astype(f32)
    e0 = jnp.dot(ef, bandoh_ref[0], preferred_element_type=f32, precision=HI)
    e1 = jnp.dot(ef, bandoh_ref[1], preferred_element_type=f32, precision=HI)
    e2 = jnp.dot(ef, bandoh_ref[2], preferred_element_type=f32, precision=HI)
    e_line = jnp.where(fl == 0, e0, jnp.where(fl == 1, e1, e2))
    xr = jnp.sign(iv) * mag * jnp.exp2(0.25 * e_line)

    # --- stereo mix: m [T2, 4, 576] line-expanded by the XLA-side prep
    m = m_ref[:]
    xp = xr.reshape(-1, 2, 576)
    x0 = xp[:, 0]
    x1 = xp[:, 1]
    mp = m.reshape(-1, 2, 4, 576)[:, 0]
    l = mp[:, 0] * x0 + mp[:, 1] * x1
    r = mp[:, 2] * x0 + mp[:, 3] * x1
    xr = jnp.stack([l, r], axis=1).reshape(-1, 576)

    # --- reorder+alias: flavor-selected constant matmul. Long blocks
    # dominate real content, so short/mixed matmuls are predicated out
    # for all-long tiles (pl.when) — 1 matmul instead of 3.
    nat_ref[:] = jnp.dot(xr, ra0_ref[:], preferred_element_type=f32, precision=HI)

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

    def call(is_rows, e_rows, fl_rows, m_rows):
        R = is_rows.shape[0]         # rows = 2 * granule-pairs
        tiles = R // (2 * TILE)
        grid = (tiles,)
        T2 = 2 * TILE
        bspec = lambda shape: pl.BlockSpec(
            (T2,) + shape, lambda i: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM)
        cspec = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                         memory_space=pltpu.VMEM)
        consts_j = {k: jnp.asarray(v, jnp.float32) for k, v in consts.items()}
        out = pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[
                bspec((576,)), bspec((64,)),
                bspec((1,)), bspec((4, 576)),
                cspec(consts_j["ra0"]), cspec(consts_j["ra1"]),
                cspec(consts_j["ra2"]), cspec(consts_j["bandoh"]),
            ],
            out_specs=bspec((576,)),
            out_shape=jax.ShapeDtypeStruct((R, 576), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=R * 576 * 576 * 2 * 3,
                bytes_accessed=R * 576 * 8, transcendentals=R * 576 * 2),
        )(is_rows, e_rows, fl_rows, m_rows,
          consts_j["ra0"], consts_j["ra1"], consts_j["ra2"], consts_j["bandoh"])
        return out

    return call


def fused_frontend(is_, exp, block_type, mixed, smode, tables, sample_rate: int):
    """Drop-in C1-C4 replacement: same inputs as granule_pipeline,
    returns the natural-order alias-reduced spectrum [S, G, 2, 576].
    Stereo-palette line expansion stays in XLA (small)."""
    S, G = is_.shape[:2]
    bt = block_type.astype(jnp.int32)
    short = bt == 2
    fl = jnp.where(short, jnp.where(mixed, 2, 1), 0)
    fl_oh = (fl[..., None] == jnp.arange(3)).astype(jnp.float32)

    # stereo palette -> per-line 2x2 rows (XLA; small)
    oh = (smode[..., None] == jnp.arange(tables.palette4.shape[0])
          ).astype(jnp.float32)
    m_band = jnp.einsum("sgbp,pq->sgbq", oh, tables.palette4)
    m_flav = jnp.einsum("sgbq,nbi->sgniq", m_band, tables.band_oh)
    m_line = jnp.einsum("sgniq,sgn->sgqi", m_flav, fl_oh[:, :, 0])  # [S,G,4,576]

    R = S * G * 2
    Rp = -(-R // (2 * TILE)) * (2 * TILE)  # pad rows to a tile multiple
    pad = lambda a: jnp.pad(a, ((0, Rp - R),) + ((0, 0),) * (a.ndim - 1))
    is_rows = pad(is_.reshape(R, 576))
    e_rows = pad(exp.reshape(R, 64))
    fl_rows = pad(fl.reshape(R, 1).astype(jnp.int32))
    m_rows = pad(jnp.repeat(m_line.reshape(S * G, 4, 576), 2, axis=0))

    nat = _fused_call(sample_rate)(is_rows, e_rows, fl_rows, m_rows)
    return nat[:R].reshape(S, G, 2, 576)
