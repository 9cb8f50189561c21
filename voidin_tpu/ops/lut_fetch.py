"""Pallas LUT-fetch kernel: bilinear 64x64 table sampling on the MXU with
the two-tap weight matrices built IN VMEM.

Why: the XLA formulation (passes/shading.sample_lut_bilinear_mxu_multi)
materializes a (P, 64) weight matrix per distinct uv set in HBM — at 1080p
that is the dominant traffic of the whole frame (COST_AUDIT.json: shade =
36 GB/frame, mostly these weights; ltc.wgsl's original is a texture
gather, which TPU prices at ~5 ns/row). This kernel rebuilds the same
math per 1024-pixel block entirely on-chip: HBM sees only the packed
tap coordinates in (24 B/px) and the fetched channels out (4 B/px/chan).

Layout notes (Mosaic constraints, see CLAUDE.md):
* pixels ride the LANE dim (blocks of 1024 = 8 x 128 lanes), table rows
  ride sublanes — the one-hot weights are (64, PB) built from a 2D int
  iota + float comparisons (exact: tap indices are small ints in f32);
* the C tables are pre-concatenated along columns to (64, 64*C) so ONE
  dot_general per block contracts table rows: (64, 64C)^T-free contract
  with WY (64, PB) -> (64C, PB); a leading-dim reshape (lane dim intact)
  then folds channels out;
* edge taps replicate the XLA path exactly: y1 = min(y0+1, 63) is
  precomputed on the host, and when y1 == y0 the two one-hot terms add
  to weight 1.0 on that row — identical to the (iy==y0)*(1-t)+(iy==y1)*t
  construction.

Matches sample_lut_bilinear_mxu_multi to f32 rounding (same taps, same
weights, different contraction order) — asserted by tests/test_ltc.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PB = 1024  # pixels per grid step (8 x 128 lanes)
TDIM = 64  # table size (64 x 64)
CPAD = 8  # output channel rows padded to a full sublane group


def _kernel(q_ref, tab_ref, out_ref, *, n_chan, bf16):
    # n_chan here is the PADDED channel count (even, so the table's lane
    # dim 64*n_chan is a 128 multiple — Mosaic DMA alignment).
    # q rows: [y0, y1, ty, x0, x1, tx, 0, 0] — (8, PB)
    y0 = q_ref[0:1, :]
    y1 = q_ref[1:2, :]
    ty = q_ref[2:3, :]
    x0 = q_ref[3:4, :]
    x1 = q_ref[4:5, :]
    tx = q_ref[5:6, :]
    iota = jax.lax.broadcasted_iota(jnp.int32, (TDIM, PB), 0).astype(
        jnp.float32
    )
    wy = (iota == y0) * (1.0 - ty) + (iota == y1) * ty  # (64, PB)
    wx = (iota == x0) * (1.0 - tx) + (iota == x1) * tx
    tab = tab_ref[...]  # (64, 64 * n_chan)
    if bf16:
        wy = wy.astype(jnp.bfloat16)
        tab = tab.astype(jnp.bfloat16)
    # contract table rows: R[c*64 + x, p] = sum_y tab[y, c*64 + x] wy[y, p]
    r = jax.lax.dot_general(
        tab, wy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (64 * n_chan, PB)
    r3 = r.reshape(n_chan, TDIM, PB)  # leading-dim reshape, lanes intact
    out = jnp.sum(r3 * wx[None], axis=1)  # (n_chan, PB)
    pad = jnp.zeros((CPAD - n_chan, PB), jnp.float32)
    out_ref[...] = jnp.concatenate([out, pad], axis=0)


def lut_fetch_pallas(tables, uv, interpret=False, bf16=False):
    """Bilinear-fetch `tables` (list of (64, 64) f32) at `uv` (..., 2),
    uv pre-scaled by LUT_SCALE/BIAS like sample_lut_bilinear_mxu_multi.
    Returns a list of (...,) f32 per table. `bf16` casts weights+tables to
    bf16 inside the kernel (the LTC_LUT_BF16 semantics)."""
    n_chan = len(tables)
    assert 1 <= n_chan <= CPAD
    # pad channels to an even count: the concatenated table's lane dim is
    # 64 * c_pad, which must be a 128 multiple for aligned VMEM DMA
    c_pad = n_chan + (n_chan % 2)
    shape = uv.shape[:-1]
    p = 1
    for s in shape:
        p *= s
    uvf = uv.reshape(p, 2)
    fx = uvf[:, 0] * TDIM - 0.5
    fy = uvf[:, 1] * TDIM - 0.5
    x0 = jnp.clip(jnp.floor(fx), 0, TDIM - 1)
    y0 = jnp.clip(jnp.floor(fy), 0, TDIM - 1)
    tx = fx - x0
    ty = fy - y0
    x1 = jnp.minimum(x0 + 1, TDIM - 1)
    y1 = jnp.minimum(y0 + 1, TDIM - 1)

    p_pad = -(-p // PB) * PB
    # padded pixels fetch table[0, 0] harmlessly and are sliced off below
    q = jnp.pad(
        jnp.stack([y0, y1, ty, x0, x1, tx]).astype(jnp.float32),
        ((0, 2), (0, p_pad - p)),
    )
    tab_all = jnp.concatenate(
        [jnp.asarray(t, jnp.float32) for t in tables]
        + [jnp.zeros((TDIM, TDIM), jnp.float32)] * (c_pad - n_chan),
        axis=1,
    )  # (64, 64 * c_pad)

    grid = (p_pad // PB,)
    out = pl.pallas_call(
        functools.partial(_kernel, n_chan=c_pad, bf16=bf16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, PB), lambda s: (0, s), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (TDIM, TDIM * c_pad), lambda s: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (CPAD, PB), lambda s: (0, s), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((CPAD, p_pad), jnp.float32),
        interpret=interpret,
    )(q, tab_all)
    return [out[c, :p].reshape(shape) for c in range(n_chan)]
