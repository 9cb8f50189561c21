"""Pallas TPU kernel: tile-local visibility-buffer fine rasterization.

Replaces the XLA chunk-loop fine raster (passes/raster.py fine_raster),
whose materialized (NT, C, PX, 3) intermediates made it HBM-bound
(~600 ms/frame). Here each grid step owns a handful of 8x16-pixel tiles:
the tile's binned triangle records live in VMEM, triangles are processed 8
at a time as (8 tri, 128 px) vector ops, and only the final (depth, id)
winner per pixel is written back — HBM traffic is one record read + one
pixel write, the arithmetic never leaves VMEM/registers.

Layout choices (TPU-first):
* a tile is 8x16 = 128 pixels = exactly one vector-register row; a group
  of 8 triangles against the tile is one native (8, 128) VPU shape;
* triangle records are stored triangle-major (K x 16 fields) with the
  triangle axis on sublanes, so a group of 8 records is one aligned
  (8, 16) sublane slice (lane-dim dynamic slicing must be 128-aligned on
  TPU; sublane slicing only needs 8);
* per-tile dynamic triangle counts are scalar-prefetched; the triangle
  loop runs ceil(count/8) iterations, so cost scales with actual work;
* the depth/id competition packs (depth, id) per pixel as two running
  (1, 128) registers resolved with a max + equality-select (no per-lane
  gather needed).

Record fields (RECORD_F = 16, f32):
  0..2 sx[3], 3..5 sy[3], 6..8 z[3], 9 triangle id as f32 (-1 = invalid).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RECORD_F = 16
F_SX = 0
F_SY = 3
F_Z = 6
F_ID = 9

TILE_H = 8
TILE_W = 16
TILE_PX = TILE_H * TILE_W  # 128 = one vreg row
TRI_GROUP = 8


def _kernel(counts_ref, rec_ref, depth_ref, id_ref, *, k_cap, tiles_per_step, tiles_x):
    step = pl.program_id(0)

    # Pixel coordinate lanes, shared by every tile in the step (offsets
    # added per tile): lane l -> (l // 16, l % 16).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_PX), 1)
    lx = jnp.mod(lane, TILE_W).astype(jnp.float32)
    ly = (lane // TILE_W).astype(jnp.float32)

    for j in range(tiles_per_step):
        tile = step * tiles_per_step + j
        tx0 = (jnp.mod(tile, tiles_x) * TILE_W).astype(jnp.float32)
        ty0 = ((tile // tiles_x) * TILE_H).astype(jnp.float32)
        px = lx + tx0 + 0.5  # (1, 128) pixel centers
        py = ly + ty0 + 0.5

        count = jnp.minimum(counts_ref[tile], k_cap)
        n_groups = (count + TRI_GROUP - 1) // TRI_GROUP

        def body(g, carry):
            best_d, best_i = carry  # (1, 128) each
            base = pl.multiple_of(g * TRI_GROUP, TRI_GROUP)
            blk = rec_ref[j, pl.ds(base, TRI_GROUP), :]  # (8, RECORD_F)

            def fld(f):  # (8, 1) field column for the triangle group
                return blk[:, f : f + 1]

            sx0, sx1, sx2 = fld(F_SX), fld(F_SX + 1), fld(F_SX + 2)
            sy0, sy1, sy2 = fld(F_SY), fld(F_SY + 1), fld(F_SY + 2)
            z0, z1, z2 = fld(F_Z), fld(F_Z + 1), fld(F_Z + 2)
            idf = fld(F_ID)

            # Edge functions e_k = cross(p - v_k, v_next - v_k); inside when
            # all >= 0 (front faces are negatively oriented in y-down pixel
            # space). (8, 128) broadcast ops.
            e0 = (px - sx0) * (sy1 - sy0) - (py - sy0) * (sx1 - sx0)
            e1 = (px - sx1) * (sy2 - sy1) - (py - sy1) * (sx2 - sx1)
            e2 = (px - sx2) * (sy0 - sy2) - (py - sy2) * (sx0 - sx2)
            inside = (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0) & (idf >= 0.0)

            # Screen-space barycentric depth: lambda_k ~ edge opposite v_k.
            ssum = e0 + e1 + e2
            inv = 1.0 / jnp.where(jnp.abs(ssum) > 1e-20, ssum, 1e-20)
            depth = (e1 * z0 + e2 * z1 + e0 * z2) * inv

            cand = jnp.where(inside, depth, -1.0)
            gmax = jnp.max(cand, axis=0, keepdims=True)  # (1, 128)
            gid = jnp.max(jnp.where(cand == gmax, idf, -1.0), axis=0, keepdims=True)

            take = gmax > best_d
            return (
                jnp.where(take, gmax, best_d),
                jnp.where(take, gid, best_i),
            )

        init = (jnp.zeros((1, TILE_PX), jnp.float32), jnp.full((1, TILE_PX), -1.0))
        best_d, best_i = jax.lax.fori_loop(0, n_groups, body, init)
        depth_ref[j, :] = best_d[0]
        id_ref[j, :] = best_i[0]


def fine_raster_pallas(
    records: jnp.ndarray,  # (NT, RECORD_F, K) f32, field-major
    counts: jnp.ndarray,  # (NT,) i32 per-tile triangle counts
    tiles_x: int,
    tiles_per_step: int = 16,
    interpret: bool = False,
):
    """Returns (depth (NT, 128) f32, id (NT, 128) f32)."""
    nt, k_cap, rf = records.shape
    assert rf == RECORD_F and nt % tiles_per_step == 0 and k_cap % TRI_GROUP == 0
    grid = (nt // tiles_per_step,)
    kernel = functools.partial(
        _kernel, k_cap=k_cap, tiles_per_step=tiles_per_step, tiles_x=tiles_x
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tiles_per_step, k_cap, RECORD_F),
                lambda s, c: (s, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (tiles_per_step, TILE_PX), lambda s, c: (s, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tiles_per_step, TILE_PX), lambda s, c: (s, 0), memory_space=pltpu.VMEM
            ),
        ],
    )
    depth, tri = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nt, TILE_PX), jnp.float32),
            jax.ShapeDtypeStruct((nt, TILE_PX), jnp.float32),
        ],
        interpret=interpret,
    )(counts, records)
    return depth, tri
