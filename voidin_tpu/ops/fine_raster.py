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


# ---------------------------------------------------------------------------
# Pair-centric variant: no per-tile capacity. Triangle records sorted by
# tile live in HBM; each tile's range [start, start+count) is streamed
# through VMEM with double-buffered DMA. Cost scales with the actual number
# of (tile, triangle) pairs — a tile with 50k triangles just loops longer.
# ---------------------------------------------------------------------------

CHUNK = 128  # records per chunk: one (16 fields, 128 records) DMA block


def _kernel_pairs(
    starts_ref,
    counts_ref,
    rec_hbm,  # (n_chunks, RECORD_F, CHUNK) f32, field-major per chunk
    *rest,  # out refs (2 or 4 with track2), then scratch, sems
    tiles_per_step,
    tiles_x,
    track2=False,
):
    if track2:
        depth_ref, id_ref, depth2_ref, id2_ref, scratch, sems = rest
    else:
        depth_ref, id_ref, scratch, sems = rest
    step = pl.program_id(0)
    # pixels on sublanes: pixel (y, x) of the 8x16 tile; triangle fields on
    # lanes. Column group g handles pixels x == g, all 8 rows at once.
    ys = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, 1), 0).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

    def dma(j, slot, chunk0, c):
        return pltpu.make_async_copy(
            rec_hbm.at[chunk0 + c],
            scratch.at[j, slot],
            sems.at[j, slot],
        )

    # Prologue: first chunk of every non-empty tile in flight at once.
    # (Start/wait MUST balance per semaphore — they persist across steps.)
    for j in range(tiles_per_step):
        tile = step * tiles_per_step + j

        @pl.when(counts_ref[tile] > 0)
        def _(j=j, tile=tile):
            dma(j, 0, starts_ref[tile] // CHUNK, 0).start()

    for j in range(tiles_per_step):
        tile = step * tiles_per_step + j
        start = starts_ref[tile]
        count = counts_ref[tile]
        chunk0 = start // CHUNK
        offset = start - chunk0 * CHUNK  # 0..127
        span = offset + count
        n_chunks = jnp.where(count > 0, (span + CHUNK - 1) // CHUNK, 0)
        tx0 = (jnp.mod(tile, tiles_x) * TILE_W).astype(jnp.float32)
        ty0 = ((tile // tiles_x) * TILE_H).astype(jnp.float32)

        def body(c, carry):
            @pl.when(c + 1 < n_chunks)
            def _():
                dma(j, jax.lax.rem(c + 1, 2), chunk0, c + 1).start()

            dma(j, jax.lax.rem(c, 2), chunk0, c).wait()

            def one_slot(blk):  # (RECORD_F, CHUNK)
                def fld(f):
                    return blk[f : f + 1, :]  # (1, CHUNK)

                sx0, sx1, sx2 = fld(F_SX), fld(F_SX + 1), fld(F_SX + 2)
                sy0, sy1, sy2 = fld(F_SY), fld(F_SY + 1), fld(F_SY + 2)
                z0, z1, z2 = fld(F_Z), fld(F_Z + 1), fld(F_Z + 2)
                idf = fld(F_ID)
                in_range = (lane >= offset - c * CHUNK) & (
                    lane < span - c * CHUNK
                )
                ok = (idf >= 0.0) & in_range  # (1, CHUNK)

                # Per-chunk hoists (constant across the 16 pixel columns):
                # edge slopes, the py-dependent edge part (py varies only
                # by sublane), and the area reciprocal. Inner loop per
                # column: 2 ops per edge + 5 for depth instead of ~16.
                # Everything is recentered on the tile origin so the
                # products stay at tile/triangle magnitude — the naive
                # hoist px*dy - (sx*dy + ...) at screen magnitudes (~2e6)
                # loses ~0.25 absolute in e and corrupts small-triangle
                # depths; recentered it matches the per-pixel form's
                # precision.
                rx0, rx1, rx2 = sx0 - tx0, sx1 - tx0, sx2 - tx0
                ry0, ry1, ry2 = sy0 - ty0, sy1 - ty0, sy2 - ty0
                py = ys + 0.5  # (8, 1) tile-relative
                dx0, dy0 = rx1 - rx0, ry1 - ry0
                dx1, dy1 = rx2 - rx1, ry2 - ry1
                dx2, dy2 = rx0 - rx2, ry0 - ry2
                c0 = rx0 * dy0 + (py - ry0) * dx0  # (8, CHUNK)
                c1 = rx1 * dy1 + (py - ry1) * dx1
                c2 = rx2 * dy2 + (py - ry2) * dx2
                area2 = dy0 * dx1 - dx0 * dy1  # = e0+e1+e2 algebraically
                inv = 1.0 / jnp.where(jnp.abs(area2) > 1e-20, area2, 1e-20)
                zi0, zi1, zi2 = z0 * inv, z1 * inv, z2 * inv

                if track2:
                    bd, bi, bd2, bi2 = carry
                else:
                    bd, bi = carry
                for g in range(TILE_W):
                    px = g + 0.5  # scalar, tile-relative
                    e0 = px * dy0 - c0
                    e1 = px * dy1 - c1
                    e2 = px * dy2 - c2
                    inside = (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0) & ok
                    depth = e1 * zi0 + e2 * zi1 + e0 * zi2
                    cand = jnp.where(inside, depth, -1.0)  # (8, CHUNK)
                    gmax = jnp.max(cand, axis=1, keepdims=True)  # (8, 1)
                    gid = jnp.max(
                        jnp.where(cand == gmax, idf, -1.0), axis=1, keepdims=True
                    )
                    prev_d = bd[:, g : g + 1]
                    take = gmax > prev_d  # (8, 1)
                    # column-masked elementwise update (Mosaic has neither
                    # scatter nor dynamic_update_slice on values)
                    col = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_W), 1) == g
                    sel = col & take
                    bd = jnp.where(sel, gmax, bd)
                    bi = jnp.where(sel, gid, bi)
                    if track2:
                        # Runner-up among DISTINCT triangles: within-chunk
                        # 2nd place (mask the argmax lane), then a 2-way
                        # sorted-pair merge with the running (best, second).
                        c2 = jnp.where(cand == gmax, -1.0, cand)
                        g2 = jnp.max(c2, axis=1, keepdims=True)
                        g2id = jnp.max(
                            jnp.where(c2 == g2, idf, -1.0), axis=1, keepdims=True
                        )
                        g2id = jnp.where(g2 > 0.0, g2id, -1.0)
                        prev_i = bi[:, g : g + 1]
                        prev_d2 = bd2[:, g : g + 1]
                        prev_i2 = bi2[:, g : g + 1]
                        lv = jnp.where(take, prev_d, gmax)  # demoted best
                        li = jnp.where(take, prev_i, gid)
                        t2 = g2 > prev_d2
                        m2v = jnp.where(t2, g2, prev_d2)
                        m2i = jnp.where(t2, g2id, prev_i2)
                        t3 = lv > m2v
                        nd2 = jnp.where(t3, lv, m2v)
                        ni2 = jnp.where(t3, li, m2i)
                        bd2 = jnp.where(col, nd2, bd2)
                        bi2 = jnp.where(col, ni2, bi2)
                if track2:
                    return bd, bi, bd2, bi2
                return bd, bi

            return jax.lax.cond(
                jax.lax.rem(c, 2) == 0,
                lambda: one_slot(scratch[j, 0]),
                lambda: one_slot(scratch[j, 1]),
            )

        zeros = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        negs = jnp.full((TILE_H, TILE_W), -1.0)
        init = (zeros, negs, zeros, negs) if track2 else (zeros, negs)
        out = jax.lax.fori_loop(0, n_chunks, body, init)
        depth_ref[j] = out[0]
        id_ref[j] = out[1]
        if track2:
            depth2_ref[j] = out[2]
            id2_ref[j] = out[3]


def fine_raster_pairs(
    records_sorted: jnp.ndarray,  # (E + pad, RECORD_F) f32, tile-sorted
    starts: jnp.ndarray,  # (NT,) i32 first pair slot per tile
    counts: jnp.ndarray,  # (NT,) i32 pairs per tile (uncapped)
    tiles_x: int,
    tiles_per_step: int = 8,
    interpret: bool = False,
    track2: bool = False,
):
    """Returns (depth, id) (NT, 8, 16) f32 each; with `track2` also the
    per-pixel runner-up (depth2, id2) for alpha-cutoff fallback."""
    nt = starts.shape[0]
    e_pad, rf = records_sorted.shape
    assert rf == RECORD_F and nt % tiles_per_step == 0 and e_pad % CHUNK == 0
    # chunk-major field-major layout: [chunk, field, record-in-chunk]
    rec_chunks = jnp.transpose(
        records_sorted.reshape(e_pad // CHUNK, CHUNK, RECORD_F), (0, 2, 1)
    )
    grid = (nt // tiles_per_step,)
    kernel = functools.partial(
        _kernel_pairs, tiles_per_step=tiles_per_step, tiles_x=tiles_x,
        track2=track2,
    )
    n_out = 4 if track2 else 2
    out_spec = pl.BlockSpec(
        (tiles_per_step, TILE_H, TILE_W),
        lambda s, a, b: (s, 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[out_spec] * n_out,
        scratch_shapes=[
            pltpu.VMEM((tiles_per_step, 2, RECORD_F, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((tiles_per_step, 2)),
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nt, TILE_H, TILE_W), jnp.float32)
        ] * n_out,
        interpret=interpret,
    )(starts, counts, rec_chunks)
    return tuple(outs)
