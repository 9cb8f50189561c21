#!/usr/bin/env python
"""Decompose bin_triangles_pairs (the ~27 ms binning stage) into cumulative
sub-steps: pair expansion, tile sort, per-tile bounds, record gather.

Usage: python -u tools/bisect_bin.py [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.tpu_timeit import slope_time  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
    import jax.numpy as jnp

    import voidin_tpu as vt
    from bench import build_world
    from voidin_tpu.ops import fine_raster as fr
    from voidin_tpu.passes import cull, raster
    from voidin_tpu.passes.raster import RasterConfig

    backend = jax.default_backend()
    world, _ = build_world()
    cfg = RasterConfig(
        width=1920, height=1080, tri_capacity=1 << 20, pair_capacity=1 << 20,
        tile_tri_capacity=128, interpret=backend == "cpu",
    )
    scene = world.device()
    cam = vt.Camera(position=[0.0, 2.0, 30.0], yaw=0.0, pitch=-5.0,
                    aspect=1920 / 1080).uniform()
    draws = jax.jit(lambda s, c: cull.emit_draws(s.meshes, s.instances, c))(
        scene, cam
    )
    setup = jax.jit(
        lambda s, c, d: raster.triangle_setup(
            s.meshes, s.instances, d, c, cfg, materials=s.materials
        )
    )(scene, cam, draws)

    TX, TY = cfg.tiles_x, cfg.tiles_y
    NT = cfg.n_tiles_padded
    E = cfg.pair_capacity

    def upto(stage):
        def f(eps):
            sx = setup["sx"] + eps
            sy, alive = setup["sy"], setup["alive"]
            x0 = jnp.floor(jnp.min(sx, axis=-1))
            x1 = jnp.ceil(jnp.max(sx, axis=-1))
            y0 = jnp.floor(jnp.min(sy, axis=-1))
            y1 = jnp.ceil(jnp.max(sy, axis=-1))
            on = (x1 >= 0) & (y1 >= 0) & (x0 < cfg.width) & (y0 < cfg.height)
            alive = alive & on
            tx0 = jnp.clip(x0.astype(jnp.int32) // cfg.tile_w, 0, TX - 1)
            tx1 = jnp.clip(x1.astype(jnp.int32) // cfg.tile_w, 0, TX - 1)
            ty0 = jnp.clip(y0.astype(jnp.int32) // cfg.tile_h, 0, TY - 1)
            ty1 = jnp.clip(y1.astype(jnp.int32) // cfg.tile_h, 0, TY - 1)
            bw = tx1 - tx0 + 1
            n_pairs = jnp.where(alive, bw * (ty1 - ty0 + 1), 0)
            if stage == "bbox":
                return n_pairs.sum().astype(jnp.float32)
            bbox_rec = jnp.stack([tx0, ty0, bw], axis=-1)
            tri, local, pair_valid = raster.segment_ids_from_counts(n_pairs, E)
            if stage == "expand":
                return (tri.sum() + local.sum()).astype(jnp.float32)
            br = bbox_rec[tri]
            tile = (br[:, 1] + local // br[:, 2]) * TX + (br[:, 0] + local % br[:, 2])
            tile = jnp.where(pair_valid, tile, NT)
            if stage == "tilecalc":
                return tile.sum().astype(jnp.float32)
            tile_sorted, tri_sorted = jax.lax.sort_key_val(tile, tri)
            if stage == "sort":
                return (tile_sorted.sum() + tri_sorted.sum()).astype(jnp.float32)
            bounds = jnp.searchsorted(
                tile_sorted, jnp.arange(NT + 1, dtype=jnp.int32), side="left"
            ).astype(jnp.int32)
            if stage == "bounds":
                return bounds.sum().astype(jnp.float32)
            rec_sorted = setup["raster_rec"][tri_sorted]
            return rec_sorted.sum()

        return jax.jit(f)

    prev = 0.0
    print(f"backend={backend}")
    for s in ["bbox", "expand", "tilecalc", "sort", "bounds", "gather"]:
        ms = slope_time(upto(s))
        print(f"{s:10s} cum {ms:8.2f} ms   marginal {ms - prev:8.2f} ms")
        prev = ms


if __name__ == "__main__":
    main()
