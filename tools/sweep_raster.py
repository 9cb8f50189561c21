#!/usr/bin/env python
"""Sweep fine-raster kernel parameters (tiles_per_step) on the north-star
scene to find the DMA/compute overlap sweet spot.

Usage: python -u tools/sweep_raster.py [--cpu]
"""

import argparse
import dataclasses
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

    import voidin_tpu as vt
    from bench import build_world
    from voidin_tpu.passes import cull, raster
    from voidin_tpu.passes.raster import RasterConfig

    world, _ = build_world()
    base = RasterConfig(
        width=1920, height=1080, tri_capacity=1 << 20, pair_capacity=1 << 20,
        tile_tri_capacity=128,
    )
    scene = world.device()
    cam = vt.Camera(position=[0.0, 2.0, 30.0], yaw=0.0, pitch=-5.0,
                    aspect=1920 / 1080).uniform()
    draws = jax.jit(lambda s, c: cull.emit_draws(s.meshes, s.instances, c))(
        scene, cam
    )

    for tps in (4, 8, 16, 32):
        cfg = dataclasses.replace(base, tiles_per_step=tps)
        f = jax.jit(
            lambda e, cfg=cfg: (
                lambda v: v.depth.sum() + v.tri_id.sum()
            )(
                raster.rasterize(
                    scene.meshes, scene.instances, draws,
                    cam.replace(znear=cam.znear + e), cfg,
                    materials=scene.materials,
                )
            )
        )
        ms = slope_time(f)
        print(f"tiles_per_step={tps:3d}: setup+bin+raster {ms:8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
