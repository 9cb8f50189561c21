#!/usr/bin/env python
"""A/B: does inserting optimization barriers between frame stages (stopping
XLA from rematerializing producer work into consumers) change whole-frame
time? In-context stage marginals exceed standalone pass timings (shade:
44 ms vs 26 ms), suggesting cross-stage recompute.

Usage: python -u tools/ab_barriers.py [--cpu]
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
    from voidin_tpu.framework.renderer import FrameState
    from voidin_tpu.passes import cull, postprocess as pp
    from voidin_tpu.passes import raster, resolve, shading, taa as taa_m
    from voidin_tpu.passes.raster import RasterConfig
    from voidin_tpu.scene.texture import linear_to_srgb

    world, _ = build_world()
    cfg = RasterConfig(
        width=1920, height=1080, tri_capacity=1 << 20, pair_capacity=1 << 20,
        tile_tri_capacity=128,
    )
    scene = world.device()
    uniform = vt.Camera(position=[0.0, 2.0, 30.0], yaw=0.0, pitch=-5.0,
                        aspect=1920 / 1080).uniform()
    state = FrameState.initial(cfg.width, cfg.height)

    def frame(barriers, eps):
        bar = jax.lax.optimization_barrier if barriers else (lambda x: x)
        camera = uniform.replace(znear=uniform.znear + eps)
        draws = cull.emit_draws(scene.meshes, scene.instances, camera)
        vis = raster.rasterize(
            scene.meshes, scene.instances, draws, camera, cfg,
            materials=scene.materials,
        )
        vis = bar(vis)
        gb, aux = resolve.resolve_gbuffer(scene, vis, camera, cfg)
        gb, aux = bar((gb, aux))
        hdr = shading.shade(scene, gb, camera, aux=aux)
        hdr = bar(hdr)
        hdr, _st, _ovf = taa_m.taa(hdr, gb, camera, state)
        out = linear_to_srgb(pp.postprocess(hdr))
        return out.sum()

    for barriers in (False, True):
        f = jax.jit(lambda e, b=barriers: frame(b, e))
        ms = slope_time(f)
        print(f"barriers={barriers}: {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
