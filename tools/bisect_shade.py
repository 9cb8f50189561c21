#!/usr/bin/env python
"""Micro-profile the deferred shade pass: isolate LTC-LUT gathers, texture
fetches, and dense math by monkeypatching the sampling primitives with
constant-returning fakes of the same shape/dtype.

Usage: python -u tools/bisect_shade.py [--cpu]
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
    from voidin_tpu.passes import cull, raster, resolve, shading
    from voidin_tpu.passes.raster import RasterConfig
    from voidin_tpu.scene import texture as tex_mod

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
    vis = jax.jit(
        lambda s, c, d: raster.rasterize(s.meshes, s.instances, d, c, cfg)
    )(scene, cam, draws)
    gb, aux = jax.jit(
        lambda s, v, c: resolve.resolve_gbuffer(s, v, c, cfg)
    )(scene, vis, cam)

    real_lut = shading.sample_lut_bilinear
    real_tri = shading.sample_trilinear

    def fake_lut(quads, width, uv, channels=4):
        shape = uv.shape[:-1] + (channels * 2,)
        return jnp.broadcast_to(uv[..., :1] * 0 + 0.5, shape)

    def fake_tri(pool, tex_id, uv, lod=None, trilinear=True):
        return jnp.broadcast_to(uv[..., :1] * 0 + 0.5, uv.shape[:-1] + (4,))

    def timed(name, lut_channels_to_fake=(), fake_textures=False):
        def lut(quads, width, uv, channels=4):
            if channels in lut_channels_to_fake:
                return fake_lut(quads, width, uv, channels)
            return real_lut(quads, width, uv, channels)

        shading.sample_lut_bilinear = lut
        shading.sample_trilinear = fake_tri if fake_textures else real_tri
        try:
            fn = jax.jit(
                lambda e: shading.shade(
                    scene, gb.replace(depth=gb.depth + e), cam, aux=aux
                )
            )
            ms = slope_time(lambda e: fn(e))
        finally:
            shading.sample_lut_bilinear = real_lut
            shading.sample_trilinear = real_tri
        print(f"{name:38s} {ms:8.2f} ms")
        return ms

    print(f"backend={backend}")
    timed("full shade")
    timed("no ltc2 fetches (4/px)", lut_channels_to_fake=(4,))
    timed("no ltc12 fetch (1/px, 128B)", lut_channels_to_fake=(8,))
    timed("no LUT fetches at all", lut_channels_to_fake=(4, 8))
    timed("no emissive/mr texture fetches", fake_textures=True)
    timed("dense math only", lut_channels_to_fake=(4, 8), fake_textures=True)


if __name__ == "__main__":
    main()
