#!/usr/bin/env python
"""Config-3 resolve decomposition: its honest resolve marginal is 222 ms
(tools/bisect_frame.py --config 3) against a 62 ms gather-row floor.
Suspects: the real-texture trilinear taps (pool table is tens of M rows
at 2048^2 textures — beyond the measured 1M-row gather tier), the
normal-map TBN path, or the planar dense math.

Times, at the config-3 pose data shapes (1080p):
  P0  one trilinear tap (albedo-style: wh passed, srgb static)
  P1  one tap, srgb=None (per-pixel flag gather + where)
  P2  resolve_gbuffer full (the stage itself, fresh jit)
  P3  resolve_gbuffer with taps forced const (scene textures replaced by
      1x1) — isolates sampling from record/interp math

Usage: python -u tools/r5_c3_probe.py [--cpu]
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

    import dataclasses

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from bench import AB_VARIANTS, apply_ab_runtime_options, retry_transient
    from voidin_tpu.framework.presets import config3_gltf_arealights
    from voidin_tpu.passes import cull as cull_pass
    from voidin_tpu.passes import raster as raster_pass
    from voidin_tpu.passes import resolve as resolve_pass
    from voidin_tpu.passes.raster import RasterConfig
    from voidin_tpu.scene import texture as tex_mod

    backend = jax.default_backend()
    W, H = (320, 184) if args.cpu else (1920, 1080)
    p = config3_gltf_arealights(W / H)
    scene = p.world.device()
    cfg_kw, bf16, ascale, lut = AB_VARIANTS["all_lut_p"]
    cfg = RasterConfig(
        width=W, height=H, tri_capacity=p.tri_capacity,
        pair_capacity=p.pair_capacity,
        tile_tri_capacity=p.tile_tri_capacity,
        interpret=backend == "cpu", **cfg_kw,
    )
    apply_ab_runtime_options(bf16, ascale, lut, backend)
    uniform = p.camera.uniform()
    pool = scene.textures
    print(f"backend={backend} pool rows={pool.quads.shape[0]} "
          f"({pool.quads.shape[0] * pool.quads.shape[1] * 2 / 2**20:.0f} "
          f"MiB)")

    rng = np.random.default_rng(0)
    uv = jax.device_put(rng.random((H, W, 2), np.float32).astype(np.float32))
    lod = jax.device_put(
        (rng.random((H, W), np.float32) * 4.0).astype(np.float32)
    )
    tid = jax.device_put(
        rng.integers(0, max(int(pool.size.shape[0]) - 1, 1), (H, W))
        .astype(np.int32)
    )

    def run(name, f, *a):
        jf = jax.jit(f)
        ms = retry_transient(lambda: slope_time(jf, *a), attempts=3,
                             label=name)
        print(f"{name:38s} {ms:8.2f} ms", flush=True)
        return ms

    whs = pool.size

    def p0(uv_, lod_, tid_, eps):
        wh = whs[tid_]
        out = tex_mod.sample_trilinear(
            pool, tid_, uv_ + eps, lod_, wh=(wh[..., 0], wh[..., 1]),
            srgb=True,
        )
        return out.sum()

    run("P0 one tap (wh passed, srgb static)", p0, uv, lod, tid)

    def p1(uv_, lod_, tid_, eps):
        wh = whs[tid_]
        out = tex_mod.sample_trilinear(
            pool, tid_, uv_ + eps, lod_, wh=(wh[..., 0], wh[..., 1]),
        )
        return out.sum()

    run("P1 one tap (srgb flag gather)", p1, uv, lod, tid)

    # P2/P3: the full resolve stage at the real pose
    draws = cull_pass.emit_draws(scene.meshes, scene.instances, uniform)
    inst_rec = resolve_pass._inst_rec_f16(scene)
    vis = jax.jit(
        lambda: raster_pass.rasterize(
            scene.meshes, scene.instances, draws, uniform, cfg,
            materials=scene.materials, inst_rec=inst_rec,
        )
    )()
    vis = jax.tree_util.tree_map(jax.device_put, vis)

    def p2(sc, vv, eps):
        cam = uniform.replace(znear=uniform.znear + eps)
        gb, aux = resolve_pass.resolve_gbuffer(sc, vv, cam, cfg)
        return (gb.depth.sum() + gb.normal_uv.sum() + aux.albedo.sum()
                + aux.emissive.sum() + aux.mr.sum())

    run("P2 resolve_gbuffer (real textures)", p2, scene, vis)

    # const-texture twin: same scene but every material points at the 1x1
    # WHITE texture -> taps const-fold
    from voidin_tpu.scene.scene import SceneData  # noqa: F401

    mats = scene.materials
    zeros = jnp.zeros_like(mats.albedo)
    mats_const = dataclasses.replace(
        mats, albedo=zeros, normal=jnp.zeros_like(mats.normal) - 1,
        emissive=zeros, metallic_roughness=zeros,
    )
    scene_const = dataclasses.replace(scene, materials=mats_const)

    def p3(sc, vv, eps):
        cam = uniform.replace(znear=uniform.znear + eps)
        gb, aux = resolve_pass.resolve_gbuffer(sc, vv, cam, cfg)
        return (gb.depth.sum() + gb.normal_uv.sum() + aux.albedo.sum()
                + aux.emissive.sum() + aux.mr.sum())

    try:
        run("P3 resolve_gbuffer (1x1 textures)", p3, scene_const, vis)
    except Exception as e:
        print(f"P3 failed: {str(e)[:200]}")


if __name__ == "__main__":
    main()
