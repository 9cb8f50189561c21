#!/usr/bin/env python
"""Round-4 measurement batch (one TPU session, serial):

1. shade ablation: which TERM of the dense math costs (area lights? point
   light? position/normal prep? upsample?) — the r4 shade bisect showed
   'dense math only' = 22.7/24.2 ms, so the cost is NOT the fetches.
2. gather ns/row at FAT widths (48..256 B): if one 192 B gather costs ~one
   48 B gather, resolve's 3 row-gathers/pixel fold into 1 at setup time.
3. resolve ablation: fetch vs bary math vs texture tap.

Usage: python -u tools/r4_probe.py [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.tpu_timeit import slope_time  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip-gather", action="store_true")
    ap.add_argument("--skip-resolve", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
    import jax.numpy as jnp
    import numpy as np

    import voidin_tpu as vt
    from bench import build_world
    from voidin_tpu.passes import cull, raster, resolve, shading
    from voidin_tpu.passes.raster import RasterConfig

    backend = jax.default_backend()
    print(f"backend={backend}")
    rng = np.random.default_rng(0)

    # ---------------- 2. fat-row gather microbench --------------------
    print("== gather: ns/row at fat widths (2M queries) ==")
    N = 1 << 21
    for rows in () if args.skip_gather else (1 << 17, 1 << 20):
        idx = jnp.asarray(rng.integers(0, rows, N).astype(np.int32))
        for width_f32 in (12, 16, 24, 32, 48, 64):
            table = jnp.asarray(
                rng.standard_normal((rows, width_f32), dtype=np.float32))
            f = jax.jit(lambda t, i, e: (t[i] + e).sum())
            ms = slope_time(f, table, idx)
            print(f"rows {rows:>8} width {width_f32 * 4:>4}B: "
                  f"{ms / N * 1e6:6.2f} ns/row   total {ms:7.2f} ms")
        # 3 separate 16-f32 gathers vs one 48-f32 gather
        t16 = [jnp.asarray(rng.standard_normal((rows, 16), dtype=np.float32))
               for _ in range(3)]
        f3 = jax.jit(lambda a, b, c, i, e:
                     (a[i] + e).sum() + (b[i] + e).sum() + (c[i] + e).sum())
        ms3 = slope_time(f3, *t16, idx)
        print(f"rows {rows:>8} 3x 64B gathers: {ms3:7.2f} ms "
              f"({ms3 / N * 1e6:6.2f} ns/row-triple)")

    # ---------------- scene setup for 1/3 ------------------------------
    world, _ = build_world()
    cfg = RasterConfig(
        width=1920, height=1080, tri_capacity=1 << 19,
        pair_capacity=1 << 19, tile_tri_capacity=128,
        interpret=backend == "cpu",
    )
    scene = world.device()
    cam = vt.Camera(position=[0.0, 2.0, 30.0], yaw=0.0, pitch=-5.0,
                    aspect=1920 / 1080).uniform()
    draws = jax.jit(lambda s, c: cull.emit_draws(s.meshes, s.instances, c))(
        scene, cam)
    vis = jax.jit(
        lambda s, c, d: raster.rasterize(s.meshes, s.instances, d, c, cfg)
    )(scene, cam, draws)
    gb, aux = jax.jit(
        lambda s, v, c: resolve.resolve_gbuffer(s, v, c, cfg)
    )(scene, vis, cam)

    # ---------------- 1. shade term ablation ---------------------------
    print("== shade ablation (isolated jit, donate none) ==")

    import dataclasses

    def t(label, fn, *a):
        # slope_time passes a 0-valued eps last; fold it into the gbuffer
        # depth (or first array arg) so the dispatch chain serializes.
        def wrapped(*aa):
            *rest, e = aa
            rest = list(rest)
            for i, r in enumerate(rest):
                if hasattr(r, "depth"):
                    rest[i] = dataclasses.replace(r, depth=r.depth + e)
                    break
                if isinstance(r, jnp.ndarray) and r.dtype == jnp.float32:
                    rest[i] = r + e
                    break
            return fn(*rest)
        ms = slope_time(jax.jit(wrapped), *a)
        print(f"{label:42s} {ms:7.2f} ms")
        return ms

    t("shade full (2 area + 1 point)",
      lambda s, g, a: shading.shade(s, g, cam, aux=a), scene, gb, aux)
    t("shade area_light_scale=2",
      lambda s, g, a: shading.shade(s, g, cam, aux=a, area_light_scale=2),
      scene, gb, aux)
    t("shade area_light_scale=4",
      lambda s, g, a: shading.shade(s, g, cam, aux=a, area_light_scale=4),
      scene, gb, aux)

    lights_none = dataclasses.replace(
        scene,
        lights=dataclasses.replace(
            scene.lights,
            area_intensity=scene.lights.area_intensity[:0],
            area_color=scene.lights.area_color[:0],
            area_points=scene.lights.area_points[:0],
        ),
    )
    t("shade NO area lights (point only)",
      lambda s, g, a: shading.shade(s, g, cam, aux=a), lights_none, gb, aux)
    lights_1 = dataclasses.replace(
        scene,
        lights=dataclasses.replace(
            scene.lights,
            area_intensity=scene.lights.area_intensity[:1],
            area_color=scene.lights.area_color[:1],
            area_points=scene.lights.area_points[:1],
        ),
    )
    t("shade ONE area light",
      lambda s, g, a: shading.shade(s, g, cam, aux=a), lights_1, gb, aux)
    no_point = dataclasses.replace(
        scene,
        lights=dataclasses.replace(
            scene.lights,
            point_position=scene.lights.point_position[:0],
            point_radius=scene.lights.point_radius[:0],
            point_color=scene.lights.point_color[:0],
        ),
    )
    t("shade NO point light (2 area)",
      lambda s, g, a: shading.shade(s, g, cam, aux=a), no_point, gb, aux)

    # pieces: position/normal prep only
    def prep_only(s, g, a):
        depth = g.depth
        from voidin_tpu.core import encoding
        nor = encoding.decode_octahedral_32(g.normal_uv[..., 0])
        pos = shading.world_position_from_depth(depth, cam.clip_to_world)
        cam_pos = jnp.asarray(cam.position)[:3]
        rd = (cam_pos - pos)
        rd = rd / jnp.sqrt(jnp.maximum((rd * rd).sum(-1, keepdims=True),
                                       1e-20))
        return pos.sum() + rd.sum() + nor.sum()
    t("prep only (pos + normal decode)", prep_only, scene, gb, aux)

    # one raw ltc_evaluate_rect at full res
    def one_rect(s, g, a):
        from voidin_tpu.core import encoding
        nor = encoding.decode_octahedral_32(g.normal_uv[..., 0])
        pos = shading.world_position_from_depth(g.depth, cam.clip_to_world)
        cam_pos = jnp.asarray(cam.position)[:3]
        rd = (cam_pos - pos)
        rd = rd / jnp.sqrt(jnp.maximum((rd * rd).sum(-1, keepdims=True),
                                       1e-20))
        ident = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32),
                                 pos.shape[:-1] + (3, 3))
        return shading.ltc_evaluate_rect(
            s, nor, rd, pos, ident, s.lights.area_points[0]).sum()
    t("ONE ltc_evaluate_rect @ full res", one_rect, scene, gb, aux)

    # postprocess
    from voidin_tpu.passes import postprocess as post
    hdr = jnp.abs(jnp.asarray(
        rng.standard_normal((1080, 1920, 3), dtype=np.float32)))
    t("postprocess (sharpen+tonemap)", lambda h: post.postprocess(h), hdr)

    # ---------------- 3. resolve ablation ------------------------------
    if args.skip_resolve:
        return
    print("== resolve ablation ==")
    t("resolve full", lambda s, v, c: resolve.resolve_gbuffer(s, v, c, cfg),
      scene, vis, cam)
    cfg_fused = dataclasses.replace(cfg, fused_resolve_rec=True)
    t("resolve fused_resolve_rec",
      lambda s, v, c: resolve.resolve_gbuffer(s, v, c, cfg_fused),
      scene, vis, cam)

    real_fetch = resolve._fetch_rows

    def fake_fetch(scene_, vis_, tri_id, inst_f16=False):
        rows = real_fetch(scene_, vis_, jnp.zeros_like(tri_id), inst_f16)
        return rows
    resolve._fetch_rows = fake_fetch
    t("resolve rows fetched at index 0",
      lambda s, v, c: resolve.resolve_gbuffer(s, v, c, cfg), scene, vis, cam)
    resolve._fetch_rows = real_fetch

    from voidin_tpu.scene import texture as tex_mod
    real_tri = tex_mod.sample_trilinear
    import voidin_tpu.passes.resolve as resolve_mod

    def fake_tri(pool, tex_id, uv, lod=None, trilinear=True, wh=None,
                 srgb=None):
        shape = uv.shape[:-1] + (4,)
        return jnp.broadcast_to(uv[..., :1] * 0 + 0.5, shape)
    resolve_mod.sample_trilinear = fake_tri
    t("resolve NO texture taps",
      lambda s, v, c: resolve.resolve_gbuffer(s, v, c, cfg), scene, vis, cam)
    resolve_mod.sample_trilinear = real_tri


if __name__ == "__main__":
    main()
