#!/usr/bin/env python
"""Static per-stage cost audit of the north-star frame from XLA's own
cost_analysis(): flops + bytes-accessed per stage prefix (differenced), at
any config, on any backend — no TPU needed, no hand-maintained cost model.

Interpretation notes (honest limits of the numbers):
* bytes/flops come from the HLO the chosen backend compiles; CPU numbers
  are indicative for the TPU program but not identical (fusion differs).
* XLA prices a gather by bytes moved, which UNDERSTATES its cost on TPU
  (~5 ns/row regardless of width, tools/microbench_gather.py) — use the
  printed gather-element counts for the gather-bound stages.
* Times are NOT predicted; this tool ranks stages and quantifies traffic.

Usage: python -u tools/cost_audit.py [--variant all] [--width W --height H]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="base",
                    help="bench.AB_VARIANTS key to audit")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--out", default=None, help="optional JSON path")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
    import jax.numpy as jnp

    import voidin_tpu as vt
    from bench import AB_VARIANTS, build_world
    from voidin_tpu.framework.renderer import FrameState
    from voidin_tpu.ops import fine_raster as fr
    from voidin_tpu.passes import cull as cull_pass
    from voidin_tpu.passes import postprocess as post_pass
    from voidin_tpu.passes import raster as raster_pass
    from voidin_tpu.passes import resolve as resolve_pass
    from voidin_tpu.passes import shading as shading_pass
    from voidin_tpu.passes import taa as taa_pass
    from voidin_tpu.passes.raster import RasterConfig
    from voidin_tpu.scene.texture import linear_to_srgb

    ab_cfg, ab_bf16, ab_ascale, ab_lut = AB_VARIANTS[args.variant]
    shading_pass.LTC_LUT_BF16 = ab_bf16
    shading_pass.LTC_FETCH_PALLAS = (
        "interpret" if ab_lut != "off" else "off"
    )
    world, _moving = build_world()
    cfg = RasterConfig(
        width=args.width, height=args.height,
        tri_capacity=1 << 19, pair_capacity=1 << 19,
        tile_tri_capacity=128, interpret=True, **ab_cfg,
    )
    scene = world.device()
    uniform = vt.Camera(
        position=[0.0, 2.0, 30.0], yaw=0.0, pitch=-5.0,
        aspect=args.width / args.height,
    ).uniform()
    # frame-1 state: with history_valid=False XLA constant-folds the TAA
    # blend away and the taa stage audits as zero
    state = FrameState.initial(cfg.width, cfg.height).replace(
        history_valid=jnp.asarray(True)
    )

    def upto(stage):
        def f():
            draws = cull_pass.emit_draws(
                scene.meshes, scene.instances, uniform
            )
            if stage == "cull":
                return draws.count.astype(jnp.float32)
            setup = raster_pass.triangle_setup(
                scene.meshes, scene.instances, draws, uniform, cfg,
                materials=scene.materials,
            )
            if stage == "setup":
                return setup["raster_rec"].sum()
            rec_sorted, starts, counts, overflow = (
                raster_pass.bin_triangles_pairs(setup, cfg)
            )
            if stage == "bin":
                return rec_sorted.sum() + starts.sum() + counts.sum()
            outs = fr.fine_raster_pairs(
                rec_sorted, starts, counts, tiles_x=cfg.tiles_x,
                tiles_per_step=cfg.tiles_per_step, interpret=cfg.interpret,
            )
            depth, trif = outs[0], outs[1]
            depth, tri_id = raster_pass._untile(
                depth.reshape(depth.shape[0], -1),
                trif.reshape(trif.shape[0], -1), cfg,
            )
            vis = raster_pass.VisBuffer(
                tri_id=tri_id[: cfg.height, : cfg.width],
                depth=depth[: cfg.height, : cfg.width],
                resolve_rec=setup["resolve_rec"],
                overflow=overflow,
            )
            if stage == "raster":
                return vis.depth.sum() + vis.tri_id.sum()
            gb, aux = resolve_pass.resolve_gbuffer(scene, vis, uniform, cfg)
            if stage == "resolve":
                return (gb.depth.sum() + gb.material.sum()
                        + gb.normal_uv.sum() + aux.albedo.sum()
                        + aux.emissive.sum() + aux.mr.sum())
            hdr = shading_pass.shade(scene, gb, uniform, aux=aux,
                                     area_light_scale=ab_ascale)
            if stage == "shade":
                return hdr.sum()
            hdr2, _st = taa_pass.taa(hdr, gb, uniform, state)
            if stage == "taa":
                return hdr2.sum()
            return linear_to_srgb(post_pass.postprocess(hdr2)).sum()

        return f

    stages = ["cull", "setup", "bin", "raster", "resolve", "shade", "taa",
              "full"]
    keys = ("flops", "bytes accessed")
    cum = {}
    for s in stages:
        compiled = jax.jit(upto(s)).lower().compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):  # older jax returns [dict]
            ca = ca[0]
        cum[s] = {k: float(ca.get(k, 0.0)) for k in keys}
        print(f"# compiled {s}")

    print(f"\nvariant={args.variant}  {args.width}x{args.height}  "
          f"(XLA cost_analysis, CPU lowering)")
    print(f"{'stage':10s} {'GF marginal':>12s} {'GB marginal':>12s}")
    prev = {k: 0.0 for k in keys}
    marginals = {}
    for s in stages:
        d = {k: cum[s][k] - prev[k] for k in keys}
        marginals[s] = {
            "gflops": round(d["flops"] / 1e9, 3),
            "gbytes": round(d["bytes accessed"] / 1e9, 3),
        }
        print(f"{s:10s} {d['flops'] / 1e9:12.3f} "
              f"{d['bytes accessed'] / 1e9:12.3f}")
        prev = cum[s]

    if args.out:
        import json

        with open(args.out, "w") as f:
            json.dump(
                {
                    "variant": args.variant,
                    "size": [args.width, args.height],
                    "method": "XLA cost_analysis, CPU lowering, stage-prefix"
                              " differences",
                    "marginal": marginals,
                },
                f, indent=2,
            )
            f.write("\n")
        print("wrote", args.out)


if __name__ == "__main__":
    main()
