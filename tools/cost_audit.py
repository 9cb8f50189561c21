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
    from voidin_tpu.passes import shading as shading_pass
    from voidin_tpu.passes.raster import RasterConfig

    ab_cfg, ab_bf16, ab_ascale, ab_lut = AB_VARIANTS[args.variant]
    shading_pass.LTC_LUT_BF16 = ab_bf16
    shading_pass.LTC_FETCH_PALLAS = (
        "interpret" if ab_lut != "off" else "off"
    )
    world, _moving = build_world()
    cfg = RasterConfig(
        width=args.width, height=args.height,
        tri_capacity=1 << 19, pair_capacity=1 << 19,
        tile_tri_capacity=128, quad_edge_capacity=1 << 15, taa_edge_capacity=1 << 12, tap_edge_capacity=1 << 15, interpret=True, **ab_cfg,
    )
    scene = world.device()
    uniform = vt.Camera(
        position=[0.0, 2.0, 30.0], yaw=0.0, pitch=-5.0,
        aspect=args.width / args.height,
    ).uniform()
    import jax.numpy as jnp

    # frame-1 state: with history_valid=False XLA constant-folds the TAA
    # blend away and the taa stage audits as zero
    state = FrameState.initial(cfg.width, cfg.height).replace(
        history_valid=jnp.asarray(True)
    )

    # one shared stage sequence for all audit tools (tools/stage_prefix.py)
    from tools.stage_prefix import STAGES as stages
    from tools.stage_prefix import make_upto

    upto_f = make_upto(scene, uniform, cfg, state, ab_ascale=ab_ascale)

    def upto(stage):
        f = upto_f(stage)
        return lambda: f(scene, state, jnp.float32(0.0))

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
