#!/usr/bin/env python
"""A/B the round-3 perf options on the north-star frame (slope-timed):

  base                 — current defaults
  fused_rec            — RasterConfig.fused_resolve_rec (96 B resolve rows)
  inst_f16             — RasterConfig.inst_rec_f16 (48 B f16 fused record)
  ltc_bf16             — shading.LTC_LUT_BF16 (bf16 LUT weight matrices)
  area_half            — area_light_scale=2 (flagged deviation)
  lut_kernel           — Pallas LUT-fetch kernel (weights in VMEM)
  quad                 — RasterConfig.quad_rate_resolve (2x2-coherent
                         resolve gathers, bit-exact)
  all / all_lut / all_q — composed variants (see bench.AB_VARIANTS)

The variant list lives in bench.AB_VARIANTS; bench.py applies the winner
from AB_OPTIONS.json to the official north-star run.

Usage: python -u tools/ab_options.py [--cpu]
Honest timing only via tools/tpu_timeit.slope_time (block_until_ready is
a no-op on the axon tunnel).
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
    ap.add_argument(
        "--only",
        default="",
        help="comma-separated variant subset (e.g. base,all_lut_p,slim_p) "
        "— a fresh container has an EMPTY jax compile cache, and a full "
        "17-variant 1080p sweep costs hours of compiles; the incremental "
        "writer + current-build stamp make a subset capture valid for "
        "bench.tuned_options (it takes the min over measured entries)",
    )
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "AB_OPTIONS.json",
        ),
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
    import jax.numpy as jnp

    import voidin_tpu as vt
    from bench import build_world
    from voidin_tpu.framework.renderer import (
        FrameState, Globals, render_frame,
    )
    from voidin_tpu.passes import shading
    from voidin_tpu.passes.raster import RasterConfig

    backend = jax.default_backend()
    world, moving = build_world()
    scene = world.device()
    cfg0 = RasterConfig(
        width=1920, height=1080, tri_capacity=1 << 19,
        pair_capacity=1 << 19, tile_tri_capacity=128, quad_edge_capacity=1 << 15, taa_edge_capacity=1 << 12, tap_edge_capacity=1 << 15,
        interpret=backend == "cpu",
    )
    cam = vt.Camera(position=[0.0, 2.0, 30.0], yaw=0.0, pitch=-5.0,
                    aspect=1920 / 1080).uniform()
    state = FrameState.initial(cfg0.width, cfg0.height)
    moving_j = jnp.asarray(moving)
    g = Globals.make(cfg0.width, cfg0.height, frame=1, time=1.0, dt=0.0)

    # Single source of truth: bench.AB_VARIANTS (bench.tuned_options applies
    # the winner this sweep finds).
    from bench import AB_VARIANTS, apply_ab_runtime_options, retry_transient

    variants = [(name, *opts) for name, opts in AB_VARIANTS.items()]
    if args.only:
        keep = [s.strip() for s in args.only.split(",") if s.strip()]
        unknown = [k for k in keep if k not in AB_VARIANTS]
        if unknown:
            raise SystemExit(f"unknown variants: {unknown}")
        variants = [v for v in variants if v[0] in keep]
    print(f"backend={backend}")
    results = {}
    for name, cfg_kw, bf16, ascale, lut in variants:
        cfg = dataclasses.replace(cfg0, **cfg_kw)
        apply_ab_runtime_options(bf16, ascale, lut, backend)
        try:
            def f(eps):
                camera = cam.replace(znear=cam.znear + eps)
                img, _st, _sc, _aux = render_frame(
                    scene, camera, g, state, moving_j, cfg,
                    area_light_scale=ascale,
                )
                return img.sum()

            jf = jax.jit(f)
            # the tunnel throws transient 'Internal' flakes (CLAUDE.md) —
            # retry before recording a variant as failed
            ms = retry_transient(lambda: slope_time(jf), attempts=3,
                                 label=f"ab {name}")
        except Exception as e:  # a variant that fails to compile (e.g. a
            # Mosaic limitation in an unproven kernel) must not kill the
            # rest of the sweep; tuned_options ignores non-numeric entries
            print(f"{name:12s} FAILED: {str(e)[:160]}", flush=True)
            results[name] = f"error: {str(e)[:200]}"
            _write(args.out, backend, results)
            continue
        finally:
            shading.LTC_LUT_BF16 = False
            shading.LTC_FETCH_PALLAS = "off"
        results[name] = ms
        base_ms = results.get("base")
        if isinstance(base_ms, (int, float)) and name != "base":
            print(f"{name:12s} {ms:8.2f} ms   ({ms - base_ms:+6.2f} vs base)",
                  flush=True)
        else:
            print(f"{name:12s} {ms:8.2f} ms", flush=True)
        _write(args.out, backend, results)  # incremental: a timeout mid-
        # sweep keeps every variant measured so far
    print(f"wrote {args.out}")


def _write(path, backend, results):
    import json

    from bench import ab_variants_stamp

    with open(path, "w") as f:
        json.dump(
            {
                "backend": backend,
                "scene": "north-star 10k instances 1080p",
                "method": "tools/tpu_timeit.slope_time",
                # definition stamp: bench.tuned_options refuses captures
                # whose variant definitions differ from the current build
                "variants": ab_variants_stamp(),
                "ms_per_variant": {
                    k: round(v, 3) if isinstance(v, (int, float)) else v
                    for k, v in results.items()
                },
            },
            f,
            indent=2,
        )


if __name__ == "__main__":
    main()
