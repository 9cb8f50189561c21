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

Measurement contract (round-5 reconciliation, VERDICT r4 Weak #1): each
variant is timed by driving the PRODUCTION `Renderer.render` loop — the
same jitted program, same slimmed output pytree (img + TAA state +
instances + scalar aux), same donation — with the same two-point slope
bench.py uses. The round-4 sweep timed an `img.sum()`-only closure whose
state/scene/aux outputs XLA dead-code-eliminated, so it optimized a
different program than bench shipped (58.5 ms sweep vs 99.2 ms official).
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
        "--smoke", action="store_true",
        help="tiny-scale CPU wiring check (320x184, 300 instances) — "
        "drives the exact sweep loop in minutes; NEVER writes AB_OPTIONS",
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

    if args.cpu or args.smoke:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
    import voidin_tpu as vt
    from bench import build_world
    from voidin_tpu.framework.renderer import Renderer
    from voidin_tpu.passes import shading
    from voidin_tpu.passes.raster import RasterConfig

    backend = jax.default_backend()
    world, moving = build_world(n_instances=300 if args.smoke else 10_000)
    scene = world.device()
    if args.smoke:
        cfg0 = RasterConfig(
            width=320, height=184, tri_capacity=1 << 14,
            pair_capacity=1 << 14, tile_tri_capacity=128,
            quad_edge_capacity=1 << 10, taa_edge_capacity=1 << 10,
            tap_edge_capacity=1 << 10, interpret=True,
        )
        args.out = "/tmp/ab_smoke.json"
    else:
        cfg0 = RasterConfig(
            width=1920, height=1080, tri_capacity=1 << 19,
            pair_capacity=1 << 19, tile_tri_capacity=128, quad_edge_capacity=1 << 15, taa_edge_capacity=1 << 12, tap_edge_capacity=1 << 15,
            interpret=backend == "cpu",
        )
    cam = vt.Camera(position=[0.0, 2.0, 30.0], yaw=0.0, pitch=-5.0,
                    aspect=cfg0.width / cfg0.height)

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
            # the PRODUCTION program: Renderer.render's jitted frame with
            # the slimmed output pytree + donation — identical to what
            # bench.py times for the official number
            r = Renderer(scene, cfg, moving_ids=moving,
                         area_light_scale=ascale)

            def measure():
                img = r.render(cam)  # compile + warm
                _ = float(img.sum())
                n1, n2 = (1, 9) if backend != "cpu" else (1, 3)
                times = {}
                for n in (n1, n2):
                    t0 = time.perf_counter()
                    for _ in range(n):
                        img = r.render(cam, dt=1 / 60)
                    _ = float(img.sum())  # device->host: the only real sync
                    times[n] = time.perf_counter() - t0
                return (times[n2] - times[n1]) / (n2 - n1) * 1000.0

            # the tunnel throws transient 'Internal' flakes (CLAUDE.md) —
            # retry before recording a variant as failed
            ms = retry_transient(measure, attempts=3, label=f"ab {name}")
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
                "method": "production Renderer.render two-point slope "
                          "(same program bench.py ships)",
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
