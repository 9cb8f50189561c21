#!/usr/bin/env python
"""Per-pass TPU profile of the north-star bench scene -> BENCH_DETAIL.json.

Usage: python -u tools/profile_northstar.py [--out BENCH_DETAIL.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_DETAIL.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

    import numpy as np

    import voidin_tpu as vt  # noqa: F401
    from bench import build_world
    from voidin_tpu.framework.profiler import print_table, profile_frame
    from voidin_tpu.framework.renderer import Renderer
    from voidin_tpu.passes.raster import RasterConfig

    backend = jax.default_backend()
    world, moving = build_world()
    cfg = RasterConfig(
        width=1920,
        height=1080,
        tri_capacity=1 << 20,
        pair_capacity=1 << 20,
        tile_tri_capacity=128,
        interpret=backend == "cpu",
    )
    scene = world.device()
    cam = vt.Camera(
        position=[0.0, 2.0, 30.0], yaw=0.0, pitch=-5.0, aspect=1920 / 1080
    )
    uniform = cam.uniform()

    rows = profile_frame(scene, uniform, cfg, moving_ids=moving)
    print_table(rows)
    # Whole-frame number for cross-checking the sum of passes.
    r = Renderer(scene, cfg, moving_ids=moving)
    img = r.render(cam)
    _ = float(img.sum())
    import time

    times = {}
    for n in (1, 9):
        t0 = time.perf_counter()
        for _ in range(n):
            img = r.render(cam, dt=1 / 60)
        _ = float(img.sum())
        times[n] = time.perf_counter() - t0
    frame_ms = (times[9] - times[1]) / 8 * 1000.0

    out = {
        "backend": backend,
        "scene": "north-star 10k instances 1080p",
        "passes_ms": {name: round(t, 3) for name, t in rows},
        "sum_of_passes_ms": round(sum(t for _, t in rows), 3),
        "whole_frame_ms": round(frame_ms, 3),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print("wrote", args.out, "whole frame:", round(frame_ms, 2), "ms")


if __name__ == "__main__":
    main()
