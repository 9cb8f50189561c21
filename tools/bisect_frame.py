#!/usr/bin/env python
"""Bisect the north-star frame: slope-time cumulative stage prefixes of ONE
jitted program to find where the whole-frame time lives (the per-pass table
in tools/profile_northstar.py jits passes separately; in-context costs can
differ once XLA schedules the full program).

Usage: python -u tools/bisect_frame.py [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from tools.tpu_timeit import slope_time  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None,
                    help="write marginals as BENCH_DETAIL-style JSON")
    ap.add_argument("--variant", default=None,
                    help="A/B variant to profile (bench.AB_VARIANTS key); "
                    "default: the AB_OPTIONS.json winner bench.py ships")
    ap.add_argument("--config", type=int, default=0,
                    help="profile a BASELINE preset scene (pose + "
                    "capacities) instead of the north-star world")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
    import jax.numpy as jnp

    import voidin_tpu as vt
    from bench import build_world
    from voidin_tpu.framework.renderer import FrameState
    from voidin_tpu.passes.raster import RasterConfig

    backend = jax.default_backend()
    # Profile the SAME configuration bench.py ships (the sweep winner),
    # so BENCH_DETAIL's stage marginals describe the official number.
    from bench import AB_VARIANTS, apply_ab_runtime_options, tuned_options

    if args.variant:
        ab_name, (ab_cfg, ab_bf16, ab_ascale, ab_lut) = (
            args.variant, AB_VARIANTS[args.variant]
        )
    else:
        ab_name, (ab_cfg, ab_bf16, ab_ascale, ab_lut) = tuned_options()
    apply_ab_runtime_options(ab_bf16, ab_ascale, ab_lut, backend)
    print(f"variant={ab_name} config={args.config or 'north-star'}")
    if args.config:
        import numpy as np

        from voidin_tpu.framework.presets import PRESETS

        p = PRESETS[args.config](1920 / 1080)
        world, moving = p.world, np.asarray(p.moving_ids, np.int32)
        cfg = RasterConfig(
            width=1920, height=1080, tri_capacity=p.tri_capacity,
            pair_capacity=p.pair_capacity,
            tile_tri_capacity=p.tile_tri_capacity,
            quad_edge_capacity=p.quad_edge_capacity,
            taa_edge_capacity=p.taa_edge_capacity,
            tap_edge_capacity=p.tap_edge_capacity,
            interpret=backend == "cpu", **ab_cfg,
        )
        cam = p.camera
    else:
        world, moving = build_world()
        cfg = RasterConfig(
            width=1920, height=1080, tri_capacity=1 << 19, pair_capacity=1 << 19,
            tile_tri_capacity=128, quad_edge_capacity=1 << 15, taa_edge_capacity=1 << 12, tap_edge_capacity=1 << 15, interpret=backend == "cpu", **ab_cfg,
        )
        cam = vt.Camera(position=[0.0, 2.0, 30.0], yaw=0.0, pitch=-5.0,
                        aspect=1920 / 1080)
    scene = world.device()
    uniform = cam.uniform()
    state = FrameState.initial(cfg.width, cfg.height)
    # steady-state (frame >= 1) TAA state, passed as a runtime ARG: a
    # closure constant with history_valid=False lets XLA DCE the whole
    # TAA resolve (the round-4 blind spot — tools/r5_tail_probe3.py)
    state_dev = jax.device_put(
        state.replace(history_valid=jnp.asarray(True))
    )

    # one shared stage sequence for all audit tools (tools/stage_prefix.py)
    from tools.stage_prefix import STAGES, make_upto

    upto_f = make_upto(scene, uniform, cfg, state, ab_ascale=ab_ascale)

    def upto(stage):
        return jax.jit(upto_f(stage))

    stages = STAGES
    # INTERLEAVED repeats: the tunnel's throughput drifts ~10% between
    # minutes, so a single sweep can produce negative marginals (round-2
    # VERDICT Weak #3). Cycling the full stage list per repeat spreads the
    # drift across all stages; mean +- spread is recorded per stage.
    reps = 1 if backend == "cpu" else 3
    fns = {s: upto(s) for s in stages}
    cums = {s: [] for s in stages}
    print(f"backend={backend} repeats={reps}")
    scene_dev = jax.device_put(scene)
    for r in range(reps):
        for s in stages:
            cums[s].append(slope_time(fns[s], scene_dev, state_dev))
    import numpy as _np

    marginals = {}
    variance = {}
    prev_mean = 0.0
    for s in stages:
        arr = _np.asarray(cums[s])
        mean, spread = float(arr.mean()), float(arr.max() - arr.min())
        marginals[s] = round(mean - prev_mean, 3)
        variance[s] = dict(
            cum_ms=round(mean, 3),
            spread_ms=round(spread, 3),
            samples=[round(float(x), 3) for x in arr],
        )
        print(f"{s:10s} cum {mean:8.2f} ms (±{spread / 2:5.2f})  "
              f"marginal {mean - prev_mean:8.2f} ms")
        prev_mean = mean
    cum_full = prev_mean

    # The real frame program (render_frame), threading scene/state exactly
    # like Renderer.render — isolates donation/aux overhead vs the
    # stage-prefix program above.
    import time as _time

    from voidin_tpu.framework.renderer import Globals, render_frame

    moving_j = jnp.asarray(moving)

    def whole(sc, cam_u, g, st, mov):
        return render_frame(sc, cam_u, g, st, mov, cfg,
                            area_light_scale=ab_ascale)

    # legacy full-output program: quantifies the output-materialization
    # tail the production path eliminated (round-4 reconciliation)
    f = jax.jit(whole)

    def run(n, sc, st):
        eps = jnp.float32(0.0)
        for i in range(n):
            g = Globals.make(cfg.width, cfg.height, frame=i,
                             time=1.0, dt=eps)
            img, st, sc, aux = f(sc, uniform, g, st, moving_j)
            eps = img.ravel()[0] * 0
        return float(eps), sc, st

    sc = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), scene)
    st = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), state)
    _, sc, st = run(1, sc, st)  # compile
    t0 = _time.perf_counter()
    _, sc, st = run(1, sc, st)
    ta = _time.perf_counter() - t0
    t0 = _time.perf_counter()
    _, sc, st = run(5, sc, st)
    tb = _time.perf_counter() - t0
    ms = (tb - ta) / 4 * 1000.0
    print(f"{'render_frame (full outputs)':28s} {ms:8.2f} ms")
    marginals["render_frame (full outputs)"] = round(ms, 3)

    # the PRODUCTION program (slimmed outputs + donation), via Renderer —
    # the same jitted fn bench.py's official number times
    from voidin_tpu.framework.renderer import Renderer

    cam_obj = cam
    r = Renderer(scene, cfg, moving_ids=moving, area_light_scale=ab_ascale)
    img = r.render(cam_obj)
    _ = float(img.sum())
    times = {}
    for n in (1, 5):
        t0 = _time.perf_counter()
        for _ in range(n):
            img = r.render(cam_obj, dt=1 / 60)
        _ = float(img.sum())
        times[n] = _time.perf_counter() - t0
    ms = (times[5] - times[1]) / 4 * 1000.0
    print(f"{'render_frame (production)':28s} {ms:8.2f} ms")
    marginals["render_frame (production)"] = round(ms, 3)

    if args.out:
        import json

        with open(args.out, "w") as f:
            json.dump(
                {
                    "backend": backend,
                    "variant": ab_name,
                    "scene": "north-star 10k instances 1080p",
                    "method": "in-context cumulative slope (tools/bisect_frame.py)",
                    "stage_marginal_ms": marginals,
                    "stage_variance": variance,
                    "repeats": reps,
                    "sum_of_stages_ms": round(cum_full, 3),
                },
                f,
                indent=2,
            )
            f.write("\n")
        print("wrote", args.out)


if __name__ == "__main__":
    main()
