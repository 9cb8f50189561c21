#!/usr/bin/env python
"""A/B RasterConfig.rt_unroll on the config-5 production frame.

The threaded walk advances one node per packet per while-loop step; if
the 274 ms config-5 frame is iteration-bound (fixed per-step dispatch
overhead), composing M masked steps per iteration (rt_unroll=M) cuts
iterations ~M-x at ~M-x more (tiny) per-step gathers/flops. Bit-exact
incl. max_steps cuts (tests/test_traverse_threaded.py).

Times bench.run_preset's production path per unroll value.

Usage: python -u tools/r5_c5_unroll.py [--cpu] [--unrolls 1,2,4,8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--unrolls", default="1,4,8,2")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
    import dataclasses

    import numpy as np

    from bench import retry_transient, tuned_options, apply_ab_runtime_options
    from voidin_tpu.framework.presets import PRESETS
    from voidin_tpu.framework.renderer import Renderer
    from voidin_tpu.passes.raster import RasterConfig

    backend = jax.default_backend()
    W, H = (320, 184) if args.cpu else (1920, 1080)
    p = PRESETS[5](W / H)
    ab_name, (ab_cfg, ab_bf16, ab_ascale, ab_lut), _ = tuned_options(
        with_meta=True
    )
    apply_ab_runtime_options(ab_bf16, ab_ascale, ab_lut, backend)
    print(f"backend={backend} options={ab_name}")
    scene = p.world.device(with_tlas=True)

    base_hit = None
    for unroll in [int(x) for x in args.unrolls.split(",")]:
        cfg = RasterConfig(
            width=W, height=H, tri_capacity=p.tri_capacity,
            pair_capacity=p.pair_capacity,
            tile_tri_capacity=p.tile_tri_capacity,
            quad_edge_capacity=p.quad_edge_capacity,
            taa_edge_capacity=p.taa_edge_capacity,
            rt_packet=p.rt_packet, rt_threaded=p.rt_threaded,
            rt_unroll=unroll, interpret=backend == "cpu", **ab_cfg,
        )
        r = Renderer(
            scene, cfg, enable_cull=p.enable_cull, enable_taa=p.enable_taa,
            enable_rt_shadows=True, rt_shadow_scale=p.rt_shadow_scale,
            area_light_scale=ab_ascale,
            moving_ids=np.asarray(p.moving_ids, np.int32),
        )

        def measure():
            img = r.render(p.camera)
            s0 = float(img.sum())
            times = {}
            for k in (1, 3):
                t0 = time.perf_counter()
                for _ in range(k):
                    img = r.render(p.camera, dt=1 / 60)
                _ = float(img.sum())
                times[k] = time.perf_counter() - t0
            return (times[3] - times[1]) / 2 * 1000.0, s0

        ms, s0 = retry_transient(measure, label=f"unroll={unroll}")
        if base_hit is None:
            base_hit = s0
        same = "img==u1" if s0 == base_hit else f"IMG DIFFERS ({s0} vs {base_hit})"
        print(f"rt_unroll={unroll:2d}  {ms:8.2f} ms  {same}", flush=True)


if __name__ == "__main__":
    main()
