#!/usr/bin/env python
"""Count non-uniform (edge) 2x2 quads in the north-star frame's visibility
buffer at 1080p — sizes RasterConfig.quad_edge_capacity for bench.py.

Backend-independent (the XLA-twin raster is bit-identical to the Pallas
kernel), so this runs on CPU. Quad-rate resolve gathers cost by CAPACITY:
keep it tight per scene, like tri/pair capacities (CLAUDE.md cost model).

Usage: python -u tools/count_edge_quads.py [--config N] [--frames K]
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8,
                    help="frames to step (moving instances change edges)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
    import jax.numpy as jnp
    import numpy as np

    import bench
    import voidin_tpu as vt
    from voidin_tpu.passes import cull as cull_pass
    from voidin_tpu.passes import raster as raster_pass
    from voidin_tpu.passes import update as update_pass
    from voidin_tpu.passes.raster import RasterConfig

    world, moving = bench.build_world(n_instances=10_000)
    scene = world.device()
    W, H = 1920, 1080
    # tile_tri_capacity 512, not the bench's 128: the XLA twin bins with a
    # PER-TILE cap (the pairs path the TPU bench runs has none), and 128
    # drops records at this pose — the count would be slightly off.
    cfg = RasterConfig(
        width=W, height=H, tri_capacity=1 << 19, pair_capacity=1 << 19,
        tile_tri_capacity=512, backend="xla",
    )
    cam = vt.Camera(position=[0.0, 2.0, 30.0], yaw=0.0, pitch=-5.0,
                    aspect=W / H)
    uni = cam.uniform()

    @jax.jit
    def edge_count(scene_, t):
        inst = update_pass.compute_update(
            scene_.instances, jnp.asarray(moving), t, jnp.asarray(1 / 60.0)
        )
        scene_ = scene_.replace(instances=inst)
        draws = cull_pass.emit_draws(scene_.meshes, scene_.instances, uni)
        vis = raster_pass.rasterize(
            scene_.meshes, scene_.instances, draws, uni, cfg,
            materials=scene_.materials,
        )
        q = vis.tri_id.reshape(H // 2, 2, W // 2, 2)
        anchor = q[:, 0, :, 0]
        nonuni = ~jnp.all(q == anchor[:, None, :, None], axis=(1, 3))
        return jnp.sum(nonuni.astype(jnp.int32)), vis.overflow

    counts = []
    for f in range(args.frames):
        c, ovf = edge_count(scene, jnp.asarray(f / 60.0, jnp.float32))
        counts.append(int(c))
        print(f"frame {f}: edge quads {int(c)} "
              f"({100 * int(c) / (H * W // 4):.1f}% of {H * W // 4}) "
              f"overflow {int(ovf)}", flush=True)
    mx = max(counts)
    cap = 1 << (mx - 1).bit_length()  # next pow2
    if cap < mx * 1.25:
        cap *= 2  # headroom for pose drift
    print(f"max {mx} -> suggested quad_edge_capacity {cap}")


if __name__ == "__main__":
    main()
