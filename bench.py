#!/usr/bin/env python
"""North-star benchmark: ms/frame at 1080p on a 10k-instance culled scene
(cull + raster + shade + TAA), per BASELINE.json.

Scene: 10k instances (spheres / cubes / planes) scattered over a large
field so the frustum culls most of them, with LTC area lights, a point
light, TAA and postprocessing — the full frame pipeline in one jit.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is (16.6 ms target) / measured — >= 1.0 means the >=60 FPS
target is met.
"""

import json
import sys
import time

import numpy as np


def build_world(n_instances=10_000, seed=0):
    import voidin_tpu as vt
    from voidin_tpu.core import mathx

    rng = np.random.default_rng(seed)
    w = vt.World()
    w.lights.add_point_light([0, 10.0, 0], 40.0, [1.0, 0.95, 0.9])
    w.add_area_light(
        [1, 1, 1],
        7.0,
        (5.0, 8.0),
        np.asarray(
            mathx.from_translation([0, 18, 10])
            @ mathx.from_rotation_x(np.float32(-np.pi / 4))
        ),
    )
    w.add_area_light(
        [1, 0.8, 0.6],
        5.0,
        (6.0, 6.0),
        np.asarray(
            mathx.from_translation([0, 18, -40])
            @ mathx.from_rotation_x(np.float32(-3 * np.pi / 4))
        ),
    )

    sphere = w.meshes.add(vt.mesh.make_uv_sphere(1.0, 4))  # ~1k tris
    cube = w.meshes.add(vt.mesh.make_cube_mesh(1.5))
    meshes = [sphere, cube, vt.mesh.SPHERE_1_MESH]

    # 10k instances in a 400x400 field; the camera sees a narrow slice.
    moving = []
    for i in range(n_instances - w.instances.__len__()):
        x = rng.uniform(-200, 200)
        z = rng.uniform(-200, 200)
        y = rng.uniform(-2, 6)
        t = mathx.from_translation([x, y, z]) @ mathx.from_scale(
            float(rng.uniform(0.5, 1.5))
        )
        mid = int(rng.integers(0, len(meshes)))
        idx = w.instances.add(np.asarray(t), meshes[mid], 0)
        if i % 50 == 0:
            moving.append(idx)
    # ground
    w.instances.add(
        np.asarray(mathx.from_translation([0, -3, 0]) @ mathx.from_scale(500.0)),
        vt.mesh.HORIZONTAL_PLANE_MESH,
        0,
    )
    return w, np.asarray(moving, np.int32)


def main():
    import jax

    import voidin_tpu as vt
    from voidin_tpu.framework.renderer import Renderer
    from voidin_tpu.passes.raster import RasterConfig

    backend = jax.default_backend()
    world, moving = build_world()
    cfg = RasterConfig(
        width=1920,
        height=1080,
        tri_capacity=1 << 20,
        pair_capacity=1 << 22,
        tile_tri_capacity=128,
        interpret=backend == "cpu",
    )
    r = Renderer(world.device(), cfg, moving_ids=moving)
    cam = vt.Camera(
        position=[0.0, 2.0, 30.0], yaw=0.0, pitch=-5.0, aspect=1920 / 1080
    )

    # Warmup / compile.
    img = r.render(cam)
    img.block_until_ready()

    n = 20 if backend != "cpu" else 3
    t0 = time.perf_counter()
    for _ in range(n):
        img = r.render(cam, dt=1 / 60)
    img.block_until_ready()
    ms = (time.perf_counter() - t0) / n * 1000.0

    draws = int(r.aux["draw_count"])
    overflow = int(r.aux["overflow"])
    print(
        f"# backend={backend} draws={draws} overflow={overflow} "
        f"coverage={int(r.aux['vis_coverage'])}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "ms/frame 1080p 10k-instance culled scene (cull+raster+shade+TAA)",
                "value": round(ms, 3),
                "unit": "ms",
                "vs_baseline": round(16.6 / ms, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
