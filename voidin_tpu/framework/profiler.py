"""Per-pass GPU-time profiler.

Equivalent of the reference's wgpu_profiler scope tree (ProfilerCommandEncoder,
app.rs:660-729): per-pass device timings printed as an indented table, gated
on the GPU_PROFILING env var with a 500-frame cadence (app.rs:417-424).

On this TPU platform `block_until_ready` is a no-op (only host transfers
sync), so timings come from chained-dispatch slope measurement
(tools/tpu_timeit.py technique): each pass is jitted separately and timed
with a forced device->host sync. This measures per-pass steady-state device
time, not in-frame overlap — the same semantic as the reference's timestamp
scopes.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp

PROFILING_ENV = "GPU_PROFILING"
DUMP_EVERY = 500  # frames (app.rs:417)


def profiling_enabled() -> bool:
    return bool(os.environ.get(PROFILING_ENV))


def time_fn(fn: Callable, *args, n1: int = 1, n2: int = 4) -> float:
    """Slope-timed milliseconds for one jitted fn (true device time)."""
    f = jax.jit(fn)

    def run(n):
        eps = jnp.float32(0.0)
        out = None
        for _ in range(n):
            out = f(*args, eps)
            eps = jax.tree_util.tree_leaves(out)[0].ravel()[0].astype(jnp.float32) * 0
        return float(eps)

    run(1)
    t0 = time.perf_counter()
    run(n1)
    ta = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(n2)
    tb = time.perf_counter() - t0
    return (tb - ta) / (n2 - n1) * 1000.0


def profile_frame(scene, camera, config, state=None, moving_ids=None) -> List[Tuple[str, float]]:
    """Per-pass timing table for one frame's stages."""
    import numpy as np

    from ..passes import cull, postprocess as pp, raster, resolve, shading, taa as taa_m
    from .renderer import FrameState

    if moving_ids is None:
        moving_ids = jnp.zeros((0,), jnp.int32)
    if state is None:
        state = FrameState.initial(config.width, config.height)

    rows: List[Tuple[str, float]] = []
    draws = jax.jit(lambda s, c: cull.emit_draws(s.meshes, s.instances, c))(
        scene, camera
    )
    rows.append(
        (
            "emit_draws (cull+compact)",
            time_fn(
                lambda e: cull.emit_draws(
                    scene.meshes, scene.instances,
                    camera.replace(znear=camera.znear + e),
                )
            ),
        )
    )
    setup = jax.jit(
        lambda s, c, d: raster.triangle_setup(s.meshes, s.instances, d, c, config)
    )(scene, camera, draws)
    rows.append(
        (
            "triangle setup + clip",
            time_fn(
                lambda e: raster.triangle_setup(
                    scene.meshes,
                    scene.instances,
                    draws,
                    camera.replace(znear=camera.znear + e),
                    config,
                )
            ),
        )
    )
    rc = jax.jit(lambda s: raster.bin_triangles(s, config))(setup)
    rows.append(
        (
            "binning (pairs+sort)",
            time_fn(
                lambda e: raster.bin_triangles({**setup, "sx": setup["sx"] + e}, config)
            ),
        )
    )
    rows.append(
        (
            "fine raster (pallas)",
            time_fn(
                lambda e: raster.fine_raster(
                    rc[0] + e, rc[1], config, backend=config.backend
                )
            ),
        )
    )
    vis = jax.jit(
        lambda s, c, d: raster.rasterize(s.meshes, s.instances, d, c, config)
    )(scene, camera, draws)
    rows.append(
        (
            "gbuffer resolve",
            time_fn(
                lambda e: resolve.resolve_gbuffer(
                    scene, vis.replace(depth=vis.depth + e), camera, config
                )
            ),
        )
    )
    gb, aux = jax.jit(
        lambda s, v, c: resolve.resolve_gbuffer(s, v, c, config)
    )(scene, vis, camera)
    rows.append(
        (
            "deferred shade (LTC)",
            time_fn(
                lambda e: shading.shade(
                    scene, gb.replace(depth=gb.depth + e), camera, aux=aux
                )
            ),
        )
    )
    hdr = jax.jit(lambda s, g, c: shading.shade(s, g, c))(scene, gb, camera)
    rows.append(
        ("taa (reproject+resolve)", time_fn(lambda e: taa_m.taa(hdr + e, gb, camera, state)[:2]))
    )
    rows.append(("postprocess", time_fn(lambda e: pp.postprocess(hdr + e))))
    return rows


def print_table(rows: List[Tuple[str, float]]):
    total = sum(t for _, t in rows)
    print(f"{'pass':30s} {'ms':>9s}")
    for name, t in rows:
        print(f"  {name:28s} {t:9.3f}")
    print(f"{'total (sum of passes)':30s} {total:9.3f}")
