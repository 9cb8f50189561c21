#!/usr/bin/env python
"""Tail probe 2: the production program costs ~99 ms however it's driven
(probe 1), yet round-4's img-only closure measured ~58 ms for the same
variant. Three remaining differences: (1) donation of the TAA state,
(2) cross-frame state feedback (serial dependence), (3) the output set
(img-only lets XLA DCE state/instances/aux). Time all combinations with
a fresh NON-donated jit of the same render_frame config.

Usage: python -u tools/r5_tail_probe2.py [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope(fn_once, sync, n1=1, n2=9):
    ts = {}
    for n in (n1, n2):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn_once()
        sync(out)
        ts[n] = time.perf_counter() - t0
    return (ts[n2] - ts[n1]) / (n2 - n1) * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import dataclasses

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
    import jax.numpy as jnp

    import voidin_tpu as vt
    from bench import (AB_VARIANTS, apply_ab_runtime_options, build_world,
                       retry_transient)
    from voidin_tpu.framework.renderer import (FrameState, Globals,
                                               production_slim, render_frame)
    from voidin_tpu.passes.raster import RasterConfig

    backend = jax.default_backend()
    world, moving = build_world(n_instances=300 if args.cpu else 10_000)
    scene = world.device()
    if args.cpu:
        cfg = RasterConfig(width=320, height=184, tri_capacity=1 << 14,
                           pair_capacity=1 << 14, tile_tri_capacity=128,
                           interpret=True)
    else:
        cfg = RasterConfig(width=1920, height=1080, tri_capacity=1 << 19,
                           pair_capacity=1 << 19, tile_tri_capacity=128)
    cfg_kw, bf16, ascale, lut = AB_VARIANTS["all_lut_p"]
    cfg = dataclasses.replace(cfg, **cfg_kw)
    apply_ab_runtime_options(bf16, ascale, lut, backend)
    cam = vt.Camera(position=[0.0, 2.0, 30.0], yaw=0.0, pitch=-5.0,
                    aspect=cfg.width / cfg.height)
    print(f"backend={backend} variant=all_lut_p (fresh jits, no donation)")

    uniform = jax.device_put(cam.uniform())
    globals_ = jax.device_put(
        Globals.make(cfg.width, cfg.height, frame=3, time=0.05, dt=1 / 60)
    )
    state0 = jax.device_put(FrameState.initial(cfg.width, cfg.height))
    jm = jax.device_put(jnp.zeros((0, 4, 4), jnp.float32))
    moving_d = jax.device_put(jnp.asarray(moving))

    def full(sc, u, g, st, mv, j):
        return production_slim(*render_frame(
            sc, u, g, st, mv, config=cfg, enable_cull=True,
            enable_taa=True, enable_post=True, area_light_scale=ascale,
            joint_mats=j,
        ))

    f_full = jax.jit(full)
    f_img = jax.jit(lambda *a: full(*a)[0])

    def sync(img):
        _ = float(img.sum())

    # E: full outputs, NO donation, constant inputs (no feedback)
    def once_e():
        return f_full(scene, uniform, globals_, state0, moving_d, jm)[0]

    sync(once_e())
    ms_e = retry_transient(lambda: slope(once_e, sync), label="E")
    print(f"E full outputs, const inputs   {ms_e:8.2f} ms")

    # F: full outputs, NO donation, state+instances fed back
    box = dict(scene=scene, state=state0)

    def once_f():
        img, st, inst, aux = f_full(
            box["scene"], uniform, globals_, box["state"], moving_d, jm
        )
        box["state"] = st
        box["scene"] = box["scene"].replace(instances=inst)
        return img

    sync(once_f())
    ms_f = retry_transient(lambda: slope(once_f, sync), label="F")
    print(f"F full outputs, state feedback {ms_f:8.2f} ms")

    # G: img-only output (XLA DCEs state/instances/aux), const inputs —
    # the round-4 sweep's closure
    def once_g():
        return f_img(scene, uniform, globals_, state0, moving_d, jm)

    sync(once_g())
    ms_g = retry_transient(lambda: slope(once_g, sync), label="G")
    print(f"G img-only output, const       {ms_g:8.2f} ms")

    print()
    print(f"E const/full {ms_e:.1f} | F feedback/full {ms_f:.1f} | "
          f"G img-only {ms_g:.1f}")


if __name__ == "__main__":
    main()
