#!/usr/bin/env python
"""Round-5 tail probe: WHERE does the production frame's off-stage ~40 ms go?

Round 4 ended with three disagreeing numbers (VERDICT r4 Weak #1): stages
sum 63.4 ms, production render 98.4 ms, img-only DCE'd sweep closure
58.5 ms. The round-5 output-pytree slimming did NOT close the gap (base
99.9 / all_lut_p 98.8 on the reconciled sweep) — so the tail is not
output materialization. Next suspect: per-frame HOST work in
Renderer.render — the camera uniform (10 numpy leaves) + globals (5) +
joint mats are re-built on host and re-transferred through the axon
tunnel EVERY frame, and each small host->device transfer through the
tunnel has ~ms latency.

Variants timed (two-point slope, same program):
  A  production Renderer.render loop          (the official number)
  B  raw jitted fn, ALL inputs pre-staged on device, state/instances fed
     back (zero per-frame host work)           -> the pure device frame
  C  raw fn, camera+globals device_put each call (transfer cost only)
  D  production loop minus camera rebuild (reuse first uniform)

Usage: python -u tools/r5_tail_probe.py [--cpu]
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

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
    import jax.numpy as jnp

    import voidin_tpu as vt
    from bench import (AB_VARIANTS, apply_ab_runtime_options, build_world,
                       retry_transient)
    from voidin_tpu.framework.renderer import Globals, Renderer
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
    name = "all_lut_p"
    import dataclasses
    cfg_kw, bf16, ascale, lut = AB_VARIANTS[name]
    cfg = dataclasses.replace(cfg, **cfg_kw)
    apply_ab_runtime_options(bf16, ascale, lut, backend)
    cam = vt.Camera(position=[0.0, 2.0, 30.0], yaw=0.0, pitch=-5.0,
                    aspect=cfg.width / cfg.height)
    print(f"backend={backend} variant={name}")

    r = Renderer(scene, cfg, moving_ids=moving, area_light_scale=ascale)

    # ---- A: production loop --------------------------------------------
    def once_a():
        return r.render(cam, dt=1 / 60)

    def sync(img):
        _ = float(img.sum())

    img = once_a()
    sync(img)  # compile + warm
    ms_a = retry_transient(lambda: slope(once_a, sync), label="A")
    print(f"A production render loop      {ms_a:8.2f} ms")

    # ---- B: raw fn, everything pre-staged on device --------------------
    uniform = cam.uniform()
    uniform_dev = jax.device_put(uniform)
    globals_dev = jax.device_put(
        Globals.make(cfg.width, cfg.height, frame=3, time=0.05, dt=1 / 60)
    )
    jm_dev = jax.device_put(jnp.zeros((0, 4, 4), jnp.float32))
    box = dict(scene=r.scene, state=r.state)

    def once_b():
        img, state, inst, aux = r._fn(
            box["scene"], uniform_dev, globals_dev, box["state"],
            r.moving_ids, jm_dev,
        )
        box["state"] = state
        box["scene"] = box["scene"].replace(instances=inst)
        return img

    img = once_b()
    sync(img)
    ms_b = retry_transient(lambda: slope(once_b, sync), label="B")
    print(f"B raw fn, device-staged args  {ms_b:8.2f} ms")

    # ---- C: raw fn + per-call device_put of camera/globals -------------
    def once_c():
        u = jax.device_put(uniform)
        g = jax.device_put(
            Globals.make(cfg.width, cfg.height, frame=3, time=0.05, dt=1 / 60)
        )
        img, state, inst, aux = r._fn(
            box["scene"], u, g, box["state"], r.moving_ids, jm_dev,
        )
        box["state"] = state
        box["scene"] = box["scene"].replace(instances=inst)
        return img

    img = once_c()
    sync(img)
    ms_c = retry_transient(lambda: slope(once_c, sync), label="C")
    print(f"C raw fn + re-put cam/globals {ms_c:8.2f} ms")

    # ---- D: raw fn, HOST numpy uniform/globals passed directly ---------
    # (what Renderer.render actually does: numpy leaves marshalled by the
    # jit call itself each frame)
    g_host = Globals.make(cfg.width, cfg.height, frame=3, time=0.05, dt=1 / 60)

    def once_d():
        img, state, inst, aux = r._fn(
            box["scene"], uniform, g_host, box["state"], r.moving_ids,
            jm_dev,
        )
        box["state"] = state
        box["scene"] = box["scene"].replace(instances=inst)
        return img

    img = once_d()
    sync(img)
    ms_d = retry_transient(lambda: slope(once_d, sync), label="D")
    print(f"D raw fn, host numpy cam args {ms_d:8.2f} ms")

    print()
    print(f"tail attribution: production {ms_a:.1f} | device-staged "
          f"{ms_b:.1f} | +device_put {ms_c:.1f} | +host-numpy args "
          f"{ms_d:.1f}")


if __name__ == "__main__":
    main()
