#!/usr/bin/env python
"""Tail probe 3: WHICH compile-time constant buys the 36 ms?

Probe 2 showed the production program costs ~99 ms with ALL frame inputs
as jit arguments, however driven. The round-4 sweep closure (everything
captured as constants, only a camera-znear epsilon traced) measures
62.7 ms in the SAME session. Bisect: start from the all-constant closure
and promote ONE input at a time to a runtime argument.

  K0  all constant, eps arg            (the r4 closure — expect ~63)
  K1  + state arg
  K2  + state + globals args
  K3  + state + globals + instances args   (static pools still constant)
  K4  + camera uniform arg too             (= production, expect ~99)

If K3 ~ 63: production can close over the STATIC pools (legit — they
never change between frames) and keep the win. If the jump happens at
K1/K2/K3, the folded work is per-frame-varying and the win is fiction.

Usage: python -u tools/r5_tail_probe3.py [--cpu]
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
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
    import jax.numpy as jnp

    import voidin_tpu as vt
    from bench import (AB_VARIANTS, apply_ab_runtime_options, build_world,
                       retry_transient)
    from voidin_tpu.framework.renderer import (FrameState, Globals,
                                               render_frame)
    from voidin_tpu.passes.raster import RasterConfig

    backend = jax.default_backend()
    world, moving = build_world(n_instances=300 if args.cpu else 10_000)
    scene = world.device()
    if args.cpu:
        cfg0 = RasterConfig(width=320, height=184, tri_capacity=1 << 14,
                            pair_capacity=1 << 14, tile_tri_capacity=128,
                            interpret=True)
    else:
        cfg0 = RasterConfig(width=1920, height=1080, tri_capacity=1 << 19,
                            pair_capacity=1 << 19, tile_tri_capacity=128)
    cfg_kw, bf16, ascale, lut = AB_VARIANTS["all_lut_p"]
    cfg = dataclasses.replace(cfg0, **cfg_kw)
    apply_ab_runtime_options(bf16, ascale, lut, backend)
    cam = vt.Camera(position=[0.0, 2.0, 30.0], yaw=0.0, pitch=-5.0,
                    aspect=cfg.width / cfg.height).uniform()
    state = FrameState.initial(cfg.width, cfg.height)
    moving_j = jnp.asarray(moving)
    g = Globals.make(cfg.width, cfg.height, frame=1, time=1.0, dt=0.0)
    print(f"backend={backend} variant=all_lut_p")

    def run(name, f, *args_dev):
        jf = jax.jit(f)
        ms = retry_transient(lambda: slope_time(jf, *args_dev),
                             attempts=3, label=name)
        print(f"{name:34s} {ms:8.2f} ms", flush=True)
        return ms

    # K0: everything constant, eps traced (r4 closure)
    def k0(eps):
        camera = cam.replace(znear=cam.znear + eps)
        img, _s, _sc, _a = render_frame(scene, camera, g, state, moving_j,
                                        cfg, area_light_scale=ascale)
        return img.sum()

    run("K0 all-const (r4 closure)", k0)

    # K1: + state arg
    def k1(st, eps):
        camera = cam.replace(znear=cam.znear + eps)
        img, _s, _sc, _a = render_frame(scene, camera, g, st, moving_j,
                                        cfg, area_light_scale=ascale)
        return img.sum()

    run("K1 +state arg", k1, jax.device_put(state))

    # K2: + globals arg
    def k2(st, gg, eps):
        camera = cam.replace(znear=cam.znear + eps)
        img, _s, _sc, _a = render_frame(scene, camera, gg, st, moving_j,
                                        cfg, area_light_scale=ascale)
        return img.sum()

    run("K2 +state+globals args", k2, jax.device_put(state),
        jax.device_put(g))

    # K3: + instances arg (static pools still constant)
    def k3(st, gg, inst, eps):
        camera = cam.replace(znear=cam.znear + eps)
        sc = scene.replace(instances=inst)
        img, _s, _sc, _a = render_frame(sc, camera, gg, st, moving_j,
                                        cfg, area_light_scale=ascale)
        return img.sum()

    run("K3 +instances arg (pools const)", k3, jax.device_put(state),
        jax.device_put(g), jax.device_put(scene.instances))

    # K4: + camera uniform arg (full production argument surface)
    def k4(camera, st, gg, inst, eps):
        camera = camera.replace(znear=camera.znear + eps)
        sc = scene.replace(instances=inst)
        img, _s, _sc, _a = render_frame(sc, camera, gg, st, moving_j,
                                        cfg, area_light_scale=ascale)
        return img.sum()

    run("K4 +camera arg (production-ish)", k4, jax.device_put(cam),
        jax.device_put(state), jax.device_put(g),
        jax.device_put(scene.instances))


if __name__ == "__main__":
    main()
