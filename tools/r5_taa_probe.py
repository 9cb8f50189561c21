#!/usr/bin/env python
"""Round-5 TAA breakdown: the TAA pass costs ~35 ms/frame at 1080p
(tools/r5_tail_probe3.py: K0 all-const 63.5 ms vs K1 +state-arg 98.1 —
a constant FrameState.initial folds history_valid=False and DCEs the
whole resolve; every round-4 stage tool was blind to it the same way).

Slope-time the TAA sub-stages as standalone jitted fns with REAL args:

  T0  reproject only                     (dilation + matrices, dense)
  T1  history bilinear fetch only        (_bilinear_clamp: table + gather)
  T2  moments + clamp + blend only       (hist_rgb precomputed as arg)
  T3  full taa_resolve
  T4  full taa (reproject + resolve)

Usage: python -u tools/r5_taa_probe.py [--cpu]
"""

import argparse
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
    import numpy as np

    import voidin_tpu as vt
    from bench import retry_transient
    from voidin_tpu.passes import taa as taa_mod
    from voidin_tpu.passes.gbuffer import GBuffer

    H, W = (184, 320) if args.cpu else (1080, 1920)
    rng = np.random.default_rng(0)
    color = jax.device_put(rng.random((H, W, 3), np.float32))
    history = jax.device_put(rng.random((H, W, 3), np.float32))
    depth = jax.device_put(
        (rng.random((H, W), np.float32) * 0.1 + 0.01).astype(np.float32)
    )
    normal_uv = jax.device_put(np.zeros((H, W, 2), np.uint32))
    material = jax.device_put(np.zeros((H, W), np.int32))
    gb = GBuffer(normal_uv=normal_uv, material=material, depth=depth)
    cam = vt.Camera(position=[0.0, 2.0, 30.0], yaw=0.0, pitch=-5.0,
                    aspect=W / H)
    u0 = cam.uniform()
    u1 = cam.uniform(previous=u0)
    u1 = jax.device_put(u1)
    motion = jax.device_put(
        (rng.random((H, W, 3), np.float32) * 0.002).astype(np.float32)
    )
    motion = motion.at[..., 2].set(1.0)
    print(f"backend={jax.default_backend()} {W}x{H}")

    def run(name, f, *a):
        jf = jax.jit(f)
        ms = retry_transient(lambda: slope_time(jf, *a), attempts=3,
                             label=name)
        print(f"{name:36s} {ms:8.2f} ms", flush=True)
        return ms

    # T0: reproject
    def t0(d, eps):
        g = gb.replace(depth=d + eps)
        return taa_mod.reproject(g, u1).sum()

    run("T0 reproject", t0, depth)

    # T1: history bilinear fetch
    uu = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W
    vv = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H

    def t1(h, m, eps):
        hu = uu[None, :] - m[..., 0] * 0.5 + eps
        hv = vv[:, None] + m[..., 1] * 0.5
        return taa_mod._bilinear_clamp(h, hu, hv).sum()

    run("T1 history bilinear fetch", t1, history, motion)

    # T2: moments + clamp + blend with hist_rgb as precomputed arg
    from voidin_tpu.core.color import rgb_to_ycbcr, ycbcr_to_rgb

    def t2(c, hist_rgb, m, eps):
        c = c + eps
        hist = rgb_to_ycbcr(hist_rgb)
        import numpy as np

        vsum = jnp.zeros_like(c)
        vsum2 = jnp.zeros_like(c)
        wsum = 0.0
        mn_sum = jnp.zeros_like(c)
        mn_wsum = 0.0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                shifted = taa_mod._shift(c, dy, dx)
                neigh = rgb_to_ycbcr(shifted)
                w = float(np.exp(-3.0 * (dx * dx + dy * dy) / 4.0))
                vsum = vsum + neigh * w
                vsum2 = vsum2 + neigh * neigh * w
                wsum += w
                wt = taa_mod._mitchell_weight_np(np.sqrt(dx * dx + dy * dy))
                mn_sum = mn_sum + shifted * wt
                mn_wsum += wt
        ex = vsum / wsum
        ex2 = vsum2 / wsum
        dev = jnp.sqrt(jnp.maximum(0.0, ex2 - ex * ex))
        local_contrast = dev[..., 0] / (ex[..., 0] + 1e-5)
        hu = uu[None, :] - m[..., 0] * 0.5
        hv = vv[:, None] + m[..., 1] * 0.5
        hist_px = hu * W
        hist_py = hv * H
        frac = jnp.stack(
            [hist_px - jnp.floor(hist_px), hist_py - jnp.floor(hist_py)],
            axis=-1,
        )
        tcd = jnp.sum(jnp.abs(0.5 - frac), axis=-1)
        box = (0.5 + 0.5 * taa_mod._smoothstep(-0.1, 0.3, local_contrast))
        box = box * (0.5 + 0.5 * jnp.clip(1.0 - tcd, 0.0, 1.0))
        center = rgb_to_ycbcr(mn_sum / mn_wsum)
        bs2 = (box * box)[..., None]
        mid = center + (ex - center) * bs2
        nmin = mid - dev * (box[..., None] * 1.5)
        nmax = mid + dev * (box[..., None] * 1.5)
        clamped = jnp.clip(hist, nmin, nmax)
        blend = 1.0 + (1.0 / 12.0 - 1.0) * m[..., 2]
        cd = jnp.minimum(
            jnp.abs(hist[..., 0] - nmin[..., 0]),
            jnp.abs(hist[..., 0] - nmax[..., 0]),
        ) / jnp.maximum(jnp.maximum(hist[..., 0], ex[..., 0]), 1e-5)
        blend = blend * (0.2 + 0.8 * taa_mod._smoothstep(0.0, 2.0, cd))
        return ycbcr_to_rgb(clamped + (center - clamped) * blend[..., None]).sum()

    run("T2 moments+clamp (no fetch)", t2, color, history, motion)

    # T3: full resolve
    def t3(c, h, m, eps):
        out, _ = taa_mod.taa_resolve(c + eps, h, m)
        return out.sum()

    run("T3 taa_resolve full", t3, color, history, motion)

    # T4: full taa pass
    from voidin_tpu.framework.renderer import FrameState

    state = jax.device_put(
        FrameState.initial(W, H).replace(
            history=history, history_valid=jnp.asarray(True)
        )
    )

    def t4(c, d, st, eps):
        g = gb.replace(depth=d + eps)
        out, _st, _ovf = taa_mod.taa(c, g, u1, st)
        return out.sum()

    run("T4 taa full (reproject+resolve)", t4, color, depth, state)


if __name__ == "__main__":
    main()
