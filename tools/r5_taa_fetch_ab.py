#!/usr/bin/env python
"""Honest A/B of the TAA history-fetch variants at 1080p.

Round-4's sweep closures captured FrameState.initial as a constant, so
history_valid=False folded and EVERY TAA number in AB_OPTIONS r4 was
measured on a TAA-less program (tools/r5_tail_probe3.py). This probe
times the fetch paths standalone with REAL device args and a realistic
motion field (90% static sub-pixel velocity + 10% fast-moving blob):

  F0  _bilinear_clamp            (default: f16 quad table + 2M gathers)
  F1  _bilinear_clamp_quadblock  (4x4 blocks per 2x2 quad + edge batch)

Both are bit-exact vs each other by construction (test_taa_quad.py).

Usage: python -u tools/r5_taa_fetch_ab.py [--cpu]
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

    from bench import retry_transient
    from voidin_tpu.passes import taa as taa_mod

    H, W = (184, 320) if args.cpu else (1080, 1920)
    rng = np.random.default_rng(0)
    history = jax.device_put(rng.random((H, W, 3), np.float32))

    # motion: sub-pixel jitter velocity everywhere; a fast blob on 10%
    vel = rng.random((H, W, 2), np.float32) * (1.0 / W)
    yy, xx = np.mgrid[0:H, 0:W]
    blob = ((yy - H // 2) ** 2 + (xx - W // 2) ** 2) < (0.18 * H) ** 2
    vel[blob] = rng.random((int(blob.sum()), 2), np.float32) * 0.05
    motion = jax.device_put(
        np.concatenate([vel, np.ones((H, W, 1), np.float32)], -1)
    )

    uu = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W
    vv = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
    print(f"backend={jax.default_backend()} {W}x{H} "
          f"fast-blob={float(blob.mean()):.2%}")

    def run(name, f, *a):
        jf = jax.jit(f)
        ms = retry_transient(lambda: slope_time(jf, *a), attempts=3,
                             label=name)
        print(f"{name:34s} {ms:8.2f} ms", flush=True)
        return ms

    def f0(h, m, eps):
        hu = uu[None, :] - m[..., 0] * 0.5 + eps
        hv = vv[:, None] + m[..., 1] * 0.5
        return taa_mod._bilinear_clamp(h, hu, hv).sum()

    run("F0 per-pixel quad gather", f0, history, motion)

    def f1(h, m, eps):
        hu = uu[None, :] - m[..., 0] * 0.5 + eps
        hv = vv[:, None] + m[..., 1] * 0.5
        out, ovf = taa_mod._bilinear_clamp_quadblock(h, hu, hv,
                                                     capacity=1 << 14)
        return out.sum() + ovf.astype(jnp.float32)

    run("F1 quadblock + edge batch", f1, history, motion)

    # F4: quadblock with where-chain in-block select (same gathers + edge
    # machinery; the einsum one-hot select replaced by fused VPU selects)
    def f4(h, m, eps):
        hu = uu[None, :] - m[..., 0] * 0.5 + eps
        hv = vv[:, None] + m[..., 1] * 0.5
        out, ovf = taa_mod._bilinear_clamp_quadblock(
            h, hu, hv, capacity=1 << 14, select="where"
        )
        return out.sum() + ovf.astype(jnp.float32)

    run("F4 quadblock where-select", f4, history, motion)

    # F2: table build only (the 4-shifted-copies f16 quad table + barrier)
    def f2(h, eps):
        img = h + eps
        xn = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
        yn = jnp.concatenate([img[1:], img[-1:]], axis=0)
        xyn = jnp.concatenate([xn[1:], xn[-1:]], axis=0)
        quads = (
            jnp.concatenate([img, xn, yn, xyn], axis=-1)
            .astype(jnp.float16)
            .reshape(H * W, 12)
        )
        return jax.lax.optimization_barrier(quads).astype(jnp.float32).sum()

    run("F2 quad table build only", f2, history)

    # F3: gather + lerp only (prebuilt table as arg)
    img0 = np.asarray(history)
    xn = np.concatenate([img0[:, 1:], img0[:, -1:]], axis=1)
    yn = np.concatenate([img0[1:], img0[-1:]], axis=0)
    xyn = np.concatenate([xn[1:], xn[-1:]], axis=0)
    table = jax.device_put(
        np.concatenate([img0, xn, yn, xyn], -1).astype(np.float16)
        .reshape(H * W, 12)
    )

    def f3(tab, m, eps):
        hu = uu[None, :] - m[..., 0] * 0.5 + eps
        hv = vv[:, None] + m[..., 1] * 0.5
        fx = hu * W - 0.5
        fy = hv * H - 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        tx = (fx - x0)[..., None]
        ty = (fy - y0)[..., None]
        x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
        q = tab[y0i * W + x0i].astype(jnp.float32)
        c00, c10, c01, c11 = q[..., :3], q[..., 3:6], q[..., 6:9], q[..., 9:]
        top = c00 + (c10 - c00) * tx
        bot = c01 + (c11 - c01) * tx
        return (top + (bot - top) * ty).sum()

    run("F3 gather+lerp only (prebuilt)", f3, table, motion)


if __name__ == "__main__":
    main()
