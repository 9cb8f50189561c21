#!/usr/bin/env python
"""Round-4 probe #2: where does the half-res area-light path's fixed
~6-9 ms go? Candidates: the [::s,::s] strided-slice downsamples of the
four (H,W,*) inputs (layout-hostile), vs jax.image.resize upsample
(already dot_general-based internally), vs a hand-rolled matmul resize.

Usage: python -u tools/r4_probe2.py [--cpu]
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
    import jax.image as jimage
    import jax.numpy as jnp
    import numpy as np

    from voidin_tpu.core import fastmath

    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    H, W = 1080, 1920

    def t(label, fn, *a):
        def wrapped(*aa):
            *rest, e = aa
            rest = list(rest)
            rest[0] = rest[0] + e
            return fn(*rest)
        ms = slope_time(jax.jit(wrapped), *a)
        print(f"{label:52s} {ms:7.2f} ms")
        return ms

    img = jnp.asarray(rng.standard_normal((H, W, 3), dtype=np.float32))
    half = jnp.asarray(
        rng.standard_normal((H // 2, W // 2, 3), dtype=np.float32))
    quar = jnp.asarray(
        rng.standard_normal((H // 4, W // 4, 3), dtype=np.float32))

    t("strided slice [::2,::2] (1 input)", lambda x: x[::2, ::2].sum(), img)
    t("strided slice [::4,::4] (1 input)", lambda x: x[::4, ::4].sum(), img)
    t("4x strided slice [::2,::2]",
      lambda x: (x[::2, ::2].sum() + (x + 1)[::2, ::2].sum()
                 + (x + 2)[::2, ::2].sum() + (x + 3)[::2, ::2].sum()), img)
    t("downsample mm [::2] (dot_general sel)",
      lambda x: fastmath.subsample_mm(x, 2).sum(), img)
    t("downsample mm [::4]",
      lambda x: fastmath.subsample_mm(x, 4).sum(), img)
    t("resize 2x up (jax.image)",
      lambda x: jimage.resize(x, (H, W, 3), "bilinear").sum(), half)
    t("resize 4x up (jax.image)",
      lambda x: jimage.resize(x, (H, W, 3), "bilinear").sum(), quar)
    t("upsample mm 2x (fastmath)",
      lambda x: fastmath.upsample_bilinear_mm(x, 2, H, W).sum(), half)
    t("upsample mm 4x (fastmath)",
      lambda x: fastmath.upsample_bilinear_mm(x, 4, H, W).sum(), quar)
    # fused: everything the scale path adds, minus the LTC math itself
    t("round trip mm: sub4 + 2x(up mm 4x)",
      lambda x: (fastmath.upsample_bilinear_mm(
          fastmath.subsample_mm(x, 4), 4, H, W).sum()
          + fastmath.upsample_bilinear_mm(
              fastmath.subsample_mm(x + 1, 4), 4, H, W).sum()), img)

    # missing piece of the [::2] fix: strided slice at 1 of 4 inputs only
    if not args.cpu:
        pass


if __name__ == "__main__":
    main()
