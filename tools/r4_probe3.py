#!/usr/bin/env python
"""Decompose the binning 'gather' step (bisect_bin showed ~30 ms at 2^20):
record gather vs bake_tile_origin vs kernel-layout expand vs the
chunk-major transpose. Slope-timed on the current backend.

Usage: python -u tools/r4_probe3.py [--cpu] [--cap 20]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.tpu_timeit import slope_time  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--cap", type=int, default=19)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from voidin_tpu.ops import fine_raster as fr
    from voidin_tpu.passes import raster as rp
    from voidin_tpu.passes.raster import RasterConfig

    E = 1 << args.cap
    cap = 1 << args.cap
    cfg = RasterConfig(width=1920, height=1080, tri_capacity=cap,
                       pair_capacity=E, tile_tri_capacity=128)
    rng = np.random.default_rng(0)
    rec = jnp.asarray(rng.normal(size=(cap, fr.RECORD_F)).astype(np.float32))
    tri = jnp.asarray(rng.integers(0, cap, size=E).astype(np.int32))
    tile = jnp.asarray(
        np.sort(rng.integers(0, cfg.n_tiles_padded, size=E)).astype(np.int32)
    )

    CH = fr.CHUNK
    e_pad = (E // CH + 2) * CH

    def pad(x):
        return jnp.concatenate(
            [x, jnp.zeros((e_pad - E, x.shape[1]), x.dtype)]
        )

    stages = {}

    def f_gather(eps):
        return rec[tri] + eps

    def f_bake(eps):
        rs = rec[tri] + eps
        return rp.bake_tile_origin(rs, tile, cfg)

    def f_expand(eps):
        rs = rec[tri] + eps
        rs = rp.bake_tile_origin(rs, tile, cfg)
        return fr.expand_records_kernel_layout(pad(rs))

    def f_transpose(eps):
        rs = rec[tri] + eps
        rs = rp.bake_tile_origin(rs, tile, cfg)
        k = fr.expand_records_kernel_layout(pad(rs))
        return jnp.transpose(
            k.reshape(e_pad // CH, CH, fr.KREC_F), (0, 2, 1)
        )

    prev = 0.0
    for name, f in [("gather", f_gather), ("bake", f_bake),
                    ("expand", f_expand), ("transpose", f_transpose)]:
        jf = jax.jit(lambda eps, f=f: f(eps).sum())
        ms = slope_time(jf)
        stages[name] = ms
        print(f"{name:10s} cum {ms:8.2f} ms   marginal {ms - prev:8.2f} ms",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
