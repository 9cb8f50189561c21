#!/usr/bin/env python
"""Measure the TPU gather/sort cost model that drives raster/resolve design:

* gather ns/row vs (table rows, row width, random|monotonic indices)
* lax.sort ms vs payload operand count at 1M keys

Usage: python -u tools/microbench_gather.py [--cpu]
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

    rng = np.random.default_rng(0)
    N = 1 << 21  # 2M queries (one per pixel)

    print("== gather: ns/row vs table size x width x index pattern ==")
    for rows in (1 << 12, 1 << 17, 1 << 20):
        for width in (4, 8, 12, 16, 24, 32):
            table = jnp.asarray(
                rng.standard_normal((rows, width), dtype=np.float32)
            )
            idx_r = jnp.asarray(rng.integers(0, rows, N).astype(np.int32))
            idx_m = jnp.asarray(
                np.sort(rng.integers(0, rows, N).astype(np.int32))
            )
            f = jax.jit(lambda t, i, e: (t[i] + e).sum())
            ms_r = slope_time(f, table, idx_r)
            ms_m = slope_time(f, table, idx_m)
            print(
                f"rows {rows:>8} width {width * 4:>3}B: "
                f"random {ms_r / N * 1e6:6.2f} ns/row  "
                f"monotonic {ms_m / N * 1e6:6.2f} ns/row"
            )

    print("== sort: 1M keys, payload operand count ==")
    E = 1 << 20
    keys = jnp.asarray(rng.integers(0, 1 << 14, E).astype(np.int32))
    for n_payload in (1, 2, 4, 10, 16, 22):
        vals = [
            jnp.asarray(rng.standard_normal(E).astype(np.float32))
            for _ in range(n_payload)
        ]

        def f(k, *rest):
            e = rest[-1]
            vs = rest[:-1]
            out = jax.lax.sort((k + e.astype(jnp.int32),) + vs, num_keys=1)
            return sum(o.sum().astype(jnp.float32) for o in out)

        ms = slope_time(jax.jit(f), keys, *vals)
        print(f"payload {n_payload:2d} x f32: {ms:7.2f} ms")


if __name__ == "__main__":
    main()
