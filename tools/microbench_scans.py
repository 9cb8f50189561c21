#!/usr/bin/env python
"""Measure scan/scatter primitive costs at raster scale (1M elements):
native cumsum vs the saturating associative_scan, cummax, scatter-max,
argsort — the building blocks of triangle setup + binning.

Usage: python -u tools/microbench_scans.py [--cpu]
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

    from voidin_tpu.passes.raster import saturating_cumsum, segment_ids_from_counts

    rng = np.random.default_rng(0)
    E = 1 << 20
    counts = jnp.asarray(rng.integers(0, 3, E).astype(np.int32))
    vals = jnp.asarray(rng.integers(0, 1 << 20, E).astype(np.int32))
    bools = jnp.asarray((rng.random(E) < 0.01))

    cases = {
        "native cumsum i32": lambda e: jnp.cumsum(counts + e).sum(),
        "saturating_cumsum": lambda e: saturating_cumsum(counts + e).sum(),
        "lax.cummax i32": lambda e: jax.lax.cummax(vals + e).sum(),
        "scatter-max 1M->1M": lambda e: jnp.zeros(E, jnp.int32)
        .at[jnp.minimum(vals, E - 1)]
        .max(vals + e, mode="drop")
        .sum(),
        "argsort bool 1M": lambda e: jnp.argsort(bools ^ (e > 0)).sum(),
        "sort_key_val 1M": lambda e: jax.lax.sort_key_val(vals + e, vals)[0].sum(),
        "segment_ids_from_counts": lambda e: sum(
            x.sum().astype(jnp.float32)
            for x in segment_ids_from_counts(counts + e, E)
        ),
    }
    for name, fn in cases.items():
        ms = slope_time(jax.jit(lambda e, fn=fn: fn(e)))
        print(f"{name:26s} {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
