#!/usr/bin/env python
"""Measure the TPU gather-rate CLIFF vs table size.

The CLAUDE.md cost model (4-6 ns/row regardless of table size) was
measured on tables <= 1M rows. Config 3 disproved it at scale: one
2M-pixel trilinear tap into its 11.2M-row (341 MiB) pool costs 48.8 ms
(~24 ns/row, tools/r5_c3_probe.py), and an all-row-0 access pattern
costs the SAME as a scattered one — the cost is a function of TABLE
SIZE, not locality. This probe maps the curve so pool layouts can be
sized under the cliff.

Gathers 2M rows (u8, 32 B — the texture-pool row shape) from tables of
0.25M..12M rows; also checks row width (16/64 B) and locality at one
large size.

Usage: python -u tools/r5_gather_cliff.py [--cpu]
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

    backend = jax.default_backend()
    N = 1 << 16 if args.cpu else 2_073_600  # 1080p pixel count
    print(f"backend={backend} gathers={N}")
    rng = np.random.default_rng(0)

    def probe(rows, width, pattern="random"):
        table = jax.device_put(
            rng.integers(0, 255, (rows, width), np.uint8)
        )
        if pattern == "random":
            idx = rng.integers(0, rows, N).astype(np.int32)
        else:  # all-zero: maximal locality
            idx = np.zeros(N, np.int32)
        idx = jax.device_put(idx)

        def f(table_, idx_, eps):
            # add eps-dependent offset so slope timing defeats caching
            # (stays in-bounds: eps is 0/1)
            i = jnp.minimum(idx_ + eps.astype(jnp.int32), rows - 1)
            g = table_[i].astype(jnp.float32)
            return g.sum()

        jf = jax.jit(f)
        ms = retry_transient(
            lambda: slope_time(jf, table, idx), attempts=3,
            label=f"rows={rows}",
        )
        ns_row = ms * 1e6 / N
        print(
            f"rows {rows/1e6:6.2f}M x {width:3d}B {pattern:7s}"
            f" {ms:8.2f} ms  {ns_row:6.2f} ns/row",
            flush=True,
        )
        return ms

    for rows in (
        262_144, 524_288, 1_048_576, 1_398_101, 2_097_152, 2_796_202,
        4_194_304, 5_592_404, 8_388_608, 11_184_808,
    ):
        probe(rows if not args.cpu else min(rows, 1 << 20), 32)
    # width sensitivity at one size per regime
    probe(1_048_576, 16)
    probe(1_048_576, 64)
    probe(8_388_608, 16)
    probe(8_388_608, 64)
    # locality at a large size (expected: NO effect — table-size bound)
    probe(8_388_608, 32, pattern="zero")


if __name__ == "__main__":
    main()
