#!/usr/bin/env python
"""Confirm the 16 B-row escape from the big-table gather cliff.

tools/r5_gather_cliff.py measured (2.07M gathers, v5e via axon):
  32 B rows: 0.23 ns/row at 0.26M-row tables, ~11 at 1-2.8M, ~18 at
  4.2-11.2M — width-free (16/32/64 B equal at 1M) and locality-free
  (all-zero indices cost the same as random at 8.4M).
  BUT 8.39M x 16 B measured 2.39 ns/row — 7.7x cheaper than 32 B at the
  same row count.

This probe maps the 16 B curve (is the fast path real? where does it
start?), checks 8 B, and re-checks the anomaly with repeats + a paired
child/parent two-gather form (the texture-pool use case: one 32 B quad
row split into two 16 B tables, same index).

Usage: python -u tools/r5_cliff16.py [--cpu]
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
    N = 1 << 16 if args.cpu else 2_073_600
    print(f"backend={backend} gathers={N}")
    rng = np.random.default_rng(1)

    def probe(rows, width, tag="", split=False, reps=2):
        rows_eff = rows if not args.cpu else min(rows, 1 << 20)
        if split:
            ta = jax.device_put(
                rng.integers(0, 255, (rows_eff, width), np.uint8))
            tb = jax.device_put(
                rng.integers(0, 255, (rows_eff, width), np.uint8))
        else:
            ta = jax.device_put(
                rng.integers(0, 255, (rows_eff, width), np.uint8))
            tb = None
        idx = jax.device_put(rng.integers(0, rows_eff, N).astype(np.int32))

        if split:
            def f(a, b, idx_, eps):
                i = jnp.minimum(idx_ + eps.astype(jnp.int32), rows_eff - 1)
                return (a[i].astype(jnp.float32).sum()
                        + b[i].astype(jnp.float32).sum())

            fargs = (ta, tb, idx)
        else:
            def f(a, idx_, eps):
                i = jnp.minimum(idx_ + eps.astype(jnp.int32), rows_eff - 1)
                return a[i].astype(jnp.float32).sum()

            fargs = (ta, idx)
        jf = jax.jit(f)
        for r in range(reps):
            ms = retry_transient(
                lambda: slope_time(jf, *fargs), attempts=3,
                label=f"rows={rows_eff}",
            )
            print(
                f"rows {rows_eff/1e6:6.2f}M x {width:3d}B {tag:14s}"
                f" rep{r} {ms:8.2f} ms  {ms*1e6/N:6.2f} ns/row",
                flush=True,
            )

    # the 16 B curve
    for rows in (1_048_576, 2_796_202, 5_592_404, 11_184_808):
        probe(rows, 16)
    # the use case: child+parent 16 B pair (two gathers, same index)
    probe(5_592_404, 16, tag="pair", split=True)
    probe(11_184_808, 16, tag="pair", split=True)
    # is 8 B even cheaper at scale?
    probe(8_388_608, 8)
    # re-check the 32 B baseline at one size for session comparability
    probe(5_592_404, 32, reps=1)


if __name__ == "__main__":
    main()
