"""Trusted TPU timing harness for the axon platform.

`block_until_ready` is a NO-OP on the axon TPU tunnel, and dispatch is
async — the ONLY reliable sync is a device->host transfer. This harness:

* chains N calls through a 0-valued epsilon extracted from each output
  (forces sequential execution, defeats dead-code elimination),
* ends every run with float(...) (true sync),
* reports the slope between N1 and N2 runs (cancels per-run sync overhead).

Usage:
    from tools.tpu_timeit import slope_time
    ms = slope_time(jitted_fn_taking_eps_last, *args)
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _run(f, args, n):
    eps = jnp.float32(0.0)
    out = None
    for _ in range(n):
        out = f(*args, eps)
        eps = jax.tree_util.tree_leaves(out)[0].ravel()[0].astype(jnp.float32) * 0
    return float(eps)  # device->host: the only real sync on axon


def slope_time(f, *args, n1=1, n2=5, warmup=1):
    for _ in range(warmup):
        _run(f, args, 1)
    t0 = time.perf_counter()
    _run(f, args, n1)
    ta = time.perf_counter() - t0
    t0 = time.perf_counter()
    _run(f, args, n2)
    tb = time.perf_counter() - t0
    return (tb - ta) / (n2 - n1) * 1000.0
