"""Float hash functions — utils/hash.wgsl:1-30 parity.

Dave Hoskins's sine-free float hashes (the reference's WGSL carries the
same family). Unused by the reference's main render path; ported for
library completeness (VERDICT round-2 item 10). All functions accept jnp
or numpy arrays and are shape-polymorphic over leading dims; outputs lie
in [0, 1).
"""

from __future__ import annotations

import jax.numpy as jnp


def _fract(x):
    return x - jnp.floor(x)


def hash11(x):
    """f32 -> f32 (hash.wgsl:1-6)."""
    p = _fract(x * 0.1031)
    p = p * (p + 33.333)
    p = p * (p + p)
    return _fract(p)


def hash21(x):
    """(..., 2) -> (...) (hash.wgsl:8-12)."""
    p = _fract(jnp.stack([x[..., 0], x[..., 1], x[..., 0]], -1) * 0.1031)
    d = jnp.sum(
        p * (jnp.stack([p[..., 1], p[..., 2], p[..., 0]], -1) + 33.333), -1
    )
    p = p + d[..., None]
    return _fract((p[..., 0] + p[..., 1]) * p[..., 2])


def hash13(x):
    """f32 -> (..., 3) (hash.wgsl:14-18)."""
    x = jnp.asarray(x)
    p = _fract(
        x[..., None] * jnp.asarray([0.1031, 0.1030, 0.0973], jnp.float32)
    )
    d = jnp.sum(p * jnp.stack([p[..., 1], p[..., 2], p[..., 0]], -1)
                * 33.3333, -1)
    p = p + d[..., None]
    a = jnp.stack([p[..., 0], p[..., 0], p[..., 1]], -1)
    b = jnp.stack([p[..., 1], p[..., 2], p[..., 2]], -1)
    c = jnp.stack([p[..., 2], p[..., 1], p[..., 0]], -1)
    return _fract((a + b) * c)


def hash31(x):
    """(..., 3) -> (...) (hash.wgsl:20-25)."""
    p = _fract(x * 0.1031)
    d = jnp.sum(
        p * (jnp.stack([p[..., 2], p[..., 1], p[..., 0]], -1) + 31.323), -1
    )
    p = p + d[..., None]
    return _fract((p[..., 0] + p[..., 1]) * p[..., 2])


def hash33(x):
    """(..., 3) -> (..., 3) (hash.wgsl:27-32)."""
    p = _fract(x * jnp.asarray([0.1031, 0.1030, 0.9073], jnp.float32))
    d = jnp.sum(
        p * (jnp.stack([p[..., 1], p[..., 0], p[..., 2]], -1) + 31.323), -1
    )
    p = p + d[..., None]
    a = jnp.stack([p[..., 0], p[..., 0], p[..., 1]], -1)
    b = jnp.stack([p[..., 1], p[..., 0], p[..., 0]], -1)
    c = jnp.stack([p[..., 2], p[..., 1], p[..., 0]], -1)
    return _fract((a + b) * c)
