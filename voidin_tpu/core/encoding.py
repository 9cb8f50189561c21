"""G-buffer bit packing: 32-bit octahedral normals and packed half-float UVs.

Semantics contract with the reference renderer:
* octahedral encode/decode — shaders/utils/encoding.wgsl:1-28 (PRES=16).
* pack2x16float / unpack2x16float — WGSL builtins used in
  shaders/visibility.wgsl:91-96 and shading.wgsl:57.

All functions are elementwise jnp ops over arbitrary leading batch dims and
run inside the jitted frame function.
"""

from __future__ import annotations

import jax.numpy as jnp

_PRES = 16
_MU = (1 << _PRES) - 1  # 65535


def _sign_wgsl(x):
    """WGSL sign(): -1 / 0 / +1 (sign(0) == 0)."""
    return jnp.sign(x)


def encode_octahedral_32(normal: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) float32 unit normals -> (...,) uint32."""
    n = normal.astype(jnp.float32)
    denom = jnp.abs(n[..., 0]) + jnp.abs(n[..., 1]) + jnp.abs(n[..., 2])
    nor = n / denom[..., None]
    # Fold the lower hemisphere.
    folded_xy = (1.0 - jnp.abs(nor[..., [1, 0]])) * _sign_wgsl(nor[..., :2])
    xy = jnp.where((nor[..., 2] < 0.0)[..., None], folded_xy, nor[..., :2])
    v = xy * 0.5 + 0.5
    d = jnp.floor(v * float(_MU) + 0.5).astype(jnp.uint32)
    return (d[..., 1] << _PRES) | d[..., 0]


def decode_octahedral_32(data: jnp.ndarray) -> jnp.ndarray:
    """(...,) uint32 -> (..., 3) float32 unit normals."""
    data = data.astype(jnp.uint32)
    d = jnp.stack([data & _MU, (data >> _PRES) & _MU], axis=-1)
    v = d.astype(jnp.float32) / float(_MU)
    v = v * 2.0 - 1.0
    z = 1.0 - jnp.abs(v[..., 0]) - jnp.abs(v[..., 1])
    t = jnp.maximum(-z, 0.0)
    x = v[..., 0] + jnp.where(v[..., 0] > 0.0, -t, t)
    y = v[..., 1] + jnp.where(v[..., 1] > 0.0, -t, t)
    nor = jnp.stack([x, y, z], axis=-1)
    norm = jnp.sqrt(jnp.sum(nor * nor, axis=-1, keepdims=True))
    return nor / norm


def pack2x16float(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) float32 -> (...,) uint32 with f16 halves (x low, y high)."""
    h = v.astype(jnp.float16)
    bits = jnp.asarray(h).view(jnp.uint16).astype(jnp.uint32)
    return bits[..., 0] | (bits[..., 1] << 16)


def unpack2x16float(p: jnp.ndarray) -> jnp.ndarray:
    """(...,) uint32 -> (..., 2) float32."""
    p = p.astype(jnp.uint32)
    lo = (p & 0xFFFF).astype(jnp.uint16)
    hi = ((p >> 16) & 0xFFFF).astype(jnp.uint16)
    bits = jnp.stack([lo, hi], axis=-1)
    return bits.view(jnp.float16).astype(jnp.float32)


def encode_octahedral_32_np(normal):
    """Numpy twin of encode_octahedral_32 (host-side pool packing)."""
    import numpy as np

    n = np.asarray(normal, np.float32)
    denom = np.abs(n[..., 0]) + np.abs(n[..., 1]) + np.abs(n[..., 2])
    nor = n / np.maximum(denom[..., None], 1e-20)
    folded_xy = (1.0 - np.abs(nor[..., [1, 0]])) * np.sign(nor[..., :2])
    xy = np.where((nor[..., 2] < 0.0)[..., None], folded_xy, nor[..., :2])
    v = xy * 0.5 + 0.5
    d = np.floor(v * float(_MU) + 0.5).astype(np.uint32)
    return (d[..., 1] << np.uint32(_PRES)) | d[..., 0]
