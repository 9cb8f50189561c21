"""Color-space helpers (luma, RGB<->YCbCr) — shaders/utils/color.wgsl:1-13.

The WGSL code multiplies a *row* vector by a column-major matrix
(``col * m``), i.e. ``out_j = sum_i col_i * m[j][i]`` where ``m[j]`` is the
j-th constructor column. We reproduce the exact same arithmetic here with
explicit matrices applied as ``v @ M^T``-equivalents.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import fastmath

_LUMA = np.array([0.2126, 0.7152, 0.0722], dtype=np.float32)

# WGSL: mat3x3(0.2126, 0.7152, 0.0722, -0.1146, -0.3854, 0.5, 0.5, -0.4542, -0.0458)
# columns are the consecutive triples; `col * m` gives out_j = dot(col, column_j).
_RGB_TO_YCBCR = np.array(
    [
        [0.2126, 0.7152, 0.0722],
        [-0.1146, -0.3854, 0.5],
        [0.5, -0.4542, -0.0458],
    ],
    dtype=np.float32,
)

_YCBCR_TO_RGB = np.array(
    [
        [1.0, 0.0, 1.5748],
        [1.0, -0.1873, -0.4681],
        [1.0, 1.8556, 0.0],
    ],
    dtype=np.float32,
)


def calculate_luma(col: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (...,) BT.709 luma."""
    return 0.2126 * col[..., 0] + 0.7152 * col[..., 1] + 0.0722 * col[..., 2]


def rgb_to_ycbcr(col: jnp.ndarray) -> jnp.ndarray:
    return fastmath.const_mat_vec(_RGB_TO_YCBCR, col)


def ycbcr_to_rgb(col: jnp.ndarray) -> jnp.ndarray:
    return fastmath.const_mat_vec(_YCBCR_TO_RGB, col)
