"""LTC (Linearly Transformed Cosines) lookup tables.

Two 64x64x4 f32 tables drive area-light shading (shaders/utils/ltc.wgsl):
* LTC1: inverse-M matrices, packed (m00, m02, m20, m22) per texel —
  reconstructed in ltc_matrix() as [[t1.x,0,t1.y],[0,1,0],[t1.z,0,t1.w]]
  (column-major WGSL: columns (t1.x,0,t1.y),(0,1,0),(t1.z,0,t1.w)).
* LTC2: (GGX norm, fresnel, unused, horizon-clipped-sphere form factor).

Axis convention (ltc.wgsl ltc_matrix): u = roughness, v = sqrt(1 - n.v),
both scaled by LUT_SCALE/LUT_BIAS.

The tables ship as ``voidin_tpu/assets/ltc_tables.npz`` produced by our own
fitting pipeline (tools/fit_ltc.py — GGX-to-LTC downhill-simplex fit after
Heitz et al. 2016, "Real-Time Polygonal-Light Shading with Linearly
Transformed Cosines"). If the file is absent (fresh checkout before running
the fitter) an analytic fallback is generated so the renderer still runs:
identity matrices + Schlick-style norm/fresnel approximations.
"""

from __future__ import annotations

import os
import warnings
from functools import lru_cache
from typing import Tuple

import numpy as np

LUT_SIZE = 64
LUT_SCALE = (LUT_SIZE - 1.0) / LUT_SIZE
LUT_BIAS = 0.5 / LUT_SIZE

_ASSET_PATH = os.path.join(os.path.dirname(__file__), "..", "assets", "ltc_tables.npz")


def _fallback_tables() -> Tuple[np.ndarray, np.ndarray]:
    """Analytic approximation (no fit): keeps shading plausible, not exact."""
    u = (np.arange(LUT_SIZE, dtype=np.float32) + 0.5) / LUT_SIZE  # roughness
    v = (np.arange(LUT_SIZE, dtype=np.float32) + 0.5) / LUT_SIZE  # sqrt(1-ndotv)
    rough, sq = np.meshgrid(u, v)  # (v, u) => (row, col)
    ndotv = np.clip(1.0 - sq * sq, 0.0, 1.0)

    # LTC1 ~ identity (diffuse-like lobe) stretched by roughness.
    ltc1 = np.zeros((LUT_SIZE, LUT_SIZE, 4), np.float32)
    ltc1[..., 0] = 1.0  # m00
    ltc1[..., 1] = 0.0  # m02
    ltc1[..., 2] = 0.0  # m20
    ltc1[..., 3] = np.maximum(rough, 1e-3)  # m22: tighter lobe when smooth

    # LTC2: GGX single-scatter albedo approximation (Karis) + fresnel weight.
    a = np.maximum(rough * rough, 1e-4)
    norm = 1.0 / (1.0 + a * (1.0 - ndotv))
    fresnel = (1.0 - ndotv) ** 5
    ltc2 = np.zeros((LUT_SIZE, LUT_SIZE, 4), np.float32)
    ltc2[..., 0] = norm
    ltc2[..., 1] = fresnel
    ltc2[..., 2] = 0.0
    ltc2[..., 3] = 1.0  # no horizon clipping
    return ltc1, ltc2


@lru_cache(maxsize=1)
def load_ltc_tables() -> Tuple[np.ndarray, np.ndarray]:
    path = os.path.abspath(_ASSET_PATH)
    if os.path.exists(path):
        data = np.load(path)
        return (
            np.asarray(data["ltc1"], np.float32),
            np.asarray(data["ltc2"], np.float32),
        )
    warnings.warn(
        "ltc_tables.npz not found — using analytic fallback LTC tables. "
        "Run tools/fit_ltc.py to generate fitted tables.",
        stacklevel=2,
    )
    return _fallback_tables()
