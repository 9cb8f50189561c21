"""Post-processing: luma sharpen (in sqrt-luma space) + neutral tonemap.

Dense per-pixel port of shaders/postprocess.wgsl:22-98 with identical
constants (sharpen_amount 0.5, weight formula, tonemap curve
v+v^2+0.5v^3 / (1+...), chroma desaturation, final 0.97 multiplier).

The reference samples neighbours with a bilinear sampler at +1-texel
offsets, which at pixel centers lands exactly on the neighbouring texel —
so the equivalent here is an array shift (edge-clamped).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.color import calculate_luma, rgb_to_ycbcr


def _shift(img, dy, dx):
    """Edge-clamped shift: out[y, x] = img[y+dy, x+dx]."""
    H, W = img.shape[:2]
    ys = jnp.clip(jnp.arange(H) + dy, 0, H - 1)
    xs = jnp.clip(jnp.arange(W) + dx, 0, W - 1)
    return img[ys][:, xs]


def tonemap_curve(v):
    c = v + v * v + 0.5 * v * v * v
    return c / (1.0 + c)


def neutral_tonemap(col):
    ycbcr = rgb_to_ycbcr(col)
    chroma = jnp.linalg.norm(ycbcr[..., 1:3], axis=-1) * 2.4
    bt = tonemap_curve(chroma)
    desat = jnp.maximum((bt - 0.7) * 0.8, 0.0)
    desat = desat * desat
    desat_col = col + (ycbcr[..., 0:1] - col) * desat[..., None]
    tm_luma = tonemap_curve(ycbcr[..., 0])
    luma = calculate_luma(col)
    tm0 = col * jnp.maximum(
        0.0, tm_luma / jnp.maximum(1e-5, luma)
    )[..., None]
    tm1 = tonemap_curve(desat_col)
    res = tm0 + (tm1 - tm0) * (bt * bt)[..., None]
    return res * 0.97


def postprocess(color: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) HDR -> (H, W, 3) tonemapped LDR-ish (still linear-light)."""
    sharpen_amount = 0.5

    def remap(l):
        return jnp.sqrt(jnp.maximum(l, 0.0))

    center = remap(calculate_luma(color))
    n_x = remap(calculate_luma(_shift(color, 0, 1)))
    n_y = remap(calculate_luma(_shift(color, 1, 0)))

    neighbours = jnp.zeros_like(center)
    wt_sum = jnp.zeros_like(center)
    # The WGSL loop runs dim=0..1 but indexes dim_offsets[0]/[1] both times,
    # accumulating the same two neighbours twice; reproduced faithfully.
    for _dim in range(2):
        wt = jnp.maximum(0.0, 1.0 - 6.0 * (jnp.abs(center - n_x) + jnp.abs(center - n_y)))
        wt = jnp.minimum(wt, sharpen_amount * wt * 1.25)
        neighbours = neighbours + n_x * wt + n_y * wt
        wt_sum = wt_sum + wt * 2.0

    sharpened = jnp.maximum(0.0, center * (wt_sum + 1.0) - neighbours)
    sharpened = sharpened * sharpened  # remap_inv
    luma = calculate_luma(color)
    col = color * jnp.maximum(0.0, sharpened / jnp.maximum(1e-5, luma))[..., None]
    return neutral_tonemap(col)
