"""Bindless-style texture pool for TPU.

The reference binds up to 1024 textures as a `binding_array` and samples them
by material-provided index (pools/src/texture.rs:29-161). There are no
descriptors on TPU, so the pool is one device array:

* every texture is stored *with its full mip chain* flattened into a single
  texel axis: ``texels`` has shape (T, TOTAL, 4) where
  ``TOTAL = sum_l (S>>l)^2`` and S is the pool's (power-of-two) base size.
  A texel (t, level, y, x) lives at ``level_offset[level] + y * (S>>l) + x``.
  This makes per-pixel mip level a dynamic index — one gather, no
  per-level branching.
* smaller textures occupy the top-left corner of each level; per-texture
  (w, h) is kept for UV wrap.

Reserved ids (texture.rs:10-13): WHITE=0, BLACK=1, LTC1=2, LTC2=3. The two
LTC LUTs additionally live as dedicated f32 arrays on SceneData (64x64
matrices need full precision; the pool stores bf16).

Sampler semantics match the reference default sampler (app.rs:43-56):
repeat addressing, bilinear filtering, linear mip blending.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

WHITE_TEXTURE = 0
BLACK_TEXTURE = 1
LTC1_TEXTURE = 2
LTC2_TEXTURE = 3
MAX_TEXTURES = 1024

_SRGB_BREAK = 0.04045


def srgb_to_linear(c: np.ndarray) -> np.ndarray:
    c = np.asarray(c, np.float32)
    return np.where(c <= _SRGB_BREAK, c / 12.92, ((c + 0.055) / 1.055) ** 2.4).astype(
        np.float32
    )


def linear_to_srgb_np(c: np.ndarray) -> np.ndarray:
    c = np.asarray(c, np.float32)
    return np.where(
        c <= 0.0031308, c * 12.92, 1.055 * np.maximum(c, 1e-10) ** (1 / 2.4) - 0.055
    ).astype(np.float32)


def linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    """jnp version (final blit path, blit.wgsl)."""
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(
        c <= 0.0031308, c * 12.92, 1.055 * jnp.maximum(c, 1e-10) ** (1 / 2.4) - 0.055
    )


def _mip_sizes(base: int) -> List[int]:
    sizes = [base]
    while sizes[-1] > 1:
        sizes.append(sizes[-1] // 2)
    return sizes


def _downsample2x2(img: np.ndarray) -> np.ndarray:
    h, w = img.shape[:2]
    if h == 1 and w == 1:
        return img
    nh, nw = max(h // 2, 1), max(w // 2, 1)
    if h > 1 and w > 1:
        return img[: nh * 2, : nw * 2].reshape(nh, 2, nw, 2, -1).mean(axis=(1, 3))
    if h == 1:
        return img[:, : nw * 2].reshape(1, nw, 2, -1).mean(axis=2)
    return img[: nh * 2].reshape(nh, 2, 1, -1).mean(axis=1)


@struct.dataclass
class TexturePoolData:
    texels: jnp.ndarray  # (T, TOTAL, 4) bf16, linear color
    size: jnp.ndarray  # (T, 2) i32 (w, h) at level 0
    max_lod: jnp.ndarray  # (T,) f32 highest meaningful mip per texture
    level_offset: jnp.ndarray = struct.field(pytree_node=False, default=None)
    base_size: int = struct.field(pytree_node=False, default=0)

    @property
    def count(self) -> int:
        return self.texels.shape[0]


class TexturePool:
    def __init__(self, base_size: int = 1024):
        assert base_size & (base_size - 1) == 0
        self.base_size = base_size
        self.images: List[np.ndarray] = []  # linear f32 (h, w, 4)
        # Reserved: white, black + two LTC slots (kept white; real LUTs are
        # dedicated f32 arrays on the scene).
        white = np.ones((1, 1, 4), np.float32)
        black = np.zeros((1, 1, 4), np.float32)
        black[..., 3] = 1.0
        self.images += [white, black, white.copy(), white.copy()]

    def __len__(self):
        return len(self.images)

    def add(self, image: np.ndarray, srgb: bool = False) -> int:
        """Add an (H, W, C) uint8/float image; returns its texture id."""
        img = np.asarray(image)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        img = img.astype(np.float32)
        if img.ndim == 2:
            img = img[..., None]
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        if img.shape[-1] == 3:
            img = np.concatenate([img, np.ones_like(img[..., :1])], axis=-1)
        if srgb:
            img = np.concatenate(
                [srgb_to_linear(img[..., :3]), img[..., 3:4]], axis=-1
            )
        h, w = img.shape[:2]
        if h > self.base_size or w > self.base_size:
            # Resize down to pool base size preserving aspect via box filter.
            while img.shape[0] > self.base_size or img.shape[1] > self.base_size:
                img = _downsample2x2(img)
        if len(self.images) >= MAX_TEXTURES:
            raise ValueError("texture pool full")
        self.images.append(np.ascontiguousarray(img, np.float32))
        return len(self.images) - 1

    def device(self) -> TexturePoolData:
        S = self.base_size
        sizes = _mip_sizes(S)
        offsets = np.cumsum([0] + [s * s for s in sizes])[:-1]
        total = int(sum(s * s for s in sizes))
        T = len(self.images)
        texels = np.zeros((T, total, 4), np.float32)
        wh = np.zeros((T, 2), np.int32)
        max_lod = np.zeros(T, np.float32)
        for t, img in enumerate(self.images):
            h, w = img.shape[:2]
            wh[t] = (w, h)
            max_lod[t] = max(0, int(np.floor(np.log2(max(min(w, h), 1)))))
            level = img
            for li, s in enumerate(sizes):
                lh, lw = level.shape[:2]
                if lh == 0 or lw == 0:
                    break
                block = texels[t, offsets[li] : offsets[li] + s * s].reshape(s, s, 4)
                block[:lh, :lw] = level[:s, :s]
                if lh == 1 and lw == 1:
                    # propagate the 1x1 tail to remaining levels
                    for lj in range(li + 1, len(sizes)):
                        sj = sizes[lj]
                        texels[t, offsets[lj] : offsets[lj] + sj * sj] = level.reshape(
                            1, 4
                        )
                    break
                level = _downsample2x2(level)
        return TexturePoolData(
            texels=jnp.asarray(texels, jnp.bfloat16),
            size=jnp.asarray(wh),
            max_lod=jnp.asarray(max_lod),
            level_offset=tuple(int(o) for o in offsets),
            base_size=S,
        )


# ---------------------------------------------------------------------------
# Device-side sampling (inside jit)
# ---------------------------------------------------------------------------


def _gather_texel(pool: TexturePoolData, tex_id, flat_idx):
    """texels[(tex_id, flat_idx)] -> (..., 4) f32."""
    return pool.texels[tex_id, flat_idx].astype(jnp.float32)


def _bilinear_level(pool: TexturePoolData, tex_id, uv, level):
    """Bilinear sample of one (dynamic) mip level with repeat wrap."""
    level = level.astype(jnp.int32)
    offsets = jnp.asarray(pool.level_offset, jnp.int32)
    base = pool.base_size
    # Level-l texture extent for this texture (>=1).
    wh = pool.size[tex_id]  # (..., 2)
    lw = jnp.maximum(wh[..., 0] >> level, 1)
    lh = jnp.maximum(wh[..., 1] >> level, 1)
    stride = jnp.maximum(base >> level, 1)  # row stride of the padded level
    off = offsets[level]

    fx = uv[..., 0] * lw.astype(jnp.float32) - 0.5
    fy = uv[..., 1] * lh.astype(jnp.float32) - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]

    def wrap(v, n):
        return jnp.mod(v.astype(jnp.int32), n)

    x0i, x1i = wrap(x0, lw), wrap(x0 + 1, lw)
    y0i, y1i = wrap(y0, lh), wrap(y0 + 1, lh)

    def at(xi, yi):
        return _gather_texel(pool, tex_id, off + yi * stride + xi)

    c00, c10 = at(x0i, y0i), at(x1i, y0i)
    c01, c11 = at(x0i, y1i), at(x1i, y1i)
    top = c00 * (1 - tx) + c10 * tx
    bot = c01 * (1 - tx) + c11 * tx
    return top * (1 - ty) + bot * ty


def sample_trilinear(pool: TexturePoolData, tex_id, uv, lod=None):
    """Trilinear (bilinear + linear mip) sample; repeat wrap.

    tex_id: (...,) int32; uv: (..., 2) f32; lod: (...,) f32 or None (mip 0).
    Returns (..., 4) f32 linear color.
    """
    if lod is None:
        return _bilinear_level(pool, tex_id, uv, jnp.zeros(uv.shape[:-1], jnp.int32))
    lod = jnp.clip(lod, 0.0, pool.max_lod[tex_id])
    l0 = jnp.floor(lod)
    frac = (lod - l0)[..., None]
    c0 = _bilinear_level(pool, tex_id, uv, l0.astype(jnp.int32))
    c1 = _bilinear_level(
        pool,
        tex_id,
        uv,
        jnp.minimum(l0 + 1, pool.max_lod[tex_id]).astype(jnp.int32),
    )
    return c0 * (1 - frac) + c1 * frac


def sample_lut_bilinear(table: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Clamp-to-edge bilinear fetch from a (H, W, C) f32 LUT (LTC sampler)."""
    h, w = table.shape[0], table.shape[1]
    fx = uv[..., 0] * w - 0.5
    fy = uv[..., 1] * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    c00 = table[y0i, x0i]
    c10 = table[y0i, x1i]
    c01 = table[y1i, x0i]
    c11 = table[y1i, x1i]
    top = c00 * (1 - tx) + c10 * tx
    bot = c01 * (1 - tx) + c11 * tx
    return top * (1 - ty) + bot * ty
