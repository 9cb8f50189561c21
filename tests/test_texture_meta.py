"""Metadata-free texture taps: sample_trilinear's wh/srgb fast paths and
the arithmetic mip-offset / max_lod derivations must be BIT-IDENTICAL to
the table-gather path (they only change where metadata comes from)."""

import numpy as np

import jax.numpy as jnp

import voidin_tpu as vt
from voidin_tpu.scene import texture as tex_mod


def test_derived_max_lod_matches_build_formula():
    """derived_max_lod == TexturePool.device()'s floor(log2(min(w, h)))
    for every extent the pool can hold (incl. non-pow2)."""
    n = np.arange(1, 4097)
    want = np.floor(np.log2(n)).astype(np.float32)
    got = np.asarray(
        tex_mod.derived_max_lod(jnp.asarray(n), jnp.asarray(n))
    )
    np.testing.assert_array_equal(got, want)


def test_level_offset_closed_form():
    for S in (1, 2, 8, 64, 256, 1024):
        sizes = tex_mod._mip_sizes(S)
        offsets = np.cumsum([0] + [s * s for s in sizes])[:-1]
        lv = jnp.arange(len(sizes))
        got = np.asarray(tex_mod._level_offset_closed(S, lv))
        np.testing.assert_array_equal(got, offsets)


def _pool():
    pool = vt.World().textures  # reserved WHITE/BLACK/LTC slots
    rng = np.random.default_rng(3)
    pool.add(rng.integers(0, 256, (64, 64, 4)).astype(np.uint8), srgb=True)
    pool.add(rng.integers(0, 256, (48, 24, 4)).astype(np.uint8), srgb=True)
    pool.add(rng.integers(0, 256, (16, 16, 4)).astype(np.uint8), srgb=False)
    return pool


def test_sample_trilinear_meta_fast_paths_bit_identical():
    pool = _pool()
    tp = pool.device()
    rng = np.random.default_rng(11)
    P = 512
    tex_id = jnp.asarray(rng.integers(4, 7, P))
    uv = jnp.asarray(rng.uniform(-1.5, 2.5, (P, 2)).astype(np.float32))
    lod = jnp.asarray(rng.uniform(0.0, 8.0, P).astype(np.float32))

    base = tex_mod.sample_trilinear(tp, tex_id, uv, lod)

    # wh passed in (as resolve does from its fused record, f32)
    whg = tp.size[tex_id]
    wh = (whg[..., 0].astype(jnp.float32), whg[..., 1].astype(jnp.float32))
    fast = tex_mod.sample_trilinear(tp, tex_id, uv, lod, wh=wh)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(fast))

    # static srgb flag (textures 4 and 5 are both sRGB)
    m = np.asarray(tex_id) <= 5
    s_base = tex_mod.sample_trilinear(tp, tex_id[m], uv[m], lod[m])
    s_fast = tex_mod.sample_trilinear(tp, tex_id[m], uv[m], lod[m],
                                      srgb=True)
    np.testing.assert_array_equal(np.asarray(s_base), np.asarray(s_fast))
    m = ~m  # texture 6 is linear
    l_fast = tex_mod.sample_trilinear(tp, tex_id[m], uv[m], lod[m],
                                      srgb=False)
    np.testing.assert_array_equal(
        np.asarray(tex_mod.sample_trilinear(tp, tex_id[m], uv[m], lod[m])),
        np.asarray(l_fast),
    )


def test_sample_trilinear_quadblock_bit_identical():
    """The quad-rate tap must reproduce sample_trilinear exactly on (H, W)
    grids — smooth uv (uniform quads), jumpy uv/texture/level (edge path),
    wrap seams, and the overflow fallback must stay finite + counted."""
    pool = _pool()
    tp = pool.device()
    H, W = 32, 64
    rng = np.random.default_rng(21)

    def run(tex_id, uv, lod, cap=0):
        whg = tp.size[tex_id]
        wh = (whg[..., 0].astype(jnp.float32),
              whg[..., 1].astype(jnp.float32))
        base = tex_mod.sample_trilinear(tp, tex_id, uv, lod, wh=wh)
        quad, ovf = tex_mod.sample_trilinear_quadblock(
            tp, tex_id, uv, lod, wh=wh, capacity=cap
        )
        return np.asarray(base), np.asarray(quad), int(ovf)

    # smooth screen-like uv + lod (mostly uniform quads)
    yy, xx = np.meshgrid(
        np.linspace(-0.2, 1.3, H), np.linspace(-0.1, 2.1, W), indexing="ij"
    )
    uv = jnp.asarray(np.stack([xx, yy], -1).astype(np.float32))
    lod = jnp.asarray(
        (xx * 2.0 + yy).astype(np.float32)
    )
    tex_id = jnp.full((H, W), 4, jnp.int32)
    b, q, ovf = run(tex_id, uv, lod)
    np.testing.assert_array_equal(b, q)
    assert ovf == 0

    # adversarial: random uv/lod/texture per pixel (nearly all edge quads)
    uv_r = jnp.asarray(rng.uniform(-2, 3, (H, W, 2)).astype(np.float32))
    lod_r = jnp.asarray(rng.uniform(0, 9, (H, W)).astype(np.float32))
    tex_r = jnp.asarray(rng.integers(4, 7, (H, W)).astype(np.int32))
    b, q, ovf = run(tex_r, uv_r, lod_r)
    np.testing.assert_array_equal(b, q)
    assert ovf == 0  # default capacity covers every quad

    # overflow: tiny capacity — counted, anchor-block fallback stays finite
    _, q, ovf = run(tex_r, uv_r, lod_r, cap=8)
    assert ovf > 0
    assert np.isfinite(q).all()


def test_resolve_tap_block_bit_identical():
    """Through resolve_gbuffer: RasterConfig.tap_block must not change a
    single G-buffer/aux value (composes with quad_rate_resolve = the
    all_q sweep variant)."""
    import dataclasses

    from tests.test_resolve_quad import (
        CFG, _assert_identical, _camera, _gb_of, _textured_scene,
    )

    scene = _textured_scene().device()
    cam = _camera(CFG.width / CFG.height)
    base = _gb_of(scene, cam, CFG)
    tap = _gb_of(scene, cam, dataclasses.replace(CFG, tap_block=True))
    _assert_identical(base, tap)
    assert int(tap[1].overflow) == 0
    both = _gb_of(
        scene, cam,
        dataclasses.replace(CFG, tap_block=True, quad_rate_resolve=True),
    )
    _assert_identical(base, both)


def test_upsample2x_matches_jax_image_resize():
    """The static-shift 2x bilinear upsample (half-res area lights) must
    reproduce jax.image.resize('bilinear') samples."""
    import jax.image as jimage

    from voidin_tpu.passes.shading import _upsample2x_bilinear

    rng = np.random.default_rng(9)
    a = jnp.asarray(rng.uniform(0, 3, (17, 23, 3)).astype(np.float32))
    want = jimage.resize(a, (34, 46, 3), method="bilinear")
    got = _upsample2x_bilinear(a)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-6)


def test_slot_srgb_statics():
    """World.device() derives one static sRGB flag per material slot;
    WHITE/BLACK (sRGB fixed points) never block it; genuinely mixed slots
    fall back to None (per-pixel gather)."""
    w = vt.World()
    rng = np.random.default_rng(5)
    t_srgb = w.textures.add(
        rng.integers(1, 255, (8, 8, 3)).astype(np.uint8), srgb=True
    )
    w.materials.add(albedo=t_srgb)
    w.materials.add()  # defaults: WHITE albedo — fixed point, no block
    w.instances.add(np.eye(4, dtype=np.float32), vt.mesh.SPHERE_1_MESH, 0)
    scene = w.device()
    assert scene.albedo_srgb is True
    assert scene.normal_srgb is False  # all WHITE
    # a linear-flagged non-trivial albedo makes the slot genuinely mixed
    t_lin = w.textures.add(
        rng.integers(1, 255, (8, 8, 3)).astype(np.uint8), srgb=False
    )
    w.materials.add(albedo=t_lin)
    assert w.device().albedo_srgb is None


def test_blockless_pool_falls_back_and_snapshots():
    """World.device(tap_blocks=False): 1/3 the pool bytes; the tap-block
    resolve silently falls back to per-pixel rows (same image), and the
    snapshot roundtrip realigns the leaf stream without the block tables."""
    import dataclasses

    from tests.test_resolve_quad import (
        CFG, _assert_identical, _camera, _gb_of, _textured_scene,
    )
    from voidin_tpu.io.snapshot import load_scene, save_scene

    w = _textured_scene()
    scene = w.device(tap_blocks=False)
    assert scene.textures.child_blocks is None
    cam = _camera(CFG.width / CFG.height)
    base = _gb_of(scene, cam, CFG)
    tap = _gb_of(scene, cam, dataclasses.replace(CFG, tap_block=True))
    _assert_identical(base, tap)  # fallback: identical, just per-pixel

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = d + "/s.npz"
        save_scene(p, scene)
        loaded, _ = load_scene(p)
        assert loaded.textures.child_blocks is None
        np.testing.assert_array_equal(
            np.asarray(scene.textures.quads), np.asarray(loaded.textures.quads)
        )
