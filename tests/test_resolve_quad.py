"""Quad-rate (coherence-aware) resolve: RasterConfig.quad_rate_resolve.

The quad path must be BIT-IDENTICAL to the per-pixel path: it only changes
where the three resolve row gathers are issued (once per uniform 2x2 quad +
a compacted per-pixel batch for edge quads), never the math. These tests
are the image-budget guard bench.AB_VARIANTS['quad'/'all_q'] relies on.
"""

import dataclasses

import numpy as np

import voidin_tpu as vt
from voidin_tpu.core import mathx
from voidin_tpu.passes import cull, raster, resolve

CFG = raster.RasterConfig(
    width=128,
    height=64,
    tri_capacity=1 << 13,
    pair_capacity=1 << 14,
    tile_tri_capacity=64,
    interpret=True,
)


def _textured_scene():
    """Spheres + ground with two textured materials so every resolve
    gather (record, corner attributes, instance+material) is exercised."""
    w = vt.World()
    yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    checker = ((xx // 8 + yy // 8) % 2 * 155 + 100).astype(np.uint8)
    t0 = w.textures.add(np.stack([checker] * 3, -1), srgb=True)
    rng = np.random.default_rng(7)
    t1 = w.textures.add(
        rng.integers(40, 220, (64, 64, 3)).astype(np.uint8), srgb=True
    )
    m0 = w.materials.add(albedo=t0)
    m1 = w.materials.add(albedo=t1)
    for i in range(4):
        t = mathx.from_translation([1.8 * (i - 1.5), 0.0, -5.0 - 0.7 * i])
        w.instances.add(
            np.asarray(t), vt.mesh.SPHERE_1_MESH, m0 if i % 2 else m1
        )
    t = np.asarray(
        mathx.from_translation([0, -1.5, -6]) @ mathx.from_scale(20.0)
    )
    w.instances.add(t, vt.mesh.HORIZONTAL_PLANE_MESH, m1)
    return w


def _camera(aspect):
    cam = vt.Camera(
        position=[0.0, 0.5, 2.0], yaw=0.0, pitch=-10.0, aspect=aspect
    )
    return cam.uniform()


def _gb_of(scene, cam, cfg):
    draws = cull.emit_draws(scene.meshes, scene.instances, cam)
    vis = raster.rasterize(scene.meshes, scene.instances, draws, cam, cfg)
    return resolve.resolve_gbuffer(scene, vis, cam, cfg)


def _assert_identical(a, b):
    gb_a, aux_a = a
    gb_b, aux_b = b
    np.testing.assert_array_equal(
        np.asarray(gb_a.normal_uv), np.asarray(gb_b.normal_uv)
    )
    np.testing.assert_array_equal(
        np.asarray(gb_a.material), np.asarray(gb_b.material)
    )
    np.testing.assert_array_equal(
        np.asarray(gb_a.depth), np.asarray(gb_b.depth)
    )
    np.testing.assert_array_equal(
        np.asarray(aux_a.albedo), np.asarray(aux_b.albedo)
    )
    np.testing.assert_array_equal(
        np.asarray(aux_a.emissive), np.asarray(aux_b.emissive)
    )
    np.testing.assert_array_equal(np.asarray(aux_a.mr), np.asarray(aux_b.mr))


def test_quad_rate_bit_identical_to_per_pixel():
    scene = _textured_scene().device()
    cam = _camera(CFG.width / CFG.height)
    base = _gb_of(scene, cam, CFG)
    cfg_q = dataclasses.replace(CFG, quad_rate_resolve=True)
    quad = _gb_of(scene, cam, cfg_q)
    _assert_identical(base, quad)
    assert int(quad[1].overflow) == 0


def test_quad_rate_with_inst_f16_bit_identical_to_inst_f16():
    """quad_rate composes with inst_rec_f16 (the all_q sweep variant):
    identical to the per-pixel inst_rec_f16 path bit for bit."""
    scene = _textured_scene().device()
    cam = _camera(CFG.width / CFG.height)
    cfg_h = dataclasses.replace(CFG, inst_rec_f16=True)
    base = _gb_of(scene, cam, cfg_h)
    quad = _gb_of(
        scene, cam, dataclasses.replace(cfg_h, quad_rate_resolve=True)
    )
    _assert_identical(base, quad)


def test_quad_rate_alpha_mask_bit_identical():
    """With second-candidate tracking + lazy alpha fallback, the quad path
    feeds the same winner fields into the fallback machinery."""
    from tests.test_raster import _alpha_camera, _alpha_scene

    w, _, _ = _alpha_scene()
    scene = w.device()
    assert scene.alpha_masked
    cfg = dataclasses.replace(CFG, alpha_mask=True)
    cam = _alpha_camera(CFG.width / CFG.height)
    base = _gb_of(scene, cam, cfg)
    quad = _gb_of(scene, cam, dataclasses.replace(cfg, quad_rate_resolve=True))
    _assert_identical(base, quad)
    # and through the dense two-pass oracle twin as well
    cfg_d = dataclasses.replace(cfg, lazy_alpha_resolve=False)
    base_d = _gb_of(scene, cam, cfg_d)
    quad_d = _gb_of(
        scene, cam, dataclasses.replace(cfg_d, quad_rate_resolve=True)
    )
    _assert_identical(base_d, quad_d)


def test_quad_rate_overflow_counted_and_bounded():
    """Edge quads beyond quad_edge_capacity keep their anchor's rows: the
    overflow is COUNTED and the output stays structurally valid."""
    scene = _textured_scene().device()
    cam = _camera(CFG.width / CFG.height)
    cfg_q = dataclasses.replace(
        CFG, quad_rate_resolve=True, quad_edge_capacity=8
    )
    gb, aux = _gb_of(scene, cam, cfg_q)
    assert int(aux.overflow) > 0  # the scene has > 8 edge quads
    assert np.isfinite(np.asarray(gb.depth)).all()
    assert np.isfinite(np.asarray(aux.albedo)).all()


def test_quad_rate_full_frame_bit_identical():
    """Through the WHOLE frame pipeline (update/cull/raster/resolve/shade/
    TAA/post): the quad-rate frame must equal the per-pixel frame bit for
    bit — the guard bench's all_q variant stands on."""
    import jax.numpy as jnp

    from voidin_tpu.framework.renderer import (
        FrameState, Globals, render_frame,
    )

    scene = _textured_scene().device()
    cam = _camera(CFG.width / CFG.height)
    g = Globals.make(CFG.width, CFG.height, frame=1, time=0.5, dt=1 / 60)
    state = FrameState.initial(CFG.width, CFG.height).replace(
        history_valid=jnp.asarray(True)
    )
    mov = jnp.zeros(0, jnp.int32)

    def frame(cfg):
        img, _st, _sc, aux = render_frame(scene, cam, g, state, mov, cfg)
        return np.asarray(img), int(aux["overflow"])

    img_d, ovf_d = frame(CFG)
    img_q, ovf_q = frame(dataclasses.replace(CFG, quad_rate_resolve=True))
    np.testing.assert_array_equal(img_d, img_q)
    assert ovf_d == 0 and ovf_q == 0


def test_quad_rate_excludes_fused_rec():
    import pytest

    scene = _textured_scene().device()
    cam = _camera(CFG.width / CFG.height)
    cfg = dataclasses.replace(
        CFG, quad_rate_resolve=True, fused_resolve_rec=True
    )
    with pytest.raises(ValueError, match="mutually exclusive"):
        _gb_of(scene, cam, cfg)
