"""Tile-rate (slot) resolve: RasterConfig.slot_resolve.

The slot path must be BIT-IDENTICAL to the per-pixel path: it fetches the
three resolve rows once per (8x16 tile, distinct triangle) and broadcasts
the DECODED f32 channels to pixels with an exact one-hot matmul — decode
is elementwise, so it commutes with exact selection, and the per-pixel
math afterwards is the same code. These tests are the image guard
bench.AB_VARIANTS['slot'/'all_s'] relies on.
"""

import dataclasses

import numpy as np

import voidin_tpu as vt
from tests.test_resolve_quad import (
    CFG,
    _assert_identical,
    _camera,
    _gb_of,
    _textured_scene,
)


def test_slot_bit_identical_to_per_pixel():
    scene = _textured_scene().device()
    cam = _camera(CFG.width / CFG.height)
    base = _gb_of(scene, cam, CFG)
    slot = _gb_of(scene, cam, dataclasses.replace(CFG, slot_resolve=True))
    _assert_identical(base, slot)
    assert int(slot[1].overflow) == 0


def test_slot_with_inst_f16_bit_identical_to_inst_f16():
    scene = _textured_scene().device()
    cam = _camera(CFG.width / CFG.height)
    cfg_h = dataclasses.replace(CFG, inst_rec_f16=True)
    base = _gb_of(scene, cam, cfg_h)
    slot = _gb_of(scene, cam, dataclasses.replace(cfg_h, slot_resolve=True))
    _assert_identical(base, slot)


def test_slot_alpha_mask_bit_identical():
    """With second-candidate tracking + lazy alpha fallback, the slot path
    feeds the same winner fields into the fallback machinery."""
    from tests.test_raster import _alpha_camera, _alpha_scene

    w, _, _ = _alpha_scene()
    scene = w.device()
    assert scene.alpha_masked
    cfg = dataclasses.replace(CFG, alpha_mask=True)
    cam = _alpha_camera(CFG.width / CFG.height)
    base = _gb_of(scene, cam, cfg)
    slot = _gb_of(scene, cam, dataclasses.replace(cfg, slot_resolve=True))
    _assert_identical(base, slot)
    # and through the dense two-pass oracle twin as well
    cfg_d = dataclasses.replace(cfg, lazy_alpha_resolve=False)
    base_d = _gb_of(scene, cam, cfg_d)
    slot_d = _gb_of(scene, cam, dataclasses.replace(cfg_d, slot_resolve=True))
    _assert_identical(base_d, slot_d)


def test_slot_small_k_overflow_counted_and_identical():
    """A tile with more distinct ids than slot_k routes the extra pixels
    through the compacted per-pixel fallback — still bit-identical while
    the fallback capacity holds; beyond it the overflow is COUNTED and the
    output stays structurally valid."""
    scene = _textured_scene().device()
    cam = _camera(CFG.width / CFG.height)
    base = _gb_of(scene, cam, CFG)
    # k=2 forces heavy fallback traffic; ample capacity -> bit-identical
    cfg_k2 = dataclasses.replace(CFG, slot_resolve=True, slot_k=2)
    slot = _gb_of(scene, cam, cfg_k2)
    _assert_identical(base, slot)
    assert int(slot[1].overflow) == 0
    # tiny capacity -> counted overflow, finite outputs
    cfg_tiny = dataclasses.replace(
        CFG, slot_resolve=True, slot_k=2, slot_edge_capacity=8
    )
    gb, aux = _gb_of(scene, cam, cfg_tiny)
    assert int(aux.overflow) > 0
    assert np.isfinite(np.asarray(gb.depth)).all()
    assert np.isfinite(np.asarray(aux.albedo)).all()


def test_slot_with_tap_block_bit_identical():
    """slot_resolve composes with the quad-rate albedo tap (the all_s
    sweep variant)."""
    world = _textured_scene()
    scene = world.device(tap_blocks=True)
    cam = _camera(CFG.width / CFG.height)
    cfg_t = dataclasses.replace(CFG, tap_block=True)
    base = _gb_of(scene, cam, cfg_t)
    slot = _gb_of(scene, cam, dataclasses.replace(cfg_t, slot_resolve=True))
    _assert_identical(base, slot)


def test_slot_normal_mapped_bit_identical():
    """A scene WITH normal maps keeps the tangent channels on the slot
    select (the no_normal_maps pruning must not trigger) and stays
    bit-identical through the TBN transform."""
    from voidin_tpu.core import mathx

    w = _textured_scene()
    rng = np.random.default_rng(3)
    nrm = rng.integers(100, 156, (32, 32, 3)).astype(np.uint8)
    nrm[..., 2] = 255  # mostly-up perturbations
    tn = w.textures.add(nrm, srgb=False)
    m = w.materials.add(albedo=1, normal=tn)
    t = mathx.from_translation([0.0, 0.3, -3.0])
    w.instances.add(np.asarray(t), vt.mesh.SPHERE_1_MESH, m)
    scene = w.device()
    assert not getattr(scene, "no_normal_maps", False)
    cam = _camera(CFG.width / CFG.height)
    base = _gb_of(scene, cam, CFG)
    slot = _gb_of(scene, cam, dataclasses.replace(CFG, slot_resolve=True))
    _assert_identical(base, slot)


def test_slot_full_frame_bit_identical():
    """Through the WHOLE frame pipeline: the slot-rate frame must equal
    the per-pixel frame bit for bit."""
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
    img_s, ovf_s = frame(dataclasses.replace(CFG, slot_resolve=True))
    np.testing.assert_array_equal(img_d, img_s)
    assert ovf_d == 0 and ovf_s == 0


def test_slot_excludes_fused_rec():
    import pytest

    scene = _textured_scene().device()
    cam = _camera(CFG.width / CFG.height)
    cfg = dataclasses.replace(CFG, slot_resolve=True, fused_resolve_rec=True)
    with pytest.raises(ValueError, match="mutually exclusive"):
        _gb_of(scene, cam, cfg)
