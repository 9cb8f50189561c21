"""Slim single-row resolve record: RasterConfig.slim_rec.

One 96 B record (clip + uv f32 + WORLD-space oct32 corner normals + 12xf16
material payload) replaces the fused record + f16 instance-record pair —
resolve drops to 2 per-pixel gather rows (record + albedo tap) while the
row width stays at the 96 B flat-gather ceiling (CLAUDE.md round-4: 144 B
fused_inst_rec rows measured SLOWER than 96+48).

Certification contract: depth / material id / packed uv are BIT-IDENTICAL
to the base path (those columns travel bit-unchanged); normals pay a
second octahedral quantization and swap the interpolate/transform order —
exact for translation-only instances, ~1e-3 angular deviation under
rotation/scale (the swept image budget, like inst_rec_f16)."""

import dataclasses

import numpy as np

import voidin_tpu as vt
from voidin_tpu.core import encoding, mathx
from voidin_tpu.passes import cull, raster, resolve

from .test_resolve_quad import CFG, _camera, _textured_scene


def _frame(scene, cam, cfg):
    draws = cull.emit_draws(scene.meshes, scene.instances, cam)
    inst_rec = (resolve._inst_rec_f16(scene)
                if getattr(cfg, "slim_rec", False) else None)
    vis = raster.rasterize(scene.meshes, scene.instances, draws, cam, cfg,
                           materials=scene.materials, inst_rec=inst_rec)
    return resolve.resolve_gbuffer(scene, vis, cam, cfg)


def _rotated_scene():
    """Rotated + non-uniformly placed spheres so the world-space normal
    re-encode actually exercises the basis transform."""
    w = _textured_scene()
    t = (mathx.from_translation([0.5, 1.2, -4.0])
         @ mathx.from_rotation_x(np.float32(0.7))
         @ mathx.from_scale(1.3))
    w.instances.add(np.asarray(t), vt.mesh.SPHERE_1_MESH, 0)
    return w


def _decoded_normals(gb):
    return np.asarray(encoding.decode_octahedral_32(gb.normal_uv[..., 0]))


def _assert_slim_contract(base, slim):
    gb_b, aux_b = base
    gb_s, aux_s = slim
    # bit-exact columns: depth plane, material id, packed uv
    np.testing.assert_array_equal(np.asarray(gb_b.depth),
                                  np.asarray(gb_s.depth))
    np.testing.assert_array_equal(np.asarray(gb_b.material),
                                  np.asarray(gb_s.material))
    np.testing.assert_array_equal(np.asarray(gb_b.normal_uv[..., 1]),
                                  np.asarray(gb_s.normal_uv[..., 1]))
    # normals: second oct quantization + interp/transform order swap
    np.testing.assert_allclose(_decoded_normals(gb_b),
                               _decoded_normals(gb_s), atol=2e-2, rtol=0)
    # aux taps keyed by exact uv/ids/extent — tiny (fusion-order) budgets
    for k in ("albedo", "emissive", "mr"):
        np.testing.assert_allclose(
            np.asarray(getattr(aux_b, k)), np.asarray(getattr(aux_s, k)),
            atol=2e-5, rtol=0,
        )


def test_slim_matches_base_contract():
    scene = _textured_scene().device()
    cam = _camera(CFG.width / CFG.height)
    base = _frame(scene, cam, CFG)
    slim = _frame(scene, cam, dataclasses.replace(CFG, slim_rec=True))
    _assert_slim_contract(base, slim)


def test_slim_rotated_instances():
    scene = _rotated_scene().device()
    cam = _camera(CFG.width / CFG.height)
    base = _frame(scene, cam, CFG)
    slim = _frame(scene, cam, dataclasses.replace(CFG, slim_rec=True))
    _assert_slim_contract(base, slim)


def test_slim_planar_bit_identical_to_slim_vector():
    """planar_resolve composes with slim_rec (the production 'slim'
    variant): the G-buffer must match the vector slim path bit for bit
    (same certification as tests/test_resolve_planar.py)."""
    scene = _rotated_scene().device()
    cam = _camera(CFG.width / CFG.height)
    cfg_s = dataclasses.replace(CFG, slim_rec=True)
    cfg_p = dataclasses.replace(cfg_s, planar_resolve=True)
    v = _frame(scene, cam, cfg_s)
    p = _frame(scene, cam, cfg_p)
    np.testing.assert_array_equal(np.asarray(v[0].normal_uv),
                                  np.asarray(p[0].normal_uv))
    np.testing.assert_array_equal(np.asarray(v[0].depth),
                                  np.asarray(p[0].depth))
    np.testing.assert_array_equal(np.asarray(v[0].material),
                                  np.asarray(p[0].material))
    for k in ("albedo", "emissive", "mr"):
        np.testing.assert_allclose(
            np.asarray(getattr(v[1], k)), np.asarray(getattr(p[1], k)),
            atol=2e-5, rtol=0,
        )


def test_slim_renderer_fallback_on_normal_mapped_scene():
    """A scene outside slim_rec's envelope (here: a normal-mapped
    material) must silently fall back to the general fused/f16 options so
    tuned variants stay preset-portable (framework/renderer.py gate)."""
    from voidin_tpu.framework.renderer import Renderer

    w = _textured_scene()
    rng = np.random.default_rng(3)
    nrm = rng.integers(100, 160, (16, 16, 3)).astype(np.uint8)
    tn = w.textures.add(nrm, srgb=False)
    m = w.materials.add(normal=tn)
    w.instances.add(
        np.asarray(mathx.from_translation([0, 0, -3.0])),
        vt.mesh.SPHERE_1_MESH, m,
    )
    scene = w.device()
    cfg = dataclasses.replace(CFG, slim_rec=True, planar_resolve=True)
    r = Renderer(scene, cfg)
    assert not r.config.slim_rec
    assert r.config.fused_resolve_rec and r.config.inst_rec_f16

    # ... and a conforming scene keeps slim on.
    scene2 = _textured_scene().device()
    r2 = Renderer(scene2, cfg)
    assert r2.config.slim_rec


def test_slim_renderer_frame_runs():
    """End-to-end Renderer frame with slim_rec on (exercises the
    render_frame inst_rec threading)."""
    from voidin_tpu.framework.renderer import Renderer

    scene = _textured_scene().device()
    cfg = dataclasses.replace(CFG, slim_rec=True, planar_resolve=True)
    r = Renderer(scene, cfg)
    cam = vt.Camera(position=[0.0, 0.5, 2.0], yaw=0.0, pitch=-10.0,
                    aspect=CFG.width / CFG.height)
    img = np.asarray(r.render(cam))
    assert img.shape == (CFG.height, CFG.width, 3)
    assert np.isfinite(img).all()
    assert int(r.aux["overflow"]) == 0
