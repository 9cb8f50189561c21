"""Kernel winner-payload contraction (RasterConfig.kernel_payload):
bit-identity with the resolve pass's per-pixel record gather, through the
vis buffer and through the whole frame."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import voidin_tpu as vt
from voidin_tpu.core import mathx
from voidin_tpu.framework.renderer import FrameState, Globals, render_frame
from voidin_tpu.passes import cull as cull_pass
from voidin_tpu.passes import raster as raster_pass
from voidin_tpu.passes.raster import RasterConfig


def _slim_world(n=6, seed=0):
    """A scene inside the slim envelope: default materials (1x1 const
    textures, no normal maps, no alpha masking)."""
    w = vt.World()
    knot = w.meshes.add(vt.mesh.make_torus_knot(segments=32, sides=6))
    sphere = w.meshes.add(vt.mesh.make_uv_sphere(1.0, 4))
    mat = w.materials.add()
    rng = np.random.default_rng(seed)
    for i in range(n):
        a = 2 * np.pi * i / n
        t = mathx.from_translation(
            [4 * np.cos(a), 0.5 + (i % 3), -8 + 4 * np.sin(a)]
        ) @ mathx.from_rotation_y(np.float32(rng.uniform(0, 6)))
        w.instances.add(np.asarray(t), knot if i % 2 else sphere, mat)
    w.instances.add(
        np.asarray(
            mathx.from_translation([0, -1, -8]) @ mathx.from_scale(30.0)
        ),
        vt.mesh.HORIZONTAL_PLANE_MESH,
        mat,
    )
    w.lights.add_point_light([3, 6, -4], 25.0, [1, 1, 1])
    return w


CFG = dict(width=192, height=96, tri_capacity=1 << 13,
           pair_capacity=1 << 14, tile_tri_capacity=64, interpret=True,
           slim_rec=True, planar_resolve=True)


def test_payload_img_equals_record_gather():
    """vis.payload_img == resolve_rec[max(tri_id, 0)] bit-for-bit —
    including background (row 0) and every bitcast column."""
    w = _slim_world()
    scene = w.device()
    cfg = RasterConfig(**CFG, kernel_payload=True)
    cam = vt.Camera(position=[0, 2.5, 0], pitch=-15.0,
                    aspect=cfg.width / cfg.height).uniform()

    def run(c):
        draws = cull_pass.emit_draws(scene.meshes, scene.instances, cam)
        from voidin_tpu.passes import resolve as resolve_pass

        inst_rec = resolve_pass._inst_rec_f16(scene)
        return raster_pass.rasterize(
            scene.meshes, scene.instances, draws, cam, c,
            materials=scene.materials, inst_rec=inst_rec,
        )

    vis = jax.jit(run, static_argnums=0)(cfg)
    assert vis.payload_img is not None
    tid = np.maximum(np.asarray(vis.tri_id), 0)
    want = np.asarray(vis.resolve_rec)[tid]
    got = np.asarray(vis.payload_img)
    # bit-level: the payload carries bitcast u32/f16 columns
    np.testing.assert_array_equal(
        want.view(np.uint32), got.view(np.uint32)
    )
    assert int(np.asarray(vis.overflow)) == 0
    assert (np.asarray(vis.tri_id) >= 0).mean() > 0.3  # real coverage


def test_full_frame_bit_identical():
    """slim_p frame with and without kernel_payload: identical pixels."""
    w = _slim_world(n=5, seed=3)
    scene = w.device()
    cam = vt.Camera(position=[0, 2.5, 0], pitch=-15.0,
                    aspect=CFG["width"] / CFG["height"]).uniform()
    g = Globals.make(CFG["width"], CFG["height"])
    state = FrameState.initial(CFG["width"], CFG["height"])
    mov = jnp.zeros(0, jnp.int32)

    def frame(c):
        img, _st, _sc, aux = render_frame(
            scene, cam, g, state, mov, c, enable_taa=False,
        )
        assert int(aux["overflow"]) == 0
        return np.asarray(img)

    base = frame(RasterConfig(**CFG))
    pk = frame(RasterConfig(**CFG, kernel_payload=True))
    np.testing.assert_array_equal(base, pk)
    assert base.std() > 0.02


def test_multi_chunk_tiles():
    """Tiles whose pair ranges span multiple 128-record chunks: the
    payload merge across chunk boundaries must follow the id merge."""
    # many overlapping instances at one spot -> deep tiles
    w = vt.World()
    sphere = w.meshes.add(vt.mesh.make_uv_sphere(1.2, 4))
    mat = w.materials.add()
    rng = np.random.default_rng(7)
    for i in range(40):
        t = mathx.from_translation(
            [float(rng.uniform(-0.8, 0.8)), float(rng.uniform(0, 1.5)),
             -6.0 - 0.05 * i]
        )
        w.instances.add(np.asarray(t), sphere, mat)
    w.lights.add_point_light([2, 4, -2], 15.0, [1, 1, 1])
    scene = w.device()
    cfg = RasterConfig(width=128, height=64, tri_capacity=1 << 16,
                       pair_capacity=1 << 17, tile_tri_capacity=512,
                       interpret=True, slim_rec=True, kernel_payload=True)
    cam = vt.Camera(position=[0, 1, -2], pitch=-10.0,
                    aspect=cfg.width / cfg.height).uniform()
    draws = cull_pass.emit_draws(scene.meshes, scene.instances, cam)
    from voidin_tpu.passes import resolve as resolve_pass

    inst_rec = resolve_pass._inst_rec_f16(scene)
    vis = raster_pass.rasterize(
        scene.meshes, scene.instances, draws, cam, cfg,
        materials=scene.materials, inst_rec=inst_rec,
    )
    assert int(np.asarray(vis.overflow)) == 0
    tid = np.maximum(np.asarray(vis.tri_id), 0)
    want = np.asarray(vis.resolve_rec)[tid]
    np.testing.assert_array_equal(
        want.view(np.uint32), np.asarray(vis.payload_img).view(np.uint32)
    )
