"""OOB bounds-validation mode (RasterConfig.debug_bounds, core/checks.py):
the SURVEY §5.2 sanitizer — checkify asserts on every data-dependent
gather index. A clean frame passes (and stays bit-identical to the
unchecked frame); a deliberately-corrupt scene trips a named check."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_resolve_quad import CFG, _camera, _textured_scene
from voidin_tpu.core import checks
from voidin_tpu.passes import cull, raster, resolve


def _vis_of(scene, cam, cfg):
    draws = cull.emit_draws(scene.meshes, scene.instances, cam)
    return raster.rasterize(scene.meshes, scene.instances, draws, cam, cfg)


def _checked_resolve(scene, vis, cam, cfg):
    """Jit the checkified resolve so the clean-frame comparison sees the
    same XLA fusion decisions as the unchecked jitted pass (checkify run
    eagerly differs by 1 ULP in fused chains)."""
    from jax.experimental import checkify

    def f(v):
        checks.set_bounds_enabled(True)
        try:
            return resolve.resolve_gbuffer(scene, v, cam, cfg)
        finally:
            checks.set_bounds_enabled(False)

    err, out = jax.jit(checkify.checkify(f, errors=checkify.user_checks))(
        vis
    )
    return err, out


def test_clean_frame_passes_and_matches_unchecked():
    scene = _textured_scene().device()
    cam = _camera(CFG.width / CFG.height)
    vis = _vis_of(scene, cam, CFG)
    err, (gb, aux) = _checked_resolve(scene, vis, cam, CFG)
    err.throw()  # no OOB in a well-formed scene
    gb0, aux0 = jax.jit(
        lambda v: resolve.resolve_gbuffer(scene, v, cam, CFG)
    )(vis)
    np.testing.assert_array_equal(np.asarray(gb.depth), np.asarray(gb0.depth))
    np.testing.assert_array_equal(
        np.asarray(aux.albedo), np.asarray(aux0.albedo)
    )


def test_corrupt_tri_id_trips_resolve_check():
    scene = _textured_scene().device()
    cam = _camera(CFG.width / CFG.height)
    vis = _vis_of(scene, cam, CFG)
    bad = vis.replace(
        tri_id=jnp.where(vis.tri_id >= 0, vis.tri_id + 10_000_000,
                         vis.tri_id)
    )
    err, _ = _checked_resolve(scene, bad, cam, CFG)
    with pytest.raises(Exception, match="resolve.rec"):
        err.throw()


def test_corrupt_instance_id_trips_instance_check():
    scene = _textured_scene().device()
    cam = _camera(CFG.width / CFG.height)
    vis = _vis_of(scene, cam, CFG)
    rec = vis.resolve_rec.at[:, 9].set(1.0e7)  # instance column
    err, _ = _checked_resolve(scene, vis.replace(resolve_rec=rec), cam, CFG)
    with pytest.raises(Exception, match="resolve.instance"):
        err.throw()


def test_renderer_debug_bounds_end_to_end():
    """The Renderer plumbs debug_bounds through jit + checkify: a clean
    scene renders identically with the mode on."""
    import voidin_tpu as vt
    from voidin_tpu.framework.renderer import Renderer

    world = _textured_scene()
    cam = vt.Camera(position=[0.0, 0.5, 2.0], yaw=0.0, pitch=-10.0,
                    aspect=CFG.width / CFG.height)
    r0 = Renderer(world.device(), CFG)
    img0 = np.asarray(r0.render(cam))
    r1 = Renderer(world.device(),
                  dataclasses.replace(CFG, debug_bounds=True))
    img1 = np.asarray(r1.render(cam))
    np.testing.assert_array_equal(img0, img1)


def test_traversal_node_check():
    """A corrupt TLAS child pointer trips the rt.tlas_node check inside
    the traversal while_loop (checkify threads errors through loops)."""
    import voidin_tpu as vt
    from jax.experimental import checkify

    from voidin_tpu.core import mathx
    from voidin_tpu.rt import traverse

    w = vt.World()
    rng = np.random.default_rng(0)
    for _ in range(4):
        t = mathx.from_translation(rng.uniform(-3, 3, 3))
        w.instances.add(np.asarray(t), vt.mesh.SPHERE_1_MESH, 0)
    scene = w.device(with_tlas=True)
    tlas, blas, inst, tri_pos = traverse.scene_rays(scene)
    # corrupt the root's left-child pointer far past the node table
    bad_tlas = tlas.at[0, 3].set(1.0e7)

    origins = jnp.asarray(rng.uniform(-5, 5, (64, 3)), jnp.float32)
    dirs = jnp.asarray(rng.uniform(-1, 1, (64, 3)), jnp.float32)

    def f(o, d):
        checks.set_bounds_enabled(True)
        try:
            return traverse.occluded(bad_tlas, blas, inst, tri_pos, o, d,
                                     t_max=10.0)
        finally:
            checks.set_bounds_enabled(False)

    err, _ = checkify.checkify(f, errors=checkify.user_checks)(
        origins, dirs
    )
    with pytest.raises(Exception, match="rt\\."):
        err.throw()
