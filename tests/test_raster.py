import jax.numpy as jnp
import numpy as np
import pytest

import voidin_tpu as vt
from voidin_tpu.core import mathx
from voidin_tpu.passes import cull, raster

CFG = raster.RasterConfig(
    width=128,
    height=64,
    tri_capacity=1 << 13,
    pair_capacity=1 << 14,
    tile_tri_capacity=64,
    interpret=True,
)


def _scene(n_spheres=3):
    w = vt.World()
    for i in range(n_spheres):
        t = mathx.from_translation([2.5 * (i - 1), 0.0, -6.0 - i])
        w.instances.add(np.asarray(t), vt.mesh.SPHERE_1_MESH, 0)
    # ground plane
    t = np.asarray(mathx.from_translation([0, -1.5, -6]) @ mathx.from_scale(20.0))
    w.instances.add(t, vt.mesh.HORIZONTAL_PLANE_MESH, 0)
    return w


def _camera(aspect):
    cam = vt.Camera(position=[0.0, 0.5, 2.0], yaw=0.0, pitch=-10.0, aspect=aspect)
    return cam.uniform()


def _oracle_raster(setup, width, height):
    """Brute-force per-pixel rasterizer over the *same* setup data."""
    rec = np.asarray(setup["raster_rec"])
    sx = rec[:, 0:3]
    sy = rec[:, 3:6]
    z = rec[:, 6:9]
    alive = np.asarray(setup["alive"])
    depth = np.zeros((height, width), np.float32)
    tid = np.full((height, width), -1, np.int32)
    nxt = [1, 2, 0]
    for t in np.nonzero(alive)[0]:
        x0 = max(int(np.floor(sx[t].min())), 0)
        x1 = min(int(np.ceil(sx[t].max())) + 1, width)
        y0 = max(int(np.floor(sy[t].min())), 0)
        y1 = min(int(np.ceil(sy[t].max())) + 1, height)
        if x0 >= x1 or y0 >= y1:
            continue
        xs = np.arange(x0, x1) + 0.5
        ys = np.arange(y0, y1) + 0.5
        X, Y = np.meshgrid(xs, ys)
        e = np.stack(
            [
                (X - sx[t, k]) * (sy[t, nxt[k]] - sy[t, k])
                - (Y - sy[t, k]) * (sx[t, nxt[k]] - sx[t, k])
                for k in range(3)
            ],
            axis=-1,
        )
        inside = (e >= 0).all(axis=-1)
        area = e.sum(axis=-1)
        area = np.where(np.abs(area) > 1e-20, area, 1e-20)
        d = (e[..., 1] * z[t, 0] + e[..., 2] * z[t, 1] + e[..., 0] * z[t, 2]) / area
        win = inside & (d > depth[y0:y1, x0:x1])
        depth[y0:y1, x0:x1] = np.where(win, d, depth[y0:y1, x0:x1])
        tid[y0:y1, x0:x1] = np.where(win, t, tid[y0:y1, x0:x1])
    return tid, depth


def test_raster_matches_oracle():
    w = _scene()
    scene = w.device()
    cam = _camera(CFG.width / CFG.height)
    draws = cull.emit_draws(scene.meshes, scene.instances, cam)
    setup = raster.triangle_setup(scene.meshes, scene.instances, draws, cam, CFG)
    vis = raster.rasterize(scene.meshes, scene.instances, draws, cam, CFG)

    assert int(vis.overflow) == 0
    tid_ref, depth_ref = _oracle_raster(setup, CFG.width, CFG.height)
    tid = np.asarray(vis.tri_id)
    depth = np.asarray(vis.depth)

    # Coverage must be non-trivial
    assert (tid >= 0).sum() > 500
    np.testing.assert_allclose(depth, depth_ref, atol=1e-6)
    # ids may differ only where depths tie (e.g. along the shared edge of
    # the two halves of a near-clipped quad, where both triangles produce
    # identical interpolated depth); depths above are exact, so any id
    # disagreement is a tie by construction.
    agree = (tid == tid_ref).mean()
    assert agree > 0.99, agree


def test_cull_equals_full_render():
    """Property: culling must not change the image (emit_draws contract)."""
    w = _scene(n_spheres=5)
    # add some instances far outside the frustum
    for i in range(10):
        t = mathx.from_translation([100.0 + i, 50.0, 20.0])
        w.instances.add(np.asarray(t), vt.mesh.SPHERE_1_MESH, 0)
    scene = w.device()
    cam = _camera(CFG.width / CFG.height)

    draws_all = cull.DrawList(
        instance=jnp.arange(scene.instances.count, dtype=jnp.int32),
        count=jnp.int32(scene.instances.count),
    )
    draws_culled = cull.emit_draws(scene.meshes, scene.instances, cam)
    assert int(draws_culled.count) < scene.instances.count

    vis_all = raster.rasterize(scene.meshes, scene.instances, draws_all, cam, CFG)
    vis_cull = raster.rasterize(scene.meshes, scene.instances, draws_culled, cam, CFG)
    np.testing.assert_allclose(
        np.asarray(vis_all.depth), np.asarray(vis_cull.depth), atol=1e-6
    )


def test_visibility_mask_conservative():
    """Everything that rasterizes to >=1 pixel must be marked visible."""
    w = _scene(n_spheres=5)
    scene = w.device()
    cam = _camera(CFG.width / CFG.height)
    mask = np.asarray(cull.instance_visibility(scene.meshes, scene.instances, cam))

    draws_all = cull.DrawList(
        instance=jnp.arange(scene.instances.count, dtype=jnp.int32),
        count=jnp.int32(scene.instances.count),
    )
    vis = raster.rasterize(scene.meshes, scene.instances, draws_all, cam, CFG)
    tid = np.asarray(vis.tri_id)
    inst_of_tri = np.asarray(vis.resolve_rec[:, 9]).astype(np.int32)
    covered = np.unique(inst_of_tri[tid[tid >= 0]])
    for i in covered:
        assert mask[i], f"instance {i} rasterized but was culled"


def test_fine_raster_pallas_matches_xla():
    """The Pallas kernel and the XLA twin must agree exactly."""
    import dataclasses

    w = _scene()
    scene = w.device()
    cam = _camera(CFG.width / CFG.height)
    draws = cull.emit_draws(scene.meshes, scene.instances, cam)
    setup = raster.triangle_setup(scene.meshes, scene.instances, draws, cam, CFG)
    records, counts, _ = raster.bin_triangles(setup, CFG)
    d_p, i_p = raster.fine_raster(records, counts, CFG, backend="pallas")
    d_x, i_x = raster.fine_raster(records, counts, CFG, backend="xla")
    # fine_raster returns untiled images
    np.testing.assert_array_equal(np.asarray(d_p), np.asarray(d_x))
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_x))
