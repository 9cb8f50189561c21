import jax.numpy as jnp
import numpy as np

import voidin_tpu as vt
from voidin_tpu.core import mathx
from voidin_tpu.rt import traverse


def _occlusion_oracle(world, origins, dirs, t_max):
    """Brute force over every instance triangle (object-space MT)."""
    h = world.meshes.host_arrays()
    inst = world.instances.host_arrays()
    R = len(origins)
    hit = np.zeros(R, bool)
    for n in range(len(inst["mesh_id"])):
        inv = inst["inv_transform"][n]
        mid = inst["mesh_id"][n]
        base = h["base_index"][mid] // 3
        count = h["index_count"][mid] // 3
        tris = h["positions"]  # via tri rows instead:
        rows = np.concatenate([  # rebuild tri_pos host-side
            h["positions"][h["indices"].reshape(-1, 3)[:, k] + 0]  # placeholder
            for k in range(0)
        ]) if False else None
        o = origins @ inv[:3, :3].T + inv[:3, 3]
        d = dirs @ inv[:3, :3].T
        tri_idx = h["indices"][3 * base : 3 * (base + count)].reshape(-1, 3)
        vofs = h["vertex_offset"][mid]
        v = h["positions"][tri_idx + vofs]  # (t, 3, 3)
        for ti in range(len(v)):
            v0, v1, v2 = v[ti]
            e1, e2 = v1 - v0, v2 - v0
            uvec = np.cross(d, e2)
            det = (e1 * uvec).sum(-1)
            inv_det = 1.0 / np.where(np.abs(det) > 1e-20, det, 1e-20)
            orig = o - v0
            u = inv_det * (orig * uvec).sum(-1)
            vv = np.cross(orig, e1)
            w = inv_det * (d * vv).sum(-1)
            t = inv_det * (e2 * vv).sum(-1)
            ok = (
                (det >= 1e-10)
                & (u >= 0) & (u <= 1)
                & (w >= 0) & (u + w <= 1)
                & (t > 0) & (t < t_max)
            )
            hit |= ok
    return hit


def test_occlusion_matches_bruteforce():
    w = vt.World()
    rng = np.random.default_rng(0)
    for i in range(6):
        t = (
            mathx.from_translation(rng.uniform(-4, 4, 3))
            @ mathx.from_rotation_y(np.float32(rng.uniform(0, 6)))
            @ mathx.from_scale(float(rng.uniform(0.5, 1.5)))
        )
        w.instances.add(np.asarray(t), vt.mesh.SPHERE_1_MESH, 0)
    scene = w.device(with_tlas=True)
    tlas, blas, inst, tri_pos = traverse.scene_rays(scene)

    R = 256
    origins = rng.uniform(-6, 6, (R, 3)).astype(np.float32)
    targets = rng.uniform(-4, 4, (R, 3)).astype(np.float32)
    dirs = (targets - origins).astype(np.float32)

    res = traverse.occluded(
        tlas, blas, inst, tri_pos, jnp.asarray(origins), jnp.asarray(dirs),
        t_max=1.0,
    )
    got = np.asarray(res.hit)
    assert int(res.overflow) == 0 and int(res.exhausted) == 0
    want = _occlusion_oracle(w, origins, dirs, t_max=1.0)
    agree = (got == want).mean()
    assert agree == 1.0, f"occlusion mismatch: {agree}, {np.flatnonzero(got != want)[:10]}"
    assert want.any() and not want.all()  # non-trivial test


def _deep_tlas_chain(n):
    """Synthetic worst case: a TLAS left-spine where every internal node's
    children are BOTH the next node — each pop pushes two, so the stack
    grows by one per step and must overflow STACK=48."""
    rows = np.zeros((n, 8), np.float32)
    rows[:, 0:3] = -100.0  # min
    rows[:, 4:7] = 100.0  # max — every node hit by any ray
    for i in range(n - 1):
        rows[i, 3] = i + 1  # a = left child
        rows[i, 7] = i + 1  # b = right child
    rows[n - 1, 3] = -1.0  # leaf
    rows[n - 1, 7] = 0.0  # instance 0
    blas = np.zeros((1, 8), np.float32)
    blas[0, 7] = 1.0  # leaf, 1 tri
    inst = np.zeros((1, 24), np.float32)
    inst[0, :16] = np.eye(4, dtype=np.float32).reshape(16)
    tri = np.zeros((1, 9), np.float32)  # degenerate tri: never hit
    o = np.zeros((1, 3), np.float32)
    d = np.array([[0, 0, -1]], np.float32)
    return (jnp.asarray(rows), jnp.asarray(blas), jnp.asarray(inst),
            jnp.asarray(tri), jnp.asarray(o), jnp.asarray(d))


def test_occluded_reports_stack_overflow():
    args = _deep_tlas_chain(80)
    res = traverse.occluded(*args, t_max=1e6, max_steps=4096)
    assert int(res.overflow) > 0, "deep spine must overflow STACK and say so"


def test_occluded_reports_steps_exhausted():
    args = _deep_tlas_chain(80)
    res = traverse.occluded(*args, t_max=1e6, max_steps=3)
    assert int(res.exhausted) == 1


def test_closest_hit_reports_counters():
    args = _deep_tlas_chain(80)
    res = traverse.closest_hit(*args, t_max=1e6, max_steps=3)
    assert int(res.exhausted) == 1
    res2 = traverse.closest_hit(*args, t_max=1e6, max_steps=4096)
    assert int(res2.overflow) > 0


def test_pack_blas_rows_rejects_fat_leaves():
    import pytest

    bad_count = jnp.asarray(np.array([0, traverse.MAX_LEAF + 1], np.int32))
    with pytest.raises(ValueError, match="MAX_LEAF"):
        traverse.pack_blas_rows(
            jnp.zeros((2, 3)), jnp.zeros((2, 3)),
            jnp.zeros(2, jnp.int32), bad_count,
        )


def test_occluded_chunked_matches_unchunked():
    """chunk_size processing is a pure scheduling change: identical hits,
    summed counters."""
    import voidin_tpu as vt
    from voidin_tpu.core import mathx
    from voidin_tpu.rt import traverse as trav

    w = vt.World()
    knot = w.meshes.add(vt.mesh.make_torus_knot(segments=48, sides=8))
    for i in range(4):
        t = mathx.from_translation([2.0 * i - 3.0, 0, -6.0])
        w.instances.add(np.asarray(t), knot, 0)
    scene = w.device(with_tlas=True)
    tlas, blas, inst, tri_pos = trav.scene_rays(scene)

    rng = np.random.default_rng(3)
    R = 1000
    origins = rng.uniform(-4, 4, (R, 3)).astype(np.float32)
    origins[:, 2] = 2.0
    dirs = np.tile([0, 0, -1.0], (R, 1)).astype(np.float32) * rng.uniform(
        4, 12, (R, 1)
    ).astype(np.float32)
    active = rng.random(R) < 0.9

    a = trav.occluded(tlas, blas, inst, tri_pos, jnp.asarray(origins),
                      jnp.asarray(dirs), t_max=1.0, active=jnp.asarray(active))
    b = trav.occluded(tlas, blas, inst, tri_pos, jnp.asarray(origins),
                      jnp.asarray(dirs), t_max=1.0, active=jnp.asarray(active),
                      chunk_size=256)  # 1000 -> 4 chunks with padding
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    assert int(a.overflow) == int(b.overflow)
    assert int(a.exhausted) == int(b.exhausted)
    assert bool(np.asarray(a.hit).any())


def test_half_res_shadow_rays_close_to_full_res():
    """shadow_scale=2 (documented deviation for config-5 feasibility):
    occlusion is traced per 2x2 block and broadcast — the image must agree
    with full-res away from shadow edges (>=90% identical pixels) and
    differ only by the 0.5-occlusion step where it differs at all."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    import voidin_tpu as vt
    from tests.test_golden import CFG, _deferred_scene
    from voidin_tpu.framework.renderer import Renderer

    w = _deferred_scene()
    cam = vt.Camera(position=[0, 2, 0], pitch=-18.0,
                    aspect=CFG.width / CFG.height)
    # post off for the anchor-exactness clause: the sharpen stencil mixes
    # each pixel with its +x/+y neighbors, so shadow-edge differences
    # bleed into anchor pixels after postprocess (this surfaced when the
    # round-4 capacity fix restored the shadow-catching floor plane)
    img1 = np.asarray(Renderer(
        w.device(with_tlas=True), CFG, enable_taa=False,
        enable_rt_shadows=True, enable_post=False,
    ).render(cam))
    img2 = np.asarray(Renderer(
        w.device(with_tlas=True), CFG, enable_taa=False,
        enable_rt_shadows=True, rt_shadow_scale=2, enable_post=False,
    ).render(cam))
    same = (img1 == img2).all(axis=-1)
    assert same.mean() > 0.90, same.mean()
    # the top-left sample of every 2x2 block is exact by construction
    assert (img1[::2, ::2] == img2[::2, ::2]).all(axis=-1).mean() > 0.999


def test_occluded_packets_bit_identical():
    """Packet traversal (shared per-packet stack, per-lane leaf gating)
    must reproduce occluded() exactly — coherent AND incoherent rays,
    partial-packet padding, inactive lanes, chunked packet groups."""
    import voidin_tpu as vt
    from voidin_tpu.core import mathx
    from voidin_tpu.rt import traverse as trav

    w = vt.World()
    knot = w.meshes.add(vt.mesh.make_torus_knot(segments=48, sides=8))
    rng = np.random.default_rng(5)
    for i in range(5):
        t = mathx.from_translation(
            [2.0 * i - 4.0, float(rng.uniform(-1, 1)), -6.0]
        ) @ mathx.from_rotation_y(np.float32(rng.uniform(0, 6)))
        w.instances.add(np.asarray(t), knot, 0)
    scene = w.device(with_tlas=True)
    tlas, blas, inst, tri_pos = trav.scene_rays(scene)

    R = 1000  # not a multiple of the packet size (pad lanes exercised)
    # coherent block: screen-like grid of origins, one light target
    og = np.stack(
        np.meshgrid(
            np.linspace(-5, 5, 25), np.linspace(-2, 2, 20), indexing="ij"
        ),
        -1,
    ).reshape(-1, 2)
    coherent_o = np.concatenate(
        [og, np.full((500, 1), 2.0)], axis=1
    ).astype(np.float32)
    coherent_d = (np.array([0.0, 3.0, -9.0]) - coherent_o).astype(np.float32)
    # incoherent tail: random rays (worst case for packets)
    rand_o = rng.uniform(-5, 5, (500, 3)).astype(np.float32)
    rand_d = rng.uniform(-6, 6, (500, 3)).astype(np.float32)
    origins = np.concatenate([coherent_o, rand_o])
    dirs = np.concatenate([coherent_d, rand_d])
    active = rng.random(R) < 0.9

    base = trav.occluded(
        tlas, blas, inst, tri_pos, jnp.asarray(origins), jnp.asarray(dirs),
        t_max=1.0, active=jnp.asarray(active), max_steps=4096,
    )
    assert int(base.overflow) == 0 and int(base.exhausted) == 0
    assert bool(np.asarray(base.hit).any())
    for kwargs in (
        dict(packet=128),
        dict(packet=64),
        dict(packet=128, chunk_packets=4),
    ):
        pk = trav.occluded_packets(
            tlas, blas, inst, tri_pos, jnp.asarray(origins),
            jnp.asarray(dirs), t_max=1.0, active=jnp.asarray(active),
            max_steps=4096, **kwargs,
        )
        np.testing.assert_array_equal(
            np.asarray(base.hit), np.asarray(pk.hit), err_msg=str(kwargs)
        )
        assert int(pk.overflow) == 0 and int(pk.exhausted) == 0


def test_shade_raytraced_packet_bit_identical():
    """Through the full frame with enable_rt_shadows: RasterConfig.
    rt_packet (config-5's default) must not change a single pixel."""
    import dataclasses

    import voidin_tpu as vt
    from voidin_tpu.core import mathx
    from voidin_tpu.framework.renderer import (
        FrameState, Globals, render_frame,
    )
    from voidin_tpu.passes import raster

    w = vt.World()
    knot = w.meshes.add(vt.mesh.make_torus_knot(segments=32, sides=6))
    w.instances.add(
        np.asarray(mathx.from_translation([0, 0.8, -5.0])), knot, 1
    )
    w.instances.add(
        np.asarray(
            mathx.from_translation([0, -1.0, -5.0]) @ mathx.from_scale(12.0)
        ),
        vt.mesh.HORIZONTAL_PLANE_MESH,
        1,
    )
    w.lights.add_point_light([2.5, 4.0, -2.0], 25.0, [1, 1, 1])
    scene = w.device(with_tlas=True)
    cfg = raster.RasterConfig(
        width=128, height=64, tri_capacity=1 << 13, pair_capacity=1 << 14,
        tile_tri_capacity=64, interpret=True,
    )
    cam = vt.Camera(
        position=[0.0, 1.0, 0.5], pitch=-15.0, aspect=cfg.width / cfg.height
    ).uniform()
    g = Globals.make(cfg.width, cfg.height)
    state = FrameState.initial(cfg.width, cfg.height)
    mov = jnp.zeros(0, jnp.int32)

    def frame(c):
        img, _st, _sc, aux = render_frame(
            scene, cam, g, state, mov, c,
            enable_taa=False, enable_rt_shadows=True,
        )
        return np.asarray(img)

    base = frame(cfg)
    pk = frame(dataclasses.replace(cfg, rt_packet=64))
    np.testing.assert_array_equal(base, pk)
    # threaded (stackless) traversal over 8x16 screen blocks — config-5's
    # production setting — must also not change a pixel
    th = frame(dataclasses.replace(cfg, rt_packet=128, rt_threaded=True))
    np.testing.assert_array_equal(base, th)
    # the scene must be non-trivially lit/shadowed for this to mean much
    # (0-1 sRGB floats: the knot-over-plane frame measures ~0.14)
    assert base.std() > 0.05
