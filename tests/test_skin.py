"""Vertex skinning + glTF animation sampling.

The reference renderer cannot do any of this (its importer drops skins,
compute_update only rotates instance transforms) — these tests cover the
beyond-parity skinning path end to end: packing equivalence with the pool
tables, LBS math, glTF skin/animation parsing on a synthetic document, and
a full Renderer frame driven by joint matrices.
"""

import numpy as np
import pytest

import voidin_tpu as vt
from voidin_tpu.core import mathx
from voidin_tpu.scene import skin as skin_mod
from voidin_tpu.scene.mesh import Mesh


def _strip_mesh():
    """Vertical 2-quad strip along +y: y=0 row bound to joint 0, y=2 row
    to joint 1, the middle row blended 50/50."""
    verts, tris = [], []
    for row, y in enumerate((0.0, 1.0, 2.0)):
        verts += [[-0.5, y, 0.0], [0.5, y, 0.0]]
    for row in range(2):
        a = 2 * row
        tris += [[a, a + 1, a + 2], [a + 1, a + 3, a + 2]]
    verts = np.array(verts, np.float32)
    n = np.tile(np.array([[0, 0, 1]], np.float32), (6, 1))
    t = np.tile(np.array([[1, 0, 0, 1]], np.float32), (6, 1))
    uv = verts[:, :2].copy()
    idx = np.array(tris, np.int32).reshape(-1)
    joints = np.zeros((6, 4), np.int32)
    weights = np.zeros((6, 4), np.float32)
    weights[:, 0] = 1.0
    joints[2:4, 1] = 1
    weights[2:4] = [0.5, 0.5, 0, 0]
    joints[4:6, 0] = 1
    return Mesh(verts, n, t, uv, idx), joints, weights


def _skinned_world():
    w = vt.World(build_bvh=False)
    mesh, jv, wv = _strip_mesh()
    mid = w.meshes.add(mesh)
    info = w.meshes.mesh_info[mid]
    off = w.allocate_joints(2)
    w.skins.append(
        skin_mod.build_skin_data(
            mesh, w.meshes.indices[mid], jv, wv,
            base_tri=info["base_index"] // 3, mesh_id=mid,
            joint_offset=off, n_joints=2,
            nodes=w.meshes.bvh_nodes[mid], bvh_base=info["bvh_index"],
        )
    )
    w.instances.add(np.eye(4, dtype=np.float32), mid, 0)
    w.lights.add_point_light([0, 1, 4], 20.0, [1, 1, 1])
    return w, mid


def test_identity_skin_reproduces_pool_tables():
    """apply_skin with identity joints must reproduce the pool's own
    de-indexed tables bit-for-bit (packing paths are twins)."""
    import jax.numpy as jnp

    w, mid = _skinned_world()
    scene = w.device()
    jm = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (2, 1, 1)))
    meshes2 = skin_mod.apply_skins(scene.meshes, scene.skins, jm)
    np.testing.assert_array_equal(
        np.asarray(meshes2.tri_pos), np.asarray(scene.meshes.tri_pos)
    )
    np.testing.assert_array_equal(
        np.asarray(meshes2.tri_attr_packed),
        np.asarray(scene.meshes.tri_attr_packed),
    )


def test_two_joint_bend():
    """Rotating joint 1 by 90deg about z moves its bound row as
    T(0,1,0) R J T(0,-1,0) x; the blended row moves halfway."""
    import jax.numpy as jnp

    w, mid = _skinned_world()
    scene = w.device()
    base = w.meshes.mesh_info[mid]["base_index"] // 3
    rot = np.asarray(
        mathx.from_translation([0, 1, 0])
        @ mathx.from_rotation_z(np.float32(np.pi / 2))
        @ mathx.from_translation([0, -1, 0])
    )
    jm = jnp.asarray(np.stack([np.eye(4, dtype=np.float32), rot]))
    meshes2 = skin_mod.apply_skins(scene.meshes, scene.skins, jm)
    pos = np.asarray(meshes2.tri_pos).reshape(-1, 3, 3)
    sd = scene.skins[0]
    tris = pos[base : base + sd.rest_pos.shape[0]]
    rest = np.asarray(sd.rest_pos)
    jts = np.asarray(sd.joints)
    wts = np.asarray(sd.weights)
    # fully joint-1 corners: (0.5, 2, 0) -> rotate about (0,1,0): (-1, 1.5, 0)
    m1 = (jts[..., 0] == 1) & (wts[..., 0] == 1.0)
    src = rest[m1]
    got = tris[m1]
    want = (rot[:3, :3] @ src.T).T + rot[:3, 3]
    np.testing.assert_allclose(got, want, atol=1e-5)
    # blended corners: halfway between rest and rotated
    mb = np.isclose(wts[..., 0], 0.5) & np.isclose(wts[..., 1], 0.5)
    src = rest[mb]
    rotated = (rot[:3, :3] @ src.T).T + rot[:3, 3]
    np.testing.assert_allclose(tris[mb], 0.5 * src + 0.5 * rotated, atol=1e-5)


def _synthetic_gltf():
    """Minimal in-memory glTF: 2-joint skeleton, rotation animation on
    joint 1 (0 -> 90deg about z over 1 s), inverse binds."""
    from voidin_tpu.io.gltf import GltfDocument

    ibm = np.stack([
        np.eye(4, dtype=np.float32),
        np.array(mathx.from_translation([0, -1, 0]), np.float32),
    ])
    # glTF matrices are column-major
    ibm_bytes = np.ascontiguousarray(
        np.transpose(ibm, (0, 2, 1))
    ).tobytes()
    times = np.array([0.0, 1.0], np.float32)
    s = np.sin(np.pi / 4)
    quats = np.array([[0, 0, 0, 1], [0, 0, s, np.cos(np.pi / 4)]], np.float32)
    buf = ibm_bytes + times.tobytes() + quats.tobytes()
    doc = {
        "scenes": [{"nodes": [0, 2]}],
        "scene": 0,
        "nodes": [
            {"children": [1]},                       # joint 0 (root)
            {"translation": [0, 1, 0]},              # joint 1
            {"mesh": 0, "skin": 0},                  # skinned mesh node
        ],
        "meshes": [{"primitives": [{"attributes": {}}]}],
        "skins": [{"joints": [0, 1], "inverseBindMatrices": 0}],
        "animations": [{
            "channels": [
                {"sampler": 0, "target": {"node": 1, "path": "rotation"}}
            ],
            "samplers": [{"input": 1, "output": 2,
                          "interpolation": "LINEAR"}],
        }],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 2,
             "type": "MAT4"},
            {"bufferView": 1, "componentType": 5126, "count": 2,
             "type": "SCALAR"},
            {"bufferView": 2, "componentType": 5126, "count": 2,
             "type": "VEC4"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 128},
            {"buffer": 0, "byteOffset": 128, "byteLength": 8},
            {"buffer": 0, "byteOffset": 136, "byteLength": 32},
        ],
        "buffers": [{"byteLength": len(buf)}],
    }
    return GltfDocument(doc=doc, mesh_ids={}, material_ids=[],
                        skinned={}, buffers=[buf])


def test_gltf_animator_joint_matrices():
    from voidin_tpu.io.gltf import GltfAnimator

    gdoc = _synthetic_gltf()
    an = GltfAnimator(gdoc)
    assert an.duration == 1.0
    # t=0: bind pose -> both joint mats are identity
    jm0 = an.joint_matrices(0, 0.0)
    np.testing.assert_allclose(jm0[0], np.eye(4), atol=1e-6)
    np.testing.assert_allclose(jm0[1], np.eye(4), atol=1e-6)
    # t=1: joint 1 rotated 90deg about z around its own origin (0,1,0)
    jm1 = an.joint_matrices(0, 1.0, loop=False)
    want = np.asarray(
        mathx.from_translation([0, 1, 0])
        @ mathx.from_rotation_z(np.float32(np.pi / 2))
        @ mathx.from_translation([0, -1, 0])
    )
    np.testing.assert_allclose(jm1[1], want, atol=1e-5)
    # a point at the joint-1 origin stays put
    p = jm1[1] @ np.array([0, 1, 0, 1], np.float32)
    np.testing.assert_allclose(p[:3], [0, 1, 0], atol=1e-5)


def test_skinned_render_end_to_end():
    """Full Renderer frame with joint matrices: bind pose == static pose;
    a bent pose changes the image; missing joint_mats raises."""
    from voidin_tpu.framework.renderer import Renderer
    from voidin_tpu.passes.raster import RasterConfig

    w, mid = _skinned_world()
    cfg = RasterConfig(width=96, height=64, tri_capacity=1 << 10,
                       pair_capacity=1 << 12, tile_tri_capacity=64,
                       interpret=True)
    cam = vt.Camera(position=[0, 1, 3.0], yaw=0.0, aspect=96 / 64)
    scene = w.device()
    r = Renderer(scene, cfg, enable_taa=False)
    with pytest.raises(ValueError):
        r.render(cam)
    eye = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    img0 = np.asarray(r.render(cam, joint_mats=eye))
    assert np.isfinite(img0).all() and img0.var() > 0
    rot = np.stack([
        np.eye(4, dtype=np.float32),
        np.asarray(
            mathx.from_translation([0, 1, 0])
            @ mathx.from_rotation_z(np.float32(1.0))
            @ mathx.from_translation([0, -1, 0])
        ),
    ])
    img1 = np.asarray(r.render(cam, joint_mats=rot))
    assert np.abs(img1 - img0).max() > 0.05


def test_skinned_node_transform_ignored():
    """glTF 2.0: the skinned mesh node's (and its ancestors') transform MUST
    be ignored — joint matrices alone place the mesh, so the instance
    transform for a skinned primitive is root only. Guards the round-2
    advisor finding (double transform under a translated parent)."""
    from voidin_tpu.io.gltf import GltfDocument

    doc = {
        "scenes": [{"nodes": [0, 3]}],
        "scene": 0,
        "nodes": [
            {"translation": [5, 0, 0], "children": [1]},  # translated parent
            {"mesh": 0, "skin": 0, "translation": [0, 2, 0]},  # skinned
            {},                                            # joint
            {"mesh": 1, "translation": [1, 0, 0]},         # plain mesh node
        ],
        "meshes": [{"primitives": [{"attributes": {}}]},
                   {"primitives": [{"attributes": {}}]}],
        "skins": [{"joints": [2]}],
    }
    jv = np.zeros((3, 4), np.int32)
    wv = np.zeros((3, 4), np.float32)
    wv[:, 0] = 1.0
    gdoc = GltfDocument(
        doc=doc, mesh_ids={(0, 0): 10, (1, 0): 11}, material_ids=[],
        skinned={(0, 0): (jv, wv)}, buffers=[],
    )
    root = np.asarray(mathx.from_translation([0, 0, -3]), np.float32)
    inst = {mesh_id: m for m, mesh_id, _ in gdoc.scene_instances(root)}
    # skinned primitive: root ONLY (hierarchy ignored per spec)
    np.testing.assert_allclose(inst[10], root, atol=1e-6)
    # plain node: full hierarchy transform
    want = root @ np.asarray(mathx.from_translation([1, 0, 0]), np.float32)
    np.testing.assert_allclose(inst[11], want, atol=1e-6)


def test_config4_preset_clapper_renders():
    """The config-4 preset's skinned clapping arms render through the full
    pipeline, and the clap animation actually moves them."""
    from voidin_tpu.framework.presets import PRESETS, clapper_joint_mats
    from voidin_tpu.framework.renderer import Renderer
    from voidin_tpu.passes.raster import RasterConfig

    p = PRESETS[4](160 / 96)
    assert p.animator is not None and len(p.world.skins) == 2
    cfg = RasterConfig(width=160, height=96, tri_capacity=1 << 13,
                       pair_capacity=1 << 14, tile_tri_capacity=128,
                       interpret=True)
    r = Renderer(p.world.device(), cfg, enable_taa=False,
                 moving_ids=np.asarray(p.moving_ids, np.int32))
    img0 = np.asarray(r.render(p.camera, joint_mats=clapper_joint_mats(0.0)))
    img1 = np.asarray(
        r.render(p.camera, joint_mats=clapper_joint_mats(0.7))
    )
    assert np.isfinite(img0).all() and np.isfinite(img1).all()
    assert np.abs(img1 - img0).max() > 0.02  # arms moved


def test_blas_refit_tracks_pose():
    """In-jit BLAS refit: after bending, every node AABB must contain its
    triangles/children (validity) and the root must equal the skinned
    geometry's bounds (tightness at the top)."""
    import jax.numpy as jnp

    w = vt.World()  # build_bvh=True: real SAH tree to refit
    mesh, jv, wv = _strip_mesh()
    mid = w.meshes.add(mesh)
    info = w.meshes.mesh_info[mid]
    off = w.allocate_joints(2)
    w.skins.append(
        skin_mod.build_skin_data(
            mesh, w.meshes.indices[mid], jv, wv,
            base_tri=info["base_index"] // 3, mesh_id=mid,
            joint_offset=off, n_joints=2,
            nodes=w.meshes.bvh_nodes[mid], bvh_base=info["bvh_index"],
        )
    )
    w.instances.add(np.eye(4, dtype=np.float32), mid, 0)
    scene = w.device()
    sd = scene.skins[0]
    assert sd.refit_order is not None

    rot = np.asarray(
        mathx.from_translation([0, 1, 0])
        @ mathx.from_rotation_z(np.float32(1.2))
        @ mathx.from_translation([0, -1, 0])
    )
    jm = jnp.asarray(np.stack([np.eye(4, dtype=np.float32), rot]))
    meshes2 = skin_mod.apply_skins(scene.meshes, scene.skins, jm)

    base = sd.bvh_base
    n_nodes = len(w.meshes.bvh_nodes[mid])
    bmin = np.asarray(meshes2.bvh_min)[base:base + n_nodes]
    bmax = np.asarray(meshes2.bvh_max)[base:base + n_nodes]
    nodes = w.meshes.bvh_nodes[mid]
    pos = np.asarray(meshes2.tri_pos).reshape(-1, 3, 3)[
        sd.base_tri:sd.base_tri + sd.rest_pos.shape[0]
    ]
    # only nodes reachable from the root carry refit AABBs (slot 1 is
    # deliberately empty in the reference layout)
    reach = {0}
    stack = [0]
    while stack:
        n = stack.pop()
        if nodes["count"][n] == 0:
            for c in (int(nodes["left_first"][n]),
                      int(nodes["left_first"][n]) + 1):
                reach.add(c)
                stack.append(c)
    eps = 1e-5
    for n in range(n_nodes):
        if n not in reach:
            continue
        if nodes["count"][n] > 0:
            lo = int(nodes["left_first"][n])
            tris = pos[lo:lo + int(nodes["count"][n])]
            assert (bmin[n] <= tris.reshape(-1, 3).min(0) + eps).all()
            assert (bmax[n] >= tris.reshape(-1, 3).max(0) - eps).all()
        else:
            l = int(nodes["left_first"][n])
            assert (bmin[n] <= bmin[l] + eps).all() and (
                bmin[n] <= bmin[l + 1] + eps).all()
            assert (bmax[n] >= bmax[l] - eps).all() and (
                bmax[n] >= bmax[l + 1] - eps).all()
    # root is tight around the skinned geometry
    np.testing.assert_allclose(bmin[0], pos.reshape(-1, 3).min(0), atol=1e-4)
    np.testing.assert_allclose(bmax[0], pos.reshape(-1, 3).max(0), atol=1e-4)


def test_skinned_traced_shadow_tracks_pose():
    """End-to-end: rays toward the light are occluded by the arm's CURRENT
    pose, not its rest pose (round-2 VERDICT item 8). The arm starts
    vertical at x=0 and bends its top toward +x; a probe under the bent
    tip must become occluded, a probe under the rest-pose tip must clear."""
    import jax.numpy as jnp

    from voidin_tpu.rt import traverse as trav
    from voidin_tpu.scene.skin import apply_skins, refit_tlas

    w = vt.World()
    mesh, jv, wv = _strip_mesh()
    mid = w.meshes.add(mesh)
    info = w.meshes.mesh_info[mid]
    off = w.allocate_joints(2)
    w.skins.append(
        skin_mod.build_skin_data(
            mesh, w.meshes.indices[mid], jv, wv,
            base_tri=info["base_index"] // 3, mesh_id=mid,
            joint_offset=off, n_joints=2,
            nodes=w.meshes.bvh_nodes[mid], bvh_base=info["bvh_index"],
        )
    )
    w.instances.add(np.eye(4, dtype=np.float32), mid, 0)
    scene = w.device(with_tlas=True)

    # bend 90deg: the strip's y in [1, 2] folds to x in [0, 1] at y ~ 1
    rot = np.asarray(
        mathx.from_translation([0, 1, 0])
        @ mathx.from_rotation_z(np.float32(-np.pi / 2))
        @ mathx.from_translation([0, -1, 0])
    )
    jm = jnp.asarray(np.stack([np.eye(4, dtype=np.float32), rot]))
    meshes2 = apply_skins(scene.meshes, scene.skins, jm)
    scene2 = scene.replace(
        meshes=meshes2,
        tlas=refit_tlas(scene.tlas, meshes2, scene.instances),
    )

    def occluded_at(s, x):
        tlas, blas, inst, tri_pos = trav.scene_rays(s)
        # approach from +z (the strip faces +z; triangle intersection is
        # backface-culled, matching utils/intersections.wgsl)
        o = jnp.asarray([[x, 0.97, 1.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, -2.0]], jnp.float32)
        return bool(np.asarray(trav.occluded(
            tlas, blas, inst, tri_pos, o, d, t_max=1.0
        ).hit)[0])

    # rest pose: strip occupies x in [-0.5, 0.5] up to y=2
    assert occluded_at(scene, 0.0)
    assert not occluded_at(scene, 0.9)
    # bent pose: the upper half now lies along +x near y ~ 1
    assert occluded_at(scene2, 0.9), "bent arm must occlude under its tip"
