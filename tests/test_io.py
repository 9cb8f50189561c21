import os

import numpy as np
import pytest

import voidin_tpu as vt
from voidin_tpu.io.gltf import GltfDocument
from voidin_tpu.io.obj import import_obj

_HELMET = (
    "/root/reference/assets/glTF-Sample-Models/2.0/DamagedHelmet/glTF-Binary/"
    "DamagedHelmet.glb"
)
_SPONZA = "/root/reference/assets/glTF-Sample-Models/2.0/Sponza/glTF/Sponza.gltf"
_CUBE = "/root/reference/assets/cube/cube.obj"


@pytest.mark.skipif(not os.path.exists(_HELMET), reason="assets not mounted")
def test_gltf_glb_import():
    w = vt.World()
    doc = GltfDocument.import_file(w, _HELMET)
    assert len(doc.mesh_ids) == 1
    assert len(doc.material_ids) == 1
    ids = doc.add_to_world(w)
    assert len(ids) == 1
    # alpha cutoff default replaces base_color.w (reference mod.rs:55-56)
    assert w.materials.base_color[-1][3] == 0.5
    # helmet textures: albedo, mr, emissive, normal (occlusion unused)
    assert len(w.textures) == 4 + 4  # 4 reserved + 4 maps
    h = w.meshes.host_arrays()
    # helmet has ~15k tris; AABB should be roughly unit-scale
    assert h["index_count"][-1] > 10000
    assert np.all(np.isfinite(h["positions"]))


_SPONZA_BIN = os.path.join(os.path.dirname(_SPONZA), "Sponza.bin")


@pytest.mark.skipif(
    not os.path.exists(_SPONZA_BIN), reason="Sponza.bin not in the mount"
)
def test_gltf_sponza_import():
    w = vt.World()
    doc = GltfDocument.import_file(w, _SPONZA)
    inst = doc.scene_instances()
    assert len(inst) > 20  # sponza has many primitives
    total_tris = sum(
        w.meshes.mesh_info[m]["index_count"] // 3 for _, m, _ in inst
    )
    assert total_tris > 100_000
    assert len(w.textures) > 20


@pytest.mark.skipif(not os.path.exists(_CUBE), reason="assets not mounted")
def test_obj_import():
    w = vt.World()
    groups = import_obj(w, _CUBE)
    assert len(groups) == 1
    mesh_id, mat_id = groups[0]
    info = w.meshes.mesh_info[mesh_id]
    # the reference cube.obj is a beveled cube (218 polygon faces)
    assert info["index_count"] >= 36 and info["index_count"] % 3 == 0
    np.testing.assert_allclose(info["min"], [-1, -1, -1], atol=1e-5)
    np.testing.assert_allclose(info["max"], [1, 1, 1], atol=1e-5)


def test_obj_negative_indices(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    w = vt.World()
    groups = import_obj(w, str(p))
    info = w.meshes.mesh_info[groups[0][0]]
    assert info["index_count"] == 3


def test_scene_snapshot_roundtrip(tmp_path):
    import jax
    import numpy as np

    from voidin_tpu.core import mathx
    from voidin_tpu.io.snapshot import load_scene, save_scene

    w = vt.World()
    w.lights.add_point_light([0, 1, 0], 5.0, [1, 1, 1])
    w.instances.add(np.asarray(mathx.from_translation([0, 0, -4])),
                    vt.mesh.SPHERE_1_MESH, 0)
    scene = w.device(with_tlas=True)
    cam = vt.Camera(position=[1, 2, 3], yaw=10.0, pitch=-5.0, aspect=1.5)
    p = tmp_path / "scene.npz"
    save_scene(str(p), scene, cam)
    scene2, cam2 = load_scene(str(p))
    for a, b in zip(jax.tree_util.tree_leaves(scene),
                    jax.tree_util.tree_leaves(scene2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert cam2.aspect == 1.5 and cam2.yaw == 10.0
    np.testing.assert_allclose(cam2.position, [1, 2, 3])
    # static (non-leaf) fields must survive too
    assert scene2.tlas.refit_levels == scene.tlas.refit_levels
    assert scene2.meshes.has_lods == scene.meshes.has_lods


def test_scene_snapshot_version_mismatch(tmp_path):
    """A snapshot from a different format version must fail LOUDLY: the flat
    leaf stream misaligns when pytree fields change, so silent loading would
    corrupt the scene (round-3 review finding)."""
    import pytest

    from voidin_tpu.core import mathx
    from voidin_tpu.io.snapshot import load_scene, save_scene

    w = vt.World()
    w.instances.add(np.asarray(mathx.from_translation([0, 0, -4])),
                    vt.mesh.SPHERE_1_MESH, 0)
    p = tmp_path / "scene.npz"
    save_scene(str(p), w.device())
    data = dict(np.load(str(p), allow_pickle=False))
    data["aux_version"] = np.asarray([1], np.int64)
    np.savez_compressed(str(p), **data)
    with pytest.raises(ValueError, match="format v1"):
        load_scene(str(p))
    # and a file with no version marker at all (pre-v2) also refuses
    data.pop("aux_version")
    np.savez_compressed(str(p), **data)
    with pytest.raises(ValueError, match="format v1"):
        load_scene(str(p))


def test_native_texture_packer_matches_numpy():
    """C++ texel-quad packer vs the numpy oracle: exact at fine mip levels,
    within a few u8 steps at the deepest mips (float accumulation order)."""
    import os

    import voidin_tpu.native as nat

    if nat.load() is None:
        import pytest

        pytest.skip("no native toolchain")
    import voidin_tpu as vt

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (48, 80, 4)).astype(np.uint8)

    os.environ["VOIDIN_NATIVE"] = "0"
    try:
        w0 = vt.World(texture_base_size=128)
        w0.textures.add(img)
        tp0 = w0.textures.device()
    finally:
        os.environ["VOIDIN_NATIVE"] = "1"
    w1 = vt.World(texture_base_size=128)
    w1.textures.add(img)
    tp1 = w1.textures.device()
    a = np.asarray(tp0.quads).astype(np.int32)
    b = np.asarray(tp1.quads).astype(np.int32)
    assert np.abs(a - b).max() <= 3
    # fine levels (0-3) must be exact
    fine_end = tp0.level_offset[4] * len(w0.textures.images)
    T = len(w0.textures.images)
    total = tp0.total
    av = a.reshape(T, total, 32)
    bv = b.reshape(T, total, 32)
    np.testing.assert_array_equal(
        av[:, : tp0.level_offset[4]], bv[:, : tp0.level_offset[4]]
    )
