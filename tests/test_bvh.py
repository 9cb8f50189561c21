import numpy as np
import pytest

from voidin_tpu.rt import bvh
from voidin_tpu.scene import mesh as mesh_mod


def _sphere(res=4):
    m = mesh_mod.make_uv_sphere(1.0, res)
    return m.vertices, m.indices


def _random_tris(n, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-10, 10, size=(n, 1, 3))
    offsets = rng.normal(scale=0.5, size=(n, 3, 3))
    verts = (centers + offsets).reshape(-1, 3).astype(np.float32)
    indices = np.arange(n * 3, dtype=np.int32)
    return verts, indices


def _check_invariants(nodes, verts, perm, n_tris):
    tri = perm.reshape(-1, 3)
    assert tri.shape[0] == n_tris
    # The permuted indices are a permutation of the original triangle set.
    covered = np.zeros(n_tris, bool)
    stack = [0]
    while stack:
        ni = stack.pop()
        node = nodes[ni]
        if node["count"] > 0:
            lo, hi = int(node["left_first"]), int(node["left_first"] + node["count"])
            assert not covered[lo:hi].any(), "leaf ranges overlap"
            covered[lo:hi] = True
            # AABB contains its triangles
            tv = verts[tri[lo:hi].reshape(-1)]
            assert (tv >= node["min"] - 1e-4).all()
            assert (tv <= node["max"] + 1e-4).all()
        else:
            li = int(node["left_first"])
            stack += [li, li + 1]
            # children contained in parent
            for c in (li, li + 1):
                assert (nodes[c]["min"] >= node["min"] - 1e-4).all()
                assert (nodes[c]["max"] <= node["max"] + 1e-4).all()
    assert covered.all(), "every triangle must be in exactly one leaf"


@pytest.mark.parametrize("gen", ["sphere", "random"])
def test_blas_invariants(gen):
    verts, indices = _sphere(3) if gen == "sphere" else _random_tris(257)
    nodes, perm = bvh.build_blas(verts, indices)
    _check_invariants(nodes, verts, perm, indices.size // 3)
    # permutation preserves the multiset of triangles
    orig = np.sort(indices.reshape(-1, 3), axis=0)
    new = np.sort(perm.reshape(-1, 3), axis=0)
    np.testing.assert_array_equal(np.sort(orig.ravel()), np.sort(new.ravel()))


def test_blas_leaf_size():
    verts, indices = _random_tris(100)
    nodes, _ = bvh.build_blas(verts, indices)
    leaf_counts = nodes["count"][nodes["count"] > 0]
    assert leaf_counts.max() <= bvh.LEAF_SIZE


def test_blas_traversal_matches_brute_force():
    verts, indices = _random_tris(64, seed=3)
    nodes, perm = bvh.build_blas(verts, indices)
    rng = np.random.default_rng(7)
    misses = 0
    for _ in range(64):
        origin = rng.uniform(-15, 15, 3).astype(np.float32)
        direction = rng.normal(size=3).astype(np.float32)
        t_bvh = bvh.traverse_blas_oracle(nodes, verts, perm, origin, direction)
        t_ref = bvh.brute_force_closest(verts, perm, origin, direction)
        assert np.isclose(t_bvh, t_ref, rtol=1e-5), (t_bvh, t_ref)
        if t_ref >= bvh.MAX_DIST:
            misses += 1
    assert misses < 64  # sanity: some rays actually hit


def test_blas_degenerate_identical_centroids():
    # 10 coincident triangles: SAH has no valid split; must still terminate.
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    verts = np.tile(v, (10, 1))
    indices = np.arange(30, dtype=np.int32)
    nodes, perm = bvh.build_blas(verts, indices)
    _check_invariants(nodes, verts, perm, 10)


def test_tlas_structure():
    rng = np.random.default_rng(0)
    n = 50
    mins = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    maxs = mins + rng.uniform(0.1, 2.0, (n, 3)).astype(np.float32)
    nodes = bvh.build_tlas(mins, maxs)
    # every instance appears in exactly one leaf; AABBs contain children
    seen = np.zeros(n, int)
    stack = [0]
    while stack:
        ni = stack.pop()
        node = nodes[ni]
        if node["left_right"] == 0:
            seen[int(node["instance_idx"])] += 1
            np.testing.assert_allclose(node["min"], mins[node["instance_idx"]])
            np.testing.assert_allclose(node["max"], maxs[node["instance_idx"]])
        else:
            li = int(node["left_right"] & 0xFFFF)
            ri = int(node["left_right"] >> 16)
            assert li != 0 and ri != 0
            for c in (li, ri):
                assert (nodes[c]["min"] >= node["min"] - 1e-5).all()
                assert (nodes[c]["max"] <= node["max"] + 1e-5).all()
            stack += [li, ri]
    assert (seen == 1).all()


def test_instance_world_aabbs():
    mesh_min = np.array([[-1, -1, -1]], np.float32)
    mesh_max = np.array([[1, 1, 1]], np.float32)
    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = [5, 0, 0]
    t[0, 0] = 2.0
    mn, mx = bvh.instance_world_aabbs(
        mesh_min, mesh_max, t[None], np.array([0], np.int32)
    )
    np.testing.assert_allclose(mn[0], [3, -1, -1], atol=1e-6)
    np.testing.assert_allclose(mx[0], [7, 1, 1], atol=1e-6)


def test_native_blas_matches_numpy_semantics():
    """C++ builder: same invariants + identical closest hits vs brute force."""
    from voidin_tpu import native as native_mod

    if native_mod.load() is None:
        pytest.skip("native builder unavailable")
    verts, indices = _random_tris(200, seed=5)
    out = native_mod.build_blas_native(verts, indices)
    assert out is not None
    nodes, perm = out
    _check_invariants(nodes, verts, perm, 200)
    rng = np.random.default_rng(9)
    for _ in range(32):
        origin = rng.uniform(-15, 15, 3).astype(np.float32)
        direction = rng.normal(size=3).astype(np.float32)
        t_bvh = bvh.traverse_blas_oracle(nodes, verts, perm, origin, direction)
        t_ref = bvh.brute_force_closest(verts, perm, origin, direction)
        assert np.isclose(t_bvh, t_ref, rtol=1e-5)


def test_native_tlas_matches_invariants():
    from voidin_tpu import native as native_mod

    if native_mod.load() is None:
        pytest.skip("native builder unavailable")
    rng = np.random.default_rng(2)
    n = 300
    mins = rng.uniform(-50, 50, (n, 3)).astype(np.float32)
    maxs = mins + rng.uniform(0.1, 3.0, (n, 3)).astype(np.float32)
    nodes = native_mod.build_tlas_native(mins, maxs)
    seen = np.zeros(n, int)
    stack = [0]
    while stack:
        ni = stack.pop()
        node = nodes[ni]
        if node["left_right"] == 0:
            seen[int(node["instance_idx"])] += 1
        else:
            li = int(node["left_right"] & 0xFFFF)
            ri = int(node["left_right"] >> 16)
            for c in (li, ri):
                assert (nodes[c]["min"] >= node["min"] - 1e-4).all()
                assert (nodes[c]["max"] <= node["max"] + 1e-4).all()
            stack += [li, ri]
    assert (seen == 1).all()


def test_native_blas_speed():
    """The C++ path should build a 100k-tri BVH in well under a second."""
    import time

    from voidin_tpu import native as native_mod

    if native_mod.load() is None:
        pytest.skip("native builder unavailable")
    verts, indices = _random_tris(100_000, seed=1)
    t0 = time.perf_counter()
    out = native_mod.build_blas_native(verts, indices)
    dt = time.perf_counter() - t0
    assert out is not None and dt < 2.0, dt
