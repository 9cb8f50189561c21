"""Threaded (stackless, exit-link) packet traversal: bit-identity with the
stack-based paths + exit-link structural invariants."""

import jax.numpy as jnp
import numpy as np


def _scene_and_rays(seed=5, n_inst=5, R=1000):
    import voidin_tpu as vt
    from voidin_tpu.core import mathx

    w = vt.World()
    knot = w.meshes.add(vt.mesh.make_torus_knot(segments=48, sides=8))
    rng = np.random.default_rng(seed)
    for i in range(n_inst):
        t = mathx.from_translation(
            [2.0 * i - 4.0, float(rng.uniform(-1, 1)), -6.0]
        ) @ mathx.from_rotation_y(np.float32(rng.uniform(0, 6)))
        w.instances.add(np.asarray(t), knot, 0)
    scene = w.device(with_tlas=True)
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
    rand_o = rng.uniform(-5, 5, (R - 500, 3)).astype(np.float32)
    rand_d = rng.uniform(-6, 6, (R - 500, 3)).astype(np.float32)
    origins = np.concatenate([coherent_o, rand_o])
    dirs = np.concatenate([coherent_d, rand_d])
    active = rng.random(R) < 0.9
    return scene, origins, dirs, active


def test_exit_links_invariants():
    """Exit links walk the exact DFS node set: following hit->left /
    miss->exit from the root enumerates every reachable node once."""
    from voidin_tpu.rt import bvh as bvh_mod

    rng = np.random.default_rng(3)
    verts = rng.uniform(-1, 1, (120, 3)).astype(np.float32)
    idx = np.arange(120, dtype=np.int32)
    nodes, _ = bvh_mod.build_blas(verts, idx)
    exit_enc = bvh_mod.blas_exit_links(nodes)

    # walk the threaded order visiting EVERY node (treat all slabs as hit)
    seen = []
    cur = 0
    for _ in range(10 * len(nodes)):
        seen.append(cur)
        if nodes["count"][cur] > 0:  # leaf -> exit
            nxt = exit_enc[cur] - 1
        else:  # internal -> first child
            nxt = int(nodes["left_first"][cur])
        if nodes["count"][cur] > 0 and exit_enc[cur] == 0:
            break
        cur = int(nxt)
    # reachable set from the refit plan (slot 1 is an intentional hole)
    plan = bvh_mod.blas_refit_plan(nodes)
    assert sorted(seen) == sorted(plan["order"].tolist())

    # miss-at-root terminates immediately
    assert exit_enc[0] == 0


def test_occluded_threaded_bit_identical():
    """occluded_threaded == occluded == occluded_packets on coherent +
    incoherent rays with padding, inactive lanes and chunking."""
    from voidin_tpu.rt import traverse as trav

    scene, origins, dirs, active = _scene_and_rays()
    tlas, blas, inst, tri_pos = trav.scene_rays(scene)
    base = trav.occluded(
        tlas, blas, inst, tri_pos, jnp.asarray(origins), jnp.asarray(dirs),
        t_max=1.0, active=jnp.asarray(active), max_steps=4096,
    )
    assert int(base.exhausted) == 0 and bool(np.asarray(base.hit).any())

    table, n_tlas, inst2, tri2 = trav.scene_rays_threaded(scene)
    for kwargs in (
        dict(packet=128),
        dict(packet=64),
        dict(packet=128, chunk_packets=4),
    ):
        th = trav.occluded_threaded(
            table, n_tlas, inst2, tri2, jnp.asarray(origins),
            jnp.asarray(dirs), t_max=1.0, active=jnp.asarray(active),
            max_steps=8192, max_leaf=scene.meshes.bvh_max_leaf, **kwargs,
        )
        np.testing.assert_array_equal(
            np.asarray(base.hit), np.asarray(th.hit), err_msg=str(kwargs)
        )
        assert int(th.exhausted) == 0


def test_threaded_single_instance_and_empty():
    """Degenerate TLAS shapes: 1 instance (root is a leaf); all-inactive
    rays terminate without iterations."""
    import voidin_tpu as vt
    from voidin_tpu.rt import traverse as trav

    w = vt.World()
    knot = w.meshes.add(vt.mesh.make_torus_knot(segments=24, sides=6))
    w.instances.add(np.eye(4, dtype=np.float32), knot, 0)
    scene = w.device(with_tlas=True)
    tlas, blas, inst, tri_pos = trav.scene_rays(scene)
    table, n_tlas, inst2, tri2 = trav.scene_rays_threaded(scene)

    rng = np.random.default_rng(0)
    o = rng.uniform(-3, 3, (64, 3)).astype(np.float32)
    d = rng.uniform(-3, 3, (64, 3)).astype(np.float32)
    base = trav.occluded(tlas, blas, inst, tri_pos, jnp.asarray(o),
                         jnp.asarray(d), t_max=1.0)
    th = trav.occluded_threaded(
        table, n_tlas, inst2, tri2, jnp.asarray(o), jnp.asarray(d),
        t_max=1.0, max_leaf=scene.meshes.bvh_max_leaf,
    )
    np.testing.assert_array_equal(np.asarray(base.hit), np.asarray(th.hit))

    inactive = trav.occluded_threaded(
        table, n_tlas, inst2, tri2, jnp.asarray(o), jnp.asarray(d),
        t_max=1.0, active=jnp.zeros(64, bool),
        max_leaf=scene.meshes.bvh_max_leaf,
    )
    assert not bool(np.asarray(inactive.hit).any())


def test_threaded_unroll_bit_identical():
    """unroll=M composes M masked steps per while iteration; results must
    be bit-identical to unroll=1 — including under a max_steps cut that
    lands mid-composition (the steps < max_steps guard)."""
    from voidin_tpu.rt import traverse as trav

    scene, origins, dirs, active = _scene_and_rays()
    table, n_tlas, inst2, tri2 = trav.scene_rays_threaded(scene)

    def run(unroll, max_steps):
        return trav.occluded_threaded(
            table, n_tlas, inst2, tri2, jnp.asarray(origins),
            jnp.asarray(dirs), t_max=1.0, active=jnp.asarray(active),
            max_steps=max_steps, max_leaf=scene.meshes.bvh_max_leaf,
            unroll=unroll, chunk_packets=4,
        )

    for max_steps in (8192, 37):  # 37: cut lands mid-unroll for M=4
        base = run(1, max_steps)
        for m in (2, 4):
            u = run(m, max_steps)
            np.testing.assert_array_equal(
                np.asarray(base.hit), np.asarray(u.hit),
                err_msg=f"unroll={m} max_steps={max_steps}",
            )
            assert int(u.exhausted) == int(base.exhausted), (m, max_steps)
