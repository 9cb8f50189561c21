import numpy as np

from voidin_tpu.core import camera, mathx


def test_look_at_orthonormal():
    v = mathx.look_at_rh([2, 5, 12], [0, 0, 0], [0, 1, 0])
    r = v[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    # eye maps to origin
    eye_h = v @ np.array([2, 5, 12, 1.0], np.float32)
    np.testing.assert_allclose(eye_h[:3], 0, atol=1e-5)


def test_look_at_forward_is_negative_z():
    v = mathx.look_at_rh([0, 0, 0], [0, 0, -5], [0, 1, 0])
    p = v @ np.array([0, 0, -5, 1.0], np.float32)
    assert p[2] < 0  # in front of camera means negative view z


def test_infinite_reverse_z_projection():
    znear = 0.001
    p = mathx.perspective_infinite_reverse_rh(np.pi / 2, 1.0, znear)
    # near plane -> ndc z = 1
    clip = p @ np.array([0, 0, -znear, 1], np.float32)
    assert abs(clip[2] / clip[3] - 1.0) < 1e-6
    # far -> ndc z -> 0
    clip = p @ np.array([0, 0, -1e7, 1], np.float32)
    assert clip[2] / clip[3] < 1e-3
    # fov: at 45 deg from axis (fovy=90), |ndc.x| = 1
    clip = p @ np.array([1, 0, -1, 1], np.float32)
    assert abs(abs(clip[0] / clip[3]) - 1.0) < 1e-5


def test_rotation_z_ccw():
    m = mathx.from_rotation_z(np.float32(np.pi / 2))
    out = m @ np.array([1, 0, 0, 1], np.float32)
    np.testing.assert_allclose(out[:3], [0, 1, 0], atol=1e-6)


def test_extract_scale():
    # TRS order: scale is applied first, so columns are R @ diag(s).
    m = mathx.from_rotation_y(np.float32(0.3)) @ mathx.from_scale([2.0, 3.0, 4.0])
    np.testing.assert_allclose(mathx.extract_scale(m), [2, 3, 4], rtol=1e-5)


def test_radical_inverse():
    assert abs(mathx.radical_inverse(1, 2) - 0.5) < 1e-7
    assert abs(mathx.radical_inverse(2, 2) - 0.25) < 1e-7
    assert abs(mathx.radical_inverse(3, 2) - 0.75) < 1e-7
    assert abs(mathx.radical_inverse(1, 3) - 1 / 3) < 1e-6


def test_camera_uniform_contract():
    cam = camera.Camera(position=[2.0, 5.0, 12.0], yaw=0.0, pitch=-20.0, aspect=16 / 9)
    u = cam.uniform()
    # clip_to_world inverts proj@view
    np.testing.assert_allclose(
        u.clip_to_world @ (u.projection @ u.view), np.eye(4), atol=1e-4
    )
    # first frame: prev == current
    np.testing.assert_allclose(u.prev_world_to_clip, u.projection @ u.view, atol=1e-6)
    assert u.znear == np.float32(0.001)
    assert np.isinf(u.zfar)


def test_camera_jitter_enters_projection():
    cam = camera.Camera(position=[0, 0, 0], aspect=1.0)
    cam.jitter = np.array([0.25, -0.125], np.float32)
    u = cam.uniform()
    base = mathx.perspective_infinite_reverse_rh(camera.FOVY, 1.0, camera.ZNEAR)
    assert abs((u.projection - base)[0, 2] - 0.25) < 1e-6
    assert abs((u.projection - base)[1, 2] + 0.125) < 1e-6


def test_frustum_packing_matches_planes():
    """The packed frustum culls exactly the points outside x/y planes."""
    cam = camera.Camera(position=[0, 0, 0], aspect=1.5)
    u = cam.uniform()
    fr = u.frustum
    rng = np.random.default_rng(0)
    pts = rng.uniform(-50, 50, size=(2000, 3)).astype(np.float32)
    view_pts = pts  # camera at origin looking -z: view == world here (identity view)
    # Reference test (emit_draws.wgsl:24-30) with radius 0:
    vis_packed = (view_pts[:, 2] * fr[1] - np.abs(view_pts[:, 0]) * fr[0] >= 0) & (
        view_pts[:, 2] * fr[3] - np.abs(view_pts[:, 1]) * fr[2] >= 0
    )
    # Direct clip-space test (ignoring near/far)
    clip = (u.projection @ np.concatenate([pts, np.ones((len(pts), 1), np.float32)], 1).T).T
    w = clip[:, 3]
    vis_clip = (np.abs(clip[:, 0]) <= w) & (np.abs(clip[:, 1]) <= w)
    agree = vis_packed == vis_clip
    assert agree.mean() > 0.999


def test_hash_functions():
    """utils/hash.wgsl parity port: deterministic, in [0, 1), and roughly
    uniform (no sine-hash banding)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from voidin_tpu.core import hash as h

    x = jnp.linspace(0.0, 113.7, 4097)
    for v in (h.hash11(x), h.hash21(jnp.stack([x, x * 1.7], -1)),
              h.hash31(jnp.stack([x, x * 0.7, x * 2.3], -1))):
        v = np.asarray(v)
        assert ((v >= 0) & (v < 1)).all()
        assert 0.4 < v.mean() < 0.6 and v.std() > 0.2
    v3 = np.asarray(h.hash13(x))
    v33 = np.asarray(h.hash33(jnp.stack([x, x * 0.7, x * 2.3], -1)))
    for v in (v3, v33):
        assert v.shape[-1] == 3
        assert ((v >= 0) & (v < 1)).all()
        assert 0.35 < v.mean() < 0.65
    # determinism
    np.testing.assert_array_equal(np.asarray(h.hash11(x)), np.asarray(h.hash11(x)))
