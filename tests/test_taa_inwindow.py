"""In-window TAA history fetch: bit-identity with _bilinear_clamp under
sub-pixel, fast-moving and out-of-bounds history coordinates, block
fallback + overflow accounting, and the full-frame flag."""

import jax
import jax.numpy as jnp
import numpy as np


def _coords(H, W, rng, fast_frac=0.1, fast_mag=0.08):
    """Normalized history uv: sub-pixel jitter everywhere + a fast blob."""
    u = (np.arange(W, dtype=np.float32) + 0.5) / W
    v = (np.arange(H, dtype=np.float32) + 0.5) / H
    uu = np.broadcast_to(u[None, :], (H, W)).copy()
    vv = np.broadcast_to(v[:, None], (H, W)).copy()
    uu += (rng.random((H, W), dtype=np.float32) - 0.5) * (1.8 / W)
    vv += (rng.random((H, W), dtype=np.float32) - 0.5) * (1.8 / H)
    mask = rng.random((H, W)) < fast_frac
    uu[mask] += (rng.random(int(mask.sum()), dtype=np.float32) - 0.5) * fast_mag
    vv[mask] += (rng.random(int(mask.sum()), dtype=np.float32) - 0.5) * fast_mag
    return jnp.asarray(uu), jnp.asarray(vv)


def test_inwindow_bit_identical():
    from voidin_tpu.passes import taa as taa_mod

    H, W = 64, 96
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((H, W, 3), dtype=np.float32))
    for fast_frac, fast_mag in ((0.0, 0.0), (0.1, 0.08), (0.5, 0.3)):
        u, v = _coords(H, W, rng, fast_frac, fast_mag)
        base = np.asarray(taa_mod._bilinear_clamp(img, u, v))
        out, ovf = taa_mod._bilinear_clamp_inwindow(img, u, v, capacity=0)
        assert int(ovf) == 0, (fast_frac, fast_mag)
        np.testing.assert_array_equal(base, np.asarray(out),
                                      err_msg=str((fast_frac, fast_mag)))


def test_inwindow_offscreen_coords():
    """History coords far outside [0, 1]: the clamped gather path and the
    in-window path must agree (everything lands in the fallback or the
    edge-clamped dense window)."""
    from voidin_tpu.passes import taa as taa_mod

    H, W = 32, 64
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((H, W, 3), dtype=np.float32))
    u = jnp.asarray(rng.uniform(-0.5, 1.5, (H, W)).astype(np.float32))
    v = jnp.asarray(rng.uniform(-0.5, 1.5, (H, W)).astype(np.float32))
    base = np.asarray(taa_mod._bilinear_clamp(img, u, v))
    out, ovf = taa_mod._bilinear_clamp_inwindow(img, u, v, capacity=0)
    assert int(ovf) == 0
    np.testing.assert_array_equal(base, np.asarray(out))


def test_inwindow_overflow_counts():
    """An undersized block capacity reports the shortfall instead of
    silently mixing paths."""
    from voidin_tpu.passes import taa as taa_mod

    H, W = 32, 64
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((H, W, 3), dtype=np.float32))
    u, v = _coords(H, W, rng, fast_frac=1.0, fast_mag=0.5)
    _out, ovf = taa_mod._bilinear_clamp_inwindow(img, u, v, capacity=2)
    assert int(ovf) > 0


def test_inwindow_full_frame_flag():
    """RasterConfig.taa_inwindow through render_frame: pixel-identical to
    the default TAA path on a two-frame animated run."""
    import dataclasses

    import voidin_tpu as vt
    from voidin_tpu.core import mathx
    from voidin_tpu.framework.renderer import (FrameState, Globals,
                                               render_frame)
    from voidin_tpu.passes.raster import RasterConfig

    w = vt.World()
    sphere = w.meshes.add(vt.mesh.make_uv_sphere(1.0, 4))
    mat = w.materials.add()
    moving = []
    for i in range(4):
        t = mathx.from_translation([2.0 * i - 3.0, 1.0, -6.0])
        moving.append(w.instances.add(np.asarray(t), sphere, mat))
    w.instances.add(
        np.asarray(
            mathx.from_translation([0, -1, -6]) @ mathx.from_scale(20.0)
        ),
        vt.mesh.HORIZONTAL_PLANE_MESH,
        mat,
    )
    w.lights.add_point_light([2, 5, -2], 20.0, [1, 1, 1])
    scene = w.device()
    W_, H_ = 128, 64
    cfg = RasterConfig(width=W_, height=H_, interpret=True,
                       tri_capacity=1 << 12, pair_capacity=1 << 13,
                       tile_tri_capacity=64)
    cam = vt.Camera(position=[0, 2, 0], pitch=-15.0, aspect=W_ / H_)
    mov = jnp.asarray(np.asarray(moving, np.int32))

    def run(c):
        cu0 = cam.uniform()
        g = Globals.make(W_, H_, frame=0, time=0.0, dt=1 / 60)
        st = FrameState.initial(W_, H_)
        sc = scene
        img, st, sc, aux = render_frame(sc, cu0, g, st, mov, c,
                                        enable_taa=True)
        g1 = Globals.make(W_, H_, frame=1, time=1 / 60, dt=1 / 60)
        cu1 = cam.uniform(previous=cu0)
        img1, _st, _sc, aux1 = render_frame(sc, cu1, g1, st, mov, c,
                                            enable_taa=True)
        assert int(aux1["overflow"]) == 0
        return np.asarray(img1)

    base = run(cfg)
    inw = run(dataclasses.replace(cfg, taa_inwindow=True))
    np.testing.assert_array_equal(base, inw)


def test_quadblock_where_select_bit_identical():
    """The where-chain in-block select is bit-identical to the einsum
    one-hot select and to the per-pixel path."""
    from voidin_tpu.passes import taa as taa_mod

    H, W = 64, 96
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((H, W, 3), dtype=np.float32))
    for fast_frac, fast_mag in ((0.0, 0.0), (0.1, 0.08), (1.0, 0.5)):
        u, v = _coords(H, W, rng, fast_frac, fast_mag)
        base = np.asarray(taa_mod._bilinear_clamp(img, u, v))
        for sel in ("einsum", "where"):
            out, _ovf = taa_mod._bilinear_clamp_quadblock(
                img, u, v, capacity=H * W // 4, select=sel
            )
            np.testing.assert_array_equal(
                base, np.asarray(out), err_msg=f"{sel} {fast_frac}"
            )
