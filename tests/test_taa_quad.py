"""Quad-block TAA history fetch (RasterConfig.taa_quad_history): one
4x4-texel block row per uniform 2x2 output quad must reproduce the
per-pixel 2x2-quad path BIT for bit — same texels, same lerp; only the
fetch granularity changes."""

import numpy as np

import jax.numpy as jnp

from voidin_tpu.passes import taa as taa_mod


def _data(seed=0, H=64, W=96, vel_scale=2.0, discontinuous=True):
    rng = np.random.default_rng(seed)
    color = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    history = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    # smooth velocity field + a hard discontinuity band (forces edge quads
    # whose floor coords spread beyond the 4x4 block)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    vx = 0.02 * np.sin(xx / 17.0) * vel_scale
    vy = 0.02 * np.cos(yy / 13.0) * vel_scale
    if discontinuous:
        band = (xx // 9 % 4 == 0)
        vx = np.where(band, vx + 0.4, vx)
        vy = np.where(band, vy - 0.3, vy)
    inb = rng.uniform(0, 1, (H, W)) > 0.2
    motion = np.stack([vx, vy, inb.astype(np.float32)], -1).astype(np.float32)
    return jnp.asarray(color), jnp.asarray(history), jnp.asarray(motion)


def test_taa_quad_history_bit_identical():
    color, history, motion = _data()
    base, ovf0 = taa_mod.taa_resolve(color, history, motion)
    quad, ovf = taa_mod.taa_resolve(color, history, motion,
                                    quad_history=True)
    assert int(ovf0) == 0
    np.testing.assert_array_equal(np.asarray(base), np.asarray(quad))


def test_taa_quad_history_extreme_velocities():
    """Large random velocities: nearly every quad falls to the edge path;
    still bit-identical while capacity holds."""
    color, history, motion = _data(seed=3, vel_scale=40.0)
    base, _ = taa_mod.taa_resolve(color, history, motion)
    quad, _ = taa_mod.taa_resolve(color, history, motion, quad_history=True)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(quad))


def test_taa_quad_history_overflow_counted():
    color, history, motion = _data(seed=5, vel_scale=40.0)
    _, ovf = taa_mod.taa_resolve(color, history, motion, quad_history=True,
                                 edge_capacity=4)
    assert int(ovf) > 0  # counted, not silent
    # overflowed pixels fall back to block-anchor samples — still finite
    out, _ = taa_mod.taa_resolve(color, history, motion, quad_history=True,
                                 edge_capacity=4)
    assert np.isfinite(np.asarray(out)).all()


def test_taa_full_frame_quad_matches():
    """Through taa() (reproject + resolve + state update) on a real
    G-buffer: quad history path equals the default bit for bit."""
    import dataclasses

    from tests.test_resolve_quad import CFG, _camera, _textured_scene
    from voidin_tpu.framework.renderer import (
        FrameState, Globals, render_frame,
    )

    scene = _textured_scene().device()
    cam = _camera(CFG.width / CFG.height)
    g = Globals.make(CFG.width, CFG.height, frame=1, time=0.5, dt=1 / 60)
    state = FrameState.initial(CFG.width, CFG.height).replace(
        history_valid=jnp.asarray(True),
        history=jnp.full((CFG.height, CFG.width, 3), 0.25, jnp.float32),
    )
    mov = jnp.zeros(0, jnp.int32)

    def frame(cfg):
        img, _st, _sc, aux = render_frame(scene, cam, g, state, mov, cfg)
        return np.asarray(img), int(aux["overflow"])

    img_d, ovf_d = frame(CFG)
    img_q, ovf_q = frame(
        dataclasses.replace(CFG, taa_quad_history=True)
    )
    np.testing.assert_array_equal(img_d, img_q)
    assert ovf_d == 0 and ovf_q == 0
