"""End-to-end image anchoring against the independent numpy oracle.

tests/oracle_renderer.py implements the reference WGSL semantics
(visibility/shading/ltc/postprocess + the wgpu raster rules) from scratch
in numpy — no production rendering code, only shared INPUT data. These
tests diff the production frame against it at image level (VERDICT r3
next #6: "diffed <1e-2"), converting "goldens lock our own behavior" into
"goldens anchor to reference semantics".

Why image-level and not bit-level: two independently written rasterizers
legitimately disagree on coverage/tie pixels (different edge-function
arithmetic) and on texture LOD fractions (quad-derivative estimates vs
analytic gradients), and the production renderer carries documented
approximations (post-filter sRGB, parent-resampled trilinear — see
PARITY.md). The budgets below are tight enough that any semantic bug
(wrong light formula, wrong encode, a dropped pass — or the capacity
truncation this oracle caught in round 4, see test_golden.py CFG note)
blows through them, while the legitimate divergences stay inside.

First frame only (TAA off in both): configs 1 and 3 are the BASELINE
presets whose first frame is TAA-free by design.
"""

import numpy as np
import pytest

import voidin_tpu as vt
from voidin_tpu.framework.renderer import FrameState, Globals, render_frame
from voidin_tpu.passes.raster import RasterConfig

from . import oracle_renderer as orc


def _production(world, cam_uniform, width, height, caps, enable_cull):
    import dataclasses
    from functools import partial

    import jax
    import jax.numpy as jnp

    cfg = RasterConfig(
        width=width, height=height, interpret=True, **caps
    )
    scene = world.device()
    g = Globals.make(width, height, frame=0, time=0.0, dt=0.0)
    state = FrameState.initial(width, height)
    img, _, _, aux = jax.jit(
        partial(
            render_frame, config=cfg, enable_cull=enable_cull,
            enable_taa=False,
        )
    )(scene, cam_uniform, g, state, jnp.zeros(0, jnp.int32))
    assert int(aux["overflow"]) == 0, "capacities must hold the scene"
    return np.asarray(img)


def _diff_report(prod, oracle):
    d = np.abs(prod - oracle)
    return dict(
        mean=float(d.mean()),
        p99=float(np.percentile(d, 99)),
        frac_gt_05=float((d > 0.05).mean()),
    )


def _assert_anchored(prod, oracle, mean_budget=1e-2, name=""):
    assert np.isfinite(oracle).all(), f"{name}: oracle produced non-finite"
    assert prod.std() > 0.02, f"{name}: production image is empty"
    assert oracle.std() > 0.02, f"{name}: oracle image is empty"
    rep = _diff_report(prod, oracle)
    assert rep["mean"] < mean_budget, f"{name}: {rep}"
    # edge/tie pixels may flip, but they must stay a small minority
    assert rep["frac_gt_05"] < 0.05, f"{name}: {rep}"


def test_oracle_matches_production_deferred_scene():
    """The golden deferred scene (point + area light, 5 spheres + plane):
    the fastest full-pipeline anchor."""
    from .test_golden import CFG, H, W, _deferred_scene

    w = _deferred_scene()
    cam = vt.Camera(position=[0, 2, 0], pitch=-18.0, aspect=W / H)
    cu = cam.uniform()
    prod = _production(
        w, cu, W, H,
        dict(tri_capacity=CFG.tri_capacity,
             pair_capacity=CFG.pair_capacity,
             tile_tri_capacity=CFG.tile_tri_capacity),
        enable_cull=False,
    )
    oracle = orc.render_oracle(w, cu, W, H)
    _assert_anchored(prod, oracle, name="deferred")


def test_oracle_matches_production_config1():
    """BASELINE config 1 (single dense mesh, point light, no cull/TAA) at
    reduced resolution — shading.wgsl point-light semantics + raster at
    ~65k triangles."""
    from voidin_tpu.framework.presets import config1_single_mesh

    W, H = 256, 144
    p = config1_single_mesh(W / H)
    cu = p.camera.uniform()
    prod = _production(
        p.world, cu, W, H,
        dict(tri_capacity=1 << 17, pair_capacity=1 << 18,
             tile_tri_capacity=192),
        enable_cull=False,
    )
    oracle = orc.render_oracle(p.world, cu, W, H)
    _assert_anchored(prod, oracle, name="config1")


def test_oracle_matches_production_config3():
    """BASELINE config 3 (glTF + two LTC area lights + point light):
    textured materials, normal maps, LTC area lighting."""
    from voidin_tpu.framework.presets import config3_gltf_arealights

    W, H = 256, 144
    p = config3_gltf_arealights(W / H)
    cu = p.camera.uniform()
    prod = _production(
        p.world, cu, W, H,
        dict(tri_capacity=1 << 17, pair_capacity=1 << 18,
             tile_tri_capacity=192),
        enable_cull=True,
    )
    oracle = orc.render_oracle(p.world, cu, W, H)
    # textured content adds the LOD-estimate and sRGB-filter-order
    # divergences (both documented above); the budget stays well below
    # anything a semantic bug would produce
    _assert_anchored(prod, oracle, mean_budget=1.5e-2, name="config3")
