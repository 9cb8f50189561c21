#!/usr/bin/env python
"""North-star benchmark: ms/frame at 1080p on a 10k-instance culled scene
(cull + raster + shade + TAA), per BASELINE.json.

Scene: 10k instances (spheres / cubes / planes) scattered over a large
field so the frustum culls most of them, with LTC area lights, a point
light, TAA and postprocessing — the full frame pipeline in one jit.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is (16.6 ms target) / measured — >= 1.0 means the >=60 FPS
target is met.
"""

import json
import sys
import time

import numpy as np


def retry_transient(fn, attempts=5, label="bench",
                    backoff=(5.0, 15.0, 30.0, 60.0)):
    """The axon TPU tunnel occasionally throws transient 'TPU backend error
    (Internal)' (CLAUDE.md) — retry the whole measurement instead of letting
    one flake produce a bad BENCH_rN capture."""
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # jaxlib.xla_extension.XlaRuntimeError etc.
            msg = str(e)
            transient = (
                "Internal" in msg
                or "UNAVAILABLE" in msg
                or "Unavailable" in msg
                or "DEADLINE" in msg
            )
            if i + 1 == attempts or not transient:
                raise
            print(f"# {label}: transient TPU error, retry {i + 1}: "
                  f"{msg[:120]}", file=sys.stderr)
            time.sleep(backoff[min(i, len(backoff) - 1)])


def _probe_tpu_subprocess(timeout_s):
    """Probe TPU availability in a THROWAWAY subprocess with a hard timeout.

    Backend init through the axon tunnel has two observed failure modes:
    a fast `UNAVAILABLE` error (which killed BENCH_r02 — VERDICT.md Weak #1)
    and an indefinite HANG. An in-process retry loop handles neither safely
    (a hang never returns control; a failed init can be cached). A
    subprocess gives both a hard timeout and a clean slate per attempt.
    """
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print('BACKEND=' + jax.default_backend())"],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return None, f"probe timed out after {timeout_s:.0f}s"
    out = (r.stdout or "") + (r.stderr or "")
    for line in (r.stdout or "").splitlines():
        if line.startswith("BACKEND="):
            return line.split("=", 1)[1], None
    return None, out.strip().splitlines()[-1][:160] if out.strip() else "no output"


def probe_is_tpu(timeout_s=150.0) -> bool:
    """One subprocess probe; True iff a live TPU answered. The canonical
    probe — __graft_entry__ and tools/tpu_watch.sh call this too, so
    tunnel lessons live in ONE place."""
    backend, _ = _probe_tpu_subprocess(timeout_s)
    return backend == "tpu"


# Perf-option variants swept by tools/ab_options.py on the north-star frame.
# name -> (RasterConfig overrides, LTC_LUT_BF16, area_light_scale,
#          LTC_FETCH_PALLAS "off"|"on" — "on" resolves to the compiled
#          kernel on TPU, interpret mode on CPU; apply_ab_runtime_options).
# Every variant is image-budget-tested: fused_rec is bit-identical
# (tests/test_raster.py test_fused_resolve_rec_matches_default), ltc_bf16
# stays under the 1e-2 budget (tests/test_ltc.py test_ltc_lut_bf16_...),
# area_half is a documented deviation tested to mean < 5e-3
# (test_half_res_area_lights_close_to_full_res).
AB_VARIANTS = {
    # Sweep order = dict order, and tools/ab_options.py writes results
    # INCREMENTALLY — the expected winners go right after base so a sweep
    # cut short by the watcher timeout still yields them.
    "base": (dict(), False, 1, "off"),
    # taa_inwindow: gather-free TAA history fetch (bit-identical,
    # tests/test_taa_inwindow.py) — the history bilinear gather is
    # 16.6 ms of the ~21 ms honest TAA cost (tools/r5_taa_probe.py;
    # every round-4 artifact DCE'd the TAA pass via a constant
    # FrameState, see tools/r5_tail_probe3.py). Composed with the two
    # round-4 winners first so a short sweep still covers them.
    "slim_pw": (
        dict(slim_rec=True, planar_resolve=True, taa_inwindow=True),
        True, 2, "on"
    ),
    "all_lut_pw": (
        dict(fused_resolve_rec=True, inst_rec_f16=True,
             planar_resolve=True, taa_inwindow=True), True, 2, "on"
    ),
    "taa_inw": (dict(taa_inwindow=True), False, 1, "off"),
    # kernel_payload: the fine-raster kernel contracts the winner's
    # resolve record per pixel on the MXU (bit-identical,
    # tests/test_kernel_payload.py) — resolve's 2M-row record gather
    # becomes a pair_capacity-row stream gather.
    "slim_pk": (
        dict(slim_rec=True, planar_resolve=True, kernel_payload=True),
        True, 2, "on"
    ),
    "slim_pkw": (
        dict(slim_rec=True, planar_resolve=True, kernel_payload=True,
             taa_inwindow=True), True, 2, "on"
    ),
    # quad-block history fetch with the where-chain select: the 4x-fewer
    # gather rows of taa_quad_history without its einsum select disaster
    # (bit-identical, tests/test_taa_inwindow.py). Unlike taa_inwindow it
    # handles sky-heavy frames (background quads stay block-coherent).
    "slim_pqw": (
        dict(slim_rec=True, planar_resolve=True, taa_quad_history=True,
             taa_quad_where=True), True, 2, "on"
    ),
    "all_lut_pqw": (
        dict(fused_resolve_rec=True, inst_rec_f16=True, planar_resolve=True,
             taa_quad_history=True, taa_quad_where=True), True, 2, "on"
    ),
    "taa_qw": (
        dict(taa_quad_history=True, taa_quad_where=True), False, 1, "off"
    ),
    # planar (channel-major) resolve: identical arithmetic on (H, W)
    # planes instead of (H, W, 3)-shaped arrays whose tiny trailing dims
    # lane-pad to 128 on TPU. GBuffer fields bit-identical, aux taps
    # last-ulp (tests/test_resolve_planar.py); tools/r4_probe.py measured
    # the dense resolve MATH (not its gathers) at ~36 ms — all layout.
    "all_lut_p": (
        dict(fused_resolve_rec=True, inst_rec_f16=True,
             planar_resolve=True), True, 2, "on"
    ),
    # slim_rec: ONE 96 B record row (clip + uv + world-space oct normals +
    # 12xf16 material payload) — resolve drops to 2 gather rows/pixel
    # (record + albedo tap) at the same 96 B width where the flat gather
    # regime ends (CLAUDE.md round-4: 144 B fused rows measured SLOWER,
    # row count AND width both matter). Image budget like inst_rec_f16
    # (tests/test_resolve_slim.py); Renderer falls back to fused+f16 on
    # scenes outside the envelope (normal maps / non-const emissive/mr /
    # alpha masking).
    "slim_p": (
        dict(slim_rec=True, planar_resolve=True), True, 2, "on"
    ),
    # fused_inst_rec folds the f16 instance+material record INTO the
    # resolve record at setup (rides the per-draw gather): resolve drops
    # from 3 to 2 per-pixel gathers. Bit-identical to inst_rec_f16
    # (tests/test_raster.py test_fused_inst_rec_matches_inst_f16).
    # Hardware verdict (08-19 sweep): SLOWER — 144 B rows leave the
    # flat-cost gather regime (69.9 vs 63.1 ms); kept swept, never wins.
    "all_lut_pi": (
        dict(fused_resolve_rec=True, inst_rec_f16=True,
             planar_resolve=True, fused_inst_rec=True), True, 2, "on"
    ),
    "ifold": (
        dict(fused_resolve_rec=True, inst_rec_f16=True,
             fused_inst_rec=True), False, 1, "off"
    ),
    "planar": (dict(planar_resolve=True), False, 1, "off"),
    # tile-rate (slot) resolve + quad-block TAA history + quad-rate albedo
    # tap are bit-exact with the default path (tests/test_resolve_slot.py,
    # test_taa_quad.py, test_texture_meta.py); slot subsumes quad-rate
    # resolve at ~3x fewer gather rows (SOL_AUDIT.json)
    "all_s": (
        dict(slot_resolve=True, inst_rec_f16=True,
             taa_quad_history=True, tap_block=True), True, 2, "on"
    ),
    # quad-rate resolve + quad-block TAA history + quad-rate albedo tap
    # are bit-exact with the default path (tests/test_resolve_quad.py,
    # test_taa_quad.py, test_texture_meta.py) and exclude fused_resolve_rec
    "all_q": (
        dict(quad_rate_resolve=True, inst_rec_f16=True,
             taa_quad_history=True, tap_block=True), True, 2, "on"
    ),
    "slot": (dict(slot_resolve=True), False, 1, "off"),
    "taa_quad": (dict(taa_quad_history=True), False, 1, "off"),
    "tap_block": (dict(tap_block=True), False, 1, "off"),
    "all_lut": (
        dict(fused_resolve_rec=True, inst_rec_f16=True), True, 2, "on"
    ),
    "quad": (dict(quad_rate_resolve=True), False, 1, "off"),
    # all_exact: every BIT-EXACT XLA-only coherence option and nothing
    # else — no Pallas kernel, no f16/bf16/half-res image deviations, and
    # no slot_resolve (its one-hot MXU select is exact but only VERIFIED
    # on hardware by check_kernel_hw at sweep time; the quad path is pure
    # gathers). The UNSWEPT fallback in tuned_options: official numbers
    # taken before any TPU sweep measure the base-fidelity image path
    # (ADVICE r3).
    "all_exact": (
        dict(quad_rate_resolve=True, taa_quad_history=True, tap_block=True),
        False, 1, "off"
    ),
    # all_x: the composed variant with NO new Pallas kernel — every
    # component is XLA-only and CPU-proven (quad bit-exact, f16/bf16/half
    # inside the image budget).
    "all_x": (
        dict(quad_rate_resolve=True, inst_rec_f16=True), True, 2, "off"
    ),
    "all": (dict(fused_resolve_rec=True, inst_rec_f16=True), True, 2, "off"),
    "lut_kernel": (dict(), False, 1, "on"),
    "slim_solo": (dict(slim_rec=True), False, 1, "off"),
    "fused_rec": (dict(fused_resolve_rec=True), False, 1, "off"),
    "inst_f16": (dict(inst_rec_f16=True), False, 1, "off"),
    "ltc_bf16": (dict(), True, 1, "off"),
    "area_half": (dict(), False, 2, "off"),
}


def apply_ab_runtime_options(bf16, ascale, lut, backend):
    """Set the module-level shading switches for a variant (returns
    area_light_scale unchanged for the caller to plumb)."""
    from voidin_tpu.passes import shading

    shading.LTC_LUT_BF16 = bf16
    shading.LTC_FETCH_PALLAS = (
        "off" if lut == "off"
        else ("interpret" if backend == "cpu" else "hw")
    )
    return ascale


def ab_variants_stamp():
    """Canonical JSON-stable description of AB_VARIANTS, written into
    AB_OPTIONS.json by the sweep and REQUIRED to match by tuned_options —
    a capture taken before a variant's definition changed must not steer
    the official run (it measured something else)."""
    return {
        name: [sorted(cfg.items()), bool(bf16), int(ascale), lut]
        for name, (cfg, bf16, ascale, lut) in AB_VARIANTS.items()
    }


def tuned_options(path=None, with_meta=False):
    """The fastest measured variant from AB_OPTIONS.json (written by
    tools/ab_options.py once the TPU answers — tools/tpu_watch.sh runs it).
    With no valid TPU sweep the fallback is 'all_exact', the composed
    variant whose every component is XLA-only and BIT-EXACT with the base
    image (no f16/bf16/half-res deviations) — official numbers taken
    unswept measure the base-fidelity path (ADVICE r3). The Pallas
    LUT-kernel variants are never applied unswept: they need the hardware
    bit-exactness guard first (tools/check_kernel_hw.py, run by the
    watcher before any capture). `with_meta`: also return whether a valid
    TPU sweep backed the choice (callers stamp it into their JSON)."""
    import os

    if path is None:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "AB_OPTIONS.json")
    name, swept = "all_exact", False
    try:
        with open(path) as f:
            d = json.load(f)
        # A stored measurement steers the official run only if it measured
        # the SAME variant definition this build would apply — checked PER
        # VARIANT (json roundtrip: tuples become lists), so adding a new
        # variant to AB_VARIANTS doesn't throw away the existing sweep;
        # editing an existing variant invalidates just that entry.
        cur = json.loads(json.dumps(ab_variants_stamp()))
        stored = d.get("variants") or {}
        if d.get("backend") == "tpu":
            ms = {
                k: v for k, v in d.get("ms_per_variant", {}).items()
                if k in AB_VARIANTS and isinstance(v, (int, float))
                and stored.get(k) == cur.get(k)
            }
            if ms:
                name, swept = min(ms, key=ms.get), True
    except Exception:
        pass
    if with_meta:
        return name, AB_VARIANTS[name], swept
    return name, AB_VARIANTS[name]


def acquire_backend(total_budget_s=900.0, insurance_metric=None):
    """Initialize the JAX backend with patience measured in MINUTES.

    Probes in subprocesses (hard per-attempt timeout) with growing backoff
    until the tunnel answers, then initializes in-process while the tunnel
    is warm. After the budget, pins the CPU backend (never having touched
    axon in-process, so the pin is clean) and lets the caller record an
    honest degraded measurement instead of a traceback.

    `insurance_metric`: after the FIRST failed probe an error JSON line for
    this metric is printed immediately — if the driver's own timeout kills
    the process mid-probe, a parseable record is already on stdout. A later
    successful measurement prints the real line afterwards (last line
    wins)."""
    import os

    import jax

    t0 = time.monotonic()
    delay, probe_timeout = 5.0, 120.0
    attempt = 0
    insured = False
    allow_cpu = os.environ.get("VOIDIN_BENCH_ALLOW_CPU") == "1"
    while time.monotonic() - t0 < total_budget_s:
        attempt += 1
        backend, err = _probe_tpu_subprocess(probe_timeout)
        # A "cpu" answer is the tunnel's fast-UNAVAILABLE mode: backend init
        # errored and JAX fell back to host CPU. For the official TPU metric
        # that is DOWN, not up — keep probing (interpret-mode 1080p on CPU
        # outlives the driver timeout and loses the round's number, the
        # BENCH_r02 failure this function exists to prevent). Set
        # VOIDIN_BENCH_ALLOW_CPU=1 to accept CPU on a dev box.
        if backend is not None and backend != "tpu" and not allow_cpu:
            err = f"probe answered '{backend}' (TPU init failed; tunnel down)"
            backend = None
        if backend is not None:
            print(f"# backend probe ok: {backend} (attempt {attempt}, "
                  f"{time.monotonic() - t0:.0f}s)", file=sys.stderr)
            if backend != "tpu":
                jax.config.update("jax_platforms", "cpu")
            return jax.default_backend()
        print(f"# backend probe failed (attempt {attempt}, "
              f"{time.monotonic() - t0:.0f}s): {err}", file=sys.stderr)
        if not insured and insurance_metric:
            print(json.dumps({
                "metric": insurance_metric, "value": None, "unit": "ms",
                "vs_baseline": 0.0,
                "error": "TPU tunnel not answering (probing continues; a "
                         "later JSON line supersedes this one)",
            }), flush=True)
            insured = True
        remaining = total_budget_s - (time.monotonic() - t0)
        if remaining < probe_timeout / 2:
            break
        time.sleep(min(delay, max(0.0, remaining - probe_timeout)))
        delay = min(delay * 1.7, 90.0)
    print(f"# backend unavailable after {time.monotonic() - t0:.0f}s — "
          f"falling back to CPU", file=sys.stderr)
    jax.config.update("jax_platforms", "cpu")
    return "cpu-fallback"


def build_world(n_instances=10_000, seed=0):
    import voidin_tpu as vt
    from voidin_tpu.core import mathx

    rng = np.random.default_rng(seed)
    w = vt.World()
    w.lights.add_point_light([0, 10.0, 0], 40.0, [1.0, 0.95, 0.9])
    w.add_area_light(
        [1, 1, 1],
        7.0,
        (5.0, 8.0),
        np.asarray(
            mathx.from_translation([0, 18, 10])
            @ mathx.from_rotation_x(np.float32(-np.pi / 4))
        ),
    )
    w.add_area_light(
        [1, 0.8, 0.6],
        5.0,
        (6.0, 6.0),
        np.asarray(
            mathx.from_translation([0, 18, -40])
            @ mathx.from_rotation_x(np.float32(-3 * np.pi / 4))
        ),
    )

    # mesh mix sized so ~10k instances yield ~1.5M pooled triangles —
    # heavier than the reference's own scenes (Sponza ~260k tris) while
    # staying within one frame's capacity budget
    # real textures so texture-fetch cost is represented (pool sizes to
    # content; checkerboard + noise at 256^2)
    yy, xx = np.meshgrid(np.arange(256), np.arange(256), indexing="ij")
    checker = ((xx // 16 + yy // 16) % 2 * 155 + 100).astype(np.uint8)
    tex_checker = w.textures.add(
        np.stack([checker, checker // 2 + 64, checker // 3 + 42], -1), srgb=True
    )
    noise = rng.integers(60, 220, (256, 256, 3)).astype(np.uint8)
    tex_noise = w.textures.add(noise, srgb=True)
    mat_checker = w.materials.add(albedo=tex_checker)
    mat_noise = w.materials.add(albedo=tex_noise)

    sphere2 = w.meshes.add(vt.mesh.make_uv_sphere(1.0, 2))  # ~250 tris
    sphere3 = w.meshes.add(vt.mesh.make_uv_sphere(1.0, 3))  # ~600 tris
    cube = w.meshes.add(vt.mesh.make_cube_mesh(1.5))  # 12 tris
    meshes = [sphere2, cube, sphere3, vt.mesh.SPHERE_1_MESH]
    # Geometric LOD (cull.select_lod): instances past ~540/ratio px of
    # screen radius rasterize coarser spheres — live triangles (and with
    # them the capacity-padded setup/bin costs) drop ~3x with no visible
    # change at 1080p (sub-pixel triangles are pure binning waste).
    sphere1 = vt.mesh.SPHERE_1_MESH  # ~50 tris
    w.meshes.set_lods(sphere3, [(sphere2, 8.0), (sphere1, 20.0)])
    w.meshes.set_lods(sphere2, [(sphere1, 14.0)])

    # 10k instances in a 400x400 field; the camera sees a narrow slice.
    moving = []
    for i in range(n_instances - w.instances.__len__()):
        x = rng.uniform(-200, 200)
        z = rng.uniform(-200, 200)
        y = rng.uniform(-2, 6)
        t = mathx.from_translation([x, y, z]) @ mathx.from_scale(
            float(rng.uniform(0.5, 1.5))
        )
        mid = int(rng.integers(0, len(meshes)))
        idx = w.instances.add(
            np.asarray(t), meshes[mid], mat_checker if i % 2 else mat_noise
        )
        if i % 50 == 0:
            moving.append(idx)
    # ground
    w.instances.add(
        np.asarray(mathx.from_translation([0, -3, 0]) @ mathx.from_scale(500.0)),
        vt.mesh.HORIZONTAL_PLANE_MESH,
        0,
    )
    return w, np.asarray(moving, np.int32)


def run_preset(n, profile=False, rt_scale=0, ab=True):
    """Run one of the five BASELINE configs via the preset system.
    rt_scale > 0 overrides the preset's rt_shadow_scale (config-5
    feasibility fallback: half-res shadow rays, a documented deviation
    tested in tests/test_traverse.py). `ab`: apply the tuned A/B variant
    (the sweep winner / CPU-proven all_x fallback) — the configs measure
    this framework at its production settings, like the reference runs
    with its own; the applied variant is recorded in the JSON line."""
    import time

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

    import voidin_tpu as vt
    from voidin_tpu.framework.presets import PRESETS
    from voidin_tpu.framework.renderer import Renderer
    from voidin_tpu.passes.raster import RasterConfig

    suffix = f" (rt_shadow_scale={rt_scale})" if rt_scale else ""
    metric = f"ms/frame 1080p BASELINE config {n}{suffix}"
    backend = acquire_backend(insurance_metric=metric)
    if backend == "cpu-fallback":
        print(
            json.dumps(
                {
                    "metric": metric,
                    "value": None,
                    "unit": "ms",
                    "vs_baseline": 0.0,
                    "error": "TPU backend unavailable after 900s of probing",
                }
            )
        )
        return
    p = PRESETS[n](1920 / 1080)
    if rt_scale:
        import dataclasses as _dc

        p = _dc.replace(p, rt_shadow_scale=rt_scale)
    if ab:
        ab_name, (ab_cfg, ab_bf16, ab_ascale, ab_lut), ab_swept = \
            tuned_options(with_meta=True)
        apply_ab_runtime_options(ab_bf16, ab_ascale, ab_lut, backend)
    else:
        ab_name, ab_cfg, ab_ascale, ab_swept = "base", {}, 1, True
    cfg = RasterConfig(
        width=1920,
        height=1080,
        tri_capacity=p.tri_capacity,
        pair_capacity=p.pair_capacity,
        tile_tri_capacity=p.tile_tri_capacity,
        quad_edge_capacity=p.quad_edge_capacity,
        taa_edge_capacity=p.taa_edge_capacity,
        tap_edge_capacity=p.tap_edge_capacity,
        rt_packet=p.rt_packet,
        rt_threaded=p.rt_threaded,
        interpret=backend == "cpu",
        **ab_cfg,
    )
    r = Renderer(
        # block tables cost 3x the pool bytes — only build them when the
        # tuned variant actually taps them
        p.world.device(with_tlas=p.with_tlas,
                       tap_blocks=bool(ab_cfg.get("tap_block", False))),
        cfg,
        enable_cull=p.enable_cull,
        enable_taa=p.enable_taa,
        enable_rt_shadows=p.enable_rt_shadows,
        rt_shadow_scale=p.rt_shadow_scale,
        area_light_scale=ab_ascale,
        moving_ids=np.asarray(p.moving_ids, np.int32),
    )

    def jm():
        return p.animator(r.time) if p.animator else None

    def measure():
        img = r.render(p.camera, joint_mats=jm())
        _ = float(img.sum())
        times = {}
        for k in (1, 5):
            t0 = time.perf_counter()
            for _ in range(k):
                img = r.render(p.camera, dt=1 / 60, joint_mats=jm())
            _ = float(img.sum())
            times[k] = time.perf_counter() - t0
        return (times[5] - times[1]) / 4 * 1000.0

    ms = retry_transient(measure, label=f"config {n}")
    print(
        f"# config {n}: draws={int(r.aux['draw_count'])} "
        f"overflow={int(r.aux['overflow'])} "
        f"coverage={int(r.aux['vis_coverage'])}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(ms, 3),
                "unit": "ms",
                "vs_baseline": round(16.6 / ms, 4),
                "overflow": int(r.aux["overflow"]),
                "options": ab_name,
                "options_swept": ab_swept,
            }
        )
    )
    return r, p


def run_anim(n=4, frames=60):
    """Multi-frame ANIMATED capture (VERDICT r4 next #9): `frames` frames
    of a preset through the production Renderer — state threading,
    per-frame joint-matrix evaluation and skinning BLAS/TLAS refits all
    inside the measured loop (the official static-pose number can't see
    them). Wall-clock is chunked so the slope method still defeats the
    axon tunnel's async dispatch; prints mean ms/frame + spread."""
    import time

    out = run_preset(n)
    if out is None:
        return
    r, p = out

    def jm():
        return p.animator(r.time) if p.animator else None

    chunk = 10
    samples = []
    img = r.render(p.camera, dt=1 / 60, joint_mats=jm())
    _ = float(img.sum())  # warm
    for s in range(frames // chunk):
        t0 = time.perf_counter()
        for _ in range(chunk):
            img = r.render(p.camera, dt=1 / 60, joint_mats=jm())
        _ = float(img.sum())
        samples.append((time.perf_counter() - t0) / chunk * 1000.0)
    import numpy as _np

    arr = _np.asarray(samples)
    print(
        json.dumps(
            {
                "metric": f"ms/frame 1080p config {n} ANIMATED "
                          f"({frames} frames)",
                "value": round(float(arr.mean()), 3),
                "unit": "ms",
                "spread": round(float(arr.max() - arr.min()), 3),
                "chunks_ms": [round(float(x), 3) for x in arr],
                "overflow": int(r.aux["overflow"]),
            }
        )
    )


def main():
    import argparse

    import jax

    import voidin_tpu as vt
    from voidin_tpu.framework.renderer import Renderer
    from voidin_tpu.passes.raster import RasterConfig

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=0,
                    help="BASELINE config 1-5; 0 = north-star 10k scene")
    ap.add_argument("--rt-scale", type=int, default=0,
                    help="override preset rt_shadow_scale (2 = half-res "
                    "shadow rays, documented deviation)")
    ap.add_argument("--smoke", action="store_true",
                    help="drive the EXACT north-star wiring (incl. the A/B "
                    "winner application) at tiny scale on CPU — a minutes-"
                    "scale verification run, not a measurement")
    ap.add_argument("--no-ab", action="store_true",
                    help="run presets at base options (no tuned variant)")
    ap.add_argument("--anim", type=int, default=0,
                    help="N>0: ANIMATED capture — N frames of --config "
                    "(default 4, the skinned preset) through the "
                    "production Renderer; mean ms/frame + spread")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
    if args.anim:
        return run_anim(args.config or 4, frames=args.anim)
    if args.config:
        run_preset(args.config, rt_scale=args.rt_scale,
                   ab=not args.no_ab)
        return

    if args.smoke:
        # No probing: the probe subprocess can't inherit the CPU pin (the
        # JAX_PLATFORMS env var is ignored on this image) and would wait
        # out the whole tunnel budget. Smoke is CPU by definition.
        jax.config.update("jax_platforms", "cpu")
        backend = "cpu"
    else:
        backend = acquire_backend(
            insurance_metric="ms/frame 1080p 10k-instance culled scene "
            "(cull+raster+shade+TAA)"
        )
    if backend == "cpu-fallback":
        # TPU never answered within the budget. A 1080p interpret-mode CPU
        # measurement is meaningless for the TPU metric and could outlive
        # the driver's own timeout — emit an explicit error record instead.
        print(
            json.dumps(
                {
                    "metric": "ms/frame 1080p 10k-instance culled scene "
                    "(cull+raster+shade+TAA)",
                    "value": None,
                    "unit": "ms",
                    "vs_baseline": 0.0,
                    "error": "TPU backend unavailable after 900s of probing",
                }
            )
        )
        return
    world, moving = build_world(n_instances=300 if args.smoke else 10_000)
    ab_name, (ab_cfg, ab_bf16, ab_ascale, ab_lut), ab_swept = \
        tuned_options(with_meta=True)
    if args.smoke:
        # exercise every option path regardless of what the sweep found
        # (all_s is the strict superset: slot resolve + quad TAA/tap +
        # f16 instance records + bf16 LUT weights + half-res area lights
        # + LUT kernel)
        ab_name = "all_s"
        ab_cfg, ab_bf16, ab_ascale, ab_lut = AB_VARIANTS["all_s"]
    if ab_name != "base":
        print(f"# applying A/B sweep winner: {ab_name}", file=sys.stderr)
    apply_ab_runtime_options(ab_bf16, ab_ascale, ab_lut, backend)
    W, H = (320, 184) if args.smoke else (1920, 1080)
    cap = 1 << (14 if args.smoke else 19)
    cfg = RasterConfig(
        width=W,
        height=H,
        tri_capacity=cap,  # ~204k live LOD-selected tris (was 1.1M)
        pair_capacity=cap,  # ops cost by capacity; overflow checked 0
        tile_tri_capacity=128,
        interpret=backend == "cpu",
        # quad-rate resolve edge-quad capacity: max 26.9k at the bench
        # pose (tools/count_edge_quads.py, stable ±0.1% over the
        # animation) — 1<<15 leaves 22% headroom; gathers cost by
        # capacity, so keep it tight (CLAUDE.md cost model)
        quad_edge_capacity=0 if args.smoke else 1 << 15,
        # TAA edge quads: 1.4k at the bench pose (velocity-coherent
        # static camera); 1<<12 leaves 3x headroom
        taa_edge_capacity=0 if args.smoke else 1 << 12,
        # tap-block edge quads: 18.6k at the bench pose
        # (tools/count_edge_quads.py) -> 1<<15 with 76% headroom
        tap_edge_capacity=0 if args.smoke else 1 << 15,
        **ab_cfg,
    )
    r = Renderer(world.device(), cfg, moving_ids=moving,
                 area_light_scale=ab_ascale)
    cam = vt.Camera(
        position=[0.0, 2.0, 30.0], yaw=0.0, pitch=-5.0, aspect=W / H
    )

    # Warmup / compile. NOTE: block_until_ready is a NO-OP on the axon
    # platform; the only true sync is a device->host transfer, and per-call
    # overhead is cancelled by the two-point slope.
    def measure():
        img = r.render(cam)
        _ = float(img.sum())

        n1, n2 = (1, 9) if backend != "cpu" else (1, 3)
        times = {}
        for n in (n1, n2):
            t0 = time.perf_counter()
            for _ in range(n):
                img = r.render(cam, dt=1 / 60)
            _ = float(img.sum())
            times[n] = time.perf_counter() - t0
        return (times[n2] - times[n1]) / (n2 - n1) * 1000.0

    ms = retry_transient(measure)

    draws = int(r.aux["draw_count"])
    overflow = int(r.aux["overflow"])
    print(
        f"# backend={backend} draws={draws} overflow={overflow} "
        f"coverage={int(r.aux['vis_coverage'])}",
        file=sys.stderr,
    )
    metric = "ms/frame 1080p 10k-instance culled scene (cull+raster+shade+TAA)"
    if args.smoke:
        # never report the official metric string for a tiny CPU run
        metric = f"SMOKE {W}x{H} {backend} culled scene (not a measurement)"
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(ms, 3),
                "unit": "ms",
                "vs_baseline": round(16.6 / ms, 4),
                "options": ab_name,
                "options_swept": ab_swept,
                **({"smoke": True} if args.smoke else {}),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # noqa: BLE001 — the driver contract is ONE
        # JSON line no matter what; a traceback-only exit loses the round's
        # official number (this killed BENCH_r02).
        if isinstance(e, SystemExit) and not e.code:
            raise  # clean exits (--help) are not failures
        import traceback

        traceback.print_exc(file=sys.stderr)
        _cfg = 0
        for _i, _a in enumerate(sys.argv):
            if _a == "--config" and _i + 1 < len(sys.argv):
                _cfg = int(sys.argv[_i + 1])
            elif _a.startswith("--config="):
                _cfg = int(_a.split("=", 1)[1])
        print(
            json.dumps(
                {
                    "metric": (
                        f"ms/frame 1080p BASELINE config {_cfg}"
                        if _cfg
                        else "ms/frame 1080p 10k-instance culled scene "
                        "(cull+raster+shade+TAA)"
                    ),
                    "value": None,
                    "unit": "ms",
                    "vs_baseline": 0.0,
                    "error": f"{type(e).__name__}: {str(e)[:200]}",
                }
            )
        )
        sys.exit(1)
