"""Shared stage-prefix builder for the frame-pipeline audit tools.

tools/bisect_frame.py (slope timing) and tools/cost_audit.py (XLA
cost_analysis) both need "the frame up to stage X" as one jittable
function. Keeping the stage sequence in ONE place means a pipeline
rewiring cannot silently make the audits measure a different frame than
framework/renderer.py ships (round-3 review finding).
"""

from __future__ import annotations

STAGES = ["cull", "setup", "bin", "raster", "resolve", "shade", "taa", "full"]


def make_upto(scene, uniform, cfg, state, ab_ascale=1):
    """Returns upto(stage) -> f(scene, state, eps): the frame prefix
    ending at `stage`, reduced to a scalar (eps perturbs znear so slope
    timing can defeat caching; pass 0.0 for a single evaluation).

    `scene` and `state` MUST be passed as runtime arguments (the
    parameters here only survive for signature compatibility):
    - a closure-captured FrameState becomes a jit compile-time CONSTANT,
      history_valid=False folds, and XLA dead-code-eliminates the entire
      TAA resolve — exactly how every round-4 stage/sweep artifact missed
      the ~35 ms the TAA pass really costs (tools/r5_tail_probe3.py).
      Pass a SECOND-frame state (history_valid=True) for honest numbers.
    - a closure-captured scene bakes the texture pools into the program
      as literals; config-3-sized pools exceed the axon tunnel's
      remote-compile request limit (HTTP 413). Timing-neutral either way
      (r5_tail_probe3 K2 vs K3)."""
    import jax
    import jax.numpy as jnp

    from voidin_tpu.ops import fine_raster as fr
    from voidin_tpu.passes import cull as cull_pass
    from voidin_tpu.passes import postprocess as post_pass
    from voidin_tpu.passes import raster as raster_pass
    from voidin_tpu.passes import resolve as resolve_pass
    from voidin_tpu.passes import shading as shading_pass
    from voidin_tpu.passes import taa as taa_pass
    from voidin_tpu.scene.texture import linear_to_srgb

    def upto(stage):
        def f(scene, state, eps):
            camera = uniform.replace(znear=uniform.znear + eps)
            draws = cull_pass.emit_draws(
                scene.meshes, scene.instances, camera
            )
            if stage == "cull":
                return draws.count.astype(jnp.float32)
            inst_rec = None
            if getattr(cfg, "slim_rec", False) or getattr(
                cfg, "fused_inst_rec", False
            ):
                inst_rec = resolve_pass._inst_rec_f16(scene)
            setup = raster_pass.triangle_setup(
                scene.meshes, scene.instances, draws, camera, cfg,
                materials=scene.materials, inst_rec=inst_rec,
            )
            if stage == "setup":
                return setup["raster_rec"].sum()
            rec_sorted, starts, counts, overflow = (
                raster_pass.bin_triangles_pairs(setup, cfg)
            )
            if stage == "bin":
                return rec_sorted.sum() + starts.sum() + counts.sum()
            outs = fr.fine_raster_pairs(
                rec_sorted, starts, counts, tiles_x=cfg.tiles_x,
                tiles_per_step=cfg.tiles_per_step, interpret=cfg.interpret,
            )
            depth, trif = outs[0], outs[1]
            depth, tri_id = raster_pass._untile(
                depth.reshape(depth.shape[0], -1),
                trif.reshape(trif.shape[0], -1), cfg,
            )
            vis = raster_pass.VisBuffer(
                tri_id=tri_id[: cfg.height, : cfg.width],
                depth=depth[: cfg.height, : cfg.width],
                resolve_rec=setup["resolve_rec"],
                overflow=overflow,
            )
            if stage == "raster":
                return vis.depth.sum() + vis.tri_id.sum()
            gb, aux = resolve_pass.resolve_gbuffer(scene, vis, camera, cfg)
            if stage == "resolve":
                return (gb.depth.sum() + gb.material.sum()
                        + gb.normal_uv.sum() + aux.albedo.sum()
                        + aux.emissive.sum() + aux.mr.sum())
            hdr = shading_pass.shade(scene, gb, camera, aux=aux,
                                     area_light_scale=ab_ascale)
            if stage == "shade":
                return hdr.sum()
            hdr2, _st, _tovf = taa_pass.taa(
                hdr, gb, camera, state,
                quad_history=getattr(cfg, 'taa_quad_history', False),
                edge_capacity=getattr(cfg, 'taa_edge_capacity', 0),
            )
            if stage == "taa":
                return hdr2.sum()
            return linear_to_srgb(post_pass.postprocess(hdr2)).sum()

        return f

    return upto
