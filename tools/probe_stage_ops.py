#!/usr/bin/env python
"""Per-op census of ONE pass (default: resolve) — the drill-down behind
tools/sol_audit.py's stage totals. Lowers just the pass at 1080p on the
north-star scene and prints every gather/scatter/sort with its priced
cost, plus the largest intermediate buffers (HBM suspects).

Usage: python -u tools/probe_stage_ops.py [--variant all_s] [--pass taa]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="all_s")
    ap.add_argument("--pass", dest="which", default="resolve",
                    choices=["resolve", "taa"])
    ap.add_argument("--top", type=int, default=24)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
    import jax.numpy as jnp

    import voidin_tpu as vt
    from bench import AB_VARIANTS, build_world
    from tools.sol_audit import audit_hlo
    from voidin_tpu.passes.raster import RasterConfig

    ab_cfg, _bf16, _asc, _lut = AB_VARIANTS[args.variant]
    W, H = 1920, 1080
    cfg = RasterConfig(
        width=W, height=H, tri_capacity=1 << 19, pair_capacity=1 << 19,
        quad_edge_capacity=1 << 15, taa_edge_capacity=1 << 12,
        tap_edge_capacity=1 << 15, interpret=True, **ab_cfg,
    )
    world, _ = build_world()
    scene = world.device(tap_blocks=bool(ab_cfg.get("tap_block")))
    cam = vt.Camera(position=[0.0, 2.0, 30.0], yaw=0.0, pitch=-5.0,
                    aspect=W / H).uniform()

    if args.which == "resolve":
        from voidin_tpu.passes import resolve as resolve_pass
        from voidin_tpu.passes.gbuffer import VisBuffer

        vis = VisBuffer(
            tri_id=jax.ShapeDtypeStruct((H, W), jnp.int32),
            depth=jax.ShapeDtypeStruct((H, W), jnp.float32),
            resolve_rec=jax.ShapeDtypeStruct(
                ((1 << 19) + (1 << 16), 12), jnp.float32
            ),
            overflow=jax.ShapeDtypeStruct((), jnp.int32),
            tri_id2=None, depth2=None,
        )

        def f(v):
            gb, aux = resolve_pass.resolve_gbuffer(scene, v, cam, cfg)
            return gb, aux

        lowered = jax.jit(f).lower(vis)
    else:
        from voidin_tpu.framework.renderer import FrameState
        from voidin_tpu.passes import taa as taa_pass
        from voidin_tpu.passes.gbuffer import GBuffer

        gb = GBuffer(
            normal_uv=jax.ShapeDtypeStruct((H, W, 2), jnp.uint32),
            material=jax.ShapeDtypeStruct((H, W), jnp.int32),
            depth=jax.ShapeDtypeStruct((H, W), jnp.float32),
        )
        st = FrameState.initial(W, H).replace(history_valid=jnp.asarray(True))

        def f(g, hdr, hist):
            out, _ns, ovf = taa_pass.taa(
                hdr, g, cam, st.replace(history=hist),
                quad_history=cfg.taa_quad_history,
                edge_capacity=cfg.taa_edge_capacity,
            )
            return out, ovf

        lowered = jax.jit(f).lower(
            gb, jax.ShapeDtypeStruct((H, W, 3), jnp.float32),
            jax.ShapeDtypeStruct((H, W, 3), jnp.float32),
        )

    compiled = lowered.compile()
    text = compiled.as_text()
    g, sc, so = audit_hlo(text)
    ops = sorted(g + sc + so, key=lambda d: -d["ns"])
    print(f"== {args.which} ({args.variant}) gather/scatter/sort ops ==")
    for d in ops[: args.top]:
        if d["kind"] == "sort":
            print(f"  sort  {d['keys']:>9} keys x{d['operands']} "
                  f"-> {d['ns'] / 1e6:6.2f} ms")
        else:
            print(f"  {d['kind']:7s} {d['rows']:>9} rows x{d['row_bytes']:>4}B "
                  f"(table {d['table_rows']:>9}) -> {d['ns'] / 1e6:6.2f} ms")
    total = sum(d["ns"] for d in ops) / 1e6
    print(f"  row total {total:.2f} ms over {len(ops)} ops")

    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print(f"  bytes accessed: {float(ca.get('bytes accessed', 0)) / 1e9:.2f} "
          f"GB -> {float(ca.get('bytes accessed', 0)) / 819e6:.2f} ms at "
          f"819 GB/s")

    # biggest buffers by shape among fusion outputs
    import re

    sizes = {}
    for m in re.finditer(r"(\w+)\[([\d,]+)\]", text):
        dt = {"f32": 4, "s32": 4, "u32": 4, "f16": 2, "bf16": 2,
              "u8": 1, "pred": 1}.get(m.group(1))
        if not dt:
            continue
        n = 1
        for d in m.group(2).split(","):
            n *= int(d)
        key = f"{m.group(1)}[{m.group(2)}]"
        sizes[key] = dt * n
    print("== largest tensor shapes in HLO ==")
    for k, v in sorted(sizes.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {v / 1e6:8.1f} MB  {k}")


if __name__ == "__main__":
    main()
