#!/usr/bin/env python
"""Speed-of-light audit: price every gather/scatter/sort in the north-star
frame with the MEASURED TPU cost model and print per-stage floors.

Where cost_audit.py reports XLA's own flops/bytes (fusion-dependent), this
tool walks the optimized HLO text of each stage prefix and counts the ops
that dominate on this platform (CLAUDE.md cost model):

  gather/scatter  ~2.5 ns/row (small table), ~6.6 ns/row (1M-row table,
                  rows <= 96 B), ~40 ns/row (128 B rows)
                  [tools/microbench_gather.py]
  sort            ~2 ms per million keys (x number of payload operands)
  dense HBM       bytes_accessed / 819 GB/s

The per-stage floor is max(row-rate cost, HBM cost): gathers are
row-rate-bound and cannot overlap their own table traffic. This is a
RANKING and a floor, not a prediction — TPU fusion differs from the CPU
lowering — but the gather/scatter/sort set survives fusion, so the row
counts are exact for the given config. Known over-counts: XLA:CPU lowers
STRIDED SLICES (x[::2]) and jnp.nonzero's compaction as gather/scatter
HLOs — on TPU those are dense strided copies / cumsum+select, far below
the priced row rate (e.g. the shade stage's four 518k-row "gathers" are
the half-res area-light ::2 slices).

Usage: python -u tools/sol_audit.py [--variant all_q] [--out SOL_AUDIT.json]
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DT_BYTES = {
    "f32": 4, "s32": 4, "u32": 4, "f16": 2, "bf16": 2, "s16": 2, "u16": 2,
    "f64": 8, "s64": 8, "u64": 8, "pred": 1, "s8": 1, "u8": 1,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape(tok):
    """'f32[518400,12]{1,0}' -> (dtype_bytes, [518400, 12])."""
    m = _SHAPE_RE.search(tok)
    if not m:
        return None
    dt = _DT_BYTES.get(m.group(1))
    dims = [int(d) for d in m.group(2).split(",") if d] if m.group(2) else []
    return dt, dims


def _row_cost_ns(rows, row_bytes, table_rows):
    """The measured gather tiers (tools/microbench_gather.py)."""
    if row_bytes > 96:
        per = 40.0
    elif table_rows <= (1 << 16):
        per = 2.5
    else:
        per = 6.6
    return rows * per


_DEF_RE = re.compile(r"^\s*(?:ROOT )?(%[\w.\-]+) = \(?(\w+\[[\d,]*\])")
_SET_RE = re.compile(r"\{([\d,]*)\}")


def _prod(xs):
    p = 1
    for x in xs:
        p *= x
    return p


def audit_hlo(text):
    """Count gather/scatter/sort ops in optimized HLO text.

    HLO operands are bare '%name' references — a sequential symbol table
    (last definition above the use wins; fusion-body parameters are
    defined with shapes too) resolves table/updates shapes. Row counts:
      gather:  rows = |output| / prod(slice_sizes); row = slice bytes
      scatter: rows = |updates| outside update_window_dims
      sort:    keys = |first operand|, x number of payload operands
    """
    sym = {}
    gathers, scatters, sorts = [], [], []
    for line in text.splitlines():
        md = _DEF_RE.match(line)
        if not md:
            continue
        name, shp_tok = md.groups()
        shp = _shape(shp_tok)
        if shp:
            sym[name] = shp

        def operands():
            mo = re.search(r"\w+\((.*?)\)[,)]?", line)
            if not mo:
                return []
            return [t.strip() for t in mo.group(1).split(",")]

        if re.search(r"= \w+\[[\d,]*\]\S* gather\(", line):
            out = shp
            ms = re.search(r"slice_sizes=\{([\d,]*)\}", line)
            if not out or out[0] is None or not ms:
                continue
            slice_sz = [int(x) for x in ms.group(1).split(",") if x]
            row_elems = max(_prod(slice_sz), 1)
            rows = _prod(out[1]) // row_elems
            row_bytes = row_elems * out[0]
            ops = operands()
            tab = sym.get(ops[0]) if ops else None
            table_rows = tab[1][0] if tab and tab[1] else 1 << 20
            gathers.append(
                dict(kind="gather", rows=rows, row_bytes=row_bytes,
                     table_rows=table_rows,
                     ns=_row_cost_ns(rows, row_bytes, table_rows))
            )
        elif re.search(r"= \w+\[[\d,]*\]\S* scatter\(", line):
            ops = operands()
            # scatter(operand..., indices, updates...): with one input the
            # updates operand is the last
            upd = sym.get(ops[-1]) if ops else None
            if not upd or upd[0] is None:
                continue
            mw = re.search(r"update_window_dims=\{([\d,]*)\}", line)
            win = ([int(x) for x in mw.group(1).split(",") if x]
                   if mw else [len(upd[1]) - 1])
            rows = _prod(
                [d for i, d in enumerate(upd[1]) if i not in win]
            )
            row_bytes = _prod(
                [d for i, d in enumerate(upd[1]) if i in win]
            ) * upd[0]
            scatters.append(
                dict(kind="scatter", rows=rows, row_bytes=row_bytes,
                     table_rows=0,
                     ns=_row_cost_ns(rows, row_bytes, 1 << 20))
            )
        elif " sort(" in line and "parameter" not in line:
            ops = operands()
            k = sym.get(ops[0]) if ops else None
            if not k:
                continue
            keys = _prod(k[1])
            n_ops = max(len(ops), 1)
            sorts.append(
                dict(kind="sort", keys=keys, operands=n_ops,
                     ns=keys * n_ops * 2000.0 / 1e6)
            )
    return gathers, scatters, sorts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="all_q",
                    help="bench.AB_VARIANTS key to audit")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--out", default=None)
    ap.add_argument("--config", type=int, default=0,
                    help="census a BASELINE preset scene instead of the "
                    "north-star world (pose, capacities and the preset's "
                    "camera; the taa row counts apply only if the preset "
                    "runs TAA)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
    import jax.numpy as jnp

    import voidin_tpu as vt
    from bench import AB_VARIANTS, build_world
    from voidin_tpu.framework.renderer import FrameState
    from voidin_tpu.passes import shading as shading_pass
    from voidin_tpu.passes.raster import RasterConfig

    ab_cfg, ab_bf16, ab_ascale, ab_lut = AB_VARIANTS[args.variant]
    shading_pass.LTC_LUT_BF16 = ab_bf16
    shading_pass.LTC_FETCH_PALLAS = "interpret" if ab_lut != "off" else "off"
    if args.config:
        from voidin_tpu.framework.presets import PRESETS

        p = PRESETS[args.config](args.width / args.height)
        world = p.world
        cfg = RasterConfig(
            width=args.width, height=args.height,
            tri_capacity=p.tri_capacity, pair_capacity=p.pair_capacity,
            tile_tri_capacity=p.tile_tri_capacity,
            quad_edge_capacity=p.quad_edge_capacity,
            taa_edge_capacity=p.taa_edge_capacity,
            tap_edge_capacity=p.tap_edge_capacity,
            interpret=True, **ab_cfg,
        )
        scene = world.device()
        uniform = p.camera.uniform()
    else:
        world, _moving = build_world()
        cfg = RasterConfig(
            width=args.width, height=args.height,
            tri_capacity=1 << 19, pair_capacity=1 << 19,
            tile_tri_capacity=128, quad_edge_capacity=1 << 15, taa_edge_capacity=1 << 12, tap_edge_capacity=1 << 15,
            interpret=True, **ab_cfg,
        )
        scene = world.device()
        uniform = vt.Camera(
            position=[0.0, 2.0, 30.0], yaw=0.0, pitch=-5.0,
            aspect=args.width / args.height,
        ).uniform()
    state = FrameState.initial(cfg.width, cfg.height).replace(
        history_valid=jnp.asarray(True)
    )

    from tools.stage_prefix import STAGES as stages
    from tools.stage_prefix import make_upto

    upto_f = make_upto(scene, uniform, cfg, state, ab_ascale=ab_ascale)

    HBM_GBPS = 819.0
    report = {}
    prev = dict(g_rows=0, s_rows=0, sort_keys=0, row_ns=0.0, hbm=0.0)
    print(f"variant={args.variant} {args.width}x{args.height}")
    print(f"{'stage':10s} {'Mg-rows':>8s} {'Ms-rows':>8s} {'Msort':>6s} "
          f"{'row ms':>7s} {'hbm ms':>7s} {'floor':>7s}")
    for s in stages:
        f = upto_f(s)
        compiled = jax.jit(f).lower(scene, state, 0.0).compile()
        text = compiled.as_text()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        g, sc, so = audit_hlo(text)
        cum = dict(
            g_rows=sum(x["rows"] for x in g),
            s_rows=sum(x["rows"] for x in sc),
            sort_keys=sum(x["keys"] for x in so),
            row_ns=sum(x["ns"] for x in g) + sum(x["ns"] for x in sc)
            + sum(x["ns"] for x in so),
            hbm=float(ca.get("bytes accessed", 0.0)) / HBM_GBPS / 1e6,
        )
        d = {k: cum[k] - prev[k] for k in cum}
        prev = cum
        floor = max(d["row_ns"] / 1e6, d["hbm"])
        report[s] = dict(
            gather_rows=int(d["g_rows"]), scatter_rows=int(d["s_rows"]),
            sort_keys=int(d["sort_keys"]),
            row_ms=round(d["row_ns"] / 1e6, 3), hbm_ms=round(d["hbm"], 3),
            floor_ms=round(floor, 3),
        )
        print(f"{s:10s} {d['g_rows'] / 1e6:8.3f} {d['s_rows'] / 1e6:8.3f} "
              f"{d['sort_keys'] / 1e6:6.2f} {d['row_ns'] / 1e6:7.2f} "
              f"{d['hbm']:7.2f} {floor:7.2f}")
    total = round(sum(r["floor_ms"] for r in report.values()), 2)
    print(f"total stage-floor sum ~= {total} ms "
          f"(north star 16.6 ms; floors don't overlap across stages)")

    if args.out:
        import json

        with open(args.out, "w") as fh:
            json.dump(
                dict(
                    variant=args.variant,
                    size=[args.width, args.height],
                    method="HLO gather/scatter/sort census priced with the "
                           "measured row-rate cost model + cost_analysis "
                           "HBM bytes at 819 GB/s; floor = max(rows, hbm) "
                           "per stage (CPU lowering: row counts exact, "
                           "fusion-dependent HBM indicative)",
                    stages=report,
                    total_floor_ms=total,
                ),
                fh, indent=2,
            )
            fh.write("\n")
        print("wrote", args.out)


if __name__ == "__main__":
    main()
