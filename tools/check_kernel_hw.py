#!/usr/bin/env python
"""Compiled-vs-interpret equivalence check for the fine-raster Pallas
kernel on REAL TPU hardware (Mosaic can miscompile patterns that interpret
mode executes correctly — e.g. an (8, CHUNK) x (8, 1) single-column
dot_general silently corrupted triangle ids while depths stayed exact).

Run on a TPU host after kernel changes:  python -u tools/check_kernel_hw.py
Exits non-zero on any divergence.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_case(seed=0, n=512, tiles_x=4, n_tiles=8):
    import numpy as np

    rng = np.random.default_rng(seed)
    rec = np.zeros((n, 16), np.float32)
    for i in range(n):
        x0, y0 = rng.uniform(0, tiles_x * 16), rng.uniform(0, (n_tiles // tiles_x) * 8)
        xs = x0 + rng.uniform(-6, 6, 3)
        ys = y0 + rng.uniform(-6, 6, 3)
        area = (ys[1] - ys[0]) * (xs[2] - xs[1]) - (xs[1] - xs[0]) * (ys[2] - ys[1])
        if area < 0:
            xs[1], xs[2] = xs[2], xs[1]
            ys[1], ys[2] = ys[2], ys[1]
        z = rng.uniform(0.1, 0.9, 3)
        anchor = np.floor(xs.min()), np.floor(ys.min())
        rx, ry = xs - anchor[0], ys - anchor[1]
        dx = np.roll(rx, -1) - rx
        dy = np.roll(ry, -1) - ry
        b = ry * dx - rx * dy
        area2 = dy[0] * dx[1] - dx[0] * dy[1]
        inv = 1.0 / area2
        zrot = z[[2, 0, 1]]
        rec[i, 0:9] = np.stack([dy, -dx, b], axis=0).T.reshape(-1)
        rec[i, 9] = (dy * zrot).sum() * inv
        rec[i, 10] = (-dx * zrot).sum() * inv
        rec[i, 11] = (b * zrot).sum() * inv
        rec[i, 12] = i
        rec[i, 13], rec[i, 14] = anchor
    ty = (n_tiles // tiles_x) * 8
    tile_of = (
        np.clip(rec[:, 14], 0, ty - 1).astype(int) // 8
    ) * tiles_x + np.clip(rec[:, 13], 0, tiles_x * 16 - 1).astype(int) // 16
    order = np.argsort(tile_of, kind="stable")
    rec_s = rec[order]
    tile_s = tile_of[order]
    tx0 = (tile_s % tiles_x) * 16.0
    ty0 = (tile_s // tiles_x) * 8.0
    for q in range(4):
        rec_s[:, 3 * q + 2] += rec_s[:, 3 * q] * (tx0 - rec_s[:, 13]) + rec_s[
            :, 3 * q + 1
        ] * (ty0 - rec_s[:, 14])
    starts = np.searchsorted(tile_s, np.arange(n_tiles)).astype(np.int32)
    counts = (
        np.searchsorted(tile_s, np.arange(1, n_tiles + 1)) - starts
    ).astype(np.int32)
    pad = 256 + (128 - n % 128) % 128 + 128
    rec_pad = np.concatenate([rec_s, np.zeros((pad, 16), np.float32)])
    return rec_pad, starts, counts


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from voidin_tpu.ops import fine_raster as fr

    if jax.default_backend() == "cpu":
        print("no TPU backend — nothing to cross-check")
        return 0
    rec, starts, counts = build_case()
    args = (jnp.asarray(rec), jnp.asarray(starts), jnp.asarray(counts))
    bad = 0
    # winner-payload contraction operand: 16-bit integer halves (the
    # production encoding, raster._pair_payload_stream) built from
    # ADVERSARIAL u32 bit patterns (incl. would-be NaN/Inf/subnormal
    # f32 encodings) + arbitrary finite floats in the native columns
    rng0 = np.random.default_rng(3)
    raw = rng0.integers(0, 1 << 32, (rec.shape[0], 9), dtype=np.uint64)
    raw = raw.astype(np.uint32)
    pay = np.concatenate(
        [
            (rng0.standard_normal((rec.shape[0], 15))
             * 10.0 ** rng0.integers(-8, 8, (rec.shape[0], 15))
             ).astype(np.float32),
            (raw & 0xFFFF).astype(np.float32),
            (raw >> 16).astype(np.float32),
            np.zeros((rec.shape[0], 7), np.float32),
        ],
        axis=-1,
    )
    for track2 in (False, True):
        for payload in (None, jnp.asarray(pay)):
            hw = fr.fine_raster_pairs(
                *args, tiles_x=4, tiles_per_step=8, interpret=False,
                track2=track2, payload=payload,
            )
            it = fr.fine_raster_pairs(
                *args, tiles_x=4, tiles_per_step=8, interpret=True,
                track2=track2, payload=payload,
            )
            for k, (a, b) in enumerate(zip(hw, it)):
                a, b = np.asarray(a), np.asarray(b)
                eq = (a == b).mean()
                print(f"track2={track2} pay={payload is not None} "
                      f"out{k}: exact-equal {eq:.4f}")
                bad += eq < 1.0
    # LUT-fetch kernel (ops/lut_fetch.py): compiled vs interpret across
    # the channel-padding paths (C=1 -> 2, C=5 -> 6) and bf16.
    from voidin_tpu.ops.lut_fetch import lut_fetch_pallas

    rng = np.random.default_rng(7)
    for n_chan, bf16 in ((1, False), (5, False), (5, True)):
        tables = [
            jnp.asarray(rng.standard_normal((64, 64)), jnp.float32)
            for _ in range(n_chan)
        ]
        uv = jnp.asarray(rng.uniform(0.02, 0.98, (1500, 2)), jnp.float32)
        hw = lut_fetch_pallas(tables, uv, interpret=False, bf16=bf16)
        it = lut_fetch_pallas(tables, uv, interpret=True, bf16=bf16)
        for k, (a, b) in enumerate(zip(hw, it)):
            a, b = np.asarray(a), np.asarray(b)
            if bf16:
                # MXU bf16 accumulation legitimately rounds differently
                # from the CPU emulation — gate on closeness, not bits
                d = np.abs(a - b).max()
                print(f"lut C={n_chan} bf16 chan{k}: max diff {d:.2e}")
                bad += d > 3e-2
            else:
                eq = (a == b).mean()
                print(f"lut C={n_chan} f32 chan{k}: exact-equal {eq:.4f}")
                bad += eq < 1.0

    # Slot-resolve one-hot select (resolve._slot_fetch_channels): the MXU
    # f32 matmul at Precision.HIGHEST must select values EXACTLY (products
    # by 0/1 + zero accumulation). Verify against the gather it replaces.
    onehot_vals = jnp.asarray(
        rng.standard_normal((1024, 16, 60)) * 10.0 ** rng.integers(
            -6, 6, (1024, 16, 60)
        ),
        jnp.float32,
    )
    sel = jnp.asarray(rng.integers(0, 16, (1024, 128)), jnp.int32)
    oh = (sel[..., None] == jnp.arange(16)).astype(jnp.float32)

    @jax.jit
    def select_mxu(oh_, vals_):
        return jnp.einsum(
            "bpk,bkc->bpc", oh_, vals_,
            precision=jax.lax.Precision.HIGHEST,
        )

    got = np.asarray(select_mxu(oh, onehot_vals))
    want = np.asarray(
        jnp.take_along_axis(onehot_vals, sel[..., None], axis=1)
    )
    eq = (got == want).mean()
    print(f"slot-resolve one-hot MXU select: exact-equal {eq:.4f}")
    bad += eq < 1.0

    if bad:
        print("DIVERGENCE between compiled and interpret kernels")
        return 1
    print("compiled kernels match interpret mode bit-for-bit")
    return 0


if __name__ == "__main__":
    sys.exit(main())
