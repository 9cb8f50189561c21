"""Tile-binned software visibility-buffer rasterizer.

This replaces the reference's hardware raster path
(multi_draw_indexed_indirect + visibility.wgsl) with a TPU-first design.
There is no rasterizer on a TPU, so the pass is re-architected around dense
vector math instead of per-primitive hardware state:

  1. **setup** — expand the compact draw list into a capacity-padded stream
     of triangle work items (prefix-sum + searchsorted, the standard
     variable-rate expansion under jit), gather + transform vertices with
     one batched matmul, project to screen, back-face/near-plane cull.
  2. **bin** — compute each triangle's tile bbox, expand to (triangle, tile)
     pairs, sort pairs by tile (lax.sort), and scatter into fixed-capacity
     per-tile lists with *unique* destinations (tile*K + rank) so the
     scatter is embarrassingly parallel.
  3. **fine raster** — for every (TILE_H x TILE_W) tile evaluate edge
     functions for chunks of its binned triangles over all tile pixels at
     once (pure VPU tensor ops, no divergence), keeping a running
     (depth, id) winner — reverse-Z max depth test, matching the
     reference's Greater depth compare (pass/visibility.rs:127-133).
  4. **resolve** (gbuffer.py consumer) — per-pixel perspective-correct
     barycentrics from the winning triangle's setup, then attribute fetch.
     This is the "visibility buffer" deferred-attribute trick: the raster
     loop touches only positions; fat attributes are fetched exactly once
     per pixel.

Depth semantics: ndc.z (= znear / view_depth with the infinite reverse-Z
projection) is affine in screen space, so the depth test interpolates it
with screen-space barycentrics, like hardware.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..scene.instance import InstanceData
from ..scene.mesh import MeshPoolData
from .cull import DrawList
from .gbuffer import VisBuffer

NEAR_EPS = 1e-8


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    width: int = 1920
    height: int = 1080
    tile_h: int = 8
    tile_w: int = 128
    tri_capacity: int = 1 << 20  # max live triangle work items per frame
    pair_capacity: int = 1 << 21  # max (triangle, tile) pairs
    tile_tri_capacity: int = 256  # max triangles rasterized per tile
    chunk: int = 8  # triangles processed per tile per loop step

    @property
    def tiles_x(self) -> int:
        return -(-self.width // self.tile_w)

    @property
    def tiles_y(self) -> int:
        return -(-self.height // self.tile_h)

    @property
    def n_tiles(self) -> int:
        return self.tiles_x * self.tiles_y

    @property
    def padded_width(self) -> int:
        return self.tiles_x * self.tile_w

    @property
    def padded_height(self) -> int:
        return self.tiles_y * self.tile_h


# ---------------------------------------------------------------------------
# 1. Triangle setup
# ---------------------------------------------------------------------------


# Near clipping: Vulkan clips 0 <= z_clip <= w_clip. With the infinite
# reverse-Z projection z_clip = znear (constant), so the z <= w plane IS the
# near plane (view depth >= znear, ndc.z <= 1); z >= 0 never clips. We clip
# against the signed distance s = w - z.


def _project(clip, config: RasterConfig):
    """Clip-space (,...,4) -> pixel coords + ndc z (y down, uv.wgsl cs_to_uv)."""
    w = clip[..., 3]
    inv_w = 1.0 / jnp.where(jnp.abs(w) > NEAR_EPS, w, NEAR_EPS)
    ndc = clip[..., :3] * inv_w[..., None]
    sx = (ndc[..., 0] * 0.5 + 0.5) * config.width
    sy = (0.5 - ndc[..., 1] * 0.5) * config.height
    return sx, sy, ndc[..., 2]


def _front_face(sx, sy):
    """wgpu culls clockwise given front_face=Ccw (pass/visibility.rs:124).
    CCW in y-up NDC is negative signed area in y-down pixel space."""
    area2 = (sx[..., 1] - sx[..., 0]) * (sy[..., 2] - sy[..., 0]) - (
        sy[..., 1] - sy[..., 0]
    ) * (sx[..., 2] - sx[..., 0])
    return area2 < 0.0


def triangle_setup(
    meshes: MeshPoolData,
    instances: InstanceData,
    draws: DrawList,
    camera,
    config: RasterConfig,
):
    """Produce per-work-item triangle screen data (SoA, capacity padded).

    Triangles crossing the near plane are clipped against w = W_CLIP
    (Sutherland-Hodgman, <= 2 output triangles); second outputs are
    compacted into the tail of the same capacity array. The *original*
    clip-space coordinates are kept per work item for perspective-correct
    attribute resolve via homogeneous barycentrics.
    """
    cap = config.tri_capacity
    inst_ids = draws.instance  # (N,) -1 padded
    safe_inst = jnp.maximum(inst_ids, 0)
    mesh_ids = instances.mesh_id[safe_inst]
    n_tris = jnp.where(
        jnp.arange(inst_ids.shape[0]) < draws.count,
        meshes.index_count[mesh_ids] // 3,
        0,
    )  # (N,)
    cum = jnp.cumsum(n_tris)
    tri_total = jnp.minimum(cum[-1], cap)

    e = jnp.arange(cap, dtype=jnp.int32)
    draw_slot = jnp.searchsorted(cum, e, side="right").astype(jnp.int32)  # (T,)
    draw_slot = jnp.minimum(draw_slot, inst_ids.shape[0] - 1)
    prev = jnp.where(draw_slot > 0, cum[jnp.maximum(draw_slot - 1, 0)], 0)
    local_tri = e - prev  # triangle index within the mesh
    valid = e < tri_total

    inst = jnp.where(valid, inst_ids[draw_slot], 0)
    mesh = instances.mesh_id[inst]
    base_index = meshes.base_index[mesh]
    vofs = meshes.vertex_offset[mesh]
    idx_start = base_index + 3 * local_tri

    # Gather the 3 vertex positions (object space).
    vid = meshes.indices[idx_start[:, None] + jnp.arange(3)[None, :]] + vofs[:, None]
    pos = meshes.positions[vid]  # (T, 3, 3)

    # world -> clip: one (4,4) @ per-instance (4,4) then batched transform.
    view_proj = jnp.asarray(camera.projection) @ jnp.asarray(camera.view)
    mvp = jnp.einsum("ij,njk->nik", view_proj, instances.transform)  # (N_inst,4,4)
    m = mvp[inst]  # (T, 4, 4)
    clip = (
        jnp.einsum("tij,tvj->tvi", m[:, :, :3], pos) + m[:, None, :, 3]
    )  # (T, 3, 4)

    # --- near-plane clipping (s = w - z > 0) ----------------------------
    s_dist = clip[..., 3] - clip[..., 2]
    is_in = s_dist > 0.0  # (T, 3)
    n_in = jnp.sum(is_in.astype(jnp.int32), axis=-1)

    # Rotate vertices so the pattern is canonical while preserving winding:
    # n_in == 1 -> inside vertex at slot 0; n_in == 2 -> outside at slot 2.
    r1 = jnp.argmax(is_in, axis=-1)
    r2 = (jnp.argmax(~is_in, axis=-1) + 1) % 3
    r = jnp.where(n_in == 1, r1, jnp.where(n_in == 2, r2, 0)).astype(jnp.int32)
    rot_idx = (r[:, None] + jnp.arange(3)[None, :]) % 3  # (T, 3)
    rclip = jnp.take_along_axis(clip, rot_idx[..., None], axis=1)  # (T, 3, 4)
    a, b, c = rclip[:, 0], rclip[:, 1], rclip[:, 2]

    def lerp_to_plane(p, q):
        sp = p[..., 3] - p[..., 2]
        sq = q[..., 3] - q[..., 2]
        t = sp / jnp.where(jnp.abs(sp - sq) > 1e-20, sp - sq, 1e-20)
        return p + (q - p) * t[..., None]

    i_ab = lerp_to_plane(a, b)
    i_ac = lerp_to_plane(a, c)
    i_bc = lerp_to_plane(b, c)

    # First output triangle per case (0 in -> dead, 3 in -> original).
    tri1 = jnp.where(
        (n_in == 3)[:, None, None],
        clip,
        jnp.where(
            (n_in == 2)[:, None, None],
            jnp.stack([a, b, i_bc], axis=1),
            jnp.stack([a, i_ab, i_ac], axis=1),
        ),
    )
    # Second output (only when n_in == 2): (a, i_bc, i_ac).
    tri2 = jnp.stack([a, i_bc, i_ac], axis=1)

    sx1, sy1, z1 = _project(tri1, config)
    sx2, sy2, z2 = _project(tri2, config)
    alive1 = valid & (n_in >= 1) & _front_face(sx1, sy1)
    needs2 = valid & (n_in == 2)
    alive2 = needs2 & _front_face(sx2, sy2)

    # Compact second triangles into the tail of the capacity arrays.
    extra_rank = jnp.cumsum(needs2.astype(jnp.int32)) - 1
    dest = jnp.where(needs2, tri_total + extra_rank, cap)
    in_cap = dest < cap
    overflow = jnp.sum((needs2 & ~in_cap).astype(jnp.int32))
    dest = jnp.where(in_cap, dest, cap + e)  # unique OOB slots, dropped

    def scatter(base_arr, extra_vals):
        return base_arr.at[dest].set(extra_vals, mode="drop", unique_indices=True)

    sx = scatter(sx1, sx2)
    sy = scatter(sy1, sy2)
    z = scatter(z1, z2)
    alive = scatter(alive1, alive2)
    inst_out = scatter(inst.astype(jnp.int32), inst.astype(jnp.int32))
    idx_out = scatter(idx_start.astype(jnp.int32), idx_start.astype(jnp.int32))
    clip_out = scatter(clip, clip)  # resolve uses ORIGINAL clip coords

    work_total = jnp.minimum(tri_total + jnp.sum(needs2.astype(jnp.int32)), cap)
    return dict(
        sx=sx,
        sy=sy,
        z=z,
        clip=clip_out,
        instance=inst_out,
        idx_start=idx_out,
        alive=alive,
        tri_total=work_total,
        setup_overflow=overflow,
    )


# ---------------------------------------------------------------------------
# 2. Binning
# ---------------------------------------------------------------------------


def bin_triangles(setup: dict, config: RasterConfig):
    """(triangle, tile) pair expansion -> per-tile fixed-capacity lists."""
    TX, TY = config.tiles_x, config.tiles_y
    NT = config.n_tiles
    K = config.tile_tri_capacity
    E = config.pair_capacity

    sx, sy, alive = setup["sx"], setup["sy"], setup["alive"]
    x0 = jnp.floor(jnp.min(sx, axis=-1))
    x1 = jnp.ceil(jnp.max(sx, axis=-1))
    y0 = jnp.floor(jnp.min(sy, axis=-1))
    y1 = jnp.ceil(jnp.max(sy, axis=-1))
    on_screen = (x1 >= 0) & (y1 >= 0) & (x0 < config.width) & (y0 < config.height)
    alive = alive & on_screen

    tx0 = jnp.clip(x0.astype(jnp.int32) // config.tile_w, 0, TX - 1)
    tx1 = jnp.clip(x1.astype(jnp.int32) // config.tile_w, 0, TX - 1)
    ty0 = jnp.clip(y0.astype(jnp.int32) // config.tile_h, 0, TY - 1)
    ty1 = jnp.clip(y1.astype(jnp.int32) // config.tile_h, 0, TY - 1)
    bw = tx1 - tx0 + 1
    bh = ty1 - ty0 + 1
    n_pairs = jnp.where(alive, bw * bh, 0)  # (T,)

    cum = jnp.cumsum(n_pairs)
    total_pairs = jnp.minimum(cum[-1], E)
    overflow = jnp.maximum(cum[-1] - E, 0)

    e = jnp.arange(E, dtype=jnp.int32)
    tri = jnp.searchsorted(cum, e, side="right").astype(jnp.int32)
    tri = jnp.minimum(tri, n_pairs.shape[0] - 1)
    prev = jnp.where(tri > 0, cum[jnp.maximum(tri - 1, 0)], 0)
    local = e - prev
    pair_valid = e < total_pairs

    tile = (ty0[tri] + local // bw[tri]) * TX + (tx0[tri] + local % bw[tri])
    tile = jnp.where(pair_valid, tile, NT)  # invalid pairs sort to the end

    # Sort pairs by tile; rank within tile gives a unique scatter slot.
    tile_sorted, tri_sorted = jax.lax.sort_key_val(tile, tri)
    starts = jnp.searchsorted(tile_sorted, jnp.arange(NT, dtype=jnp.int32)).astype(
        jnp.int32
    )
    rank = jnp.arange(E, dtype=jnp.int32) - starts[jnp.minimum(tile_sorted, NT - 1)]
    in_cap = (rank < K) & (tile_sorted < NT)
    overflow = overflow + jnp.sum(jnp.where((rank >= K) & (tile_sorted < NT), 1, 0))

    # Out-of-cap writes land past the end (dropped); offset by e to keep the
    # unique_indices promise airtight.
    dest = jnp.where(in_cap, tile_sorted * K + rank, NT * K + e)
    tile_tris = jnp.full((NT * K,), -1, jnp.int32)
    tile_tris = tile_tris.at[dest].set(tri_sorted, mode="drop", unique_indices=True)
    return tile_tris.reshape(NT, K), overflow


# ---------------------------------------------------------------------------
# 3. Fine raster
# ---------------------------------------------------------------------------


def _tile_pixel_coords(config: RasterConfig):
    """Global pixel-center coordinates per tile: (NT, PX) x and y."""
    TX = config.tiles_x
    th, tw = config.tile_h, config.tile_w
    t = jnp.arange(config.n_tiles, dtype=jnp.int32)
    tile_x0 = (t % TX) * tw
    tile_y0 = (t // TX) * th
    py, px = jnp.meshgrid(
        jnp.arange(th, dtype=jnp.float32), jnp.arange(tw, dtype=jnp.float32),
        indexing="ij",
    )
    x = tile_x0[:, None].astype(jnp.float32) + (px.reshape(-1)[None, :] + 0.5)
    y = tile_y0[:, None].astype(jnp.float32) + (py.reshape(-1)[None, :] + 0.5)
    return x, y  # (NT, PX)


def fine_raster(setup: dict, tile_tris: jnp.ndarray, config: RasterConfig):
    """Per-tile chunked depth/id competition. Returns (H', W') id + depth."""
    NT, K = tile_tris.shape
    PX = config.tile_h * config.tile_w
    C = config.chunk

    sx, sy, z = setup["sx"], setup["sy"], setup["z"]
    px, py = _tile_pixel_coords(config)  # (NT, PX)

    def body(i, carry):
        depth_buf, id_buf = carry  # (NT, PX)
        ids = jax.lax.dynamic_slice(tile_tris, (0, i * C), (NT, C))  # (NT, C)
        ok = ids >= 0
        safe = jnp.maximum(ids, 0)
        tsx = sx[safe]  # (NT, C, 3)
        tsy = sy[safe]
        tz = z[safe]

        # Edge functions at pixel centers: e_k = cross(p - v_k, v_{k+1} - v_k).
        # Front faces are negatively oriented in y-down pixel space, which
        # makes e_k >= 0 inside; inclusive to avoid cracks on shared edges.
        dx = px[:, None, :, None] - tsx[:, :, None, :]  # (NT, C, PX, 3)
        dy = py[:, None, :, None] - tsy[:, :, None, :]
        ex = tsx[:, :, None, jnp.array([1, 2, 0])] - tsx[:, :, None, :]
        ey = tsy[:, :, None, jnp.array([1, 2, 0])] - tsy[:, :, None, :]
        e = dx * ey - dy * ex  # (NT, C, PX, 3)
        inside = jnp.all(e >= 0.0, axis=-1)  # (NT, C, PX)

        # Screen-space barycentrics for depth (affine in screen space).
        # lambda_k proportional to the edge function opposite vertex k;
        # their sum is |2*area|.
        area2 = e[..., 0] + e[..., 1] + e[..., 2]
        lam0 = e[..., 1]  # edge v1->v2 opposite v0
        lam1 = e[..., 2]
        lam2 = e[..., 0]
        inv_area = 1.0 / jnp.where(jnp.abs(area2) > 1e-20, area2, 1e-20)
        depth = (
            lam0 * tz[:, :, None, 0] + lam1 * tz[:, :, None, 1] + lam2 * tz[:, :, None, 2]
        ) * inv_area  # (NT, C, PX)

        cand = jnp.where(inside & ok[:, :, None], depth, -1.0)
        best = jnp.max(cand, axis=1)  # (NT, PX)
        best_i = jnp.argmax(cand, axis=1)  # (NT, PX)
        best_id = jnp.take_along_axis(ids, best_i, axis=1)

        take = best > depth_buf
        return jnp.where(take, best, depth_buf), jnp.where(take, best_id, id_buf)

    depth0 = jnp.zeros((NT, PX), jnp.float32)  # reverse-Z clear = 0 (far)
    id0 = jnp.full((NT, PX), -1, jnp.int32)
    depth_buf, id_buf = jax.lax.fori_loop(0, K // C, body, (depth0, id0))

    # Un-tile to (H', W').
    TY, TX = config.tiles_y, config.tiles_x
    th, tw = config.tile_h, config.tile_w

    def untile(a):
        return (
            a.reshape(TY, TX, th, tw).transpose(0, 2, 1, 3).reshape(TY * th, TX * tw)
        )

    return untile(id_buf), untile(depth_buf)


# ---------------------------------------------------------------------------
# Full pass
# ---------------------------------------------------------------------------


def rasterize(
    meshes: MeshPoolData,
    instances: InstanceData,
    draws: DrawList,
    camera,
    config: RasterConfig,
) -> VisBuffer:
    setup = triangle_setup(meshes, instances, draws, camera, config)
    tile_tris, overflow = bin_triangles(setup, config)
    tri_id, depth = fine_raster(setup, tile_tris, config)
    H, W = config.height, config.width
    return VisBuffer(
        tri_id=tri_id[:H, :W],
        depth=depth[:H, :W],
        clip=setup["clip"],
        instance=setup["instance"],
        idx_start=setup["idx_start"],
        overflow=overflow + setup["setup_overflow"],
    )
