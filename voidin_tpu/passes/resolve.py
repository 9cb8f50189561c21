"""Visibility-buffer -> G-buffer resolve.

The reference's raster fragment shader (shaders/visibility.wgsl:66-97)
interpolates normal/tangent/uv per fragment, samples the normal map, applies
the alpha cutoff, and writes the packed G-buffer. Our rasterizer emits only
(triangle id, depth); this pass recomputes perspective-correct barycentrics
per *winning* pixel and evaluates the same attribute math densely over the
image — each G-buffer pixel is touched exactly once.

Contract reproduced exactly:
* normal matrix is the upper-left 3x3 of the instance transform (not the
  inverse transpose) — visibility.wgsl:43-46;
* bitangent = cross(normal, tangent) * tangent.w — visibility.wgsl:47;
* normal map applied iff material.normal != 0 (WHITE) — visibility.wgsl:83-89;
* alpha cutoff: base_color.w < 0.5 || albedo.a < 0.5 discards
  (visibility.wgsl:79-81) — here the pixel reverts to background;
* G-buffer = (octahedral normal u32, pack2x16float uv, material id, depth).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import encoding
from ..scene.scene import SceneData
from ..scene.texture import sample_trilinear
from .gbuffer import GBuffer, VisBuffer


def _normalize(v, eps=1e-20):
    return v / jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), eps))


def resolve_gbuffer(
    scene: SceneData, vis: VisBuffer, camera, config
) -> GBuffer:
    H, W = vis.depth.shape
    tid = jnp.maximum(vis.tri_id, 0)
    hit = vis.tri_id >= 0

    inst = vis.instance[tid]  # (H, W)
    idx_start = vis.idx_start[tid]
    meshes = scene.meshes
    mesh = scene.instances.mesh_id[inst]
    vofs = meshes.vertex_offset[mesh]
    vid = meshes.indices[idx_start[..., None] + jnp.arange(3)] + vofs[..., None]

    # Perspective-correct barycentrics via 2D homogeneous coordinates
    # (Olano & Greer style): for NDC pixel (x, y) and clip-space vertices
    # c_i, affine weights b satisfy sum b_i (c_i.x - x c_i.w) = 0 and
    # sum b_i (c_i.y - y c_i.w) = 0 => b ∝ cross(u, v). Works for triangles
    # crossing the near plane (no screen coords involved).
    x_ndc = ((jnp.arange(W, dtype=jnp.float32) + 0.5) / W * 2.0 - 1.0)[None, :]
    y_ndc = (1.0 - (jnp.arange(H, dtype=jnp.float32) + 0.5) / H * 2.0)[:, None]
    cl = vis.clip[tid]  # (H, W, 3, 4)
    u = cl[..., 0] - x_ndc[..., None] * cl[..., 3]  # (H, W, 3)
    v = cl[..., 1] - y_ndc[..., None] * cl[..., 3]
    b = jnp.cross(u, v)  # (H, W, 3)
    bsum = jnp.sum(b, axis=-1, keepdims=True)
    sign = jnp.where(bsum < 0, -1.0, 1.0)
    b = b * sign
    bsum = bsum * sign
    lam_p = b / jnp.maximum(bsum, 1e-20)

    def interp(attr):  # attr: (V, C) -> (H, W, C)
        vals = attr[vid]  # (H, W, 3, C)
        return jnp.einsum("hwvc,hwv->hwc", vals, lam_p)

    normal_raw = interp(meshes.normals)
    tangent4 = meshes.tangents[vid]  # (H, W, 3, 4)
    tangent_raw = jnp.einsum("hwvc,hwv->hwc", tangent4[..., :3], lam_p)
    tangent_w = jnp.einsum("hwv,hwv->hw", tangent4[..., 3], lam_p)
    uv = interp(meshes.uvs)

    # Object -> world with the plain upper 3x3 (reference parity).
    basis = scene.instances.transform[inst][..., :3, :3]  # (H, W, 3, 3)
    n_ws = jnp.einsum("hwij,hwj->hwi", basis, normal_raw)
    t_ws = jnp.einsum("hwij,hwj->hwi", basis, tangent_raw)
    b_ws = jnp.cross(n_ws, t_ws) * tangent_w[..., None]

    material_id = scene.instances.material_id[inst]  # (H, W)
    mat_normal = scene.materials.normal[material_id]
    mat_albedo = scene.materials.albedo[material_id]
    base_color_a = scene.materials.base_color[material_id][..., 3]

    # Mip LOD from screen-space uv derivatives (finite differences stand in
    # for the raster's implicit quad derivatives).
    tex_w = scene.textures.size[mat_albedo][..., 0].astype(jnp.float32)
    tex_h = scene.textures.size[mat_albedo][..., 1].astype(jnp.float32)
    du = jnp.diff(uv, axis=1, append=uv[:, -1:, :])
    dv = jnp.diff(uv, axis=0, append=uv[-1:, :, :])
    # guard against seams: derivative magnitude clamped
    rho = jnp.maximum(
        jnp.abs(du[..., 0]) * tex_w + jnp.abs(du[..., 1]) * tex_h,
        jnp.abs(dv[..., 0]) * tex_w + jnp.abs(dv[..., 1]) * tex_h,
    )
    lod = jnp.where(rho > 1e-8, jnp.log2(jnp.maximum(rho, 1e-8)), 0.0)
    lod = jnp.clip(lod, 0.0, 16.0)

    albedo = sample_trilinear(scene.textures, mat_albedo, uv, lod)
    normal_tex = sample_trilinear(scene.textures, mat_normal, uv, lod)

    # Shading normal: normal map via per-pixel TBN when assigned.
    n_geo = _normalize(n_ws)
    tbn_t = _normalize(t_ws)
    tbn_b = _normalize(b_ws)
    mapped = (
        tbn_t * (normal_tex[..., 0:1] * 2.0 - 1.0)
        + tbn_b * (normal_tex[..., 1:2] * 2.0 - 1.0)
        + n_geo * (normal_tex[..., 2:3] * 2.0 - 1.0)
    )
    use_map = (mat_normal != 0)[..., None]
    normal = _normalize(jnp.where(use_map, mapped, n_geo))

    # Alpha cutoff (visibility.wgsl:79-81).
    cut = (base_color_a < 0.5) | (albedo[..., 3] < 0.5)
    keep = hit & ~cut

    packed_n = encoding.encode_octahedral_32(normal)
    packed_uv = encoding.pack2x16float(uv)
    normal_uv = jnp.stack(
        [
            jnp.where(keep, packed_n, jnp.uint32(0)),
            jnp.where(keep, packed_uv, jnp.uint32(0)),
        ],
        axis=-1,
    )
    return GBuffer(
        normal_uv=normal_uv,
        material=jnp.where(keep, material_id, 0).astype(jnp.int32),
        depth=jnp.where(keep, vis.depth, 0.0),
    )
