"""Visibility-buffer -> G-buffer resolve.

The reference's raster fragment shader (shaders/visibility.wgsl:66-97)
interpolates normal/tangent/uv per fragment, samples the normal map, applies
the alpha cutoff, and writes the packed G-buffer. Our rasterizer emits only
(triangle id, depth); this pass recomputes perspective-correct barycentrics
per winning pixel and evaluates the same attribute math densely.

Gather budget (TPU gathers are ~4-6 ns/row): per pixel this pass issues
exactly 3 row-gathers — the packed resolve record (clip + ids, 48 B), ONE
packed corner-attribute row (uv f32 + octahedral normals/tangents, 48 B),
one fused instance+material record (basis + material fields, 64 B) — plus
the albedo texture tap (and the normal-map tap only when the scene has
normal maps).

Contract reproduced exactly:
* normal matrix = upper-left 3x3 of the instance transform (not inverse
  transpose) — visibility.wgsl:43-46;
* bitangent = cross(normal, tangent) * tangent.w — visibility.wgsl:47;
* normal map applied iff material.normal != 0 (WHITE) — visibility.wgsl:83-89;
* alpha cutoff: base_color.w < 0.5 || albedo.a < 0.5 -> background
  (visibility.wgsl:79-81);
* G-buffer = (octahedral normal u32, pack2x16float uv, material id, depth).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core import encoding, fastmath
from ..scene.scene import SceneData
from ..scene.texture import sample_trilinear
from .gbuffer import GBuffer, VisBuffer
from .shading import uv_lod


@struct.dataclass
class ResolveAux:
    """Per-pixel material fields the shading pass consumes, produced here so
    shading issues ZERO per-pixel gathers: the material row rides the fused
    instance record this pass gathers anyway (one 96 B row from a small
    table), and emissive/metallic-roughness are const-folded or sampled at
    the same quantized uv/lod the reference's shading FS would use
    (shading.wgsl:58-64 samples via the G-buffer's packed uv)."""

    albedo: jnp.ndarray  # (H, W, 4) filtered albedo (shading.wgsl:58)
    emissive: jnp.ndarray  # (H, W, 3)
    mr: jnp.ndarray  # (H, W, 4) metallic-roughness texel


def _normalize(v, eps=1e-20):
    return v / jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), eps))


def resolve_gbuffer(scene: SceneData, vis: VisBuffer, camera, config):
    """Resolve the winning candidate; with second-candidate tracking
    (RasterConfig.alpha_mask), pixels whose winner is alpha-cut fall back to
    the runner-up — reproducing visibility.wgsl:79-81 `discard`, where a cut
    fragment never writes depth and the triangle BEHIND it stays visible.
    One level of fallback: a cutout behind a cutout (both cut at the same
    pixel) resolves to background; deeper stacking would need k > 2
    candidates. Returns (GBuffer, ResolveAux)."""
    if vis.tri_id2 is not None:
        _, _, cut1 = _resolve_once(
            scene, vis, vis.tri_id, vis.depth, camera, want_aux=False
        )
        fall = (vis.tri_id >= 0) & cut1
        tid = jnp.where(fall, vis.tri_id2, vis.tri_id)
        dep = jnp.where(fall, vis.depth2, vis.depth)
        gbuffer, aux, _ = _resolve_once(scene, vis, tid, dep, camera)
        return gbuffer, aux
    gbuffer, aux, _ = _resolve_once(
        scene, vis, vis.tri_id, vis.depth, camera
    )
    return gbuffer, aux


def _resolve_once(scene: SceneData, vis: VisBuffer, tri_id, depth, camera,
                  want_aux: bool = True):
    H, W = depth.shape
    tid = jnp.maximum(tri_id, 0)
    hit = tri_id >= 0

    # Gather 1: packed resolve record [x,y,w per vertex | inst | idx_start].
    rec = vis.resolve_rec[tid]  # (H, W, 12)
    cl = rec[..., :9].reshape(H, W, 3, 3)
    inst = rec[..., 9].astype(jnp.int32)
    tri_pool = (rec[..., 10] / 3.0).astype(jnp.int32)  # idx_start / 3

    # Perspective-correct barycentrics via 2D homogeneous coordinates:
    # b ∝ cross(u, v) with u_i = c_i.x - x*c_i.w, v_i = c_i.y - y*c_i.w.
    x_ndc = ((jnp.arange(W, dtype=jnp.float32) + 0.5) / W * 2.0 - 1.0)[None, :]
    y_ndc = (1.0 - (jnp.arange(H, dtype=jnp.float32) + 0.5) / H * 2.0)[:, None]
    u = cl[..., 0] - x_ndc[..., None] * cl[..., 2]  # (H, W, 3)
    v = cl[..., 1] - y_ndc[..., None] * cl[..., 2]
    b = jnp.cross(u, v)
    bsum = jnp.sum(b, axis=-1, keepdims=True)
    sign = jnp.where(bsum < 0, -1.0, 1.0)
    lam_p = b * sign / jnp.maximum(bsum * sign, 1e-20)  # (H, W, 3)

    # Gather 2: ONE packed corner-attribute row (48 B): exact f32 uv per
    # corner + octahedral corner normals/tangents (see MeshPoolData).
    pk = scene.meshes.tri_attr_packed[tri_pool]  # (H, W, 12) u32
    uv_c = jax.lax.bitcast_convert_type(
        pk[..., 0:6], jnp.float32
    ).reshape(H, W, 3, 2)
    n_c = encoding.decode_octahedral_32(pk[..., 6:9])  # (H, W, 3, 3)
    t_enc = pk[..., 9:12]
    t_sign = 1.0 - 2.0 * (t_enc & jnp.uint32(1)).astype(jnp.float32)
    t_c = encoding.decode_octahedral_32(t_enc)  # (H, W, 3, 3)
    normal_raw = jnp.sum(n_c * lam_p[..., None], axis=-2)
    tangent_raw = jnp.sum(t_c * lam_p[..., None], axis=-2)
    tangent_w = jnp.sum(t_sign * lam_p, axis=-1)
    uv = jnp.sum(uv_c * lam_p[..., None], axis=-2)

    # Gather 3: ONE fused per-instance record (transform basis + the FULL
    # material row), built densely from the live pools each frame. Folding
    # every material field the frame needs into the instance row makes this
    # the frame's only material fetch: the shading pass then runs with zero
    # per-pixel gathers. 24 f32 = 96 B rows from a small (N-instance) table
    # stay in the flat-cost gather regime (tools/microbench_gather.py).
    n_inst = scene.instances.count
    mats = scene.materials
    mid = scene.instances.material_id  # (N,)
    albedo_sz = scene.textures.size[mats.albedo[mid]].astype(jnp.float32)
    inst_rec = jnp.concatenate(
        [
            scene.instances.transform[:, :3, :3].reshape(n_inst, 9),
            mid.astype(jnp.float32)[:, None],
            mats.albedo[mid].astype(jnp.float32)[:, None],
            mats.normal[mid].astype(jnp.float32)[:, None],
            mats.base_color[mid, 3][:, None],
            mats.emissive[mid].astype(jnp.float32)[:, None],
            mats.metallic_roughness[mid].astype(jnp.float32)[:, None],
            albedo_sz,  # (N, 2) albedo texture extent (lod)
            mats.emissive_rgba[mid, :3],  # const-folded 1x1 emissive
            mats.mr_rgba[mid],  # const-folded 1x1 metallic-roughness
        ],
        axis=-1,
    )  # (N, 24)
    irec = inst_rec[inst]  # (H, W, 24)
    basis = irec[..., :9].reshape(H, W, 3, 3)
    material_id = irec[..., 9].astype(jnp.int32)
    mat_albedo = irec[..., 10].astype(jnp.int32)
    mat_normal = irec[..., 11].astype(jnp.int32)
    base_color_a = irec[..., 12]

    # Object -> world with the plain upper 3x3 (reference parity).
    n_ws = fastmath.mat3_vec(basis, normal_raw)
    t_ws = fastmath.mat3_vec(basis, tangent_raw)
    b_ws = jnp.cross(n_ws, t_ws) * tangent_w[..., None]

    # Mip LOD from screen-space uv derivatives (texture extent rides the
    # fused instance record — no per-pixel size gather).
    tex_w = irec[..., 15]
    tex_h = irec[..., 16]
    lod = uv_lod(uv, tex_w, tex_h)

    albedo = sample_trilinear(scene.textures, mat_albedo, uv, lod)

    n_geo = _normalize(n_ws)
    if getattr(scene, "no_normal_maps", False):
        # Static: no material has a normal map (normal == WHITE default,
        # visibility.wgsl:83) — skip the per-pixel fetch + TBN transform.
        normal = n_geo
    else:
        normal_tex = sample_trilinear(scene.textures, mat_normal, uv, lod)
        tbn_t = _normalize(t_ws)
        tbn_b = _normalize(b_ws)
        mapped = (
            tbn_t * (normal_tex[..., 0:1] * 2.0 - 1.0)
            + tbn_b * (normal_tex[..., 1:2] * 2.0 - 1.0)
            + n_geo * (normal_tex[..., 2:3] * 2.0 - 1.0)
        )
        use_map = (mat_normal != 0)[..., None]
        normal = _normalize(jnp.where(use_map, mapped, n_geo))

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
    gbuffer = GBuffer(
        normal_uv=normal_uv,
        material=jnp.where(keep, material_id, 0).astype(jnp.int32),
        depth=jnp.where(keep, depth, 0.0),
    )
    if not want_aux:
        return gbuffer, None, cut

    # Shading-pass material fields, computed here so shade() issues no
    # gathers. Semantics match what shade() previously derived from the
    # G-buffer exactly:
    # * albedo: sampled above at the exact uv/lod (shading.wgsl:58);
    #   background / cut pixels revert to the material-0 WHITE lookup the
    #   reference would produce from its cleared G-buffer.
    # * emissive / metallic-roughness: const-folded from the fused record
    #   when every such texture is 1x1; otherwise sampled at the QUANTIZED
    #   uv + its lod — the reference shading FS reads uv back from the
    #   packed G-buffer (pack2x16float roundtrip), so we reproduce that
    #   quantization rather than use the exact uv.
    aux_albedo = jnp.where(keep[..., None], albedo, jnp.ones_like(albedo))
    mat_emissive = irec[..., 13].astype(jnp.int32)
    mat_mr = irec[..., 14].astype(jnp.int32)
    if scene.emissive_const:
        emissive = jnp.where(
            keep[..., None], irec[..., 17:20],
            mats.emissive_rgba[0, :3],
        )
    else:
        uv_s = encoding.unpack2x16float(normal_uv[..., 1])  # 0 off-keep
        lod_s = uv_lod(uv_s, jnp.where(keep, tex_w, 1.0),
                       jnp.where(keep, tex_h, 1.0))
        emissive = sample_trilinear(
            scene.textures,
            jnp.where(keep, mat_emissive, mats.emissive[0]),
            uv_s, lod_s,
        )[..., :3]
    if scene.mr_const:
        mr = jnp.where(keep[..., None], irec[..., 20:24], mats.mr_rgba[0])
    else:
        uv_s = encoding.unpack2x16float(normal_uv[..., 1])
        lod_s = uv_lod(uv_s, jnp.where(keep, tex_w, 1.0),
                       jnp.where(keep, tex_h, 1.0))
        mr = sample_trilinear(
            scene.textures,
            jnp.where(keep, mat_mr, mats.metallic_roughness[0]),
            uv_s, lod_s,
        )
    aux = ResolveAux(albedo=aux_albedo, emissive=emissive, mr=mr)
    return gbuffer, aux, cut
