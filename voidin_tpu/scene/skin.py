"""Vertex skinning: linear blend skinning applied to pooled triangle data
inside the frame jit.

The reference renderer has NO skinning (its glTF importer ignores skins and
its only animation rotates instance transforms —
shaders/compute_update.wgsl:19-27); BASELINE config 4 asks for an animated
skinned glTF, so this pass EXCEEDS reference parity. TPU-first design: the
raster consumes de-indexed per-triangle corner tables (tri_pos /
tri_attr_packed), so skinning re-computes exactly those rows for the
skinned region and writes them back with one dynamic_update_slice each —
a dense (T, 3, 4)-gather + weighted matrix blend, no scatter.

Joint matrices (joint world transform @ inverseBind) are computed on the
HOST per frame (a few dozen 4x4s — hierarchy composition is sequential)
and passed into the jit as a (J, 4, 4) array, like the camera uniform.

Limitations (documented): the mesh's build-time BLAS is NOT refit, so
raytraced shadows against a skinned mesh use its rest pose; the per-mesh
AABB used by frustum culling IS refit from the skinned positions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core import encoding


@struct.dataclass
class SkinData:
    """One skinned mesh's rest-pose corner data + joint bindings, covering
    the pool triangle range [base_tri, base_tri + n_tri)."""

    rest_pos: jnp.ndarray  # (T, 3, 3) f32 corner positions (rest)
    rest_nrm: jnp.ndarray  # (T, 3, 3) f32
    rest_tan: jnp.ndarray  # (T, 3, 3) f32
    tan_w: jnp.ndarray  # (T, 3) f32 handedness
    uv: jnp.ndarray  # (T, 3, 2) f32
    joints: jnp.ndarray  # (T, 3, 4) i32 joint indices per corner
    weights: jnp.ndarray  # (T, 3, 4) f32 normalized weights
    base_tri: int = struct.field(pytree_node=False, default=0)
    mesh_id: int = struct.field(pytree_node=False, default=0)
    joint_offset: int = struct.field(pytree_node=False, default=0)
    n_joints: int = struct.field(pytree_node=False, default=0)


def pack_corner_attrs(uv, nrm, tan, tan_w):
    """(T, 3, *) corner attributes -> (T, 12) u32 rows matching
    MeshPool._tri_attrs layout: [uv f32 bits (6) | oct normals (3) |
    oct tangents with w-sign LSB (3)]."""
    t = uv.shape[0]
    uv_bits = jax.lax.bitcast_convert_type(
        uv.reshape(t, 6), jnp.uint32
    )
    n_oct = encoding.encode_octahedral_32(nrm)  # (T, 3)
    t_oct = encoding.encode_octahedral_32(tan)
    t_oct = (t_oct & jnp.uint32(0xFFFFFFFE)) | (tan_w < 0.0).astype(jnp.uint32)
    return jnp.concatenate([uv_bits, n_oct, t_oct], axis=-1)


def apply_skin(meshes, skin: SkinData, joint_mats: jnp.ndarray):
    """Skin one mesh region and write it back into the pool tables.

    joint_mats: (J_total, 4, 4) f32 — world-joint @ inverseBind matrices
    for ALL skins concatenated; this skin uses rows
    [joint_offset, joint_offset + n_joints).
    """
    jm = jax.lax.dynamic_slice(
        joint_mats, (skin.joint_offset, 0, 0), (skin.n_joints, 4, 4)
    )
    M = jm[skin.joints]  # (T, 3, 4, 4, 4) — joint table is small
    Mw = jnp.sum(M * skin.weights[..., None, None], axis=2)  # (T, 3, 4, 4)
    R = Mw[..., :3, :3]
    pos = (
        jnp.einsum("tcij,tcj->tci", R, skin.rest_pos) + Mw[..., :3, 3]
    )  # (T, 3, 3)
    nrm = jnp.einsum("tcij,tcj->tci", R, skin.rest_nrm)
    nrm = nrm / jnp.maximum(
        jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20
    )
    tan = jnp.einsum("tcij,tcj->tci", R, skin.rest_tan)
    tan = tan / jnp.maximum(
        jnp.linalg.norm(tan, axis=-1, keepdims=True), 1e-20
    )

    t = pos.shape[0]
    tri_pos = jax.lax.dynamic_update_slice(
        meshes.tri_pos, pos.reshape(t, 9), (skin.base_tri, 0)
    )
    attrs = pack_corner_attrs(skin.uv, nrm, tan, skin.tan_w)
    tri_attr = jax.lax.dynamic_update_slice(
        meshes.tri_attr_packed, attrs, (skin.base_tri, 0)
    )
    # Refit the mesh AABB so frustum culling tracks the animated pose.
    mn = jnp.min(pos.reshape(-1, 3), axis=0)
    mx = jnp.max(pos.reshape(-1, 3), axis=0)
    mesh_min = meshes.mesh_min.at[skin.mesh_id].set(mn)
    mesh_max = meshes.mesh_max.at[skin.mesh_id].set(mx)
    return meshes.replace(
        tri_pos=tri_pos,
        tri_attr_packed=tri_attr,
        mesh_min=mesh_min,
        mesh_max=mesh_max,
    )


def apply_skins(meshes, skins, joint_mats):
    for s in skins:
        meshes = apply_skin(meshes, s, joint_mats)
    return meshes


def build_skin_data(
    mesh, permuted_indices, joints_v, weights_v, base_tri, mesh_id,
    joint_offset, n_joints,
) -> SkinData:
    """Host-side: de-index per-VERTEX joints/weights into per-corner rows
    aligned with the pool's (BVH-permuted) triangle order."""
    tri = np.asarray(permuted_indices).reshape(-1, 3)
    jv = np.asarray(joints_v)
    wv = np.asarray(weights_v, np.float32)
    wsum = wv.sum(axis=-1, keepdims=True)
    wv = wv / np.maximum(wsum, 1e-8)
    return SkinData(
        rest_pos=jnp.asarray(mesh.vertices[tri]),
        rest_nrm=jnp.asarray(mesh.normals[tri]),
        rest_tan=jnp.asarray(mesh.tangents[tri][..., :3]),
        tan_w=jnp.asarray(mesh.tangents[tri][..., 3]),
        uv=jnp.asarray(mesh.uvs[tri]),
        joints=jnp.asarray(jv[tri].astype(np.int32)),
        weights=jnp.asarray(wv[tri]),
        base_tri=int(base_tri),
        mesh_id=int(mesh_id),
        joint_offset=int(joint_offset),
        n_joints=int(n_joints),
    )
