"""Per-frame instance animation (compute_update equivalent).

shaders/compute_update.wgsl:12-28: for each id in a moving-instance list,
rotate the transform by Rz(speed*dt) with speed = ±2 sin(0.5 t), sign from
transform[3][2] (the world z translation) > -15. Here it is a gathered
transform update + scatter back — pure jnp inside the frame jit.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import mathx
from ..scene.instance import InstanceData


def compute_update(
    instances: InstanceData, moving_ids: jnp.ndarray, time, dt
) -> InstanceData:
    if moving_ids.shape[0] == 0:
        return instances
    t = instances.transform[moving_ids]  # (M, 4, 4)
    speed = 2.0 * jnp.sin(time * 0.5)
    sign = jnp.where(t[:, 2, 3] > -15.0, 1.0, -1.0)  # translation z
    angle = speed * sign * dt
    rotz = mathx.from_rotation_z(angle, xp=jnp)  # (4, 4, M)
    rotz = jnp.moveaxis(rotz, -1, 0) if rotz.ndim == 3 else rotz[None]
    new_t = jnp.stack(
        [
            jnp.stack(
                [
                    sum(rotz[:, i, k] * t[:, k, j] for k in range(4))
                    for j in range(4)
                ],
                axis=-1,
            )
            for i in range(4)
        ],
        axis=-2,
    )
    new_transform = instances.transform.at[moving_ids].set(new_t)
    new_inv = instances.inv_transform.at[moving_ids].set(jnp.linalg.inv(new_t))
    return instances.replace(transform=new_transform, inv_transform=new_inv)
