"""Multi-chip sharding: screen-row data parallelism.

The reference is strictly single-device (SURVEY.md §2.3/§5.8); the natural
multi-chip mapping for this workload is *sort-middle* screen-space
partitioning: scene state replicated, the per-pixel passes (fine raster
competition, G-buffer resolve, shading, TAA, postprocess) sharded over tile
rows. We express this with `jax.lax.with_sharding_constraint` on the dense
per-pixel arrays inside the one frame jit and let XLA's SPMD partitioner
insert the (few) collectives — e.g. halo exchanges for the 3x3 TAA stencils
— over ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROW_AXIS = "rows"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"need {n_devices} devices, have {len(devs)} "
                "(set XLA_FLAGS=--xla_force_host_platform_device_count=N for CPU)"
            )
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (ROW_AXIS,))


def shard_rows(mesh: Optional[Mesh], *arrays):
    """Constrain (H, W, ...) arrays to be sharded over H."""
    if mesh is None:
        return arrays if len(arrays) > 1 else arrays[0]
    out = []
    for a in arrays:
        spec = P(ROW_AXIS, *([None] * (a.ndim - 1)))
        out.append(jax.lax.with_sharding_constraint(a, NamedSharding(mesh, spec)))
    return tuple(out) if len(out) > 1 else out[0]


def replicated(mesh: Optional[Mesh], tree):
    if mesh is None:
        return tree
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda a: jax.lax.with_sharding_constraint(a, sharding), tree
    )
