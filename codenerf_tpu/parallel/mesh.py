"""Device mesh + sharding helpers.

TPU-native replacement for the reference's process-per-GPU DDP runtime
(train.py:145-177, util.py:139-142).  One process per host, one
`jax.sharding.Mesh` over all chips; the ray axis is sharded over the 'data'
axis, parameters are replicated, and gradient all-reduce is inserted by XLA
(overlapped with the backward pass by the latency-hiding scheduler) — no
user-visible backend selection, matching SURVEY §2.2.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int = 0, devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the first ``num_devices``) chips."""
    devs = list(devices if devices is not None else jax.devices())
    if num_devices:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over 'data' (ray batches, pixel tiles)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (parameters, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_chunked_rays(mesh: Optional[Mesh], *arrays):
    """Constrain [C, Rc, ...] chunked ray arrays: rays sharded on axis 1,
    the lax.map chunk axis replicated (every device walks the chunks in
    lockstep on its own ray shard)."""
    if mesh is None or mesh.size == 1:
        return arrays if len(arrays) > 1 else arrays[0]
    out = tuple(
        jax.lax.with_sharding_constraint(
            a, NamedSharding(mesh, P(None, DATA_AXIS)))
        for a in arrays)
    return out if len(out) > 1 else out[0]


def shard_rays(mesh: Optional[Mesh], *arrays):
    """Constrain [R, ...] arrays to be sharded over the ray axis.

    Inside jit this tells the partitioner to split the ray dimension across
    the mesh — the pjit analog of the reference's per-rank ray split
    (nerf/__init__.py:179-193), without padding or gather bookkeeping.
    """
    if mesh is None or mesh.size == 1:
        return arrays if len(arrays) > 1 else arrays[0]
    out = tuple(
        jax.lax.with_sharding_constraint(a, NamedSharding(mesh, P(DATA_AXIS)))
        for a in arrays)
    return out if len(out) > 1 else out[0]
