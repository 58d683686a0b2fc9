"""Device mesh + sharding helpers (SURVEY.md §2.10).

The reference's only parallelism is Lightning DDP (1 process/GPU, NCCL allreduce,
src/main.py:117-130). The TPU-native equivalent: one jitted train step over a
jax.sharding.Mesh with a `data` axis — batch sharded over `data`, params replicated,
gradient psum inserted automatically by XLA (riding ICI intra-slice / DCN across
hosts). A `tile` axis is reserved for renderer-internal sharding (SURVEY.md §7 M6).

Multi-host: call jax.distributed.initialize() per host before building the mesh (the
helpers below use all visible devices either way).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def data_mesh_size(batch_size: int, n_devices: int) -> int:
    """Largest device count <= n_devices that divides the global batch.

    shard_batch splits the leading batch axis across the mesh, and
    jax.device_put hard-errors on an indivisible batch; batch 1 on an 8-chip
    host therefore trains on a 1-device mesh (the reference scales batch WITH
    devices: batch-1-per-GPU DDP, SURVEY.md §2.10)."""
    b = max(int(batch_size), 1)
    return max(d for d in range(1, max(n_devices, 1) + 1) if b % d == 0)


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Put a host numpy batch onto the mesh, sharded over the leading (batch) axis."""
    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def data_sharding(mesh: Mesh, axis_name: str = "data"):
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh):
    return NamedSharding(mesh, P())
