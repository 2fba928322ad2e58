"""Device mesh + sharding helpers (the TPU-native replacement for PL DDP).

The reference scales with NCCL data parallelism via PyTorch-Lightning
(train.py:67-79). Here a 1-D `jax.sharding.Mesh` over all chips carries the
batch axis; params/opt state are replicated; `jax.jit` on the train step
inserts the gradient all-reduces over ICI (DCN across slices transparently,
since the mesh spans whatever `jax.devices()` returns). No explicit
collectives are needed — the model is tens of M params, DP suffices
(SURVEY.md §2.5).

Scaling beyond DP (many rays / whole-image renders): shard the RAY axis with
`ray_sharding` — volume rendering is embarrassingly parallel over rays.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh, ndim: int = 1, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """Place every array leaf batch-sharded over the mesh. Leaf batch dims
    must be divisible by the mesh size (static-shape contract)."""

    def put(x):
        if x is None:
            return None
        return jax.device_put(x, batch_sharding(mesh, np.ndim(x), axis))

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Replicate params / optimizer state across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
