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
    """Place every array leaf batch-sharded over the mesh in ONE device_put
    call (per-leaf puts cost one host<->device round trip each — ruinous over
    remote-TPU tunnels). Leaf batch dims must divide by the mesh size."""
    shardings = jax.tree.map(
        lambda x: batch_sharding(mesh, np.ndim(x), axis), batch
    )
    return jax.device_put(batch, shardings)


def shard_stacked_batch(stacked, mesh: Mesh, axis: str = DATA_AXIS):
    """Shard a `stack_batches` result (leading [K] steps axis, batch second)
    over the mesh: steps replicated, batch dim sharded."""
    def spec(x):
        return NamedSharding(mesh, P(None, axis, *([None] * (np.ndim(x) - 2))))

    return jax.device_put(stacked, jax.tree.map(spec, stacked))


class DevicePrefetcher:
    """Stage host batches onto the device ahead of consumption (the
    jax_utils.prefetch_to_device pattern): a daemon thread runs shard_batch
    so the train loop never waits on host->device transfer."""

    def __init__(self, host_iter, mesh: Mesh, depth: int = 2,
                 axis: str = DATA_AXIS, stacked: bool = False):
        """stacked=True for `stack_batches` streams (steps_per_call>1):
        leading axis is the [K] substep axis (replicated), batch is dim 1 —
        sharding dim 0 over the mesh would split the substep axis."""
        import queue
        import threading

        self._q = queue.Queue(maxsize=depth)
        self._err = []
        self._stop = threading.Event()

        def worker():
            try:
                put = shard_stacked_batch if stacked else shard_batch
                for batch in host_iter:
                    staged = put(batch, mesh, axis)
                    while not self._stop.is_set():
                        try:
                            self._q.put(staged, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
            except Exception as e:  # surfaced on next()
                self._err.append(e)
                self._q.put(None)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def close(self):
        """Stop the staging thread (call when training ends — a daemon thread
        blocked inside a device_put during interpreter teardown aborts)."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass
        self._thread.join(timeout=5.0)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is None and self._err:
            raise self._err[0]
        return item


def replicate(tree, mesh: Mesh):
    """Replicate params / optimizer state across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
