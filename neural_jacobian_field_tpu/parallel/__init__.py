from .mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    shard_stacked_batch,
    replicate,
    DevicePrefetcher,
)
