from tpusr.dist.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    pad_to_multiple,
)
