from promptttspp_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate_sharding,
    shard_batch,
)

__all__ = ["batch_sharding", "make_mesh", "replicate_sharding", "shard_batch"]
