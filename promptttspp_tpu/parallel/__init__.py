from promptttspp_tpu.parallel.distributed import (
    host_batches,
    init_distributed,
    make_global_batch,
    process_slice,
    replicate_global,
)
from promptttspp_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    pad_batch_to_multiple,
    pad_batch_to_rows,
    replicate_sharding,
    shard_batch,
)
from promptttspp_tpu.parallel.pp import denoise_pipelined
from promptttspp_tpu.parallel.sp import decode_frames_sharded, frame_sharding
from promptttspp_tpu.parallel.tp import (
    param_partition_spec,
    shard_params,
    shard_state,
)

__all__ = [
    "batch_sharding",
    "decode_frames_sharded",
    "denoise_pipelined",
    "frame_sharding",
    "host_batches",
    "init_distributed",
    "make_global_batch",
    "make_mesh",
    "pad_batch_to_multiple",
    "pad_batch_to_rows",
    "param_partition_spec",
    "process_slice",
    "replicate_global",
    "replicate_sharding",
    "shard_batch",
    "shard_params",
    "shard_state",
]
