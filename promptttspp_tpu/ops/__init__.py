from promptttspp_tpu.ops.masks import (
    expand_by_durations,
    generate_path,
    sequence_mask,
    to_log_scale,
)

__all__ = [
    "expand_by_durations",
    "generate_path",
    "sequence_mask",
    "to_log_scale",
]
