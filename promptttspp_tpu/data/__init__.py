from promptttspp_tpu.data.batching import ShuffleBatchSampler, batch_by_size
from promptttspp_tpu.data.collate import PromptTTSCollator
from promptttspp_tpu.data.dataset import AllWithSpkPromptNormDataset
from promptttspp_tpu.data.prefetch import prefetch_batches

__all__ = [
    "AllWithSpkPromptNormDataset",
    "PromptTTSCollator",
    "ShuffleBatchSampler",
    "batch_by_size",
    "prefetch_batches",
]
