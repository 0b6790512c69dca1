"""Device mesh and sharding helpers.

The reference's only parallelism is single-node DDP over NCCL with
rank-sliced batches (`/root/reference/promptttspp/trainers/tts.py:41-54,
116-143`, SURVEY.md §2.4). The TPU-native equivalent: one logical program
compiled by XLA over a ``jax.sharding.Mesh`` — parameters replicated,
batch sharded on the ``data`` axis, gradient all-reduce inserted by the
compiler (ICI within a slice, DCN across slices). A ``model`` axis is
provisioned for tensor-parallel sharding of the conformer/denoiser
matmuls on larger configs.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh. Defaults: all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for batch arrays."""
    return NamedSharding(mesh, P("data"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """device_put array leaves with data sharding; pass through the rest
    (strings/lists stay on host). The global batch size must be divisible
    by the data-axis size — the collator/batcher guarantees it via
    ``required_batch_size_multiple``."""
    sharding = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, jax.Array)):
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = v
    return out


def pad_batch_to_multiple(batch: Dict, multiple: int) -> Dict:
    """Repeat-pad the batch's leading axis to a device-count multiple and
    zero out the padded items' lengths so they contribute nothing."""
    b = len(batch["phone_lengths"])
    pad = (-b) % multiple
    if pad == 0:
        return batch
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.ndim >= 1 and v.shape[0] == b:
            pad_block = np.zeros((pad,) + v.shape[1:], v.dtype)
            out[k] = np.concatenate([v, pad_block], axis=0)
        else:
            out[k] = v
    # padded rows: keep 1-frame/1-phone lengths so masks stay valid
    out["phone_lengths"][b:] = 1
    out["frame_lengths"][b:] = 1
    return out
