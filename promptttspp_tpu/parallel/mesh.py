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
    model_spans_processes: bool = False,
) -> Mesh:
    """Build a (data, model) mesh. Defaults: all devices on the data axis.

    Axis placement: ``jax.devices()`` orders devices by process, so the
    default reshape puts the DATA axis across processes and the model
    axis within each host — the standard pod layout (gradients
    all-reduce over DCN once per step; TP/PP collectives stay on ICI).
    ``model_spans_processes=True`` transposes the fold so the MODEL axis
    crosses process boundaries instead — the placement GPipe pipeline
    parallelism exists for (each host holds its pipeline stage of a
    denoiser too big for one host's devices; the stage-boundary
    ``ppermute`` activations ride the inter-host link, which the
    schedule overlaps with stage compute). Data shards are then
    host-local replicas: every process loads the full global batch
    (`distributed.mesh_process_slice` derives this from the mesh)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    if model_spans_processes:
        arr = np.asarray(devices).reshape(model, data).T
    else:
        arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for batch arrays."""
    return NamedSharding(mesh, P("data"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Place array leaves with data sharding; pass through the rest
    (strings/lists stay on host). The global batch size must be divisible
    by the data-axis size — the collator/batcher guarantees it via
    ``required_batch_size_multiple``.

    Single-process: a plain sharded device_put of the host-global array.
    Multi-process (real pods): the input is this host's contiguous row
    block (parallel/distributed.py process_slice) and the global array
    is assembled with ``jax.make_array_from_process_local_data``."""
    if jax.process_count() > 1:
        from promptttspp_tpu.parallel.distributed import make_global_batch

        return make_global_batch(batch, mesh)
    sharding = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, jax.Array)):
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = v
    return out


def pad_batch_to_rows(batch: Dict, rows: int) -> Dict:
    """Pad the batch's leading axis to exactly ``rows``.

    Padded rows keep 1-frame/1-phone lengths so every mask stays valid
    (an all-invalid row would put -inf rows into the MDN logsumexp and
    NaN the cotangents), and a ``batch_weight`` row mask (1 real / 0 pad)
    is emitted so the model's loss reductions drop them exactly — the
    loss is invariant to padding (tests/test_padding.py). The weight key
    is always present so the jitted step keeps one signature."""
    b = len(batch["phone_lengths"])
    assert rows >= b, f"cannot pad {b} rows down to {rows}"
    pad = rows - b
    weight = batch.get("batch_weight", np.ones((b,), np.float32))
    if pad == 0:
        out = dict(batch)
        out["batch_weight"] = weight
        return out
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
    out["batch_weight"] = np.concatenate(
        [weight, np.zeros((pad,), np.float32)])
    return out


def pad_batch_to_multiple(batch: Dict, multiple: int) -> Dict:
    """Pad the batch's leading axis to a device-count multiple
    (see ``pad_batch_to_rows`` for the zero-weight pad-row semantics)."""
    b = len(batch["phone_lengths"])
    return pad_batch_to_rows(batch, b + (-b) % multiple)
