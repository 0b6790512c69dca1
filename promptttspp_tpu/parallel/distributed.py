"""Multi-host (multi-process) SPMD plumbing.

The reference's distribution is single-node DDP via mp.spawn + NCCL
(`/root/reference/promptttspp/trainers/tts.py:41-54`). The TPU-native
replacement for real pods (SURVEY.md §5.8): one *process per host*, all
running the same program; ``jax.distributed.initialize`` wires the
cluster; a global ``Mesh`` spans every chip; each host loads only the
batch rows that shard onto its own chips and assembles them into global
arrays with ``jax.make_array_from_process_local_data``; XLA inserts the
gradient collectives (ICI within a slice, DCN across slices).

Single-process runs (including the 8-virtual-device CPU test mesh) flow
through the same functions: process_count()==1 makes every helper a
no-op/degenerate case.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the JAX cluster when multi-process is configured.

    Configuration sources, in order: explicit args, then the standard
    env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID — also consumed automatically on TPU pods where the
    runtime provides them). Returns True if a multi-process cluster was
    (or already is) initialized, False for single-process runs.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # nothing configured; do NOT touch the backend before a later
        # (e.g. TPU-pod-automatic) initialize could run
        return jax.process_count() > 1
    from jax._src import distributed as _dist

    if _dist.global_state.client is not None:  # already initialized
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def process_slice(n_rows: int, process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> slice:
    """The contiguous block of global batch rows this host must load.

    Mesh construction orders devices exactly as ``jax.devices()`` (which
    groups by process), so with P("data") row sharding, process p's
    addressable shards are rows [p*n/P, (p+1)*n/P).
    """
    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    assert n_rows % n == 0, (
        f"global batch of {n_rows} rows not divisible by {n} processes")
    per = n_rows // n
    return slice(p * per, (p + 1) * per)


def mesh_process_rows(mesh: Mesh, n_rows: int,
                      row_multiple: Optional[int] = None):
    """``(real_slice, slab_rows)`` for this process's share of a global
    batch of ``n_rows``, derived from the MESH (not from process_count):
    the union of the P("data") row shards its addressable devices hold.

    A global batch not divisible by ``row_multiple`` (default: the
    data-axis size; the trainer passes data × pipeline_microbatches so
    GPipe's ``B % (M*D) == 0`` requirement survives ragged tails) is
    conceptually padded up to the next multiple with zero-weight rows
    (matching the single-process ``pad_batch_to_multiple`` semantics —
    the reference instead DROPS non-divisible dynamic batches,
    `tts.py:138-142`):
    ``real_slice`` is this host's span of REAL rows (possibly empty for
    a host whose slab is entirely padding) and ``slab_rows`` is the
    exact row count it must supply after local zero-weight padding, so
    every host's shard shapes agree in
    ``jax.make_array_from_process_local_data``.

    Standard pod layout (data axis across hosts) reduces to
    ``process_slice``; when the data axis does NOT span processes —
    e.g. GPipe's model axis placed across hosts with data=1 — every
    process holds (a replica of) every shard and must load the full
    batch."""
    D = mesh.shape["data"]
    mult = row_multiple or D
    assert mult % D == 0, (
        f"row_multiple {mult} must be a multiple of the data axis {D}")
    padded = -(-n_rows // mult) * mult
    per = padded // D  # rows per shard after global padding
    pid = jax.process_index()
    devs = np.asarray(mesh.devices).reshape(D, -1)
    mine = [d for d in range(D)
            if any(x.process_index == pid for x in devs[d])]
    lo, hi = min(mine), max(mine) + 1
    assert mine == list(range(lo, hi)), (
        "this process's data shards are non-contiguous; reorder the "
        "mesh devices so each host's shards form a block")
    return (slice(min(lo * per, n_rows), min(hi * per, n_rows)),
            (hi - lo) * per)


def mesh_process_slice(mesh: Mesh, n_rows: int) -> slice:
    """This process's span of REAL global batch rows (see
    ``mesh_process_rows``)."""
    return mesh_process_rows(mesh, n_rows)[0]


def make_global_batch(local_batch: Dict, mesh: Mesh) -> Dict:
    """Assemble per-host rows into global data-sharded arrays
    (`jax.make_array_from_process_local_data`). Non-array leaves pass
    through. In single-process runs this equals a sharded device_put."""
    sharding = NamedSharding(mesh, P("data"))
    out = {}
    for k, v in local_batch.items():
        if isinstance(v, (np.ndarray, jax.Array)):
            out[k] = jax.make_array_from_process_local_data(
                sharding, np.asarray(v))
        else:
            out[k] = v
    return out


def replicate_global(tree, mesh: Mesh):
    """Replicate host-identical values over every device of the (possibly
    multi-host) mesh. Values MUST be bitwise identical across hosts
    (e.g. PRNG-derived params)."""
    sharding = NamedSharding(mesh, P())

    def place(x):
        if isinstance(x, (np.ndarray, jax.Array)) or np.isscalar(x):
            arr = np.asarray(x)
            return jax.make_array_from_process_local_data(sharding, arr)
        return x

    return jax.tree.map(place, tree)


def host_batches(sampler, dataset, collator,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None,
                 prompt_pad_to: int = 64,
                 mesh: Optional[Mesh] = None,
                 row_multiple: Optional[int] = None):
    """Per-host view of a global batch sampler.

    Every host walks the identical (seed-synchronized) sampler; for each
    global batch it computes the GLOBAL shape buckets from metadata —
    so the assembled global arrays agree across hosts — and yields
    ``(local_indices, collate_kwargs)`` with this host's row block:
    mesh-derived (``mesh_process_slice`` — correct for any axis
    placement, incl. a model/pipeline axis spanning processes) when a
    mesh is given, else the standard 1/process_count contiguous block.
    Requires the dataset to expose ``num_tokens(i)`` (frames) and
    ``num_phones(i)``.
    """
    from promptttspp_tpu.data.batching import bucket_shape

    n = jax.process_count() if process_count is None else process_count
    if n == 1:
        for idx in sampler:
            yield list(idx), {}
        return
    assert hasattr(dataset, "num_phones"), (
        "multi-host loading needs dataset.num_phones(i) for global "
        "shape buckets")
    for idx in sampler:
        t_frames = bucket_shape(
            max(dataset.num_tokens(i) for i in idx),
            collator.frame_quantum)
        t_phones = bucket_shape(
            max(dataset.num_phones(i) for i in idx),
            collator.phone_quantum)
        kwargs = dict(t_phones=t_phones, t_frames=t_frames,
                      prompt_pad_to=prompt_pad_to)
        if mesh is not None:
            sl, slab = mesh_process_rows(mesh, len(idx), row_multiple)
            local = list(idx)[sl]
            # reserved keys the batch assemblers pop (not collator args):
            # exact local row target, and the all-padding marker for a
            # host whose slab lies entirely in the global pad region (it
            # borrows one real row for shape inference, zero-weighted)
            kwargs["_pad_rows_to"] = slab
            if not local:
                local = [idx[0]]
                kwargs["_zero_weight"] = True
        else:
            local = list(idx)[process_slice(len(idx), process_index, n)]
        yield local, kwargs
