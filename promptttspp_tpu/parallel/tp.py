"""Tensor-parallel parameter sharding over the mesh's ``model`` axis.

The reference has no TP (SURVEY.md §2.4: DP-only DDP); this is the
forward-looking TPU-native extension: Megatron-style column/row sharding
of the FFN expansion/contraction matmuls (conformer conv-FFNs, BERT
intermediate/output, DiffNet step-MLP). Parameters are placed with
``NamedSharding``; XLA GSPMD propagates activation shardings and inserts
the reduce-scatter/all-reduce collectives over ICI.

With model axis size 1 every spec degenerates to replication, so the same
code path serves pure-DP meshes.
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# parent module names whose matmul expands the hidden dim (column-parallel):
# conformer/BERT FFN expansions, prompt-encoder MLP, attention q/k/v (+
# rel-pos projection — shards the head axis), DiffNet gate/filter convs
_COLUMN = {
    "w_1", "intermediate_dense", "mlp_0", "adaptor_0",
    "linear_q", "linear_k", "linear_v", "linear_pos",
    "query", "key", "value",
    "dilated_conv", "conditioner_projection",
}
# ... and whose matmul contracts back (row-parallel): FFN contractions,
# attention output projections
_ROW = {"w_2", "output_dense", "mlp_2", "linear_out",
        "attention_output_dense"}
# per-head rel-pos biases [n_head, d_k]: follow the q/k/v head sharding
_HEAD = {"pos_bias_u", "pos_bias_v"}


def param_partition_spec(path: Tuple[str, ...], leaf) -> P:
    """PartitionSpec for one parameter leaf, by its flax path."""
    if not path:
        return P()
    name = path[-1]
    parent = path[-2] if len(path) > 1 else ""
    ndim = getattr(leaf, "ndim", 0)

    if name in _HEAD and ndim == 2:
        return P("model", None)
    if name == "kernel":
        if parent in _COLUMN:
            # Dense [in, out] / Conv [k, in, out]: shard output features
            return P(*([None] * (ndim - 1) + ["model"]))
        if parent in _ROW:
            # shard input (contraction) features
            return P(*([None] * (ndim - 2) + ["model", None]))
        if parent == "output_projection" and any(
                p.startswith("residual_layers") for p in path):
            # DiffNet ResidualBlock out-proj: input is the gated (sharded)
            # half — row-parallel; the top-level DiffNet output_projection
            # (same module name, no residual_layers in path) stays
            # replicated
            return P(*([None] * (ndim - 2) + ["model", None]))
    if name == "bias" and parent in _COLUMN and ndim == 1:
        return P("model")
    return P()


def model_axis_is_host_local(mesh: Mesh) -> bool:
    """True iff every model-axis group lives on one process — the
    standard pod layout (data across hosts, model within a host), and
    the precondition for multi-host TP placement below."""
    devs = mesh.devices  # [data, model]
    return all(len({d.process_index for d in row}) == 1 for row in devs)


def _place(leaf, sharding: NamedSharding):
    """Single-process: plain device_put. Multi-process: every host holds
    the identical full value (PRNG-deterministic init), and with the
    model axis host-local its addressable shards are slices of that
    value — exactly what make_array_from_process_local_data expects."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            sharding, jax.device_get(leaf))
    return jax.device_put(leaf, sharding)


def shard_params(params, mesh: Mesh, replicate_under: Tuple[str, ...] = (),
                 tp: bool = True):
    """Place each leaf with its TP spec (replicated where P()).

    replicate_under: subtree names forced to replication regardless of
    their TP spec — e.g. ("denoise_fn",) when the decoder stack is
    pipeline-partitioned instead (parallel/pp.py).
    tp=False replicates EVERY param — the placement when the mesh's
    model axis exists only for pipeline parallelism and spans processes
    (GPipe stage-partitions the decoder inside its shard_map; TP matmul
    sharding would put weight collectives on the inter-host link every
    layer, and `_place`'s host-identical-value assembly requires a
    host-local model axis anyway)."""
    if jax.process_count() > 1 and tp:
        assert model_axis_is_host_local(mesh), (
            "multi-host TP needs the model axis within a host "
            "(data across hosts); for a cross-process model axis "
            "(pipeline-only) pass tp=False")

    def place(path, leaf):
        names = tuple(str(getattr(k, "key", k)) for k in path)
        if not tp or any(r in names for r in replicate_under):
            spec = P()
        else:
            spec = param_partition_spec(names, leaf)
        return _place(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_state(state, mesh: Mesh, replicate_under: Tuple[str, ...] = (),
                tp: bool = True):
    """Apply TP placement to params and matching placement to opt_state
    (zeros_like trees inherit via re-placement of same-shaped leaves).
    Works single- AND multi-process (see _place): with model axis 1 this
    doubles as the multi-host state replicator; tp=False (see
    shard_params) makes it the replicator for pipeline-only model axes."""
    params = shard_params(state.params, mesh, replicate_under, tp=tp)
    replicated = NamedSharding(mesh, P())
    batch_stats = jax.tree.map(
        lambda x: _place(x, replicated), state.batch_stats)
    step = _place(state.step, replicated)

    # optimizer moments mirror the param tree structure; re-place any leaf
    # whose shape matches a param leaf at the same tree position when
    # possible, else replicate.
    flat_params = {tuple(str(getattr(k, "key", k)) for k in p): v
                   for p, v in
                   jax.tree_util.tree_flatten_with_path(params)[0]}

    def place_opt(path, leaf):
        names = tuple(str(getattr(k, "key", k)) for k in path)
        # match the trailing path segments against param paths
        for plen in range(len(names), 0, -1):
            cand = names[-plen:]
            if cand in flat_params and flat_params[cand].shape == leaf.shape:
                return _place(leaf, flat_params[cand].sharding)
        return _place(leaf, replicated)

    opt_state = jax.tree_util.tree_map_with_path(place_opt, state.opt_state)
    return state.replace(step=step, params=params, batch_stats=batch_stats,
                         opt_state=opt_state)
