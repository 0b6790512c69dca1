"""Train state, optimizer assembly, and the jitted SPMD train step.

Replaces the reference's imperative torch loop
(`/root/reference/promptttspp/trainers/tts.py:201-223`): one pure function
``train_step(state, batch, rng)`` compiled once per shape bucket, with
grad-clip 1.0, AdamW + per-step Noam, DDP-equivalent gradient mean via the
mesh (XLA inserts the collectives), and the reference's partial-BERT
freeze (`modules/prompt_encoder.py:28-31`) expressed as a masked optimizer
update instead of requires_grad flags.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from promptttspp_tpu.train.schedule import noam_schedule


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def _last_bert_layer_name(params) -> Optional[str]:
    """Highest ``encoder_layer_N`` key anywhere in the tree — the freeze
    boundary must follow the actual BERT depth, not a config default
    (a hardcoded 12 silently froze ALL of BERT on any other depth)."""
    best = -1

    def walk(tree):
        nonlocal best
        if isinstance(tree, dict):
            for k, v in tree.items():
                if k.startswith("encoder_layer_"):
                    try:
                        best = max(best, int(k[len("encoder_layer_"):]))
                    except ValueError:
                        pass
                walk(v)

    walk(params)
    return f"encoder_layer_{best}" if best >= 0 else None


def bert_freeze_mask(params, num_bert_layers: Optional[int] = None) -> Any:
    """True = trainable. Freezes prompt_encoder/bert/** except the last
    layer's attention (self + output projection/LayerNorm), mirroring the
    reference's requires_grad surgery
    (`/root/reference/promptttspp/modules/prompt_encoder.py:28-31`).
    The last layer is derived from the params tree unless an explicit
    depth is given."""
    if num_bert_layers is None:
        last = _last_bert_layer_name(params) or "encoder_layer_-1"
    else:
        last = f"encoder_layer_{num_bert_layers - 1}"
    trainable_suffixes = (
        "attention_self", "attention_output_dense", "attention_output_LayerNorm",
    )

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        if "prompt_encoder" in path and "bert" in path:
            if last in path and any(s in path for s in trainable_suffixes):
                return True
            return False
        return True

    return walk(params, ())


def split_params(params, mask):
    """Partition a params tree by a boolean mask tree (True = trainable)
    -> (trainable, frozen) nested dicts. The freeze is STRUCTURAL: the
    backward pass, gradient clip, optimizer moments, and update apply
    run only on the trainable subtree, so the 110M frozen BERT params
    cost zero per-step HBM traffic (vs ~8 ms/step when grads/moments
    for them are computed and masked to zero)."""
    from flax import traverse_util

    fp = traverse_util.flatten_dict(params)
    fm = traverse_util.flatten_dict(mask)
    train = {k: v for k, v in fp.items() if fm[k]}
    frozen = {k: v for k, v in fp.items() if not fm[k]}
    return (traverse_util.unflatten_dict(train),
            traverse_util.unflatten_dict(frozen))


def merge_params(trainable, frozen):
    from flax import traverse_util

    flat = dict(traverse_util.flatten_dict(trainable))
    flat.update(traverse_util.flatten_dict(frozen))
    return traverse_util.unflatten_dict(flat)


def make_optimizer(
    base_lr: float = 1e-3,
    warmup_steps: int = 4000,
    betas=(0.9, 0.98),
    weight_decay: float = 0.0,
    grad_clip: float = 1.0,
) -> optax.GradientTransformation:
    """AdamW + Noam + clip (`conf/optimizer/adamw.yaml`,
    `conf/train/noam.yaml`, `trainers/tts.py:208-211`). Freezing is not
    an optimizer concern: with a freeze mask the trainer inits/updates
    this optimizer over the trainable subtree only (split_params)."""
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(
            learning_rate=noam_schedule(base_lr, warmup_steps),
            b1=betas[0], b2=betas[1], weight_decay=weight_decay,
        ),
    )


def freeze_opt_state(state: "TrainState", tx,
                     freeze_mask) -> "TrainState":
    """Re-init opt_state over the trainable subtree only (the structural
    freeze) — pair with ``make_train_step(freeze_mask=...)``. The mask
    is derived from the params tree (bert_freeze_mask), so this runs
    AFTER create_train_state."""
    return state.replace(
        opt_state=tx.init(split_params(state.params, freeze_mask)[0]))


def create_train_state(model, batch, rng, tx) -> TrainState:
    init_rngs = {
        "params": rng,
        "dropout": jax.random.fold_in(rng, 1),
        "diffusion": jax.random.fold_in(rng, 2),
        "style": jax.random.fold_in(rng, 3),
    }
    variables = jax.jit(model.init, static_argnames=("train",))(
        init_rngs, batch, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def _cast_floats(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)


def make_train_step(model, tx, donate: bool = True, bf16: bool = False,
                    freeze_mask=None):
    """Returns jitted (state, batch, rng) -> (state, metrics).

    bf16=True runs compute in bfloat16 with f32 master params (the TPU
    counterpart of the reference's fp16 GradScaler switch,
    `trainers/tts.py:86-92` — no loss scaling needed for bf16). The MDN
    fp32 islands stay fp32 via their explicit casts (mdn_disable_amp).
    BatchNorm running stats remain numerically pinned under bf16:
    WeightedBatchNorm reduces batch statistics in f32 and the EMA
    carries in f32 (stats are cast back to f32 below), so the only
    drift source is the bf16 rounding of the activations — bounded by
    the EMA contraction at <2% relative, NOT accumulating over steps
    (tests/test_weighted_bn.py::test_bf16_running_stat_drift_bounded).

    freeze_mask (True = trainable) is the reference's requires_grad=False
    expressed STRUCTURALLY (`modules/prompt_encoder.py:28-31`): the
    params tree is partitioned, frozen leaves enter the loss as
    closed-over ``stop_gradient`` constants, and grad/clip/AdamW/apply
    run only over the trainable subtree — no dead backward through the
    frozen 11.x BERT layers and no optimizer HBM traffic for their 110M
    params. ``tx``/``opt_state`` must then be defined over the
    trainable subtree (see freeze_opt_state); the
    clipping norm matches torch's clip_grad_norm_ over requires_grad
    params exactly (frozen grads are zero there, absent here).
    """

    def train_step(state: TrainState, batch: Dict, rng) -> tuple:
        r_drop, r_diff, r_style = jax.random.split(
            jax.random.fold_in(rng, state.step), 3)

        if freeze_mask is not None:
            train_p, frozen_p = split_params(state.params, freeze_mask)
            frozen_sg = jax.tree.map(jax.lax.stop_gradient, frozen_p)
        else:
            train_p, frozen_p, frozen_sg = state.params, None, None

        def loss_fn(tp):
            apply_params = tp if frozen_sg is None \
                else merge_params(tp, frozen_sg)
            apply_batch = batch
            if bf16:
                apply_params = _cast_floats(apply_params, jnp.bfloat16)
                apply_batch = _cast_floats(batch, jnp.bfloat16)
            out, mutated = model.apply(
                {"params": apply_params, "batch_stats": state.batch_stats},
                apply_batch, train=True,
                rngs={"dropout": r_drop, "diffusion": r_diff,
                      "style": r_style},
                mutable=["batch_stats"],
            )
            loss = out["loss"].astype(jnp.float32)
            return loss, (out, mutated.get("batch_stats", {}))

        grads, (losses, new_stats) = jax.grad(loss_fn, has_aux=True)(
            train_p)
        if bf16:
            grads = _cast_floats(grads, jnp.float32)
            new_stats = _cast_floats(new_stats, jnp.float32)
            losses = {k: v.astype(jnp.float32) for k, v in losses.items()}
        updates, new_opt_state = tx.update(grads, state.opt_state, train_p)
        new_train = optax.apply_updates(train_p, updates)
        new_params = new_train if frozen_p is None \
            else merge_params(new_train, frozen_p)
        metrics = dict(losses)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model):
    """Validation forward (`trainers/tts.py:230-238`): full training-mode
    loss computation without dropout/param updates (BN uses running
    stats)."""

    def eval_step(state: TrainState, batch: Dict, rng) -> Dict:
        r_diff = jax.random.fold_in(rng, state.step)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=False,
            rngs={"diffusion": r_diff, "style": jax.random.fold_in(r_diff, 1)},
        )
        return out

    return jax.jit(eval_step)
