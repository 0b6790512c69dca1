"""Tensor parallelism: TP=2 must be numerically equivalent to pure DP.

The reference has no TP (SURVEY.md §2.4); this is the TPU-native
extension — Megatron-style column/row sharding of FFN, attention q/k/v/
out (+ per-head rel-pos biases), BERT, and DiffNet gate/filter convs
(parallel/tp.py), reachable from the trainer via train.mesh.model.
"""

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from promptttspp_tpu.data.collate import PromptTTSCollator
from promptttspp_tpu.parallel.mesh import make_mesh, shard_batch
from promptttspp_tpu.parallel.tp import param_partition_spec, shard_state
from promptttspp_tpu.train.state import (create_train_state, make_optimizer,
                                         make_train_step)
from promptttspp_tpu.train.trainer import model_batch

from test_train import SyntheticDataset, TokenHashTokenizer, tiny_model


@pytest.fixture(scope="module")
def setup():
    model = tiny_model()
    ds = SyntheticDataset(8, seed=5)
    batch = PromptTTSCollator(tokenizer=TokenHashTokenizer())(
        [ds[i] for i in range(8)])
    tx = make_optimizer(warmup_steps=10)
    state = create_train_state(model, model_batch(batch),
                               jax.random.PRNGKey(0), tx)
    return model, tx, state, model_batch(batch)


def _one_step(model, tx, state, batch, mesh):
    step = make_train_step(model, tx, donate=False)
    with mesh:
        sharded = shard_batch(batch, mesh)
        new_state, metrics = step(state, sharded, jax.random.PRNGKey(7))
    return new_state, {k: float(v) for k, v in metrics.items()}


def test_tp_specs_cover_the_hot_matmuls(setup):
    model, tx, state, batch = setup
    hits = {"column": 0, "row": 0, "head": 0}
    for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]:
        names = tuple(str(getattr(k, "key", k)) for k in path)
        spec = param_partition_spec(names, leaf)
        if spec == P():
            continue
        if spec[-1] == "model":
            hits["column"] += 1
        elif "model" in spec and names[-1].startswith("pos_bias"):
            hits["head"] += 1
        else:
            hits["row"] += 1
    assert hits["column"] >= 10  # ffn w_1s, qkv, bert, diffnet gates
    assert hits["row"] >= 5
    assert hits["head"] >= 2


def test_tp2_step_equals_dp_step(setup):
    model, tx, state, batch = setup

    mesh_dp = make_mesh()            # 8 data x 1 model
    s_dp, m_dp = _one_step(model, tx, state, batch, mesh_dp)

    mesh_tp = make_mesh(data=4, model=2)
    state_tp = shard_state(state, mesh_tp)
    s_tp, m_tp = _one_step(model, tx, state_tp, batch, mesh_tp)

    for k in m_dp:
        np.testing.assert_allclose(m_tp[k], m_dp[k], rtol=2e-4, atol=1e-5,
                                   err_msg=f"metric {k}")

    flat_dp = jax.tree_util.tree_flatten_with_path(s_dp.params)[0]
    flat_tp = jax.tree_util.tree_flatten_with_path(s_tp.params)[0]
    assert len(flat_dp) == len(flat_tp)
    for (p_dp, v_dp), (p_tp, v_tp) in zip(flat_dp, flat_tp):
        assert p_dp == p_tp
        np.testing.assert_allclose(
            np.asarray(v_tp), np.asarray(v_dp), rtol=2e-4, atol=2e-5,
            err_msg=f"param {p_dp} diverged under TP")


def test_tp_param_placement(setup):
    model, tx, state, batch = setup
    mesh = make_mesh(data=4, model=2)
    sharded = shard_state(state, mesh)

    def find(tree, key):
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            names = [str(getattr(k, "key", k)) for k in path]
            if key in names:
                return names, leaf
        raise KeyError(key)

    names, w1 = find(sharded.params, "w_1")
    assert "model" in w1.sharding.spec
    # optimizer moments mirror the param placement
    names, mom = find(sharded.opt_state, "w_1")
    assert "model" in mom.sharding.spec


def test_trainer_mesh_model_knob(tmp_path):
    """train.mesh.model=2 reaches shard_state from the trainer."""
    from promptttspp_tpu.config import Config
    from promptttspp_tpu.train.trainer import TTSTrainer

    cfg = Config({
        "output_dir": str(tmp_path),
        "train": {"seed": 0, "num_epochs": 1, "save_interval": 5,
                  "lr_scheduler": {"warmup_steps": 10},
                  "mesh": {"model": 2}},
        "optimizer": {"lr": 1e-3, "betas": [0.9, 0.98], "weight_decay": 0.0},
        "dataset": {"dynamic_batch": True, "max_tokens": 400},
    })
    trainer = TTSTrainer(cfg, train_ds=SyntheticDataset(8),
                         tokenizer=TokenHashTokenizer(), model=tiny_model(),
                         freeze_bert=False)
    state = trainer.run()
    assert int(state.step) > 0
    csv = (tmp_path / "logs" / "loss.csv").read_text().strip().splitlines()
    loss = float(csv[1].split(",")[1])
    assert np.isfinite(loss)
