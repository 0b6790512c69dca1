"""WeightedBatchNorm unit contract (nn/layers.py).

Drop-in compatibility with flax nn.BatchNorm (same params/batch_stats
layout, same numbers when no row weight is given) plus the row-exclusion
semantics the padding path relies on: weight-0 rows affect NOTHING —
stats, outputs of surviving rows, or the running EMA — exactly as if
the batch had been sliced before the op (the reference never pads; it
drops non-divisible batches, trainers/tts.py:138-142).
"""

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from promptttspp_tpu.nn.layers import WeightedBatchNorm


def _init_and_apply(mod, x, **apply_kw):
    v = mod.init(jax.random.PRNGKey(0), x, use_running_average=False)
    out, mut = mod.apply(v, x, mutable=["batch_stats"], **apply_kw)
    return v, out, mut["batch_stats"]


def test_matches_flax_batchnorm_without_row_weight():
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 9, 16)) * 3.0 + 1.0
    ours = WeightedBatchNorm(momentum=0.9, epsilon=1e-5)
    ref = nn.BatchNorm(momentum=0.9, epsilon=1e-5)

    v_o, out_o, bs_o = _init_and_apply(ours, x,
                                       use_running_average=False)
    v_r, out_r, bs_r = _init_and_apply(ref, x,
                                       use_running_average=False)
    # identical param/batch_stats tree layout (checkpoint compatibility)
    assert jax.tree_util.tree_structure(v_o) == \
        jax.tree_util.tree_structure(v_r)
    np.testing.assert_allclose(np.asarray(out_o), np.asarray(out_r),
                               rtol=1e-6, atol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6), bs_o, bs_r)

    # eval mode (running averages) agrees too
    e_o = ours.apply({"params": v_o["params"], "batch_stats": bs_o}, x,
                     use_running_average=True)
    e_r = ref.apply({"params": v_r["params"], "batch_stats": bs_r}, x,
                    use_running_average=True)
    np.testing.assert_allclose(np.asarray(e_o), np.asarray(e_r),
                               rtol=1e-6, atol=1e-6)


def test_all_ones_weight_equals_no_weight():
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 7, 8))
    mod = WeightedBatchNorm()
    v, out_none, bs_none = _init_and_apply(mod, x,
                                           use_running_average=False)
    out_ones, mut = mod.apply(v, x, use_running_average=False,
                              row_weight=jnp.ones((3,)),
                              mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_ones),
                               np.asarray(out_none), rtol=1e-5,
                               atol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        mut["batch_stats"], bs_none)


def test_zero_weight_rows_equal_sliced_batch():
    """Stats/outputs/EMA with weight-0 tail rows == running the module
    on the real rows only; holds on 3-D [B,T,C] and 4-D [B,H,W,C]."""
    for shape in ((5, 6, 4), (5, 3, 4, 2)):
        x = jax.random.normal(jax.random.PRNGKey(3), shape)
        w = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0])
        mod = WeightedBatchNorm()
        v = mod.init(jax.random.PRNGKey(0), x,
                     use_running_average=False)

        out_w, mut_w = mod.apply(v, x, use_running_average=False,
                                 row_weight=w, mutable=["batch_stats"])
        out_s, mut_s = mod.apply(v, x[:3], use_running_average=False,
                                 mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(out_w[:3]),
                                   np.asarray(out_s), rtol=1e-5,
                                   atol=1e-6)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            mut_w["batch_stats"], mut_s["batch_stats"])
