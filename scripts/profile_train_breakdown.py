"""Train-step component breakdown on the current backend (VERDICT r2 #2).

Methodology: the tunneled backend adds ~1.2 ms of dispatch overhead per
jit call (measured: a trivial x+1 on 20 MB "costs" 1.4 ms/call), so each
component is timed by the REP-N MARGINAL — one jit applying the
component N times to perturbed inputs vs once; (tN - t1)/(N-1) cancels
dispatch and fixed-cost terms. The full train step is timed directly
(its cost >> dispatch).

Usage: python scripts/profile_train_breakdown.py [B] [Tp] [Tf]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from promptttspp_tpu.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=10, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        ts.append((time.perf_counter() - t0) / iters)
    return float(np.median(ts)) * 1e3


def marginal(make_fn, params, x, n=4, **kw):
    t1 = timed(make_fn(1), params, x, **kw)
    tn = timed(make_fn(n), params, x, **kw)
    return (tn - t1) / (n - 1), t1


def rep_grad(apply_fn, n):
    """jit of: sum of n applications to slightly-perturbed inputs,
    grads wrt params (fwd+bwd marginal)."""

    @jax.jit
    def f(params, x):
        def loss(p):
            tot = 0.0
            for i in range(n):
                xi = jax.tree.map(
                    lambda a: a + 1e-6 * i if jnp.issubdtype(
                        a.dtype, jnp.floating) else a, x)
                out = apply_fn(p, xi)
                tot = tot + jnp.sum(
                    jax.tree_util.tree_leaves(out)[0].astype(jnp.float32))
            return tot
        return jax.grad(loss)(params)
    return f


def rep_fwd(apply_fn, n):
    @jax.jit
    def f(params, x):
        tot = 0.0
        for i in range(n):
            xi = jax.tree.map(
                lambda a: a + 1e-6 * i if jnp.issubdtype(
                    a.dtype, jnp.floating) else a, x)
            out = apply_fn(params, xi)
            tot = tot + jnp.sum(
                jax.tree_util.tree_leaves(out)[0].astype(jnp.float32))
        return tot
    return f


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    Tp = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    Tf = int(sys.argv[3]) if len(sys.argv) > 3 else 512

    from promptttspp_tpu.flagship import (
        build_flagship_model, example_batch, init_flagship)
    from promptttspp_tpu.train.state import (
        bert_freeze_mask, create_train_state, make_optimizer,
        make_train_step)

    model = build_flagship_model()
    batch = {k: jnp.asarray(v)
             for k, v in example_batch(B=B, Tp=Tp, Tf=Tf, L=32).items()}
    rng = jax.random.key(0, impl="rbg")  # production impl (trainer.py)

    tx = make_optimizer()
    state = create_train_state(model, batch, rng, tx)
    mask = bert_freeze_mask(state.params)
    from promptttspp_tpu.train.state import freeze_opt_state
    state = freeze_opt_state(state, tx, mask)
    frames = B * Tf

    only = sys.argv[4] if len(sys.argv) > 4 else ""

    print(f"flagship train step  B={B} Tp={Tp} Tf={Tf} "
          f"({frames} padded mel frames/step)")
    # peak MXU throughput for the MFU column: TPU v5e = 197 TFLOP/s
    # (bf16; f32 matmuls run through the same MXU). Override with
    # GRAFT_PEAK_FLOPS for other chips.
    import os

    peak = float(os.environ.get("GRAFT_PEAK_FLOPS", 197e12))
    # analytic model FLOPs (the honest MFU numerator — kernel-shape
    # matmul/conv accounting, fwd + 2x bwd on trainable modules, frozen
    # BERT fwd-only; see analytic_flops.py). XLA's executed-HLO count is
    # reported alongside as HFU (it includes padding/remat, so HFU >=
    # MFU by construction).
    from analytic_flops import train_flops as _analytic

    a_flops, _ = _analytic(state.params, B, Tp, Tf,
                           int(batch["prompt_ids"].shape[1]))
    print(f"  analytic model FLOPs/step: {a_flops / 1e9:.1f} GFLOP "
          f"(frozen-BERT convention)")
    full_state = state.replace(opt_state=tx.init(state.params))
    for bf16 in ((False, True) if only in ("", "step") else ()):
        for fz, fzmask, st in (("nofreeze", None, full_state),
                               ("freeze+sg", mask, state)):
            step = make_train_step(model, tx, donate=False, bf16=bf16,
                                   freeze_mask=fzmask)
            t = timed(step, st, batch, rng, iters=10)
            # executed-HLO flops from XLA's own cost model: the
            # numerator for MFU = flops / time / peak
            mfu_s = ""
            try:
                cost = step.lower(st, batch, rng).compile().cost_analysis()
                if isinstance(cost, (list, tuple)):
                    cost = cost[0]
                flops = float(cost.get("flops", 0.0))
                if flops > 0:
                    hfu = flops / (t / 1e3) / peak
                    mfu = a_flops / (t / 1e3) / peak
                    mfu_s = (f"  HLO {flops / 1e9:7.1f} GFLOP "
                             f"HFU {hfu * 100:5.2f}% | "
                             f"MFU {mfu * 100:5.2f}%")
            except Exception as e:  # cost model absent on some backends
                mfu_s = f"  (no cost analysis: {type(e).__name__})"
            print(f"  full step bf16={int(bf16)} {fz:>9}: {t:7.2f} ms "
                  f"({frames / t * 1e3:,.0f} frames/s){mfu_s}")

    # ---- sustained cadence: N steps chained inside ONE jit ----
    # The per-call `timed` above includes per-dispatch host issue cost
    # (~1 ms on this 1-core tunneled host). Chaining steps through
    # lax.scan (carry = train state, exactly what an epoch does) and
    # differencing time(2N) - time(N) with a scalar float() readback
    # cancels every fixed cost and is robust to the axon backend's
    # unreliable block_until_ready (see BENCHMARKS.md timing note).
    if only in ("", "step", "scan"):
        import functools as _ft

        from jax import lax as _lax

        def sustained(stepfn, st, n):
            @_ft.partial(jax.jit, static_argnums=(3,))
            def run(st_, b_, r_, n_):
                def body(carry, _):
                    ns, m = stepfn(carry, b_, r_)
                    return ns, m["loss"].astype(jnp.float32)
                _, losses = _lax.scan(body, st_, None, length=n_)
                return jnp.sum(losses)

            float(run(st, batch, rng, n))  # warm/compile
            t0 = time.perf_counter()
            float(run(st, batch, rng, n))
            return time.perf_counter() - t0

        for bf16 in (False, True):
            step_in = make_train_step(model, tx, donate=False, bf16=bf16,
                                      freeze_mask=mask)
            n = 10
            t1 = sustained(step_in, state, n)
            t2 = sustained(step_in, state, 2 * n)
            ms = (t2 - t1) / n * 1e3
            mfu_s = ""
            try:
                cost = step_in.lower(state, batch, rng).compile()\
                    .cost_analysis()
                if isinstance(cost, (list, tuple)):
                    cost = cost[0]
                flops = float(cost.get("flops", 0.0))
                if flops > 0:
                    mfu_s = (f"  HLO {flops / 1e9:7.1f} GFLOP "
                             f"HFU {flops / (ms / 1e3) / peak * 100:5.2f}%"
                             f" | MFU "
                             f"{a_flops / (ms / 1e3) / peak * 100:5.2f}%")
            except Exception as e:
                mfu_s = f"  (no cost analysis: {type(e).__name__})"
            print(f"  sustained (scan-chained) bf16={int(bf16)} freeze+sg: "
                  f"{ms:7.2f} ms/step ({frames / ms * 1e3:,.0f} frames/s)"
                  f"{mfu_s}")

    if only in ("step", "scan"):
        return

    # ---- phase decomposition: fwd / +bwd / +optimizer ----
    # fwd-only: the train-mode loss computation alone
    if only in ("", "parts"):
        import optax

        @jax.jit
        def fwd(params, bstats, b, r):
            out, _ = model.apply(
                {"params": params, "batch_stats": bstats}, b, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": r,
                      "diffusion": jax.random.fold_in(r, 1),
                      "style": jax.random.fold_in(r, 2)})
            return out["loss"]

        t_f = timed(fwd, state.params, state.batch_stats, batch, rng)
        print(f"  fwd only (loss):   {t_f:7.2f} ms")

        # fwd+bwd+apply, optimizer replaced by scale(0): the A-B delta
        # vs the full step is the clip+AdamW(m/v) cost
        null_tx = optax.scale(0.0)
        from promptttspp_tpu.train.state import split_params as _sp
        st0 = state.replace(opt_state=null_tx.init(
            _sp(state.params, mask)[0]))
        step0 = make_train_step(model, null_tx, donate=False,
                                freeze_mask=mask)
        t_g = timed(step0, st0, batch, rng, iters=10)
        print(f"  fwd+bwd+apply (null opt): {t_g:7.2f} ms "
              f"(bwd ~ {t_g - t_f:.2f})")
        step_full2 = make_train_step(model, tx, donate=False,
                                     freeze_mask=mask)
        t_a = timed(step_full2, state, batch, rng, iters=10)
        print(f"  full step:         {t_a:7.2f} ms "
              f"(clip+AdamW m/v ~ {t_a - t_g:.2f})")

    if only == "parts":
        return
    # ---- components (rep-N marginal, fwd+bwd unless noted) ----
    p = state.params
    bs = state.batch_stats
    C = 256

    # DiffNet single denoise call (the training decoder step)
    dn = model.decoder.denoise_fn
    xw = {"x": jnp.zeros((B, Tf, 80)), "c": jnp.zeros((B, Tf, C)),
          "t": jnp.zeros((B,), jnp.int32)}
    dn_params = {"params": p["decoder"]["denoise_fn"]}

    def dn_apply(prm, xi):
        return dn.apply(prm, xi["x"], xi["t"], xi["c"])

    m, t1 = marginal(lambda n: rep_grad(dn_apply, n), dn_params, xw)
    print(f"  diffnet fwd+bwd:   {m:7.2f} ms/call (1-call jit {t1:.2f})")

    # Conformer encoder
    enc_params = {"params": p["encoder"],
                  "batch_stats": bs.get("encoder", {})}
    xe = {"x": jnp.zeros((B, Tp, C)),
          "l": jnp.full((B,), Tp, jnp.int32)}

    def enc_apply(prm, xi):
        return model.encoder.apply(prm, xi["x"], xi["l"], train=False)

    m, t1 = marginal(lambda n: rep_grad(enc_apply, n), enc_params, xe)
    print(f"  conformer fwd+bwd: {m:7.2f} ms/call (1-call jit {t1:.2f})")

    # BERT prompt encoder
    pe_params = {"params": p["prompt_encoder"]}
    xp = {"ids": batch["prompt_ids"], "mask": batch["prompt_mask"],
          "z": jnp.zeros((1,))}

    def pe_apply(prm, xi):
        return model.prompt_encoder.apply(prm, xi["ids"], xi["mask"],
                                          train=False)

    m, t1 = marginal(lambda n: rep_fwd(pe_apply, n), pe_params, xp)
    print(f"  bert fwd only:     {m:7.2f} ms/call (1-call jit {t1:.2f})")
    m, t1 = marginal(lambda n: rep_grad(pe_apply, n), pe_params, xp)
    print(f"  bert fwd+bwd:      {m:7.2f} ms/call (1-call jit {t1:.2f})")

    # Variance adaptor (duration MDN + frame prior + F0/VUV predictors)
    va_params = {"params": p["variance_adaptor"]}
    pm = jnp.ones((B, Tp), bool)
    fm = jnp.ones((B, Tf), bool)
    xv = {"x": jnp.zeros((B, Tp, C)), "dur": batch["duration"],
          "cf0": batch["log_cf0"], "vuv": batch["vuv"]}

    def va_apply(prm, xi):
        return model.variance_adaptor.apply(
            prm, xi["x"], pm, fm, xi["dur"], xi["cf0"], xi["vuv"], None,
            train=False)

    m, t1 = marginal(lambda n: rep_grad(va_apply, n), va_params, xv)
    print(f"  var-adaptor fwd+bwd: {m:5.2f} ms/call (1-call jit {t1:.2f})")

    # GST reference encoder
    re_params = {"params": p["reference_encoder"],
                  "batch_stats": bs.get("reference_encoder", {})}
    xr = {"mel": batch["mel"], "l": batch["frame_lengths"]}

    def re_apply(prm, xi):
        return model.reference_encoder.apply(prm, xi["mel"], xi["l"],
                                             train=False)

    m, t1 = marginal(lambda n: rep_grad(re_apply, n), re_params, xr)
    print(f"  gst fwd+bwd:       {m:7.2f} ms/call (1-call jit {t1:.2f})")


if __name__ == "__main__":
    main()
