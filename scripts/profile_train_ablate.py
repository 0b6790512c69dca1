"""In-situ train-step ablation: time the FULL jitted step with one
component at a time replaced by a cheap gradient-preserving stub.

profile_train_breakdown.py times components in isolation (rep-N
marginal), which misses inter-module glue: layout changes, fusion
boundaries, dropout/RNG plumbing, batch-stat updates. Here each ablation
keeps the step's structure (loss pytree, optimizer, donation) identical,
so full_step - ablated_step attributes the component's cost as actually
compiled into the production program.

Usage: python scripts/profile_train_ablate.py [B] [Tp] [Tf]
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
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        ts.append((time.perf_counter() - t0) / iters)
    return float(np.median(ts)) * 1e3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    Tp = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    Tf = int(sys.argv[3]) if len(sys.argv) > 3 else 512

    from promptttspp_tpu.flagship import (
        build_flagship_model, example_batch, init_flagship)
    from promptttspp_tpu.train.state import (
        bert_freeze_mask, create_train_state, freeze_opt_state,
        make_optimizer, make_train_step)

    batch = {k: jnp.asarray(v)
             for k, v in example_batch(B=B, Tp=Tp, Tf=Tf, L=32).items()}
    rng = jax.random.key(0, impl="rbg")  # production impl (trainer.py)
    frames = B * Tf

    # gradient-preserving stubs: each consumes its params (via one tiny
    # projection of a real weight) and its input (mean), so the grad
    # graph over every OTHER module is unchanged while this module's
    # compute disappears.
    import promptttspp_tpu.models.diffusion as diffusion
    import promptttspp_tpu.models.style_encoder as style_encoder
    import promptttspp_tpu.models.variance_adaptor as va_mod
    import promptttspp_tpu.nn.conformer as conformer

    originals = {}

    def stub_decoder():
        orig = diffusion.GaussianDiffusion.__call__

        def fake(self, cond, y, mask=None, g=None, t=None, noise=None):
            s = jnp.mean(cond) + jnp.mean(y)
            z = jnp.broadcast_to(s, y.shape)
            return z, z * 0.5
        diffusion.GaussianDiffusion.__call__ = fake
        return ("decoder (DiffNet denoise)",
                lambda: setattr(diffusion.GaussianDiffusion, "__call__", orig))

    def stub_gst():
        orig = style_encoder.StyleEncoder.__call__

        def fake(self, mel, lengths, train=False, row_weight=None):
            C = self.gst_token_dim if hasattr(self, "gst_token_dim") else 256
            s = jnp.mean(mel)
            return jnp.broadcast_to(s, (mel.shape[0], 1, 256))
        style_encoder.StyleEncoder.__call__ = fake
        return ("reference_encoder (GST)",
                lambda: setattr(style_encoder.StyleEncoder, "__call__", orig))

    def stub_va():
        orig = va_mod.VarianceAdaptor.__call__

        def fake(self, x, phone_mask, frame_mask, duration, log_cf0, vuv,
                 energy, train=False):
            B_, Tp_, C = x.shape
            Tf_ = frame_mask.shape[1]
            s = jnp.mean(x)
            xf = jnp.broadcast_to(s, (B_, Tf_, C))
            g = jnp.zeros((B_, Tp_, 1)) + s
            mdn_out = (jnp.zeros((B_, Tp_, 4, 1)) + s,
                       jnp.zeros((B_, Tp_, 4, 1)) + s,
                       jnp.zeros((B_, Tp_, 4, 1)) + s)
            zf = jnp.zeros((B_, Tf_, 1)) + s
            return xf, mdn_out, zf, zf, None
        va_mod.VarianceAdaptor.__call__ = fake
        return ("variance_adaptor",
                lambda: setattr(va_mod.VarianceAdaptor, "__call__", orig))

    def stub_encoder():
        orig = conformer.ConformerEncoder.__call__

        def fake(self, x, lengths, train=False, row_weight=None):
            return x + jnp.mean(x)
        conformer.ConformerEncoder.__call__ = fake
        return ("conformer encoder",
                lambda: setattr(conformer.ConformerEncoder, "__call__", orig))

    # ---- sub-component stubs (VERDICT r3 #4: attribute the VA's
    # in-situ delta and the ~4 ms residual at component level) --------

    def stub_fpn():
        import promptttspp_tpu.models.frame_prior as fp

        orig = fp.FramePriorNetwork.__call__

        def fake(self, x, mask, train=False):
            return x * mask + jnp.mean(x)
        fp.FramePriorNetwork.__call__ = fake
        return ("va.frame_prior_network (6x conv k17)",
                lambda: setattr(fp.FramePriorNetwork, "__call__", orig))

    def stub_pitch():
        orig = va_mod.Predictor.__call__

        def fake(self, x, mask, train=False):
            s = jnp.mean(x)
            return (jnp.zeros(x.shape[:2] + (self.out_channels,),
                              x.dtype) + s) * mask
        va_mod.Predictor.__call__ = fake
        return ("va.pitch_predictor (5x conv k5)",
                lambda: setattr(va_mod.Predictor, "__call__", orig))

    def stub_durpred():
        orig = va_mod.MDNPredictor.__call__

        def fake(self, x, mask, train=False):
            B_, Tp_ = x.shape[:2]
            s = jnp.mean(x).astype(jnp.float32)
            z = jnp.zeros((B_, Tp_, self.num_gaussians, self.out_channels),
                          jnp.float32) + s
            return z, z, z
        va_mod.MDNPredictor.__call__ = fake
        return ("va.duration_predictor (MDN, phone res)",
                lambda: setattr(va_mod.MDNPredictor, "__call__", orig))

    def stub_expand():
        orig = va_mod.expand_by_durations

        def fake(x, durations, phone_mask, num_frames):
            s = jnp.mean(x) + jnp.mean(durations.astype(x.dtype)) * 0.0
            return jnp.broadcast_to(s, (x.shape[0], num_frames, x.shape[2]))
        va_mod.expand_by_durations = fake
        return ("va.expand_by_durations (einsum scatter)",
                lambda: setattr(va_mod, "expand_by_durations", orig))

    def stub_gradnorm():
        import optax

        orig = optax.global_norm

        def fake(tree):
            return jnp.float32(0.0)
        optax.global_norm = fake  # the metric only; clip_by_global_norm
        # resolves the internal linear_algebra.global_norm, not this alias
        return ("grad_norm metric (optax.global_norm)",
                lambda: setattr(optax, "global_norm", orig))

    def stub_all():
        restores = [s()[1] for s in (stub_decoder, stub_gst, stub_va,
                                     stub_encoder)]

        def restore():
            for r in restores:
                r()
        return ("ALL modules stubbed (= embeddings + losses + masks + "
                "optimizer + dispatch floor)", restore)

    def run_one(name, stubber):
        if stubber is not None:
            label, restore = stubber()
        else:
            label, restore = name, lambda: None
        try:
            model = build_flagship_model()
            variables_rng = jax.random.PRNGKey(0)
            state = create_train_state(model, batch, variables_rng,
                                       make_optimizer())
            tx = make_optimizer()
            mask = bert_freeze_mask(state.params)
            state = freeze_opt_state(state, tx, mask)
            step = make_train_step(model, tx, donate=False, freeze_mask=mask)
            t = timed(step, state, batch, rng)
            print(f"  {label:36s}: {t:7.2f} ms "
                  f"({frames / t * 1e3:,.0f} frames/s)")
            return t
        finally:
            restore()

    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    print(f"train-step ablation  B={B} Tp={Tp} Tf={Tf}")
    t_full = run_one("FULL step", None)
    for key, stubber in (("decoder", stub_decoder), ("gst", stub_gst),
                         ("va", stub_va), ("encoder", stub_encoder),
                         ("fpn", stub_fpn), ("pitch", stub_pitch),
                         ("durpred", stub_durpred), ("expand", stub_expand),
                         ("gradnorm", stub_gradnorm), ("all", stub_all)):
        if only is not None and key not in only:
            continue
        t = run_one("", stubber)
        print(f"    -> attributed: {t_full - t:6.2f} ms")


if __name__ == "__main__":
    main()
