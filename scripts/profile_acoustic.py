"""Acoustic-model latency breakdown on the current backend.

Times the flagship infer path cumulatively: phoneme emb + conformer
encoder, BERT prompt encoding + style MDN, variance adaptor, and the
100-step DDPM decode, with pipelined readback timing (see bench.py).

Usage: python scripts/profile_acoustic.py [frames]
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


def timed(fn, *args, iters=20, reps=3):
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
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 640
    from promptttspp_tpu.flagship import (build_flagship_model,
                                          example_batch, init_flagship)

    B, TP, L = 1, 64, 32
    model = build_flagship_model()
    batch = example_batch(B=B, Tp=TP, Tf=frames, L=L)
    variables = init_flagship(model, batch)
    phoneme = jnp.asarray(batch["phoneme"])
    plens = jnp.asarray(batch["phone_lengths"])
    pids = jnp.asarray(batch["prompt_ids"])
    pmask = jnp.asarray(batch["prompt_mask"])

    def infer_upto(upto):
        def inner(mdl):
            x, phone_mask = mdl._encode_phones(phoneme, plens, train=False)
            if upto == "encoder":
                return x
            style_emb = mdl.prompt_encoder(pids, pmask, train=False)
            log_pi, log_sigma, mu = mdl.style_mdn(
                style_emb.astype(jnp.float32))
            style_emb = mdl._style_from_prompt_dist(
                log_pi, log_sigma, mu, True, 0.0,
                rng=jax.random.PRNGKey(0))
            if upto == "style":
                return style_emb
            x = x + style_emb
            x, flens, fmask, log_cf0, vuv, _raw = mdl.variance_adaptor.infer(
                x, phone_mask, frames)
            if upto == "variance":
                return x
            return mdl.decoder.inference(x, rng=jax.random.PRNGKey(3))

        return jax.jit(lambda v: model.apply(v, method=lambda m: inner(m)))

    full = jax.jit(lambda v: model.apply(
        v, phoneme, plens, frames, prompt_ids=pids, prompt_mask=pmask,
        use_max=True, noise_scale=0.0, diffusion_rng=jax.random.PRNGKey(3),
        return_f0=True, method=type(model).infer))

    t_full = timed(full, variables)
    print(f"full infer ({frames} frames budget): {t_full:8.2f} ms")
    for stage in ("encoder", "style", "variance", "decode"):
        t = timed(infer_upto(stage), variables)
        print(f"cumulative through {stage}: {t:8.2f} ms")


if __name__ == "__main__":
    main()
