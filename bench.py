"""Benchmark: end-to-end text -> 24 kHz waveform real-time factor.

Runs the full inference pipeline on the flagship configuration (BERT-base
prompt encoding -> style MDN sampling -> conformer -> MDN durations ->
100-step DDPM mel decoding -> F0-aware BigVGAN vocoder) on the default
JAX backend (the real TPU chip under the driver), batch 1, and reports

    {"metric": "text2wav_rtf", "value": <wall/audio>, "unit": "rtf",
     "vs_baseline": <north-star 0.01 / value>}

vs_baseline > 1 means faster than the BASELINE.md v5e target of RTF 0.01
(the reference publishes no speed numbers — BASELINE.json `published: {}`).
"""

import json
import time

from promptttspp_tpu.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from promptttspp_tpu.flagship import (
        build_flagship_model, build_vocoder, example_batch, init_flagship)

    SR, HOP = 24000, 240
    B, TP, MAX_FRAMES, L = 1, 64, 640, 32  # 6.4 s of audio per run

    model = build_flagship_model()
    batch = example_batch(B=B, Tp=TP, Tf=MAX_FRAMES, L=L)
    variables = init_flagship(model, batch)

    vocoder = build_vocoder("bigvgan_f0")
    mel0 = jnp.zeros((B, MAX_FRAMES, 80), jnp.float32)
    f00 = jnp.zeros((B, MAX_FRAMES, 1), jnp.float32)
    voc_vars = vocoder.init(jax.random.PRNGKey(1), mel0, f00,
                            deterministic=True)

    @jax.jit
    def text2wav(variables, voc_vars, phoneme, phone_lengths, prompt_ids,
                 prompt_mask):
        mel, flens, log_cf0, vuv = model.apply(
            variables, phoneme, phone_lengths, MAX_FRAMES,
            prompt_ids=prompt_ids, prompt_mask=prompt_mask,
            use_max=True, noise_scale=0.0,
            diffusion_rng=jax.random.PRNGKey(3),
            return_f0=True,
            method=type(model).infer,
        )
        f0 = jnp.exp(log_cf0) * (vuv > 0.5)
        wav = vocoder.apply(voc_vars, mel, f0, deterministic=True)
        return wav, flens

    args = (
        variables, voc_vars,
        jnp.asarray(batch["phoneme"]), jnp.asarray(batch["phone_lengths"]),
        jnp.asarray(batch["prompt_ids"]), jnp.asarray(batch["prompt_mask"]),
    )

    # warmup / compile. block_until_ready is unreliable on tunneled
    # backends, so each measurement runs ITERS pipelined calls and forces
    # one device->host scalar readback at the end — the per-call time
    # amortizes the tunnel round-trip instead of adding ~30 ms to every
    # iteration.
    ITERS = 20

    def run_block():
        t0 = time.perf_counter()
        for _ in range(ITERS):
            wav, flens = text2wav(*args)
        float(jnp.sum(wav[:, -1, 0]))
        return (time.perf_counter() - t0) / ITERS

    run_block()  # warmup
    times = [run_block() for _ in range(3)]
    wall = float(np.median(times))
    audio_sec = MAX_FRAMES * HOP / SR  # padded synthesis = real compute
    rtf = wall / audio_sec
    target = 0.01
    print(json.dumps({
        "metric": "text2wav_rtf",
        "value": round(rtf, 6),
        "unit": "rtf",
        "vs_baseline": round(target / rtf, 4),
    }))


if __name__ == "__main__":
    main()
