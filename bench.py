"""Benchmark: end-to-end text -> 24 kHz waveform real-time factor.

Runs the full inference pipeline on the flagship configuration (BERT-base
prompt encoding -> style MDN sampling -> conformer -> MDN durations ->
100-step DDPM mel decoding -> F0 zero-phase lowpass + vuv gating ->
F0-aware BigVGAN vocoder) on the default JAX backend (the real TPU chip
under the driver), batch 1, and reports on stdout the driver's ONE line

    {"metric": "text2wav_rtf", "value": <wall/audio>, "unit": "rtf",
     "vs_baseline": <north-star 0.01 / value>}

vs_baseline > 1 means faster than the BASELINE.md v5e target of RTF 0.01
(the reference publishes no speed numbers — BASELINE.json `published: {}`).

The primary value is pipelined throughput RTF (ITERS in-flight calls,
amortized — what a serving queue sees). Single-request latency RTF (one
dispatch + completion readback, what one user sees) is printed to stderr
alongside; BENCHMARKS.md quotes both.

Flags: --sharded-vocoder runs the vocoder via vocode_sharded over all
devices (chunk batch on the mesh data axis); --batch N for batched
serving throughput.
"""

import argparse
import json
import sys
import time

from promptttspp_tpu.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--sharded-vocoder", action="store_true")
    ap.add_argument("--pndm-speedup", type=int, default=0,
                    help="PLMS multistep sampling: K/N denoiser calls "
                    "instead of K (different samples than ancestral)")
    ap.add_argument("--decode-bf16", action="store_true",
                    help="bf16-STORED denoiser weights + hoisted cond "
                    "projections (halves the decode scan's HBM streaming; "
                    "compute stays f32, x carry f32)")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from promptttspp_tpu.flagship import (
        build_flagship_model, build_vocoder, example_batch, init_flagship)
    from promptttspp_tpu.ops.filters import lowpass_filter

    SR, HOP = 24000, 240
    B, TP, MAX_FRAMES, L = args.batch, 64, 640, 32  # 6.4 s of audio per run

    overrides = ([f"+model.decoder.pndm_speedup={args.pndm_speedup}"]
                 if args.pndm_speedup else [])
    if args.decode_bf16:
        overrides.append("+model.decoder.infer_io_dtype=bfloat16")
    model = build_flagship_model(overrides)
    batch = example_batch(B=B, Tp=TP, Tf=MAX_FRAMES, L=L)
    variables = init_flagship(model, batch)
    if args.decode_bf16:
        dn = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            variables["params"]["decoder"]["denoise_fn"])
        variables = {**variables, "params": {
            **variables["params"], "decoder": {
                **variables["params"]["decoder"], "denoise_fn": dn}}}

    vocoder = build_vocoder("bigvgan_f0")
    mel0 = jnp.zeros((B, MAX_FRAMES, 80), jnp.float32)
    f00 = jnp.zeros((B, MAX_FRAMES, 1), jnp.float32)
    voc_vars = vocoder.init(jax.random.PRNGKey(1), mel0, f00,
                            deterministic=True)

    if args.sharded_vocoder:
        from promptttspp_tpu.parallel.mesh import make_mesh
        from promptttspp_tpu.vocoders.streaming import vocode_sharded

        mesh = make_mesh()

    @jax.jit
    def acoustic(variables, phoneme, phone_lengths, prompt_ids, prompt_mask):
        mel, flens, log_cf0, vuv = model.apply(
            variables, phoneme, phone_lengths, MAX_FRAMES,
            prompt_ids=prompt_ids, prompt_mask=prompt_mask,
            use_max=True, noise_scale=0.0,
            diffusion_rng=jax.random.PRNGKey(3),
            return_f0=True,
            method=type(model).infer,
        )
        # f0 smoothing + gating as in the real serving path
        # (infer.py:181-183, reference app.py:76-79)
        log_cf0 = lowpass_filter(log_cf0[..., 0], fs=100, cutoff=20)
        f0 = (jnp.exp(log_cf0) * (vuv[..., 0] > 0.5))[..., None]
        return mel, f0, flens

    @jax.jit
    def fused(variables, voc_vars, *a):
        mel, f0, flens = acoustic(variables, *a)
        return vocoder.apply(voc_vars, mel, f0, deterministic=True), flens

    if args.sharded_vocoder:
        def text2wav(variables, voc_vars, *a):
            mel, f0, flens = acoustic(variables, *a)
            wav = vocode_sharded(mesh, vocoder, voc_vars, mel, f0,
                                 deterministic=True)
            return wav, flens
    else:
        def text2wav(variables, voc_vars, *a):
            return fused(variables, voc_vars, *a)

    margs = (
        variables, voc_vars,
        jnp.asarray(batch["phoneme"]), jnp.asarray(batch["phone_lengths"]),
        jnp.asarray(batch["prompt_ids"]), jnp.asarray(batch["prompt_mask"]),
    )

    # block_until_ready is unreliable on tunneled backends, so each
    # measurement runs ITERS pipelined calls and forces one device->host
    # scalar readback at the end — the per-call time amortizes the tunnel
    # round-trip instead of adding ~30 ms to every iteration.
    ITERS = args.iters

    def run_block(n):
        t0 = time.perf_counter()
        for _ in range(n):
            wav, flens = text2wav(*margs)
        float(jnp.sum(wav[:, -1, 0]))
        return (time.perf_counter() - t0) / n

    run_block(2)  # warmup/compile
    times = [run_block(ITERS) for _ in range(3)]
    wall = float(np.median(times))
    audio_sec = B * MAX_FRAMES * HOP / SR  # padded synthesis = real compute
    rtf = wall / audio_sec

    # single-request latency: one dispatch to completion readback.
    # On a tunneled backend that includes a fixed host<->device RTT that
    # no serving stack would pay on-host; measure it with a null program
    # (same dispatch + scalar readback, ~zero compute) and report both.
    lat = float(np.median([run_block(1) for _ in range(5)]))
    lat_rtf = lat / audio_sec

    null = jax.jit(lambda z: z + 1.0)
    zv = jnp.zeros((8, 128), jnp.float32)
    float(jnp.sum(null(zv)))  # compile
    def null_block():
        t0 = time.perf_counter()
        float(jnp.sum(null(zv)))
        return time.perf_counter() - t0
    null_rtt = float(np.median([null_block() for _ in range(7)]))
    dev_rtf = max(lat - null_rtt, 0.0) / audio_sec
    print(json.dumps({
        "metric": "text2wav_latency_rtf", "value": round(lat_rtf, 6),
        "unit": "rtf", "batch": B,
        "device_latency_rtf": round(dev_rtf, 6),
        "null_dispatch_ms": round(null_rtt * 1e3, 2),
        "note": "single request dispatch->readback; device_latency_rtf "
                "subtracts the measured null-program round-trip "
                "(tunnel/transport cost, not device or host-serving time)",
    }), file=sys.stderr)

    target = 0.01
    print(json.dumps({
        "metric": "text2wav_rtf",
        "value": round(rtf, 6),
        "unit": "rtf",
        "vs_baseline": round(target / rtf, 4),
    }))
    # tunneled-TPU backends can hang in interpreter teardown; the result
    # is already printed, so exit hard rather than risk the driver's
    # timeout
    sys.stdout.flush()
    sys.stderr.flush()
    import os
    os._exit(0)


if __name__ == "__main__":
    main()
