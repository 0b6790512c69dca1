"""Benchmark: end-to-end text -> 24 kHz waveform through the SHIPPED
``Synthesizer`` request path (VERDICT r3 #1: measure what you ship).

Runs the full serving pipeline on the flagship configuration (BERT-base
prompt encoding -> style MDN sampling -> conformer -> MDN durations ->
100-step DDPM mel decoding -> F0 zero-phase lowpass + vuv gating ->
F0-aware BigVGAN vocoder) on the default JAX backend (the real TPU chip
under the driver) and reports on stdout the driver's ONE line

    {"metric": "text2wav_rtf", "value": <wall/audio>, "unit": "rtf",
     "vs_baseline": <north-star 0.01 / value>}

The value is the PIPELINED request cadence of the shipped serving API:
``synthesize_async`` with ``--queue-depth`` requests in flight (a
serving queue overlaps request N+1's device compute with request N's
audio readback), tokenized prompts in, sliced numpy PCM16 wav out —
every dispatch, host loop, and readback the served path actually pays.
The blocking single-request ``synthesize()`` wall latency and its
decomposition against measured transport baselines (null dispatch and
a same-payload null program — this backend is a tunneled chip, so a
round trip costs ~30-40 ms that no on-host deployment pays) are
reported alongside on stderr. vs_baseline > 1 means faster than the
BASELINE.md v5e target of RTF 0.01 (the reference publishes no speed
numbers — BASELINE.json `published: {}`).

Serving configuration measured (and reported alongside on stderr):
- speculative single-dispatch requests (``Synthesizer(speculative=
  True)``): the frame bucket is predicted from the phone count and the
  fused text->wav program dispatched immediately; its own unclipped
  duration sums verify the prediction in the readback that delivers the
  audio. ``--two-phase`` measures the duration-prepass path instead.
- the random-init duration head is biased to a constant
  ``--head-fpp`` frames/phone (default 10 = the standard 640-frame /
  6.4 s utterance every round has benchmarked). NOTE: with the default
  head the speculative predictor's 10-frames/phone assumption is
  exactly right, so "0 mispredicts" validates the dispatch/verify
  PLUMBING only — it says nothing about mispredict rates on real
  duration distributions (those are quantified in
  scripts/spec_serving_eval.py and BENCHMARKS.md §Speculative).
  ``--head-fpp 7`` decodes real-speech-average durations instead: the
  speculative bucket then over-provisions (640 vs the true 512-frame
  bucket) — compare against ``--two-phase --head-fpp 7`` to measure the
  over-provision cost the speculative single dispatch pays.
- a null-program dispatch+readback is measured alongside: over this
  tunneled backend it is pure transport (~tens of ms) that no on-host
  serving stack would pay; device_latency_rtf = (wall - null)/audio.

Flags: --batch N (batched serving), --two-phase, --pndm-speedup K,
--decode-bf16 (bf16-STORED denoiser weights + cond projections; compute
stays f32), --return-mels (include the mel readback in the timing),
--iters N.
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


class FixedTokenizer:
    """Deterministic stand-in for the host WordPiece tokenizer (prompt
    tokenization is host-side microseconds; the model sees ids either
    way)."""

    pad_id = 0

    def __init__(self, L=32, seed=0):
        self.L = L
        self.rng = np.random.RandomState(seed)

    def batch_encode(self, prompts):
        ids = self.rng.randint(1000, 29000,
                               (len(prompts), self.L)).astype(np.int32)
        ids[:, 0] = 101
        ids[:, -1] = 102
        return ids, np.ones_like(ids)


def bias_duration_head(variables, frames_per_phone=10.0):
    """Pin the random-init duration MDN to a constant ``frames_per_phone``
    so the benchmark decodes the standard 640-frame bucket: mu head ->
    log(fpp) (zero kernel), log_sigma head -> -7 (its clamp floor)."""
    p = variables["params"]
    head = p["variance_adaptor"]["duration_predictor"]["out_layer"]
    mu, ls = head["mu"], head["log_sigma"]
    head = {
        **head,
        "mu": {"kernel": jnp.zeros_like(mu["kernel"]),
               "bias": jnp.full_like(mu["bias"],
                                     float(np.log(frames_per_phone)))},
        "log_sigma": {"kernel": jnp.zeros_like(ls["kernel"]),
                      "bias": jnp.full_like(ls["bias"], -7.0)},
    }
    dp = {**p["variance_adaptor"]["duration_predictor"], "out_layer": head}
    va = {**p["variance_adaptor"], "duration_predictor": dp}
    return {**variables, "params": {**p, "variance_adaptor": va}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--two-phase", action="store_true",
                    help="duration pre-pass + fused pass (2 dispatches) "
                    "instead of the speculative single dispatch")
    ap.add_argument("--pndm-speedup", type=int, default=0,
                    help="PLMS multistep sampling: K/N denoiser calls "
                    "instead of K (different samples than ancestral)")
    ap.add_argument("--decode-bf16", action="store_true",
                    help="bf16-STORED denoiser weights + hoisted cond "
                    "projections (halves the decode scan's HBM streaming; "
                    "compute stays f32, x carry f32)")
    ap.add_argument("--return-mels", action="store_true",
                    help="include the per-request mel readback")
    ap.add_argument("--f32-wav", action="store_true",
                    help="read the waveform back as f32 instead of the "
                    "served PCM16 (doubles the payload bytes)")
    ap.add_argument("--queue-depth", type=int, default=4,
                    help="in-flight synthesize_async requests for the "
                    "pipelined throughput measurement")
    ap.add_argument("--ttfa", action="store_true",
                    help="also measure time-to-first-audio via "
                    "synthesize_streaming (chunked vocoder)")
    ap.add_argument("--first-chunk", type=int, default=0,
                    help="TTFA ramp: frames in the FIRST streamed chunk "
                    "(0 = full chunk_frames)")
    ap.add_argument("--head-fpp", type=float, default=10.0,
                    help="frames/phone the biased duration head emits "
                    "(10 = matches the speculative predictor exactly -> "
                    "0 mispredicts BY CONSTRUCTION; 7 = real-speech "
                    "average -> measures speculative over-provisioning)")
    ap.add_argument("--iters", type=int, default=7)
    args = ap.parse_args()

    from promptttspp_tpu.flagship import (
        build_flagship_model, build_vocoder, example_batch, init_flagship,
        init_vocoder)
    from promptttspp_tpu.infer import Synthesizer

    from promptttspp_tpu.data.batching import bucket_shape

    SR, HOP = 24000, 240
    B, TP = args.batch, 64  # 64 phones; default 10 f/phone = 6.4 s/utt
    true_frames = max(1, int(round(TP * args.head_fpp)))
    # the frame bucket each mode actually runs: speculative predicts
    # from the phone count (10 f/phone default), two-phase buckets the
    # head's true durations — at --head-fpp 7 these DIFFER (640 vs 512),
    # which is exactly the over-provision under measurement
    spec_bucket = min(bucket_shape(int(np.ceil(TP * 10.0)), 128), 2048)
    true_bucket = min(bucket_shape(true_frames, 128), 2048)
    FRAMES = true_bucket if args.two_phase else spec_bucket

    overrides = ([f"+model.decoder.pndm_speedup={args.pndm_speedup}"]
                 if args.pndm_speedup else [])
    if args.decode_bf16:
        overrides.append("+model.decoder.infer_io_dtype=bfloat16")
    model = build_flagship_model(overrides)
    variables = init_flagship(model, example_batch(B=B, Tp=TP, Tf=FRAMES,
                                                   L=32))
    variables = bias_duration_head(variables, args.head_fpp)

    vocoder = build_vocoder("bigvgan_f0")
    voc_vars = init_vocoder(vocoder, B=B, frames=FRAMES)

    synth = Synthesizer(
        model, variables, vocoder=vocoder, vocoder_variables=voc_vars,
        mel_stats={"mean": 0.0, "std": 1.0}, tokenizer=FixedTokenizer(),
        phone_quantum=16, frame_quantum=128, max_frames_cap=2048,
        speculative=not args.two_phase, spec_frames_per_phone=10.0,
        return_int16=not args.f32_wav,
        first_chunk_frames=args.first_chunk or None,
        decode_param_dtype="bfloat16" if args.decode_bf16 else None)

    rng = np.random.RandomState(3)
    seqs = [list(rng.randint(1, 90, TP)) for _ in range(B)]
    prompts = ["a deep calm male voice speaking slowly"] * B

    def request(seed):
        wavs, _ = synth.synthesize(seqs, prompts=prompts, use_max=True,
                                   noise_scale=0.0, seed=seed,
                                   return_mels=args.return_mels)
        return wavs

    # cold start: first request compiles the fused program for this
    # (phone, frame) bucket
    t0 = time.perf_counter()
    wavs = request(0)
    cold_s = time.perf_counter() - t0
    assert all(np.isfinite(w).all() for w in wavs)
    audio_sec = sum(len(w) for w in wavs) / SR
    request(1)  # settle caches

    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        request(2 + i)
        times.append(time.perf_counter() - t0)
    wall = float(np.median(times))
    single_rtf = wall / audio_sec

    # pipelined shipped-path throughput: a serving queue keeps
    # ``queue_depth`` synthesize_async requests in flight, so request
    # N+1's device compute runs while request N's audio streams back —
    # sustained throughput is compute-bound, not round-trip-bound. This
    # is the request cadence a deployment sees; the headline metric.
    rtf = single_rtf
    if not args.two_phase:
        from collections import deque

        K = max(1, args.queue_depth)
        N = max(args.iters * 2, 2 * K)
        pending = deque()
        t0 = time.perf_counter()
        for i in range(N):
            pending.append(synth.synthesize_async(
                seqs, prompts=prompts, use_max=True, noise_scale=0.0,
                seed=100 + i, return_mels=args.return_mels))
            if len(pending) >= K:
                pending.popleft().result()
        while pending:
            pending.popleft().result()
        tput_wall = (time.perf_counter() - t0) / N
        rtf = tput_wall / audio_sec

    # transport baselines on this tunneled backend (an on-host serving
    # stack pays neither): a null program (scalar readback) and a
    # payload-null that is a REQUEST-SHAPED null — it takes the exact
    # same fresh host numpy argument set a request ships (phonemes,
    # lengths, prompt ids/mask, two raw PRNG keys) and returns the exact
    # tensors a request reads back (wav, frame lens, raw dur sums), with
    # ~zero compute in between. wall(request) - wall(payload_null) is
    # therefore device compute alone: every host->device arg transfer,
    # enqueue, and readback RTT appears in both.
    null = jax.jit(lambda z: z + 1.0)
    zv = jnp.zeros((8, 128), jnp.float32)
    float(jnp.sum(null(zv)))  # compile
    def null_block():
        t0 = time.perf_counter()
        float(jnp.sum(null(zv)))
        return time.perf_counter() - t0
    null_rtt = float(np.median([null_block() for _ in range(7)]))

    wav_dtype = jnp.float32 if args.f32_wav else jnp.int16
    Ts = FRAMES * HOP
    tok = FixedTokenizer()

    @jax.jit
    def payload_null(phoneme, plens, pids, pmask, k1, k2):
        s = (phoneme[0, 0] + plens[0] + pids[0, 0] + pmask[0, 0]
             + k1[0].astype(jnp.int32) + k2[0].astype(jnp.int32))
        return (jnp.zeros((B, Ts, 1), wav_dtype) + s.astype(wav_dtype),
                jnp.zeros((B,), jnp.int32) + s,
                jnp.zeros((B,), jnp.int32) + s)

    def payload_args(seed):
        # fresh host arrays each call, like a real request's padding path
        rng_ = np.random.RandomState(seed)
        phoneme = rng_.randint(1, 90, (B, TP)).astype(np.int32)
        plens = np.full((B,), TP, np.int32)
        pids, pmask = tok.batch_encode(prompts)
        k = np.array([0, seed], np.uint32)
        return phoneme, plens, pids, pmask, k, np.array([0, seed + 1],
                                                        np.uint32)

    jax.device_get(payload_null(*payload_args(0)))  # compile
    def payload_block(seed):
        a = payload_args(seed)
        t0 = time.perf_counter()
        jax.device_get(payload_null(*a))
        return time.perf_counter() - t0
    payload_rtt = float(np.median([payload_block(i) for i in range(7)]))
    dev_rtf = max(wall - payload_rtt, 0.0) / audio_sec

    # honest dispatch/bucket accounting: a speculative mispredict re-runs
    # at the true bucket, so the delivered audio comes from true_bucket
    # and the request paid BOTH dispatches — report from the observed
    # mispredict counters, not the static prediction
    mis_ratio = (synth.spec_mispredicts / max(synth.spec_requests, 1)
                 if not args.two_phase else 0.0)
    final_bucket = (true_bucket if mis_ratio > 0 and not args.two_phase
                    else FRAMES)
    print(json.dumps({
        "metric": "text2wav_latency_detail",
        "single_request_wall_s": round(wall, 4),
        "single_request_rtf": round(single_rtf, 6),
        "audio_s": round(audio_sec, 2),
        "batch": B,
        "wav_dtype": "float32" if args.f32_wav else "int16",
        "dispatches_per_request": (2 if args.two_phase
                                   else round(1 + mis_ratio, 3)),
        "spec_requests": synth.spec_requests,
        "spec_mispredicts": synth.spec_mispredicts,
        "head_frames_per_phone": args.head_fpp,
        "true_frames": true_frames,
        "bucket_frames": final_bucket,
        "speculative_bucket_frames": None if args.two_phase else FRAMES,
        "over_provision": round(final_bucket / true_frames, 4),
        "device_latency_rtf": round(dev_rtf, 6),
        "null_dispatch_ms": round(null_rtt * 1e3, 2),
        "payload_null_ms": round(payload_rtt * 1e3, 2),
        "queue_depth": args.queue_depth,
        "cold_start_s": round(cold_s, 2),
        "note": "Synthesizer request path. single_request_* is one "
                "blocking synthesize(); the headline text2wav_rtf is "
                "the pipelined synthesize_async cadence (queue_depth in "
                "flight). device_latency_rtf = (single wall - "
                "payload_null) / audio, where payload_null is a "
                "REQUEST-SHAPED null: same fresh host args in, same "
                "output tensors back, ~zero compute — so the subtraction "
                "isolates device compute; the rest is tunnel transport "
                "no on-host deployment pays."
                + (" spec_mispredicts=0 is BY CONSTRUCTION here (the "
                   "head is pinned at the predictor's 10 f/phone) — "
                   "plumbing validation only; real-distribution rates: "
                   "scripts/spec_serving_eval.py."
                   if (not args.two_phase and args.head_fpp == 10.0)
                   else ""),
    }), file=sys.stderr)

    if args.ttfa:
        # time-to-first-audio: acoustic dispatch + first vocoder chunk
        def first_chunk(seed):
            t0 = time.perf_counter()
            gen = synth.synthesize_streaming(seqs, prompts=prompts,
                                             use_max=True, noise_scale=0.0,
                                             seed=seed)
            chunk = next(gen)
            dt = time.perf_counter() - t0
            gen.close()
            return dt, chunk.shape[1] / SR
        first_chunk(100)  # compile the chunk-shaped vocoder program
        pairs = [first_chunk(101 + i) for i in range(5)]
        ttfa = float(np.median([p[0] for p in pairs]))
        print(json.dumps({
            "metric": "ttfa", "ttfa_ms": round(ttfa * 1e3, 1),
            "first_chunk_audio_s": round(pairs[0][1], 3),
            "chunk_frames": synth.chunk_frames,
            "first_chunk_frames": synth.first_chunk_frames
                                  or synth.chunk_frames,
            "note": "time from request to the first audible chunk "
                    "(streaming serve; full request still completes at "
                    "text2wav_rtf)",
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
