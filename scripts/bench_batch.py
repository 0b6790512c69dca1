"""Batched serving throughput: full text->wav at batch B.

Complements bench.py (batch-1 latency): measures per-utterance RTF and
utterances/sec/chip when synthesis is batched — the serving configuration
(two-phase bucketed inference batches eval utterances the same way,
promptttspp_tpu/infer.py).

Usage: python scripts/bench_batch.py [batch] [frames]
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


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    SR, HOP = 24000, 240
    from promptttspp_tpu.flagship import (build_flagship_model,
                                          build_vocoder, example_batch,
                                          init_flagship, init_vocoder)

    model = build_flagship_model()
    batch = example_batch(B=B, Tp=64, Tf=frames, L=32)
    variables = init_flagship(model, batch)
    vocoder = build_vocoder("bigvgan_f0")
    voc_vars = init_vocoder(vocoder, B=B, frames=frames)

    @jax.jit
    def text2wav(variables, voc_vars, phoneme, plens, pids, pmask):
        mel, flens, log_cf0, vuv = model.apply(
            variables, phoneme, plens, frames, prompt_ids=pids,
            prompt_mask=pmask, use_max=True, noise_scale=0.0,
            diffusion_rng=jax.random.PRNGKey(3), return_f0=True,
            method=type(model).infer)
        f0 = jnp.exp(log_cf0) * (vuv > 0.5)
        return vocoder.apply(voc_vars, mel, f0, deterministic=True)

    args = (variables, voc_vars, jnp.asarray(batch["phoneme"]),
            jnp.asarray(batch["phone_lengths"]),
            jnp.asarray(batch["prompt_ids"]),
            jnp.asarray(batch["prompt_mask"]))

    ITERS = 10

    def run_block():
        t0 = time.perf_counter()
        for _ in range(ITERS):
            wav = text2wav(*args)
        float(jnp.sum(wav[:, -1, 0]))
        return (time.perf_counter() - t0) / ITERS

    run_block()
    wall = float(np.median([run_block() for _ in range(3)]))
    audio_sec = frames * HOP / SR
    rtf = wall / (audio_sec * B)
    print(f"batch={B} frames={frames}: {wall * 1e3:.1f} ms/batch, "
          f"per-utt RTF {rtf:.5f}, "
          f"{B * audio_sec / wall:.1f} s of audio per wall-second, "
          f"{B / wall:.2f} utt/s/chip")


if __name__ == "__main__":
    main()
