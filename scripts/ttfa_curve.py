"""TTFA vs ``first_chunk_frames`` curve (VERDICT r4 #5): measure the
time-to-first-audio of ``Synthesizer.synthesize_streaming`` as the first
vocoder chunk is ramped down (the round-4 lever: a smaller
phase-continuous first chunk means less vocoder work before the first
audible bytes, at the cost of one extra compiled vocoder shape).

One process, one model/vocoder init, ONE shared fused acoustic program:
``first_chunk_frames`` is read per call, so the sweep mutates it on a
single Synthesizer and only the first-chunk-shaped vocoder program
compiles per setting. Flagship config, 64 phones at 10 frames/phone =
the standard 640-frame / 6.4 s utterance, 100-step DDPM chain,
``chunk_frames=256`` steady-state streaming (as bench.py --ttfa).

Usage: python scripts/ttfa_curve.py [--first-chunks 256,128,64,32]
Writes results/ttfa_curve.json and prints one JSON line per setting.
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from promptttspp_tpu.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import numpy as np  # noqa: E402

from bench import FixedTokenizer, bias_duration_head  # noqa: E402

SR, HOP = 24000, 240


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--first-chunks", default="256,128,64,32",
                    help="comma list; 256 == chunk_frames (no ramp)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default="results/ttfa_curve.json")
    args = ap.parse_args()

    from promptttspp_tpu.flagship import (build_flagship_model,
                                          build_vocoder, example_batch,
                                          init_flagship, init_vocoder)
    from promptttspp_tpu.infer import Synthesizer

    B, TP, FRAMES = 1, 64, 640
    model = build_flagship_model()
    variables = init_flagship(model, example_batch(B=B, Tp=TP, Tf=FRAMES,
                                                   L=32))
    variables = bias_duration_head(variables, 10.0)
    vocoder = build_vocoder("bigvgan_f0")
    voc_vars = init_vocoder(vocoder, B=B, frames=FRAMES)
    synth = Synthesizer(
        model, variables, vocoder=vocoder, vocoder_variables=voc_vars,
        mel_stats={"mean": 0.0, "std": 1.0}, tokenizer=FixedTokenizer(),
        phone_quantum=16, frame_quantum=128, max_frames_cap=2048,
        speculative=True, spec_frames_per_phone=10.0, chunk_frames=256)

    rng = np.random.RandomState(3)
    seqs = [list(rng.randint(1, 90, TP)) for _ in range(B)]
    prompts = ["a deep calm male voice speaking slowly"] * B

    def once(seed):
        t0 = time.perf_counter()
        gen = synth.synthesize_streaming(seqs, prompts=prompts,
                                         use_max=True, noise_scale=0.0,
                                         seed=seed)
        chunk = next(gen)
        dt = time.perf_counter() - t0
        gen.close()
        return dt, chunk.shape[1] / SR

    rows = []
    for i, fc in enumerate(int(x) for x in args.first_chunks.split(",")):
        synth.first_chunk_frames = None if fc >= synth.chunk_frames else fc
        once(100 + 50 * i)  # compile this first-chunk shape
        pairs = [once(101 + 50 * i + j) for j in range(args.iters)]
        row = {
            "first_chunk_frames": fc,
            "ttfa_ms": round(
                float(np.median([p[0] for p in pairs])) * 1e3, 1),
            "first_chunk_audio_s": round(pairs[0][1], 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {
        "metric": "ttfa_vs_first_chunk",
        "chunk_frames": synth.chunk_frames,
        "utterance_s": FRAMES * HOP / SR,
        "rows": rows,
        "note": "streaming serve, flagship + full BigVGAN, 100-step "
                "chain, one v5e chip over the tunnel (~37 ms of every "
                "TTFA is transport no on-host deployment pays)",
    }
    (REPO / args.out).parent.mkdir(parents=True, exist_ok=True)
    (REPO / args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps({k: v for k, v in out.items() if k != "rows"}),
          file=sys.stderr)
    sys.stdout.flush()
    import os

    os._exit(0)  # dodge tunnel teardown hangs


if __name__ == "__main__":
    main()
