"""Deploy-time serving pre-warm: compile the fused text->wav program
grid into JAX's persistent compilation cache so a serving process's
first request deserializes instead of compiling (VERDICT r4 #1).

The bucketed Synthesizer compiles ONE program per (batch, phone-bucket,
frame-bucket, prompt-len) shape; the first request per shape otherwise
pays the full XLA compile (~67 s/bucket on the 1-core bench host —
hundreds of seconds of first-user latency). The bucket grid is static
and known at deploy time, so run this once per (model, config, jax
version) against a shared ``--cache-dir``; every serving process started
with ``JAX_COMPILATION_CACHE_DIR`` pointing at it starts warm. Measured
cold/warm-persisted/hot numbers: BENCHMARKS.md §Serving cold start
(produced by scripts/profile_serving_coldstart.py).

Usage:
  # real deployment (same config surface as synthesize.py / app.py):
  python scripts/prewarm_serving.py --cache-dir /srv/jaxcache -- \
      model_ckpt=... vocoder_ckpt=... [hydra overrides...]
  # self-test on random-init flagship weights (no checkpoints needed;
  # compiles are weight-independent so the cache is equally valid):
  python scripts/prewarm_serving.py --cache-dir /tmp/jaxcache --selftest

Grid selection: --grid speculative (default; exactly the shapes
speculative happy-path serving touches) or --grid full (every bucket
pair — covers mispredict re-dispatch shapes too), --batch-sizes,
--prompt-lens, --max-phones.
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


def build_selftest_synth(args):
    """Random-init flagship + vocoder (XLA programs are shape-keyed, not
    weight-keyed, so the persisted cache is identical to a real-ckpt
    run's)."""
    import jax
    import jax.numpy as jnp

    from promptttspp_tpu.flagship import (
        build_flagship_model, build_vocoder, example_batch, init_flagship,
        init_vocoder)
    from promptttspp_tpu.infer import Synthesizer

    sys.path.insert(0, str(REPO))
    from bench import FixedTokenizer

    B = max(args.batch_sizes)
    model = build_flagship_model()
    variables = init_flagship(model, example_batch(B=B, Tp=64, Tf=640,
                                                   L=32))
    vocoder = build_vocoder("bigvgan_f0")
    voc_vars = init_vocoder(vocoder, B=B, frames=640)
    return Synthesizer(
        model, variables, vocoder=vocoder, vocoder_variables=voc_vars,
        mel_stats={"mean": 0.0, "std": 1.0}, tokenizer=FixedTokenizer(),
        phone_quantum=16, frame_quantum=128, max_frames_cap=2048,
        speculative=True, spec_frames_per_phone=10.0, return_int16=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache-dir", required=True,
                    help="persistent compilation cache directory "
                    "(serve with JAX_COMPILATION_CACHE_DIR=<this>)")
    ap.add_argument("--grid", choices=("speculative", "full"),
                    default="speculative")
    ap.add_argument("--batch-sizes", type=int, nargs="+", default=[1])
    ap.add_argument("--prompt-lens", type=int, nargs="+", default=[32])
    ap.add_argument("--max-phones", type=int, default=208,
                    help="prewarm phone buckets up to this count "
                    "(208 phones ~= the 2048-frame cap at 10 f/phone)")
    ap.add_argument("--selftest", action="store_true",
                    help="random-init flagship instead of checkpoints")
    ap.add_argument("--use-max", type=int, default=1,
                    help="use_max STATIC arg the deployment serves with "
                    "(the compiled grid is keyed on it)")
    ap.add_argument("--noise-scale", type=float, default=0.5,
                    help="noise_scale STATIC arg the deployment serves "
                    "with (the compiled grid is keyed on it)")
    ap.add_argument("--streaming", action="store_true",
                    help="also compile the synthesize_streaming program "
                    "set (acoustic-only pass per grid entry + the "
                    "chunk-shaped streaming vocoder programs)")
    ap.add_argument("overrides", nargs="*",
                    help="hydra overrides for the synthesize.py config "
                    "(model_ckpt=... vocoder_ckpt=... etc.)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(args.cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    if args.selftest:
        synth = build_selftest_synth(args)
    else:
        sys.path.insert(0, str(REPO / "egs" / "proposed" / "bin"))
        from synthesize import build_synthesizer  # noqa: E402

        from promptttspp_tpu.config import compose

        cfg = compose(REPO / "conf", "synthesize", overrides=args.overrides,
                      drop_hydra_node=False)
        synth = build_synthesizer(cfg)
        synth.speculative = True

    t0 = time.perf_counter()
    rows = synth.prewarm(
        batch_sizes=tuple(args.batch_sizes),
        prompt_lens=tuple(args.prompt_lens),
        grid=args.grid, max_phones=args.max_phones,
        use_max=bool(args.use_max), noise_scale=args.noise_scale,
        streaming=args.streaming,
        log=lambda m: print(m, file=sys.stderr, flush=True))
    total = time.perf_counter() - t0
    print(json.dumps({
        "metric": "prewarm", "cache_dir": str(args.cache_dir),
        "grid": args.grid, "programs": len(rows),
        "total_s": round(total, 1), "rows": rows,
    }))


if __name__ == "__main__":
    main()
