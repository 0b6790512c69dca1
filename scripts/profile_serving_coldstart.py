"""Serving cold-start quantification (VERDICT r3 #8).

The bucketed serving design compiles ONE fused text->wav program per
(phone_bucket, frame_bucket) pair. This measures, on the flagship
configuration, what a production deployment actually pays:

- COLD: first request for a bucket with an empty compilation cache
  (process start, nothing persisted) — full XLA compile.
- WARM-PERSISTED: first request for the same bucket in a FRESH process
  with ``jax_compilation_cache_dir`` populated — deserialization only.
- HOT: steady-state request latency (programs already on device).

Run:  python scripts/profile_serving_coldstart.py [--buckets 640 1280]
Each bucket is measured in a subprocess so "fresh process" is real.

The numbers feed the cold/warm table in docs/SERVING.md. The
recommended grid follows from them: quantize phones to 16 and frames to
128 with a 2048 cap -> at most 4 phone x 16 frame = 64 programs, but a
deployment serving typical utterances touches ~6-10; with the
persistent cache the per-bucket warm cost is a deserialize, so
pre-warming the grid at deploy time is cheap and first-user latency
never includes an XLA compile.

Tunnel caveat (measured round 5, documented in BENCHMARKS.md): on this
image's tunneled backend the persistent cache DOES hit (verified via
jax._src.compiler debug logs: 'Persistent compilation cache hit for
jit__full_pass', 32 MB executable) but the FIRST EXECUTION of a
deserialized program pays ~200 s of server-side loading that a normal
PJRT TPU client does not (deserialize there is an in-process
executable load). So warm-vs-cold savings here understate what a
TPU-VM deployment gets from scripts/prewarm_serving.py.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

WORKER = """
import json, os, sys, time
t_start = time.perf_counter()
sys.path.insert(0, {repo!r})
cache_dir = os.environ.get("GRAFT_JAX_CACHE", "")
import jax
if cache_dir:
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp
import numpy as np
from promptttspp_tpu.flagship import (
    build_flagship_model, build_vocoder, example_batch, init_flagship,
    init_vocoder)
from promptttspp_tpu.infer import Synthesizer
from bench import FixedTokenizer, bias_duration_head

frames = {frames}
phones = frames // 10
model = build_flagship_model()
variables = init_flagship(model, example_batch(B=1, Tp=phones,
                                               Tf=frames, L=32))
variables = bias_duration_head(variables, 10.0)
vocoder = build_vocoder("bigvgan_f0")
voc_vars = init_vocoder(vocoder, B=1, frames=frames)
synth = Synthesizer(model, variables, vocoder=vocoder,
                    vocoder_variables=voc_vars,
                    mel_stats={{"mean": 0.0, "std": 1.0}},
                    tokenizer=FixedTokenizer(),
                    phone_quantum=16, frame_quantum=128,
                    max_frames_cap=2048, speculative=True,
                    spec_frames_per_phone=10.0)
setup_s = time.perf_counter() - t_start  # imports + jitted inits
rng = np.random.RandomState(3)
seqs = [list(rng.randint(1, 90, phones))]
t0 = time.perf_counter()
wavs, _ = synth.synthesize(seqs, prompts=["a calm voice"],
                           use_max=True, noise_scale=0.0, seed=0)
first_s = time.perf_counter() - t0
hots = []
for i in range(3):
    t0 = time.perf_counter()
    synth.synthesize(seqs, prompts=["a calm voice"], use_max=True,
                     noise_scale=0.0, seed=1 + i)
    hots.append(time.perf_counter() - t0)
print(json.dumps({{"first_s": first_s, "hot_s": sorted(hots)[1],
                   "setup_s": setup_s,
                   "audio_s": len(wavs[0]) / 24000}}))
"""


def run_worker(frames, cache_dir):
    env = dict(os.environ, GRAFT_JAX_CACHE=cache_dir or "")
    out = subprocess.run(
        [sys.executable, "-c", WORKER.format(repo=str(REPO), frames=frames)],
        capture_output=True, text=True, env=env, timeout=1800)
    if out.returncode != 0:
        print(out.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"worker failed for frames={frames}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", type=int, nargs="+", default=[640, 1280])
    ap.add_argument("--nocache", action="store_true",
                    help="also measure a no-persistent-cache fresh "
                    "process (~= cold minus the cache write; another "
                    "full compile per bucket)")
    args = ap.parse_args()

    rows = []
    for frames in args.buckets:
        with tempfile.TemporaryDirectory(prefix="jaxcache_") as cache:
            t0 = time.perf_counter()
            cold = run_worker(frames, cache)        # populates the cache
            cold_wall = time.perf_counter() - t0
            t0 = time.perf_counter()
            warm = run_worker(frames, cache)        # fresh process, cache hit
            warm_wall = time.perf_counter() - t0
        rows.append(dict(
            frames=frames,
            cold_first_request_s=round(cold["first_s"], 2),
            warm_persisted_first_request_s=round(warm["first_s"], 2),
            hot_request_s=round(warm["hot_s"], 4),
            audio_s=warm["audio_s"],
            cold_setup_s=round(cold["setup_s"], 1),
            warm_setup_s=round(warm["setup_s"], 1),
            cold_process_wall_s=round(cold_wall, 1),
            warm_process_wall_s=round(warm_wall, 1),
        ))
        if args.nocache:
            nocache = run_worker(frames, None)
            rows[-1]["nocache_first_request_s"] = round(
                nocache["first_s"], 2)
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"metric": "serving_coldstart", "rows": rows}))


if __name__ == "__main__":
    main()
