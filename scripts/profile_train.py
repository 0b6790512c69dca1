"""Training-step latency breakdown on the current backend.

Times forward-only loss vs the full train step (fwd + bwd + optimizer)
for the flagship model at the BENCHMARKS.md configuration, f32 and bf16,
with pipelined readback timing (see bench.py).

Usage: python scripts/profile_train.py [B] [Tf]
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


def timed(fn, *args, iters=10, reps=3, donate=False):
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
    Tf = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    from promptttspp_tpu.flagship import (build_flagship_model,
                                          example_batch)
    from promptttspp_tpu.train.state import (create_train_state,
                                             make_optimizer,
                                             make_train_step)

    model = build_flagship_model()
    batch = example_batch(B=B, Tp=64, Tf=Tf, L=32)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    tx = make_optimizer()
    state = create_train_state(model, batch, jax.random.PRNGKey(0), tx)
    frames = B * Tf

    print(f"B={B} Tf={Tf} ({frames} mel frames/step)")
    for bf16 in (False, True):
        step = jax.jit(make_train_step(model, tx, donate=False, bf16=bf16))
        t = timed(step, state, batch, jax.random.PRNGKey(1))
        tag = "bf16" if bf16 else "f32 "
        print(f"full train step ({tag}): {t:8.2f} ms "
              f"-> {frames / (t / 1e3):,.0f} mel frames/s/chip")


if __name__ == "__main__":
    main()
