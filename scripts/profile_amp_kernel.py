"""fused_amp_layer microbench on the current backend: per-config timing
across tile sizes and MXU precision, vs the unfused XLA path.

Stage 3 of the vocoder (C=32, T=153.6k for 6.4 s) measures ~15 ms for
9 layer calls (~1.7 ms each) — far above its ~0.1 ms HBM roofline
(2 passes x 20 MB at 820 GB/s). This script finds where that goes.

Usage: python scripts/profile_amp_kernel.py [T] [C...]
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


def timed(fn, *args, iters=30, reps=3, **kw):
    out = fn(*args, **kw)
    float(jnp.sum(out[..., -1, :]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args, **kw)
        float(jnp.sum(out[..., -1, :]))
        ts.append((time.perf_counter() - t0) / iters)
    return float(np.median(ts)) * 1e3


def main():
    from promptttspp_tpu.ops.pallas.amp import fused_amp_layer

    T = int(sys.argv[1]) if len(sys.argv) > 1 else 153600
    Cs = [int(c) for c in sys.argv[2:]] or [32, 64]
    k, d = 3, 3  # MRF resblock kernel 3, middle dilation

    for C in Cs:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, T, C).astype(np.float32)) * 0.1
        a1 = jnp.asarray(rng.randn(C).astype(np.float32)) * 0.1
        a2 = jnp.asarray(rng.randn(C).astype(np.float32)) * 0.1
        w1 = jnp.asarray(rng.randn(k, C, C).astype(np.float32)) * 0.05
        w2 = jnp.asarray(rng.randn(k, C, C).astype(np.float32)) * 0.05
        b1 = jnp.zeros((C,), jnp.float32)
        b2 = jnp.zeros((C,), jnp.float32)
        bw = 2 * T * C * 4 / 820e9 * 1e3  # ms, 1 read + 1 write

        print(f"C={C} T={T}  (HBM roofline ~{bw:.3f} ms)")
        for ablate in ("", "edge", "snake", "aa", "conv",
                       "edge,snake", "aa,conv,edge,snake"):
            try:
                t = timed(
                    lambda *a, **kwa: fused_amp_layer(*a, **kwa),
                    x, a1, w1, b1, a2, w2, b2,
                    dilation=d, tile=0, mxu_bf16=True, ablate=ablate)
            except Exception as e:
                print(f"  ablate={ablate or 'none':>20}: FAILED "
                      f"({type(e).__name__})")
                continue
            print(f"  ablate={ablate or 'none':>20}: "
                  f"{t:7.3f} ms  ({t / bw:6.1f}x roofline)")


if __name__ == "__main__":
    main()
