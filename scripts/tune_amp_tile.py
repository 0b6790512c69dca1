"""Microbench: fused AMPLayer tile-size sweep on the current backend.

Usage: python scripts/tune_amp_tile.py [C] [T]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from promptttspp_tpu.platform import apply_platform_env

apply_platform_env()

import jax

jax.devices()  # initialize the (possibly tunneled) backend before the
               # pallas import touches platform discovery

import jax.numpy as jnp
import numpy as np

from promptttspp_tpu.ops.pallas.amp import fused_amp_layer


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 153600
    k, dil = 11, 5
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, T, C).astype(np.float32) * 0.3)
    a1 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.2)
    a2 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.2)
    w1 = jnp.asarray(rng.randn(k, C, C).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.randn(k, C, C).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)

    p = 128 // C
    for tile in (1024, 2048, 4096, 8192):
        if tile // p * 128 * 4 * 14 > 14 * 1024 * 1024:  # rough VMEM guard
            continue
        for bf16 in (False, True):
            try:
                fn = lambda x_: fused_amp_layer(
                    x_, a1, w1, b1, a2, w2, b2, dil, tile=tile,
                    mxu_bf16=bf16)
                out = fn(x)
                float(jnp.sum(out[:, -1]))
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    for _ in range(20):
                        out = fn(x)
                    float(jnp.sum(out[:, -1]))
                    ts.append((time.perf_counter() - t0) / 20)
                print(f"C={C} T={T} tile={tile} bf16={bf16}: "
                      f"{np.median(ts) * 1e3:7.3f} ms")
            except Exception as e:
                print(f"C={C} T={T} tile={tile} bf16={bf16}: "
                      f"FAILED {type(e).__name__}")


if __name__ == "__main__":
    main()
