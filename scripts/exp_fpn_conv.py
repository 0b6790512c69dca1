"""Compare lowerings for the FramePriorNetwork k17 conv on TPU.

The FPN (`promptttspp_tpu/models/frame_prior.py`; reference
`/root/reference/promptttspp/modules/frame_prior.py:37-92`) runs
n_layers=6 convs of kernel_size=17 at C=192 over [B, Tf, C].

RESULT (round 4, BENCHMARKS.md "FramePriorNetwork conv lowering"):
negative — XLA's direct conv is the fastest variant and already runs at
102.8 TF/s fwd / 161 TF/s fwd+bwd (82% of v5e bf16 peak) for the full
6-layer stack; no re-lowering is worth carrying. Kept as the
measurement harness and for the RTT-cancelling timing recipe.

Candidates, all numerically equal to lax.conv (SAME padding, stride 1):
  direct   — nn.Conv / lax.conv_general_dilated (current lowering)
  im2col   — materialize [B*T, K*C] patches, one big GEMM
  tapsum   — sum_k shift(x, k) @ W[k]: K matmuls of [B*T,C]@[C,C]
  padc     — direct conv with channels zero-padded 192 -> 256 (lane-aligned)

Run on TPU: python scripts/exp_fpn_conv.py [--bf16] [--layers N]
Prints fwd and fwd+bwd times per variant for the full 6-layer stack.
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B, T, C, K = 16, 512, 192, 17
PAD = (K - 1) // 2


def conv_direct(x, w, b):
    # x [B,T,C], w [K,C,C] (HIO), b [C]
    y = lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(PAD, PAD)],
        dimension_numbers=("NTC", "TIO", "NTC"),
        
    )
    return (y + b).astype(x.dtype)


def _shifted(x):
    # [B, T+K-1, C] zero-padded view source
    return jnp.pad(x, ((0, 0), (PAD, PAD), (0, 0)))


def conv_im2col(x, w, b):
    xp = _shifted(x)
    # patches [B, T, K, C]
    patches = jnp.stack([lax.dynamic_slice_in_dim(xp, k, T, axis=1)
                         for k in range(K)], axis=2)
    g = patches.reshape(B * T, K * C)
    w2 = w.reshape(K * C, C)
    y = jnp.dot(g, w2)
    return (y.reshape(B, T, C) + b).astype(x.dtype)


def conv_tapsum(x, w, b):
    xp = _shifted(x)
    acc = jnp.zeros((B, T, C), jnp.float32)
    for k in range(K):
        xs = lax.dynamic_slice_in_dim(xp, k, T, axis=1)
        acc = acc + jnp.dot(xs.reshape(B * T, C), w[k],
                            preferred_element_type=jnp.float32).reshape(B, T, C)
    return (acc + b).astype(x.dtype)


def conv_padc(x, w, b):
    CP = 256
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, CP - C)))
    wp = jnp.pad(w, ((0, 0), (0, CP - C), (0, CP - C)))
    y = lax.conv_general_dilated(
        xp, wp, window_strides=(1,), padding=[(PAD, PAD)],
        dimension_numbers=("NTC", "TIO", "NTC"),
        
    )
    return (y[..., :C] + b).astype(x.dtype)


R = 4          # time-group factor
KG = 5         # grouped kernel size: offsets d in [-2, 2]


def _group_weight(w):
    """[K, C, C] -> block-Toeplitz [KG, R*C, R*C] for the R-grouped conv.

    y[t*R + r] = sum_k x[t*R + r + k - PAD] @ w[k].  Writing the input
    index as (t+d)*R + s gives k = d*R + s - r + PAD, nonzero iff 0<=k<K.
    """
    wn = np.asarray(w, np.float32)
    wg = np.zeros((KG, R * C, R * C), np.float32)
    for d in range(-2, 3):
        for s in range(R):
            for r in range(R):
                k = d * R + s - r + PAD
                if 0 <= k < K:
                    wg[d + 2, s * C:(s + 1) * C,
                       r * C:(r + 1) * C] = wn[k]
    return jnp.asarray(wg, w.dtype)


def conv_rgroup(x, wg, b):
    # x [B,T,C] -> [B, T/R, R*C]; wg [KG, R*C, R*C] prebuilt block-Toeplitz
    Bx, Tx, Cx = x.shape
    xg = x.reshape(Bx, Tx // R, R * Cx)
    y = lax.conv_general_dilated(
        xg, wg, window_strides=(1,), padding=[(KG // 2, KG // 2)],
        dimension_numbers=("NTC", "TIO", "NTC"),
    )
    return (y.reshape(Bx, Tx, Cx) + b).astype(x.dtype)


VARIANTS = {
    "direct": conv_direct,
    "im2col": conv_im2col,
    "tapsum": conv_tapsum,
    "padc": conv_padc,
    "rgroup": conv_rgroup,
}


def stack_fwd(conv_fn, x, ws, bs, n_layers, act="erf"):
    # mimic the FPN residual block structure: conv -> gelu -> residual
    for i in range(n_layers):
        res = conv_fn(x, ws[i], bs[i])
        if act == "erf":
            res = jax.nn.gelu(res, approximate=False)
        elif act == "tanh":
            res = jax.nn.gelu(res, approximate=True)
        x = x + res
    return x


def bench(fn, args, reps=50):
    """Differential device timing for the axon tunnel: chain applications
    inside ONE jit via lax.scan with a SCALAR output (block_until_ready is
    unreliable on axon; a float() readback of a scalar is the only hard
    sync), then report time(2*reps) - time(reps) per rep so the constant
    ~28 ms null RTT cancels."""
    x0, *rest = args

    @functools.partial(jax.jit, static_argnums=len(args))
    def chained(x, *r_and_n):
        *r, n = r_and_n

        def body(carry, _):
            out = fn(carry, *r)
            if isinstance(out, tuple):   # grad fn: chain through dx
                out = out[0]
            return out.astype(carry.dtype).reshape(carry.shape), ()
        y, _ = lax.scan(body, x, None, length=n)
        return jnp.sum(y.astype(jnp.float32))

    def timed(n):
        float(chained(x0, *rest, n))          # warm/compile
        t0 = time.perf_counter()
        float(chained(x0, *rest, n))
        return time.perf_counter() - t0

    t1, t2 = timed(reps), timed(2 * reps)
    return (t2 - t1) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--f32", dest="bf16", action="store_false")
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--act", choices=["erf", "tanh", "none"], default="erf")
    args = ap.parse_args()

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, C)) * 0.1, dtype)
    ws = jnp.asarray(rng.standard_normal((args.layers, K, C, C)) * 0.02, dtype)
    bs = jnp.asarray(rng.standard_normal((args.layers, C)) * 0.01, dtype)

    gflop = 2 * B * T * C * C * K * args.layers / 1e9
    print(f"devices={jax.devices()}  dtype={dtype.__name__}  "
          f"stack fwd FLOPs={gflop:.1f} GF")

    wgs = jnp.stack([_group_weight(ws[i]) for i in range(args.layers)])

    ref = None
    for name, conv in VARIANTS.items():
        fwd = functools.partial(stack_fwd, conv, n_layers=args.layers,
                                act=args.act)
        w_in = wgs if name == "rgroup" else ws
        out = jax.jit(fwd)(x, w_in, bs)
        if ref is None:
            ref = np.asarray(out, np.float32)
        err = float(np.max(np.abs(np.asarray(out, np.float32) - ref)))

        t_fwd = bench(fwd, (x, w_in, bs))

        def loss(x_, ws_, bs_, _f=fwd):
            return jnp.sum(_f(x_, ws_, bs_).astype(jnp.float32) ** 2)

        t_bwd = bench(jax.grad(loss, argnums=(0, 1, 2)), (x, w_in, bs))

        print(f"{name:8s} fwd {t_fwd:7.3f} ms ({gflop / t_fwd:6.1f} TF/s)   "
              f"fwd+bwd {t_bwd:7.3f} ms ({3 * gflop / t_bwd:6.1f} TF/s)   "
              f"max|Δ|={err:.2e}")


if __name__ == "__main__":
    main()
