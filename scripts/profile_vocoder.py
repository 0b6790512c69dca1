"""Per-stage vocoder latency breakdown on the current backend.

Times the NSF source, each upsample stage (ConvTranspose + noise inject +
MRF), and act_post/conv_post cumulatively with pipelined readback timing
(see bench.py for why: block_until_ready does not block over the axon
tunnel).

Usage: python scripts/profile_vocoder.py [frames]
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


def timed(fn, *args, iters=20, reps=3):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., -1, :]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., -1, :]))
        ts.append((time.perf_counter() - t0) / iters)
    return float(np.median(ts)) * 1e3


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 640
    from promptttspp_tpu.flagship import build_vocoder

    voc = build_vocoder("bigvgan_f0")
    mel = jnp.zeros((1, frames, 80), jnp.float32)
    f0 = jnp.ones((1, frames, 1), jnp.float32) * 120.0
    vv = voc.init(jax.random.PRNGKey(0), mel, f0, deterministic=True)

    full = jax.jit(lambda v, m, f: voc.apply(v, m, f, deterministic=True))
    t_full = timed(full, vv, mel, f0)
    print(f"full vocoder: {t_full:8.2f} ms ({frames} frames)")

    def stage_fn(upto):
        def inner(mdl, m, f0_):
            total_up = int(np.prod(mdl.upsample_rates))
            f0_up = jnp.repeat(f0_, total_up, axis=1)
            src, _, _ = mdl.m_source(f0_up, None, True)
            if upto == "source":
                return src
            x = mdl.conv_pre(m)
            for i, (up, nc, mrf) in enumerate(
                zip(mdl.upsamples, mdl.noise_convs, mdl.mrfs)
            ):
                if upto == ("up", i):
                    return up(x)
                x = up(x) + nc(src)
                if upto == ("mrf", i):
                    return mrf(x)
                x = mrf(x)
            return jnp.tanh(mdl.conv_post(mdl.act_post(x)))

        return jax.jit(lambda v, m, f: voc.apply(
            v, m, f, method=lambda mdl, m_, f_: inner(mdl, m_, f_)))

    t_src = timed(stage_fn("source"), vv, mel, f0)
    print(f"NSF source (cumsum harmonics): {t_src:8.2f} ms")
    prev = 0.0
    for i in range(len(voc.upsample_rates)):
        t_up = timed(stage_fn(("up", i)), vv, mel, f0)
        t_mrf = timed(stage_fn(("mrf", i)), vv, mel, f0)
        print(f"stage {i}: cum through up={t_up:8.2f} ms, "
              f"cum through mrf={t_mrf:8.2f} ms "
              f"(mrf cost ~{t_mrf - t_up:6.2f})")
        prev = t_mrf
    print(f"post (act+conv+tanh): ~{t_full - prev:6.2f} ms")


if __name__ == "__main__":
    main()
