"""Flagship model construction and example batches.

Builds the full-size PromptTTS++ model from the shipped config
(`conf/model/prompttts_mdn_v2_wo_erg_final.yaml` — same hyperparameters as
the reference's config of record) plus the F0-aware BigVGAN vocoder.
Used by __graft_entry__.py, bench.py, and the CLI entry points.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

import promptttspp_tpu.models  # noqa: F401 — registers config aliases
from promptttspp_tpu.config import compose, instantiate

REPO_ROOT = Path(__file__).resolve().parent.parent
CONF_DIR = REPO_ROOT / "conf"


def build_flagship_model(overrides=()):
    cfg = compose(CONF_DIR, "train", overrides=list(overrides))
    return instantiate(cfg.model)


def build_vocoder(name: str = "bigvgan_f0"):
    cfg = compose(CONF_DIR, "synthesize", overrides=[f"vocoder={name}"])
    return instantiate(cfg.vocoder)


def example_batch(B: int = 2, Tp: int = 32, Tf: int = 256, L: int = 32,
                  mel_dim: int = 80, seed: int = 0) -> Dict[str, np.ndarray]:
    """Synthetic training batch with the flagship's shapes."""
    rng = np.random.RandomState(seed)
    plens = np.full((B,), Tp, np.int32)
    plens[1:] = max(Tp - 5, 1)
    flens = np.full((B,), Tf, np.int32)
    flens[1:] = max(Tf - 40, 1)
    duration = np.zeros((B, Tp), np.int32)
    for b in range(B):
        d = np.ones(Tp, np.int64)
        quota = flens[b] - plens[b]
        for _ in range(int(quota)):
            d[rng.randint(0, plens[b])] += 1
        d[plens[b]:] = 0
        duration[b] = d
    batch = dict(
        phoneme=(rng.randint(1, 90, (B, Tp))).astype(np.int32),
        duration=duration,
        phone_lengths=plens,
        mel=rng.randn(B, Tf, mel_dim).astype(np.float32),
        log_cf0=rng.randn(B, Tf, 1).astype(np.float32),
        vuv=(rng.rand(B, Tf, 1) > 0.3).astype(np.float32),
        energy=rng.rand(B, Tf, 1).astype(np.float32),
        frame_lengths=flens,
        prompt_ids=rng.randint(0, 30000, (B, L)).astype(np.int32),
        prompt_mask=np.ones((B, L), np.int32),
    )
    for b in range(B):
        batch["phoneme"][b, plens[b]:] = 0
    return batch


def init_vocoder(vocoder, B: int = 1, frames: int = 640,
                 mel_dim: int = 80, seed: int = 1):
    """Jitted vocoder init. Eager flax init dispatches one op at a time
    — measured 199 s for the full BigVGAN over the tunneled backend
    (~3000 ops x the ~28 ms RTT + per-dispatch floor) vs ~seconds as ONE
    compiled program. Init cost is shape-only, so any (B, frames) works."""
    import jax.numpy as jnp

    return jax.jit(lambda k: vocoder.init(
        k, jnp.zeros((B, frames, mel_dim), jnp.float32),
        jnp.zeros((B, frames, 1), jnp.float32), deterministic=True))(
        jax.random.PRNGKey(seed))


def init_flagship(model, batch, seed: int = 0):
    rng = jax.random.PRNGKey(seed)
    rngs = {
        "params": rng,
        "dropout": jax.random.fold_in(rng, 1),
        "diffusion": jax.random.fold_in(rng, 2),
        "style": jax.random.fold_in(rng, 3),
    }
    # jit the init: eager init dispatches thousands of tiny ops (very slow
    # over a tunneled TPU); one compiled program instead
    return jax.jit(model.init, static_argnames=("train",))(
        rngs, batch, train=True)
