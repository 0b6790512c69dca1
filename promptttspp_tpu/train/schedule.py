"""Noam learning-rate schedule
(`/root/reference/promptttspp/utils/lr_scheduler.py:18-39`), stepped per
optimizer step (`conf/train/noam.yaml:15`)."""

from __future__ import annotations

import jax.numpy as jnp


def noam_schedule(base_lr: float, warmup_steps: int):
    """optax-compatible schedule: scale = sqrt(w) * min(s^-0.5, s*w^-1.5),
    with step clamped to >= 1 (torch semantics)."""

    def schedule(step):
        s = jnp.maximum(step, 1).astype(jnp.float32)
        w = float(warmup_steps)
        scale = w ** 0.5 * jnp.minimum(s ** -0.5, s * w ** -1.5)
        return base_lr * scale

    return schedule
