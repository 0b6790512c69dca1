"""Linear interpolation over unvoiced gaps of an F0 contour.

Equivalent of nnmnkwii's ``interp1d`` as used by the reference
(`/root/reference/promptttspp/preprocess/pitch.py:31-34`): voiced samples
(f0 > 0) are interpolation knots; gaps are filled linearly; leading/trailing
unvoiced regions copy the nearest voiced value. All-unvoiced input returns
zeros.

Vectorized with prefix/suffix scans (no data-dependent shapes) so it batches
and jits on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def interp1d(f0):
    """f0: [..., T] with zeros at unvoiced frames -> continuous contour."""
    T = f0.shape[-1]
    voiced = f0 > 0
    pos = jnp.arange(T, dtype=jnp.float32)

    # index of the most recent voiced frame at or before t (running max)
    prev_idx = jax.lax.cummax(
        jnp.where(voiced, pos, -jnp.inf), axis=f0.ndim - 1
    )
    # index of the next voiced frame at or after t
    next_idx = -jax.lax.cummax(
        jnp.where(voiced, -pos, -jnp.inf)[..., ::-1], axis=f0.ndim - 1
    )[..., ::-1]

    has_prev = jnp.isfinite(prev_idx)
    has_next = jnp.isfinite(next_idx)
    prev_i = jnp.clip(prev_idx, 0, T - 1).astype(jnp.int32)
    next_i = jnp.clip(next_idx, 0, T - 1).astype(jnp.int32)

    prev_val = jnp.take_along_axis(f0, prev_i, axis=-1)
    next_val = jnp.take_along_axis(f0, next_i, axis=-1)

    span = jnp.maximum(next_idx - prev_idx, 1.0)
    w = jnp.clip((pos - prev_idx) / span, 0.0, 1.0)
    interp = prev_val * (1.0 - w) + next_val * w

    out = jnp.where(has_prev & has_next, interp, 0.0)
    out = jnp.where(has_prev & ~has_next, prev_val, out)
    out = jnp.where(~has_prev & has_next, next_val, out)
    return jnp.where(voiced, f0, out)
