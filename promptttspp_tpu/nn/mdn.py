"""Mixture density network layer, NLL loss, and selection/sampling.

Behavioral equivalent of the reference MDN
(`/root/reference/promptttspp/modules/mdn.py:11-257`, originally from
nnsvs): dim-wise 1-D GMMs, NLL with the exact stability tricks (log_pi and
log_sigma clamped at -7, target clamped to mu +/- 5 sigma, -inf mask fill
before logsumexp). These fp32 islands stay fp32 under bf16 training — the
caller casts inputs up, mirroring ``mdn_disable_amp``
(`models/prompttts_mdn_v2_final/model.py:109`).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class MDNLayer(nn.Module):
    """Linear heads -> (log_pi, log_sigma, mu) (`mdn.py:11-78`).

    Input [B, T, in_dim]; outputs log_pi [B,T,G] (or [B,T,G,D] dim-wise),
    log_sigma/mu [B,T,G,D].
    """

    in_dim: int
    out_dim: int
    num_gaussians: int = 30
    dim_wise: bool = False

    @nn.compact
    def __call__(self, x):
        B, T = x.shape[0], x.shape[1]
        G, D = self.num_gaussians, self.out_dim
        odim_log_pi = G * D if self.dim_wise else G
        log_pi = nn.Dense(odim_log_pi, name="log_pi")(x)
        if self.dim_wise:
            log_pi = log_pi.reshape(B, T, G, D)
            log_pi = nn.log_softmax(log_pi, axis=2)
        else:
            log_pi = nn.log_softmax(log_pi, axis=2)
        log_sigma = nn.Dense(G * D, name="log_sigma")(x).reshape(B, T, G, D)
        mu = nn.Dense(G * D, name="mu")(x).reshape(B, T, G, D)
        return log_pi, log_sigma, mu


_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


def mdn_loss(
    log_pi,
    log_sigma,
    mu,
    target,
    log_pi_min: float = -7.0,
    log_sigma_min: float = -7.0,
    reduce: bool = True,
    mask: Optional[jnp.ndarray] = None,
):
    """Negative log-likelihood (`mdn.py:81-175`).

    mask: bool [B, T, 1], True = valid (the reference passes a *valid*
    mask and fills invalid entries with -inf pre-logsumexp).
    Returns [B] if reduce else [B, T] (or [B, T, D] dim-wise).
    """
    dim_wise = log_pi.ndim == 4
    log_sigma = jnp.maximum(log_sigma, log_sigma_min)
    log_pi = jnp.maximum(log_pi, log_pi_min)

    target = target[:, :, None, :]  # [B, T, 1, D]
    centered = target - mu
    scale = jnp.exp(log_sigma)
    edge = 5.0 * scale
    centered = jnp.clip(centered, -edge, edge)

    # Normal(0, scale).log_prob(centered)
    log_prob = (
        -0.5 * jnp.square(centered / scale) - log_sigma - _LOG_SQRT_2PI
    )

    if dim_wise:
        ll = log_prob + log_pi  # [B, T, G, D]
    else:
        ll = jnp.sum(log_prob, axis=3) + log_pi  # [B, T, G]

    if mask is not None:
        m = mask[:, :, None, :] if dim_wise else mask
        ll = jnp.where(m, ll, -jnp.inf)

    loss = -jax.scipy.special.logsumexp(ll, axis=2)
    if reduce:
        return jnp.mean(loss, axis=1)
    return loss


def mdn_get_most_probable_sigma_and_mu(log_pi, log_sigma, mu):
    """argmax-pi component selection (`mdn.py:178-223`) -> (sigma, mu),
    each [B, T, D]."""
    dim_wise = log_pi.ndim == 4
    if dim_wise:
        idx = jnp.argmax(log_pi, axis=2)  # [B, T, D]
    else:
        idx = jnp.argmax(log_pi, axis=2)[..., None]  # [B, T, 1] -> broadcast
        idx = jnp.broadcast_to(idx, log_pi.shape[:2] + (mu.shape[-1],))
    take = lambda x: jnp.take_along_axis(x, idx[:, :, None, :], axis=2)[:, :, 0, :]
    return jnp.exp(take(log_sigma)), take(mu)


def mdn_sample_sigma_and_mu(rng, log_pi, log_sigma, mu):
    """Categorical sampling of the mixture component (`mdn.py:226-257`).

    The reference's dim_wise branch assumes T == 1 (style embedding use
    case: it squeezes the time axis); we sample per (B, T, D) generally.
    """
    dim_wise = log_pi.ndim == 4
    if dim_wise:
        logits = jnp.moveaxis(log_pi, 2, -1)  # [B, T, D, G]
        idx = jax.random.categorical(rng, logits, axis=-1)  # [B, T, D]
    else:
        idx = jax.random.categorical(rng, log_pi, axis=-1)  # [B, T]
        idx = jnp.broadcast_to(idx[..., None], log_pi.shape[:2] + (mu.shape[-1],))
    take = lambda x: jnp.take_along_axis(x, idx[:, :, None, :], axis=2)[:, :, 0, :]
    return jnp.exp(take(log_sigma)), take(mu)
