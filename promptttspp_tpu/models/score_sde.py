"""VP-SDE score model (`/root/reference/promptttspp/modules/score_sde.py:21-91`,
SURVEY.md §2.7): Grad-TTS-style mean-reverting SDE with score matching.
The reference solves the probability-flow ODE with scipy ``solve_ivp`` on
host; here it is a fixed-step RK4 ``lax.scan`` on device.

[B, T, C] layout (the reference uses [B, 1, C, T]).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class SDE:
    """(`score_sde.py:21-49`)."""

    def __init__(self, beta_min=0.05, beta_max=20.0):
        self.beta_0 = beta_min
        self.beta_1 = beta_max

    def _beta(self, t):
        return self.beta_0 + (self.beta_1 - self.beta_0) * t

    def marginal_prob(self, x0, mu, t):
        beta_int = self.beta_0 * t + 0.5 * (self.beta_1 - self.beta_0) * t ** 2
        c = jnp.exp(-0.5 * beta_int)[:, None, None]
        mean = c * x0 + (1 - c) * mu
        std = jnp.sqrt(1.0 - jnp.exp(-beta_int))[:, None, None]
        return mean, std

    def probability_flow(self, score, x_t, mu, t):
        beta_t = self._beta(t)[:, None, None]
        return 0.5 * (mu - x_t - score) * beta_t


class ScoreSDE(nn.Module):
    """(`score_sde.py:52-91`)."""

    mel_dim: int
    denoise_fn: nn.Module
    eps: float = 1e-5
    norm_scale: float = 10.0

    def compute_loss(self, x0, mu, mask, t=None, z=None):
        """Score-matching loss (`score_sde.py:84-91`). mask [B, T, 1]."""
        B = x0.shape[0]
        if t is None:
            t = jax.random.uniform(self.make_rng("diffusion"), (B,),
                                   minval=self.eps, maxval=1.0)
        sde = SDE()
        mean, std = sde.marginal_prob(x0, mu, t)
        if z is None:
            z = jax.random.normal(self.make_rng("diffusion"), x0.shape)
        z = z * mask
        x_t = (mean + std * z) * mask
        score = self.denoise_fn(x_t, t, mu, mask)
        return jnp.sum(jnp.square(score * std + z) * mask) \
            / self.mel_dim / jnp.sum(mask)

    def __call__(self, x, mu, mask, n_steps: int = 50):
        """Probability-flow ODE solve t: 1 -> eps (`score_sde.py:62-82`)."""
        B = x.shape[0]
        mu = mu / self.norm_scale
        sde = SDE()

        def f(t_scalar, y):
            t = jnp.full((B,), t_scalar)
            score = self.denoise_fn(y, t, mu, mask)
            return sde.probability_flow(score, y, mu, t) * mask

        ts = jnp.linspace(1.0, self.eps, n_steps)

        def step(y, inputs):
            t, t_next = inputs
            h = t_next - t
            k1 = f(t, y)
            k2 = f(t + h / 2, y + h / 2 * k1)
            k3 = f(t + h / 2, y + h / 2 * k2)
            k4 = f(t + h, y + h * k3)
            return y + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4), None

        y, _ = jax.lax.scan(step, x, (ts[:-1], ts[1:]))
        return y
