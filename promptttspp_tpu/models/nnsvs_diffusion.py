"""Extended (nnsvs-style) diffusion decoder with classifier-free guidance.

Behavioral equivalent of
`/root/reference/promptttspp/modules/nnsvs/{diffusion,denoiser}.py` — the
path the model class name's "CFG" refers to (SURVEY.md §2.7):

- ``pred_noise`` / ``pred_x0`` objectives;
- classifier-free guidance: null speaker embedding, doubled batch at
  sampling, ``eps = eps_uncond + s * (eps_cond - eps_uncond)``;
- ``CondLayerNorm`` (FiLM-style gamma/beta from the speaker embedding)
  inside each residual block, or step-embedding concatenation;
- PLMS (pseudo linear multistep) sampling, here as a ``lax.scan`` with the
  Adams-Bashforth history in the carry — K/interval model calls instead
  of K.

[B, T, C] layout throughout (the reference's [B, 1, M, T] spectrogram axis
is dropped — it is squeezed immediately in the reference too).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from promptttspp_tpu.models.diffusion import (
    SinusoidalPosEmb, cosine_beta_schedule, linear_beta_schedule)
from promptttspp_tpu.nn.layers import conv1d, mish


def _l2norm(x, axis=-1, eps=1e-12):
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)


class CondLayerNorm(nn.Module):
    """Parameter-free LN over channels + FiLM from the conditioning
    embedding (`nnsvs/denoiser.py:11-70`); gamma/beta projections are
    zero-initialized so it starts as plain LN."""

    in_dim: int
    cond_dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, g):
        """x [B, T, C]; g [B, cond_dim] or [B, T, cond_dim]."""
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        normalized = (x - mean) / jnp.sqrt(var + self.eps)
        zeros = nn.initializers.zeros
        gamma = nn.Dense(self.in_dim, kernel_init=zeros, bias_init=zeros,
                         name="gamma")(g)
        beta = nn.Dense(self.in_dim, kernel_init=zeros, bias_init=zeros,
                        name="beta")(g)
        if gamma.ndim == 2:
            gamma = gamma[:, None, :]
            beta = beta[:, None, :]
        return normalized * (1.0 + gamma) + beta


class ResidualBlockG(nn.Module):
    """Gated dilated conv block with optional speaker conditioning
    (`nnsvs/denoiser.py:104-150`)."""

    encoder_hidden: int
    residual_channels: int
    dilation: int
    gin_channels: int = 0
    g_proj_dim: int = 128
    cond_norm: bool = False

    @nn.compact
    def __call__(self, x, conditioner, diffusion_step, g=None):
        step = nn.Dense(self.residual_channels,
                        name="diffusion_projection")(diffusion_step)
        cond = conv1d(2 * self.residual_channels, 1,
                      name="conditioner_projection")(conditioner)
        if self.cond_norm and self.gin_channels > 0:
            y = CondLayerNorm(self.residual_channels, self.g_proj_dim,
                              name="norm")(x, g)
        else:
            y = x
        y = y + step[:, None, :]
        y = conv1d(2 * self.residual_channels, 3, dilation=self.dilation,
                   name="dilated_conv")(y) + cond
        gate, filt = jnp.split(y, 2, axis=-1)
        y = nn.sigmoid(gate) * jnp.tanh(filt)
        y = conv1d(2 * self.residual_channels, 1, name="output_projection")(y)
        residual, skip = jnp.split(y, 2, axis=-1)
        return (x + residual) / math.sqrt(2.0), skip


class DiffNetG(nn.Module):
    """nnsvs DiffNet with classifier-free conditioning
    (`nnsvs/denoiser.py:155-301`)."""

    in_dim: int = 80
    encoder_hidden_dim: int = 256
    residual_layers: int = 20
    residual_channels: int = 256
    dilation_cycle_length: int = 4
    scaled_tanh: bool = False
    gin_channels: int = 0
    g_proj_dim: int = 128
    g_dropout: float = 0.0
    cond_norm: bool = False
    time_varying_emb: bool = False

    @nn.compact
    def __call__(self, x, diffusion_step, cond, g=None, train: bool = False):
        """x [B,T,in_dim]; t [B]; cond [B,T,H]; g [B,1,gin] or
        [B,T,gin]."""
        x = conv1d(self.residual_channels, 1, name="input_projection")(x)
        x = nn.relu(x)
        t_emb = SinusoidalPosEmb(self.residual_channels,
                                 name="diffusion_embedding")(diffusion_step)
        t_emb = nn.Dense(self.residual_channels * 4, name="mlp_0")(t_emb)
        t_emb = mish(t_emb)
        t_emb = nn.Dense(self.residual_channels, name="mlp_2")(t_emb)

        g_proj = None
        if self.gin_channels > 0:
            null_emb = self.param("null_embedding",
                                  nn.initializers.normal(1.0),
                                  (self.gin_channels,))
            if not self.time_varying_emb and g is not None and g.ndim == 3:
                g = g[:, 0, :]  # [B, gin]
            null = _l2norm(null_emb)
            null_b = jnp.broadcast_to(null, g.shape)
            if self.g_dropout >= 1.0:
                g_inp = null_b
            elif train and self.g_dropout > 0.0:
                drop = jax.random.bernoulli(
                    self.make_rng("cfg"), self.g_dropout)
                g_inp = jnp.where(drop, null_b, _l2norm(g))
            else:
                g_inp = _l2norm(g)
            if not train:
                # zero vectors mark the unconditional half of a CFG batch
                is_null = jnp.sum(jnp.abs(g), axis=-1, keepdims=True) == 0
                g_inp = jnp.where(is_null, null_b, g_inp)
            g_proj = nn.Dense(self.g_proj_dim, name="g_projection")(g_inp)
            if not self.cond_norm:
                t_emb = jnp.concatenate([t_emb, g_proj], axis=-1)

        skip_sum = 0.0
        for i in range(self.residual_layers):
            x, skip = ResidualBlockG(
                self.encoder_hidden_dim, self.residual_channels,
                2 ** (i % self.dilation_cycle_length),
                gin_channels=self.gin_channels, g_proj_dim=self.g_proj_dim,
                cond_norm=self.cond_norm, name=f"residual_layers_{i}",
            )(x, cond, t_emb, g=g_proj)
            skip_sum = skip_sum + skip

        x = skip_sum / math.sqrt(self.residual_layers)
        x = conv1d(self.residual_channels, 1, name="skip_projection")(x)
        x = nn.relu(x)
        x = conv1d(self.in_dim, 1, name="output_projection")(x)
        if self.scaled_tanh:  # residual-F0 mode (`denoiser.py:294-298`)
            max_lf0_ratio = 600 * np.log(2) / 1200
            x = max_lf0_ratio * jnp.tanh(x)
        return x


class GaussianDiffusionCFG(nn.Module):
    """(`nnsvs/diffusion.py:54-438`)."""

    in_dim: int
    out_dim: int
    denoise_fn: nn.Module
    K_step: int = 100
    schedule_type: str = "linear"
    norm_scale: float = 1.0
    pndm_speedup: Optional[int] = None
    objective: str = "pred_noise"
    do_classifier_free_guidance: bool = False
    guidance_scale: float = 1.0
    clip_denoised: bool = True
    a_min: Optional[float] = None
    a_max: Optional[float] = None

    def setup(self):
        if self.do_classifier_free_guidance and self.objective != "pred_noise":
            raise ValueError("CFG requires pred_noise objective")
        betas = (linear_beta_schedule(self.K_step)
                 if self.schedule_type == "linear"
                 else cosine_beta_schedule(self.K_step))
        alphas = 1.0 - betas
        ac = np.cumprod(alphas)
        ac_prev = np.append(1.0, ac[:-1])
        f32 = lambda a: jnp.asarray(a, jnp.float32)
        self.alphas_cumprod = f32(ac)
        self.sqrt_alphas_cumprod = f32(np.sqrt(ac))
        self.sqrt_one_minus_alphas_cumprod = f32(np.sqrt(1 - ac))
        self.sqrt_recip_alphas_cumprod = f32(np.sqrt(1 / ac))
        self.sqrt_recipm1_alphas_cumprod = f32(np.sqrt(1 / ac - 1))
        post_var = betas * (1 - ac_prev) / (1 - ac)
        self.posterior_log_variance_clipped = f32(
            np.log(np.maximum(post_var, 1e-20)))
        self.posterior_mean_coef1 = f32(betas * np.sqrt(ac_prev) / (1 - ac))
        self.posterior_mean_coef2 = f32(
            (1 - ac_prev) * np.sqrt(alphas) / (1 - ac))

    def _norm(self, x):
        if self.a_min is not None:
            return (x - self.a_min) / (self.a_max - self.a_min) * 2 - 1
        return x / self.norm_scale

    def _denorm(self, x):
        if self.a_min is not None:
            return (x + 1) / 2 * (self.a_max - self.a_min) + self.a_min
        return x * self.norm_scale

    def q_sample(self, x_start, t, noise):
        return (self.sqrt_alphas_cumprod[t][:, None, None] * x_start
                + self.sqrt_one_minus_alphas_cumprod[t][:, None, None] * noise)

    def predict_start_from_noise(self, x_t, t, noise):
        return (self.sqrt_recip_alphas_cumprod[t][:, None, None] * x_t
                - self.sqrt_recipm1_alphas_cumprod[t][:, None, None] * noise)

    def predict_noise_from_start(self, x_t, t, x0):
        return ((self.sqrt_recip_alphas_cumprod[t][:, None, None] * x_t - x0)
                / self.sqrt_recipm1_alphas_cumprod[t][:, None, None])

    def _pred_noise(self, x, t, cond, g):
        """epsilon prediction with optional CFG double batch
        (`nnsvs/diffusion.py:236-270`)."""
        if self.do_classifier_free_guidance:
            x2 = jnp.concatenate([x, x])
            cond2 = jnp.concatenate([cond, cond])
            g2 = jnp.concatenate([jnp.zeros_like(g), g])
            t2 = jnp.concatenate([t, t])
            eps = self.denoise_fn(x2, t2, cond2, g=g2)
            eps_uncond, eps_cond = jnp.split(eps, 2, axis=0)
            return eps_uncond + self.guidance_scale * (eps_cond - eps_uncond)
        return self.denoise_fn(x, t, cond, g=g)

    def p_mean_variance(self, x, t, cond, g):
        if self.objective == "pred_noise":
            eps = self._pred_noise(x, t, cond, g)
            x0 = self.predict_start_from_noise(x, t, eps)
            if self.clip_denoised:
                x0 = jnp.clip(x0, -1.0, 1.0)
        else:  # pred_x0
            x0 = self.denoise_fn(x, t, cond, g=g)
            if self.clip_denoised:
                x0 = jnp.clip(x0, -1.0, 1.0)
        mean = (self.posterior_mean_coef1[t][:, None, None] * x0
                + self.posterior_mean_coef2[t][:, None, None] * x)
        log_var = self.posterior_log_variance_clipped[t][:, None, None]
        return mean, log_var

    def __call__(self, cond, y, g=None, mask=None, t=None, noise=None,
                 train: bool = False):
        """Training: returns (target, model_out) per the objective
        (`nnsvs/diffusion.py:360-397`)."""
        B = cond.shape[0]
        if t is None:
            t = jax.random.randint(self.make_rng("diffusion"), (B,), 0,
                                   self.K_step)
        x_start = self._norm(y)
        if noise is None:
            noise = jax.random.normal(self.make_rng("diffusion"),
                                      x_start.shape, x_start.dtype)
        x_noisy = self.q_sample(x_start, t, noise)
        model_out = self.denoise_fn(x_noisy, t, cond, g=g, train=train)
        target = noise if self.objective == "pred_noise" else x_start
        return target, model_out

    def inference(self, cond, g=None, rng=None, x_T=None,
                  zero_noise: bool = False):
        """Ancestral or PLMS sampling as a lax.scan
        (`nnsvs/diffusion.py:399-438`)."""
        B, T = cond.shape[0], cond.shape[1]
        shape = (B, T, self.out_dim)
        if rng is None and (x_T is None or not zero_noise):
            rng = self.make_rng("diffusion")
        if x_T is None:
            rng, sub = jax.random.split(rng)
            x = jax.random.normal(sub, shape, jnp.float32)
        else:
            x = x_T

        if self.pndm_speedup:
            interval = int(self.pndm_speedup)
            steps = jnp.arange(self.K_step - interval, -1, -interval)
            return self._denorm(self._plms_loop(x, steps, interval, cond, g))

        if zero_noise:
            noises = jnp.zeros((self.K_step,) + shape, jnp.float32)
        else:
            noises = jax.random.normal(rng, (self.K_step,) + shape,
                                       jnp.float32)

        def step(x, inputs):
            i, noise = inputs
            t = jnp.full((B,), i, jnp.int32)
            mean, log_var = self.p_mean_variance(x, t, cond, g)
            nonzero = (t > 0).astype(x.dtype)[:, None, None]
            return mean + nonzero * jnp.exp(0.5 * log_var) * noise, None

        steps = jnp.arange(self.K_step - 1, -1, -1)
        x, _ = jax.lax.scan(step, x, (steps, noises[::-1]))
        return self._denorm(x)

    # -------------------------------------------------------------- PLMS
    def _x_pred(self, x, noise_t, t, interval):
        """(`nnsvs/diffusion.py:305-322`)."""
        a_t = self.alphas_cumprod[t][:, None, None]
        t_prev = jnp.maximum(t - interval, 0)
        a_prev = self.alphas_cumprod[t_prev][:, None, None]
        a_t_sq, a_prev_sq = jnp.sqrt(a_t), jnp.sqrt(a_prev)
        x_delta = (a_prev - a_t) * (
            (1.0 / (a_t_sq * (a_t_sq + a_prev_sq))) * x
            - 1.0 / (a_t_sq * (jnp.sqrt((1 - a_prev) * a_t)
                               + jnp.sqrt((1 - a_t) * a_prev))) * noise_t
        )
        return x + x_delta

    def _plms_loop(self, x, steps, interval, cond, g):
        """Adams-Bashforth multistep with the 3-deep eps history in the
        scan carry (`nnsvs/diffusion.py:300-358`)."""
        B = x.shape[0]

        def step_fn(carry, i):
            x, hist, n_hist = carry  # hist [3, B, T, C], newest first
            t = jnp.full((B,), i, jnp.int32)
            eps = self._pred_noise(x, t, cond, g)

            def order1(_):
                x_pred = self._x_pred(x, eps, t, interval)
                t_prev = jnp.maximum(t - interval, 0)
                eps_prev = self._pred_noise(x_pred, t_prev, cond, g)
                return (eps + eps_prev) / 2.0

            def order2(_):
                return (3.0 * eps - hist[0]) / 2.0

            def order3(_):
                return (23.0 * eps - 16.0 * hist[0] + 5.0 * hist[1]) / 12.0

            def order4(_):
                return (55.0 * eps - 59.0 * hist[0] + 37.0 * hist[1]
                        - 9.0 * hist[2]) / 24.0

            eps_prime = jax.lax.switch(
                jnp.minimum(n_hist, 3), [order1, order2, order3, order4],
                None)
            x_new = self._x_pred(x, eps_prime, t, interval)
            hist = jnp.concatenate([eps[None], hist[:-1]], axis=0)
            return (x_new, hist, n_hist + 1), None

        hist0 = jnp.zeros((3,) + x.shape, x.dtype)
        (x, _, _), _ = jax.lax.scan(step_fn, (x, hist0, 0), steps)
        return x
