"""DDPM mel decoder: DiffNet denoiser + GaussianDiffusion wrapper.

Behavioral equivalents of
`/root/reference/promptttspp/modules/denoiser.py:28-143` and
`modules/diffusion.py:40-356` (DiffSinger-style): K=100 linear betas
(1e-4 -> 0.06), epsilon-prediction, mel normalized by norm_scale 6.0.

TPU-first restructuring:
- all schedule tables are numpy constants folded into the program;
- the 100-step ancestral loop is one ``jax.lax.scan`` (compiles once,
  no Python loop, no host sync per step);
- the denoiser works on [B, T, C]; the 20 residual blocks' dilated convs
  + gated tanh/sigmoid run as lane-aligned convolutions, with the ``g``
  conditioning argument accepted-but-ignored exactly like the reference
  (`diffusion.py:287,320`).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from promptttspp_tpu.nn.layers import conv1d, mish


def linear_beta_schedule(timesteps: int, min_beta=1e-4, max_beta=0.06):
    return np.linspace(min_beta, max_beta, timesteps)


def cosine_beta_schedule(timesteps: int, s=0.008):
    steps = timesteps + 1
    x = np.linspace(0, steps, steps)
    ac = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = 1 - (ac[1:] / ac[:-1])
    return np.clip(betas, 0, 0.999)


class SinusoidalPosEmb(nn.Module):
    """Diffusion-step embedding (`denoiser.py:28-41`)."""

    dim: int
    scale: float = 1.0

    def __call__(self, t):
        """t [B] float/int -> [B, dim]."""
        half = self.dim // 2
        emb = math.log(10000.0) / (half - 1)
        freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
        arg = self.scale * t.astype(jnp.float32)[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(arg), jnp.cos(arg)], axis=-1)


class ResidualBlock(nn.Module):
    """Dilated conv + gated tanh/sigma + conditioner (`denoiser.py:55-83`)."""

    encoder_hidden: int
    residual_channels: int
    kernel_size: int
    dilation: int

    def setup(self):
        self.diffusion_projection = nn.Dense(
            self.residual_channels, name="diffusion_projection")
        self.conditioner_projection = conv1d(
            2 * self.residual_channels, 1, name="conditioner_projection")
        self.dilated_conv = conv1d(
            2 * self.residual_channels, self.kernel_size,
            dilation=self.dilation, name="dilated_conv")
        self.output_projection = conv1d(
            2 * self.residual_channels, 1, name="output_projection")

    def cond_proj(self, conditioner):
        """[B,T,H] -> [B,T,2R]: the sampling loop hoists this (it does not
        depend on x or t) so 100 scan steps don't recompute/restream it."""
        return self.conditioner_projection(conditioner)

    def __call__(self, x, conditioner, diffusion_step, mask=None,
                 cond_proj=None):
        """x [B,T,R]; conditioner [B,T,H]; diffusion_step [B,R]."""
        step = self.diffusion_projection(diffusion_step)[:, None, :]
        cond = (self.conditioner_projection(conditioner)
                if cond_proj is None else cond_proj)
        y = x + step
        y = self.dilated_conv(y) + cond
        gate, filt = jnp.split(y, 2, axis=-1)
        y = nn.sigmoid(gate) * jnp.tanh(filt)
        y = self.output_projection(y)
        if mask is not None:
            y = y * mask
        residual, skip = jnp.split(y, 2, axis=-1)
        return (x + residual) / math.sqrt(2.0), skip


class DiffNet(nn.Module):
    """WaveNet-ish epsilon predictor (`denoiser.py:86-143`).

    [B, T, in_dim] noisy mel + [B] t + [B, T, H] cond -> [B, T, in_dim].
    """

    in_dim: int = 80
    encoder_hidden_dim: int = 256
    residual_layers: int = 20
    residual_channels: int = 256
    kernel_size: int = 3
    dilation_cycle_length: int = 4
    scale: float = 1.0

    def setup(self):
        self.input_projection = conv1d(self.residual_channels, 1,
                                       name="input_projection")
        self.diffusion_embedding = SinusoidalPosEmb(
            self.residual_channels, self.scale, name="diffusion_embedding")
        self.mlp_0 = nn.Dense(self.residual_channels * 4, name="mlp_0")
        self.mlp_2 = nn.Dense(self.residual_channels, name="mlp_2")
        self.blocks = [
            ResidualBlock(
                self.encoder_hidden_dim, self.residual_channels,
                self.kernel_size, 2 ** (i % self.dilation_cycle_length),
                name=f"residual_layers_{i}")
            for i in range(self.residual_layers)
        ]
        self.skip_projection = conv1d(self.residual_channels, 1,
                                      name="skip_projection")
        self.out_projection = conv1d(self.in_dim, 1,
                                     name="output_projection")

    def precompute_cond(self, cond):
        """All blocks' conditioner projections, computed once per
        utterance instead of once per denoise step."""
        return tuple(b.cond_proj(cond) for b in self.blocks)

    def __call__(self, x, diffusion_step, cond, mask=None, cond_projs=None):
        x = self.input_projection(x)
        x = nn.relu(x)
        t_emb = self.diffusion_embedding(diffusion_step)
        t_emb = self.mlp_0(t_emb)
        t_emb = mish(t_emb)
        t_emb = self.mlp_2(t_emb)

        skip_sum = 0.0
        for i, block in enumerate(self.blocks):
            x, skip = block(
                x, cond, t_emb, mask,
                cond_proj=None if cond_projs is None else cond_projs[i])
            skip_sum = skip_sum + skip

        x = skip_sum / math.sqrt(self.residual_layers)
        x = self.skip_projection(x)
        x = nn.relu(x)
        return self.out_projection(x)


class GaussianDiffusion(nn.Module):
    """(`diffusion.py:68-356`). forward -> (noise, eps_pred); inference ->
    denormalized mel via a lax.scan ancestral loop."""

    in_dim: int
    out_dim: int
    denoise_fn: nn.Module
    K_step: int = 100
    schedule_type: str = "linear"
    norm_scale: Optional[float] = None
    a_min: float = 0.0
    a_max: float = 20.0
    pndm_speedup: Optional[int] = None
    # serving lever (`+model.decoder.infer_io_dtype=bfloat16`): store the
    # hoisted per-block conditioner projections — re-read from HBM by
    # every one of the K sampling steps — in this dtype. Pairs with
    # bf16-stored denoiser params (Synthesizer(decode_param_dtype=...));
    # the x carry, eps math and schedule constants stay f32, and the MXU
    # already multiplies in bf16 by default, so this changes HBM traffic,
    # not the compute path. Default None = f32 (bit-identical to the
    # golden parity chain).
    infer_io_dtype: Optional[str] = None
    # pipeline parallelism (parallel/pp.py): when pipeline_mesh is set,
    # every epsilon prediction — the train-mode forward AND each sampling
    # step — runs the DiffNet stack as an exact GPipe schedule over the
    # mesh's 'model' axis. Static hyperparameters (a Mesh is hashable),
    # injected by the trainer (train.mesh.pipeline_microbatches) or
    # Synthesizer(decode_pipelined=True) via .clone(). batch_axis names a
    # mesh axis to keep the batch dimension sharded over (DPxPP).
    pipeline_mesh: Optional[Any] = None
    pipeline_microbatches: Optional[int] = None
    pipeline_batch_axis: Optional[str] = None

    def setup(self):
        if self.schedule_type == "linear":
            betas = linear_beta_schedule(self.K_step)
        elif self.schedule_type == "cosine":
            betas = cosine_beta_schedule(self.K_step)
        else:
            raise ValueError(self.schedule_type)
        alphas = 1.0 - betas
        ac = np.cumprod(alphas)
        ac_prev = np.append(1.0, ac[:-1])
        f32 = lambda a: jnp.asarray(a, jnp.float32)
        self.betas = f32(betas)
        self.sqrt_alphas_cumprod = f32(np.sqrt(ac))
        self.sqrt_one_minus_alphas_cumprod = f32(np.sqrt(1.0 - ac))
        self.sqrt_recip_alphas_cumprod = f32(np.sqrt(1.0 / ac))
        self.sqrt_recipm1_alphas_cumprod = f32(np.sqrt(1.0 / ac - 1.0))
        post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
        self.posterior_log_variance_clipped = f32(
            np.log(np.maximum(post_var, 1e-20)))
        self.posterior_mean_coef1 = f32(
            betas * np.sqrt(ac_prev) / (1.0 - ac))
        self.posterior_mean_coef2 = f32(
            (1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - ac))
        self.alphas_cumprod = f32(ac)

    def _norm(self, x):
        if self.norm_scale is not None:
            return x / self.norm_scale
        return (x - self.a_min) / (self.a_max - self.a_min) * 2 - 1

    def _denorm(self, x):
        if self.norm_scale is not None:
            return x * self.norm_scale
        return (x + 1) / 2 * (self.a_max - self.a_min) + self.a_min

    def q_sample(self, x_start, t, noise):
        """t int [B]."""
        c1 = self.sqrt_alphas_cumprod[t][:, None, None]
        c2 = self.sqrt_one_minus_alphas_cumprod[t][:, None, None]
        return c1 * x_start + c2 * noise

    def predict_start_from_noise(self, x_t, t, noise):
        return (
            self.sqrt_recip_alphas_cumprod[t][:, None, None] * x_t
            - self.sqrt_recipm1_alphas_cumprod[t][:, None, None] * noise
        )

    def _eps(self, x, t, cond, cond_projs=None, mask=None):
        """denoise_fn call; only DiffNet-style denoisers understand the
        hoisted cond_projs kwarg (others, e.g. the U-Net, take none).
        With pipeline_mesh set, routes through the exact GPipe schedule
        (parallel/pp.py) instead — both in training (mask threaded
        through every stage) and in the sampling scan."""
        if self.pipeline_mesh is not None and not self.is_initializing():
            # function-level import: parallel/pp.py imports ResidualBlock
            # from this module, so a top-level import would be a cycle
            from promptttspp_tpu.parallel.pp import denoise_pipelined

            return denoise_pipelined(
                self.pipeline_mesh, self.denoise_fn,
                self.denoise_fn.variables["params"], x, t, cond, mask=mask,
                n_microbatches=self.pipeline_microbatches,
                batch_axis=self.pipeline_batch_axis)
        if cond_projs is None:
            if mask is None:
                return self.denoise_fn(x, t, cond)
            return self.denoise_fn(x, t, cond, mask)
        return self.denoise_fn(x, t, cond, cond_projs=cond_projs)

    def p_sample(self, x, t, cond, noise, clip_denoised: bool = True,
                 cond_projs=None):
        """One reverse step; noise [B,T,C] (zeros at t==0 handled here)."""
        eps = self._eps(x, t, cond, cond_projs)
        x_recon = self.predict_start_from_noise(x, t, eps)
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        mean = (
            self.posterior_mean_coef1[t][:, None, None] * x_recon
            + self.posterior_mean_coef2[t][:, None, None] * x
        )
        log_var = self.posterior_log_variance_clipped[t][:, None, None]
        nonzero = (t > 0).astype(x.dtype)[:, None, None]
        return mean + nonzero * jnp.exp(0.5 * log_var) * noise

    def __call__(self, cond, y, mask=None, g=None, t=None, noise=None):
        """Training step. cond [B,T,H]; y mel [B,T,out_dim]; mask
        [B,T,1]. t/noise default to fresh draws from the 'diffusion' RNG
        stream (pass explicitly for deterministic tests).
        Returns (noise, eps_pred), both [B,T,out_dim] (unmasked; the model
        applies the frame mask, `model.py:133-135`). ``g`` ignored
        (`diffusion.py:287`)."""
        B = cond.shape[0]
        if t is None:
            t = jax.random.randint(
                self.make_rng("diffusion"), (B,), 0, self.K_step)
        x = self._norm(y)
        if noise is None:
            noise = jax.random.normal(
                self.make_rng("diffusion"), x.shape, x.dtype)
        x_noisy = self.q_sample(x, t, noise)
        eps_pred = self._eps(x_noisy, t, cond, mask=mask)
        return noise, eps_pred

    def inference(self, cond, g=None, rng=None, x_T=None,
                  zero_noise: bool = False):
        """Ancestral sampling as one lax.scan over K steps.

        cond [B,T,H] -> mel [B,T,out_dim] (denormalized). ``x_T`` and
        ``zero_noise`` exist for deterministic parity tests.
        """
        B, T = cond.shape[0], cond.shape[1]
        shape = (B, T, self.out_dim)
        if rng is None and (x_T is None or not zero_noise):
            rng = self.make_rng("diffusion")
        if x_T is None:
            rng, sub = jax.random.split(rng)
            x = jax.random.normal(sub, shape, jnp.float32)
        else:
            x = x_T

        # hoist the per-block conditioner projections out of the sampling
        # loop: they depend only on cond, and recomputing them inside the
        # scan restreams ~20 weight matrices per step x K steps
        if self.infer_io_dtype is not None:
            cond = cond.astype(jnp.dtype(self.infer_io_dtype))
        # the pipelined path computes conditioner projections inside each
        # stage (its weights travel as stage slabs), so skip the hoist
        cond_projs = (self.denoise_fn.precompute_cond(cond)
                      if hasattr(self.denoise_fn, "precompute_cond")
                      and self.pipeline_mesh is None
                      else None)
        if cond_projs is not None and self.infer_io_dtype is not None:
            dt = jnp.dtype(self.infer_io_dtype)
            cond_projs = jax.tree.map(lambda a: a.astype(dt), cond_projs)

        if self.pndm_speedup:
            # PLMS fast path (the reference stubs this with
            # NotImplementedError at init, `diffusion.py:104-105`; the TPU
            # build supports it — K/interval denoiser calls instead of K)
            interval = int(self.pndm_speedup)
            steps = jnp.arange(self.K_step - interval, -1, -interval)
            return self._denorm(
                self._plms_loop(x, steps, interval, cond, cond_projs))

        if zero_noise:
            noises = jnp.zeros((self.K_step,) + shape, jnp.float32)
        else:
            noises = jax.random.normal(
                rng, (self.K_step,) + shape, jnp.float32)

        def step(x, inputs):
            i, noise = inputs
            t = jnp.full((B,), i, jnp.int32)
            x = self.p_sample(x, t, cond, noise, cond_projs=cond_projs)
            return x, None

        steps = jnp.arange(self.K_step - 1, -1, -1)
        x, _ = jax.lax.scan(step, x, (steps, noises[::-1]))
        return self._denorm(x)

    # -------------------------------------------------------------- PLMS
    def _x_pred(self, x, noise_t, t, interval):
        """PNDM transfer step (reference `diffusion.py:230-246`)."""
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

    def _plms_loop(self, x, steps, interval, cond, cond_projs=None):
        """Adams-Bashforth multistep with the eps history in the scan
        carry (reference `diffusion.py:224-277`)."""
        B = x.shape[0]

        def step_fn(carry, i):
            x, hist, n_hist = carry
            t = jnp.full((B,), i, jnp.int32)
            eps = self._eps(x, t, cond, cond_projs)

            def order1(_):
                x_pred = self._x_pred(x, eps, t, interval)
                t_prev = jnp.maximum(t - interval, 0)
                eps_prev = self._eps(x_pred, t_prev, cond, cond_projs)
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
