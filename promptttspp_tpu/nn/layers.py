"""Shared primitive layers for the [B, T, C] TPU layout.

Behavioral equivalents of scattered reference primitives
(`/root/reference/promptttspp/layers/norm.py`,
`modules/esp/transformer/layer_norm.py`,
`modules/esp/conformer/swish.py`, `modules/denoiser.py:23-25`), expressed
over channel-last tensors so XLA keeps the C axis on lanes.

Parameter-name convention: module/parameter names mirror the reference's
``state_dict`` keys (``w_1``, ``linear_q`` ...) so the torch checkpoint
converter (promptttspp_tpu.compat.torch_ckpt) is a mechanical name map.
``conv1d``/``layer_norm`` are factories returning plain flax modules to
keep the parameter tree flat.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def swish(x):
    return x * nn.sigmoid(x)


def mish(x):
    return x * jnp.tanh(nn.softplus(x))


def layer_norm(name: str, eps: float = 1e-12) -> nn.LayerNorm:
    """ESPnet LayerNorm (eps 1e-12) over the channel (last) axis."""
    return nn.LayerNorm(epsilon=eps, name=name)


def conv1d(
    features: int,
    kernel_size: int = 1,
    dilation: int = 1,
    groups: int = 1,
    use_bias: bool = True,
    name: str = None,
    padding: str = "SAME",
) -> nn.Conv:
    """1-D conv over time for [B, T, C]. padding='SAME' with stride 1
    reproduces the reference's universal ``padding=(k-1)//2 * dilation``
    (odd kernels throughout)."""
    return nn.Conv(
        features=features,
        kernel_size=(kernel_size,),
        kernel_dilation=(dilation,),
        feature_group_count=groups,
        use_bias=use_bias,
        padding=padding,
        name=name,
    )


class ChannelLayerNorm(nn.Module):
    """The reference's `layers/norm.py` LayerNorm: gamma/beta params,
    eps 1e-5. Normalizes the channel axis (last in our layout; the
    reference normalizes dim=1 of [B, C, T] — same axis)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.features,))
        beta = self.param("beta", nn.initializers.zeros, (self.features,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jnp.reciprocal(jnp.sqrt(var + self.eps))
        return y * gamma + beta


class WeightedBatchNorm(nn.Module):
    """``nn.BatchNorm`` semantics plus an optional per-row weight that
    EXCLUDES rows from the batch statistics (mean/var and the running
    EMA). Same parameter (``scale``/``bias``) and ``batch_stats``
    (``mean``/``var``) layout as ``nn.BatchNorm`` so checkpoints and the
    torch converter are unaffected.

    Why: the reference trains ``BatchNorm1d/2d`` on whole batches and
    simply DROPS batches not divisible by the world size
    (`/root/reference/promptttspp/trainers/tts.py:138-142`), so padded
    rows never exist there. Our ``pad_batch_to_multiple`` rows carry
    ``batch_weight == 0``; passing that as ``row_weight`` keeps the
    batch statistics identical to the unpadded batch (padded TIME frames
    of real rows still enter, matching the reference's unmasked
    BatchNorm semantics). ``row_weight=None`` is the plain flax formula
    (mean / mean-of-squares over all non-channel axes, float32 stats,
    ``lax.rsqrt`` normalizer)."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    use_running_average: Optional[bool] = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None,
                 row_weight=None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average,
            use_running_average)
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((feat,), jnp.float32))

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            if row_weight is None:
                mean = jnp.mean(xf, axes)
                mean2 = jnp.mean(jnp.square(xf), axes)
            else:
                w = row_weight.astype(jnp.float32).reshape(
                    (-1,) + (1,) * (x.ndim - 1))
                # frames per row = product of the non-batch, non-channel
                # axes; every surviving row contributes all of them
                per_row = 1
                for d in x.shape[1:-1]:
                    per_row *= d
                n = jnp.sum(w) * per_row
                mean = jnp.sum(xf * w, axes) / n
                mean2 = jnp.sum(jnp.square(xf) * w, axes) / n
            var = mean2 - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(
            var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)
