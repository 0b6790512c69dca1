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

import flax.linen as nn
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
