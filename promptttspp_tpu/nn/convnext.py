"""ConvNeXt-1d stack (`/root/reference/promptttspp/modules/convnext.py:20-66`,
SURVEY.md §2.7). [B, T, C]; mask float [B, T, 1]."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from promptttspp_tpu.nn.layers import conv1d


class ConvNeXtLayer(nn.Module):
    channels: int
    h_channels: int
    scale_init: float

    @nn.compact
    def __call__(self, x, mask):
        res = x
        x = conv1d(self.channels, 7, groups=self.channels, name="dw_conv")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        x = nn.Dense(self.h_channels, name="pw_conv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.channels, name="pw_conv2")(x)
        scale = self.param(
            "scale", nn.initializers.constant(self.scale_init),
            (self.channels,))
        x = scale * x
        return (res + x) * mask


class ConvNeXt1d(nn.Module):
    channels: int
    h_channels: int
    num_layers: int

    @nn.compact
    def __call__(self, x, mask):
        x = nn.LayerNorm(epsilon=1e-5, name="norm_pre")(x)
        for i in range(self.num_layers):
            x = ConvNeXtLayer(self.channels, self.h_channels,
                              1.0 / self.num_layers,
                              name=f"layers_{i}")(x, mask)
        x = nn.LayerNorm(epsilon=1e-5, name="norm_post")(x)
        return x * mask
