"""HiFi-GAN-style MRF blocks, LeakyReLU variant
(`/root/reference/promptttspp/modules/mrf.py:22-93`, SURVEY.md §2.7).
Weight-norm folds at checkpoint conversion. [B, T, C]; mask [B, T, 1]."""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from promptttspp_tpu.nn.layers import conv1d

LRELU_SLOPE = 0.1


class MRFLayer(nn.Module):
    channels: int
    kernel_size: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        y = nn.leaky_relu(x, LRELU_SLOPE)
        y = conv1d(self.channels, self.kernel_size, dilation=self.dilation,
                   name="conv1")(y)
        y = nn.leaky_relu(y, LRELU_SLOPE)
        y = conv1d(self.channels, self.kernel_size, name="conv2")(y)
        return x + y


class MRFBlock(nn.Module):
    channels: int
    kernel_size: int
    dilations: Sequence[int]

    @nn.compact
    def __call__(self, x, mask):
        for i, d in enumerate(self.dilations):
            x = MRFLayer(self.channels, self.kernel_size, d,
                         name=f"layers_{i}")(x) * mask
        return x


class MRFNet(nn.Module):
    in_channels: int
    channels: int
    out_channels: int
    kernel_sizes: Sequence[int]
    dilations: Sequence[int]

    @nn.compact
    def __call__(self, x, mask, g: Optional[jnp.ndarray] = None):
        # NOTE: faithful to the reference forward, which never applies its
        # in_conv/out_conv (`mrf.py:83-88`) — they exist only in __init__,
        # so no parameters are created for them here either.
        for j, k in enumerate(self.kernel_sizes):
            if g is not None:
                x = x + g
            x = MRFBlock(self.channels, k, tuple(self.dilations),
                         name=f"blocks_{j}")(x, mask)
        return x