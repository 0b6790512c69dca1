"""Glow normalizing flow (`/root/reference/promptttspp/modules/glow.py:20-245`,
SURVEY.md §2.7): invertible-1x1-conv + affine-coupling pairs over [B, 1, C]
style vectors (the reference applies it on [B, C, 1]).

Data-dependent ActNorm init is replaced by standard zero init (the
reference's ActNorm is commented out of the flow stack anyway,
`glow.py:33`). log-det terms follow the reference exactly, including its
quirk of summing over batch.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class ActNorm(nn.Module):
    """(`glow.py:62-99`; zero-initialized, not data-dependent)."""

    channels: int

    @nn.compact
    def __call__(self, z, log_df_dz, reverse: bool = False, g=None):
        log_scale = self.param("log_scale", nn.initializers.zeros,
                               (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        if reverse:
            return (z - bias) * jnp.exp(-log_scale), \
                log_df_dz - jnp.sum(log_scale)
        return z * jnp.exp(log_scale) + bias, log_df_dz + jnp.sum(log_scale)


class Invertible1x1Conv(nn.Module):
    """(`glow.py:102-124`). QR-orthogonal init."""

    channels: int

    @nn.compact
    def __call__(self, z, log_df_dz, reverse: bool = False, g=None):
        w = self.param("weight", nn.initializers.orthogonal(),
                       (self.channels, self.channels))
        sign, logdet = jnp.linalg.slogdet(w)
        if reverse:
            w_inv = jnp.linalg.inv(w)
            return jnp.einsum("btc,dc->btd", z, w_inv), log_df_dz - logdet
        return jnp.einsum("btc,dc->btd", z, w), log_df_dz + logdet


class ResBlockLinear(nn.Module):
    """(`glow.py:127-148`)."""

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Dense(self.out_channels, name="net_1")(y)
        y = nn.relu(y)
        y = nn.Dense(self.out_channels, name="net_3")(y)
        if self.in_channels != self.out_channels:
            x = nn.Dense(self.out_channels, name="bridge")(x)
        return x + y


class MLP(nn.Module):
    """(`glow.py:151-178`)."""

    in_channels: int
    out_channels: int
    base_filters: int = 256
    n_blocks: int = 2
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, g=None):
        x = nn.Dense(self.base_filters, name="in_block_0")(x)
        if g is not None and self.gin_channels > 0:
            x = x + nn.Dense(self.base_filters, name="cond_layer")(g)
        for i in range(self.n_blocks):
            x = ResBlockLinear(self.base_filters, self.base_filters,
                               name=f"mid_block_{i}")(x)
        x = nn.relu(x)
        return nn.Dense(self.out_channels, name="out_block_1")(x)


class AffineCoupling(nn.Module):
    """(`glow.py:181-245`)."""

    in_channels: int
    channels: int
    n_blocks: int = 2
    gin_channels: int = 0

    @nn.compact
    def __call__(self, z, log_df_dz, reverse: bool = False, g=None):
        split = self.in_channels // 2
        z0, z1 = z[..., :split], z[..., split:]
        params = nn.Dense(self.channels, name="start")(z1)
        params = MLP(self.channels, self.channels, n_blocks=self.n_blocks,
                     gin_channels=self.gin_channels, name="net")(params, g=g)
        zeros = nn.initializers.zeros
        params = nn.Dense(self.in_channels, kernel_init=zeros,
                          bias_init=zeros, name="end")(params)
        t = params[..., :split]
        logs = params[..., split:]
        if reverse:
            z0 = (z0 - t) * jnp.exp(-logs)
            log_df_dz = log_df_dz - jnp.sum(logs)
        else:
            z0 = z0 * jnp.exp(logs) + t
            log_df_dz = log_df_dz + jnp.sum(logs)
        return jnp.concatenate([z0, z1], axis=-1), log_df_dz


class Glow(nn.Module):
    """(`glow.py:20-59`). z [B, T, C] (T=1 for style vectors)."""

    in_channels: int
    channels: int
    num_flows: int
    n_blocks: int
    gin_channels: int = 0

    def setup(self):
        flows = []
        for i in range(self.num_flows):
            flows.append(Invertible1x1Conv(
                self.in_channels, name=f"flows_{2 * i}"))
            flows.append(AffineCoupling(
                self.in_channels, self.channels, self.n_blocks,
                self.gin_channels, name=f"flows_{2 * i + 1}"))
        self.flows = flows

    def __call__(self, z, g=None):
        log_df_dz = jnp.zeros(())
        for flow in self.flows:
            z, log_df_dz = flow(z, log_df_dz, reverse=False, g=g)
        return z, log_df_dz

    def reverse(self, y, g=None):
        log_df_dz = jnp.zeros(())
        for flow in reversed(self.flows):
            y, log_df_dz = flow(y, log_df_dz, reverse=True, g=g)
        return y, log_df_dz
