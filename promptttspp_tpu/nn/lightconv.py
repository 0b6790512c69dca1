"""Lightweight and dynamic convolution attention substitutes.

Behavioral equivalents of the vendored fairseq-style modules
(`/root/reference/promptttspp/modules/esp/transformer/{lightconv,
dynamic_conv}.py`, SURVEY.md §2.7): linear -> GLU -> (light|dynamic)
depthwise conv with softmax-normalized kernels -> linear. The dynamic
variant's as_strided band-matrix trick is replaced by an explicit banded
gather — identical math, static shapes.

[B, T, C] layout; mask bool/float [B, T1, T2] (attention-style, only its
time-validity is used, matching the reference).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class LightweightConvolution(nn.Module):
    """(`lightconv.py:11-114`). Query-only attention-compatible API."""

    wshare: int
    n_feat: int
    dropout_rate: float
    kernel_size_str: str = "3"
    lnum: int = 0
    use_kernel_mask: bool = False
    use_bias: bool = False

    @nn.compact
    def __call__(self, query, key=None, value=None, mask=None,
                 deterministic: bool = True):
        x = query
        B, T, C = x.shape
        H = self.wshare
        k = int(self.kernel_size_str.split("_")[self.lnum])
        pad = k // 2

        x = nn.Dense(2 * self.n_feat, name="linear1")(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * nn.sigmoid(b)  # GLU

        weight = self.param(
            "weight", nn.initializers.uniform(scale=1.0), (H, 1, k))
        weight = nn.Dropout(self.dropout_rate)(
            weight, deterministic=deterministic)
        if self.use_kernel_mask:  # causal: zero the future taps
            km = jnp.concatenate(
                [jnp.ones((H, 1, k // 2 + 1)), jnp.zeros((H, 1, k // 2))],
                axis=-1)
            weight = jnp.where(km == 0.0, -jnp.inf, weight)
        weight = nn.softmax(weight, axis=-1)

        # grouped depthwise conv with wshare shared kernels: the torch
        # [B, C, T] -> view(B*C/H, H, T) fold maps channel c to kernel c % H
        per = C // H
        w_full = jnp.tile(weight[:, 0, :], (per, 1))  # [C, k]
        w_hio = w_full.T[:, None, :]  # [k, 1, C]
        x = jax.lax.conv_general_dilated(
            x, w_hio, (1,), [(pad, pad - (1 - k % 2))],
            feature_group_count=C,
            dimension_numbers=("NHC", "HIO", "NHC"))
        if self.use_bias:
            x = x + self.param("bias", nn.initializers.zeros, (self.n_feat,))

        if mask is not None and not self.use_kernel_mask:
            valid = mask[:, 0:1, :].transpose(0, 2, 1)  # [B, T, 1]
            x = jnp.where(valid > 0, x, 0.0)
        return nn.Dense(self.n_feat, name="linear2")(x)


class DynamicConvolution(nn.Module):
    """(`dynamic_conv.py:11-124`): per-position kernels predicted from the
    input, applied as a softmax-normalized band matrix."""

    wshare: int
    n_feat: int
    dropout_rate: float
    kernel_size_str: str = "3"
    lnum: int = 0
    use_kernel_mask: bool = False
    use_bias: bool = False

    @nn.compact
    def __call__(self, query, key=None, value=None, mask=None,
                 deterministic: bool = True):
        x = query
        B, T, C = x.shape
        H = self.wshare
        k = int(self.kernel_size_str.split("_")[self.lnum])

        x = nn.Dense(2 * self.n_feat, name="linear1")(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * nn.sigmoid(b)

        w = nn.Dense(H * k, name="linear_weight")(x)
        w = nn.Dropout(self.dropout_rate)(w, deterministic=deterministic)
        w = w.reshape(B, T, H, k).transpose(0, 2, 1, 3)  # [B, H, T, k]

        # band matrix: band[b,h,t,s] = w[b,h,t, s - t + (k-1)//2]
        t_idx = jnp.arange(T)[:, None]
        s_idx = jnp.arange(T)[None, :]
        rel = s_idx - t_idx + (k - 1) // 2  # [T, T]
        in_band = (rel >= 0) & (rel < k)
        rel_c = jnp.clip(rel, 0, k - 1)
        band = jnp.take_along_axis(
            w, jnp.broadcast_to(rel_c, (B, H, T, T)), axis=-1)
        band = jnp.where(in_band[None, None], band, -jnp.inf)
        if self.use_kernel_mask:  # causal
            band = jnp.where(s_idx[None, None] <= t_idx[None, None],
                             band, -jnp.inf)
        band = nn.softmax(band, axis=-1)  # [B, H, T, T]

        xh = x.reshape(B, T, H, C // H).transpose(0, 2, 1, 3)  # [B,H,T,C/H]
        out = jnp.einsum("bhts,bhsd->bhtd", band, xh)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, C)
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.n_feat,))
        if mask is not None and not self.use_kernel_mask:
            valid = mask[:, 0:1, :].transpose(0, 2, 1)
            out = jnp.where(valid > 0, out, 0.0)
        return nn.Dense(self.n_feat, name="linear2")(out)
