"""1-D U-Net denoiser (`/root/reference/promptttspp/modules/unet.py:33-311`,
SURVEY.md §2.7): weight-standardized convs + GroupNorm blocks, linear
attention, FiLM time conditioning, skip connections across 3 resolutions.

[B, T, C] layout; mask float [B, T, 1]. The reference's left reflect
padding to a multiple of 2^(levels-1) is reproduced.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from promptttspp_tpu.nn.layers import conv1d, swish


class SinusoidalPositionEmbeddings(nn.Module):
    dim: int
    scale: float = 1000.0

    def __call__(self, time):
        half = self.dim // 2
        emb = math.log(10000.0) / (half - 1)
        freqs = jnp.exp(jnp.arange(half) * -emb)
        arg = self.scale * time.astype(jnp.float32)[:, None] * freqs[None]
        return jnp.concatenate([jnp.sin(arg), jnp.cos(arg)], axis=-1)


class WeightStandardizedConv1d(nn.Module):
    """(`unet.py:69-91`); torch unbiased std over (in, k) per out-channel."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, in_f, self.features))  # [k, in, out]
        eps = 1e-5
        n = self.kernel_size * in_f
        mean = jnp.mean(kernel, axis=(0, 1), keepdims=True)
        var = jnp.var(kernel, axis=(0, 1), keepdims=True) * n / max(n - 1, 1)
        w = (kernel - mean) / (jnp.sqrt(var) + eps)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jax.lax.conv_general_dilated(
            x, w, (1,), [(self.kernel_size // 2,) * 2],
            dimension_numbers=("NHC", "HIO", "NHC"))
        return y + bias


class Block(nn.Module):
    """WS-conv -> GroupNorm -> (FiLM) -> SiLU (`unet.py:94-110`)."""

    dim_out: int
    groups: int = 8

    @nn.compact
    def __call__(self, x, mask, scale_shift=None):
        x = WeightStandardizedConv1d(self.dim_out, 3, name="proj")(x * mask)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         name="norm")(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1) + shift
        return swish(x) * mask


class ResnetBlock(nn.Module):
    """(`unet.py:113-137`)."""

    dim: int
    dim_out: int
    time_emb_dim: Optional[int] = None
    groups: int = 8

    @nn.compact
    def __call__(self, x, mask, time_emb=None):
        scale_shift = None
        if self.time_emb_dim is not None and time_emb is not None:
            t = nn.Dense(self.dim_out * 2, name="mlp_1")(swish(time_emb))
            t = t[:, None, :]
            scale_shift = jnp.split(t, 2, axis=-1)
        h = Block(self.dim_out, self.groups, name="block1")(
            x, mask, scale_shift)
        h = Block(self.dim_out, self.groups, name="block2")(h, mask)
        if self.dim != self.dim_out:
            x = conv1d(self.dim_out, 1, name="res_conv")(x)
        return h + x


class LinearAttention(nn.Module):
    """(`unet.py:140-165`)."""

    dim: int
    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        hidden = self.heads * self.dim_head
        qkv = conv1d(hidden * 3, 1, use_bias=False, name="to_qkv")(x)
        # torch chunks [B, 3h, T] then views [B, heads, d, T]
        qkv = qkv.transpose(0, 2, 1)  # [B, 3h, T]
        q, k, v = jnp.split(qkv, 3, axis=1)
        resh = lambda a: a.reshape(B, self.heads, self.dim_head, T)
        q, k, v = resh(q), resh(k), resh(v)
        q = nn.softmax(q, axis=-2) * (self.dim_head ** -0.5)
        k = nn.softmax(k, axis=-1)
        context = jnp.einsum("bhct,bhdt->bhcd", k, v)  # [B,H,C,D]
        out = jnp.einsum("bhcd,bhct->bhdt", context, q)
        out = out.reshape(B, hidden, T).transpose(0, 2, 1)
        out = conv1d(self.dim, 1, name="to_out_0")(out)
        return nn.GroupNorm(num_groups=1, epsilon=1e-5, name="to_out_1")(out)


class PreNormAttn(nn.Module):
    """Residual(PreNorm(LinearAttention)) (`unet.py:33-44,168-176`)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        y = nn.GroupNorm(num_groups=1, epsilon=1e-5, name="norm")(x)
        return LinearAttention(self.dim, name="fn")(y) + x


class Unet1d(nn.Module):
    """(`unet.py:179-311`)."""

    in_channels: int
    encoder_channels: int
    out_channels: int
    dim: int
    dim_mults: Sequence[int] = (1, 2, 4)
    scale: float = 1000.0

    @nn.compact
    def __call__(self, x, time, cond, mask=None):
        """x [B,T,in]; time [B]; cond [B,T,enc]; mask [B,T,1]."""
        B, T, _ = x.shape
        if mask is None:
            mask = jnp.ones((B, T, 1), x.dtype)
        n_down = 2 ** (len(self.dim_mults) - 1)
        pad = (-T) % n_down
        if pad:
            x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)), mode="reflect")
            cond = jnp.pad(cond, ((0, 0), (pad, 0), (0, 0)), mode="reflect")
            mask = jnp.pad(mask, ((0, 0), (pad, 0), (0, 0)),
                           constant_values=1.0)

        dims = [self.dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        time_dim = self.dim * 4

        x = conv1d(self.dim, 1, name="init_conv")(x)
        residual = x

        t = SinusoidalPositionEmbeddings(self.dim, self.scale,
                                         name="time_mlp_0")(time)
        t = nn.Dense(time_dim, name="time_mlp_1")(t)
        t = nn.gelu(t, approximate=False)
        t = nn.Dense(time_dim, name="time_mlp_3")(t)

        h, masks = [], [mask]
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= len(in_out) - 1
            mask_down = masks[-1]
            c = nn.Conv(dim_in, (3,), strides=(2 ** ind,),
                        padding=[(1, 1)], name=f"downs_{ind}_0")(cond)
            x = x + c * mask_down
            x = ResnetBlock(dim_in, dim_in, time_dim,
                            name=f"downs_{ind}_1")(x, mask_down, t)
            h.append(x)
            x = ResnetBlock(dim_in, dim_in, time_dim,
                            name=f"downs_{ind}_2")(x, mask_down, t)
            x = PreNormAttn(dim_in, name=f"downs_{ind}_3_fn")(x)
            h.append(x)
            if not is_last:
                x = nn.Conv(dim_out, (3,), strides=(2,), padding=[(1, 1)],
                            name=f"downs_{ind}_4")(x * mask_down)
            else:
                x = conv1d(dim_out, 3, name=f"downs_{ind}_4")(x * mask_down)
            masks.append(mask_down[:, ::2, :])

        masks = masks[:-1]
        mask_mid = masks[-1]
        mid_dim = dims[-1]
        x = ResnetBlock(mid_dim, mid_dim, time_dim,
                        name="mid_block1")(x, mask_mid, t)
        x = PreNormAttn(mid_dim, name="mid_attn_fn")(x)
        x = ResnetBlock(mid_dim, mid_dim, time_dim,
                        name="mid_block2")(x, mask_mid, t)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind == len(in_out) - 1
            mask_up = masks.pop()
            x = jnp.concatenate([x, h.pop()], axis=-1)
            x = ResnetBlock(dim_out + dim_in, dim_out, time_dim,
                            name=f"ups_{ind}_0")(x, mask_up, t)
            x = jnp.concatenate([x, h.pop()], axis=-1)
            x = ResnetBlock(dim_out + dim_in, dim_out, time_dim,
                            name=f"ups_{ind}_1")(x, mask_up, t)
            x = PreNormAttn(dim_out, name=f"ups_{ind}_2_fn")(x)
            if not is_last:
                x = jnp.repeat(x, 2, axis=1)  # nearest x2
                x = conv1d(dim_in, 3, name=f"ups_{ind}_3_1")(x)
            else:
                x = conv1d(dim_in, 3, name=f"ups_{ind}_3")(x)

        x = jnp.concatenate([x, residual], axis=-1)
        x = ResnetBlock(self.dim * 2, self.dim, time_dim,
                        name="final_res_block")(x, mask, t)
        x = conv1d(self.out_channels, 1, name="final_conv")(x) * mask
        return x[:, -T:, :]
