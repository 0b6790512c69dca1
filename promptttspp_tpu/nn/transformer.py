"""VITS-style transformer with windowed relative attention.

Behavioral equivalent of
`/root/reference/promptttspp/modules/transformer.py:23-263` (SURVEY.md
§2.7): post-norm blocks, conv FFN, and the VITS windowed relative
position bias (window 4, learned key/value embeddings). The reference's
pad/reshape relative<->absolute conversion tricks are replaced by
explicit gathers — identical math, static shapes.

[B, T, C] layout; masks float [B, T, 1].
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from promptttspp_tpu.nn.layers import ChannelLayerNorm, conv1d


def _rel_to_abs(rel, T):
    """rel [B,H,T,2T-1] (r = s - t + T - 1) -> abs [B,H,T,T]."""
    t = jnp.arange(T)[:, None]
    s = jnp.arange(T)[None, :]
    idx = s - t + T - 1  # [T, T] in [0, 2T-2]
    return jnp.take_along_axis(
        rel, jnp.broadcast_to(idx, rel.shape[:2] + (T, T)), axis=-1)


def _abs_to_rel(p, T):
    """p [B,H,T,T] -> rel [B,H,T,2T-1] with zeros out of range."""
    t = jnp.arange(T)[:, None]
    r = jnp.arange(2 * T - 1)[None, :]
    s = r + t - (T - 1)  # absolute column for each (t, r)
    valid = (s >= 0) & (s < T)
    s_clamped = jnp.clip(s, 0, T - 1)
    gathered = jnp.take_along_axis(
        p, jnp.broadcast_to(s_clamped, p.shape[:2] + (T, 2 * T - 1)), axis=-1)
    return jnp.where(valid[None, None], gathered, 0.0)


def _window_to_full(emb, T, window_size):
    """[2w+1, D] learned window -> [2T-1, D] zero-padded/cropped table
    (`transformer.py:100-105`)."""
    pad = max(0, T - (window_size + 1))
    start = max(0, (window_size + 1) - T)
    padded = jnp.pad(emb, ((pad, pad), (0, 0)))
    return padded[start: start + 2 * T - 1]


class MultiHeadAttention(nn.Module):
    """Plain MHA with fused qkv conv (`transformer.py:23-55`)."""

    channels: int
    n_heads: int
    dropout: float

    @nn.compact
    def __call__(self, x, attn_mask, deterministic: bool = True):
        B, T, C = x.shape
        H, D = self.n_heads, self.channels // self.n_heads
        qkv = conv1d(3 * self.channels, 1, name="qkv")(x)
        # torch views [B, 3C, T] as [B, 3, H, D, T]: C-major split
        qkv = qkv.reshape(B, T, 3, H, D).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # [B, H, T, D]
        score = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(D)
        if attn_mask is not None:
            score = jnp.where(attn_mask, score, -1e4)
        p = nn.softmax(score, axis=-1)
        p = nn.Dropout(self.dropout)(p, deterministic=deterministic)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, T, C)
        return conv1d(self.channels, 1, name="out")(o)


class RelativeMultiHeadAttention(nn.Module):
    """Windowed relative attention (`transformer.py:59-135`)."""

    channels: int
    n_heads: int
    dropout: float
    window_size: int = 4

    @nn.compact
    def __call__(self, x, attn_mask, deterministic: bool = True):
        B, T, C = x.shape
        H, D = self.n_heads, self.channels // self.n_heads
        scale = math.sqrt(D)
        q = conv1d(self.channels, 1, name="conv_q")(x)
        k = conv1d(self.channels, 1, name="conv_k")(x)
        v = conv1d(self.channels, 1, name="conv_v")(x)
        # torch view [B, H, D, T].transpose(2,3): D-major head split
        def split(a):
            return a.transpose(0, 2, 1).reshape(B, H, D, T).transpose(
                0, 1, 3, 2)

        q, k, v = split(q), split(k), split(v)  # [B, H, T, D]

        scores = jnp.einsum("bhqd,bhkd->bhqk", q / scale, k)

        init = nn.initializers.normal(stddev=D ** -0.5)
        emb_rel_k = self.param("emb_rel_k", init,
                               (2 * self.window_size + 1, D))
        emb_rel_v = self.param("emb_rel_v", init,
                               (2 * self.window_size + 1, D))

        k_emb = _window_to_full(emb_rel_k, T, self.window_size)  # [2T-1, D]
        rel_logits = jnp.einsum("bhqd,rd->bhqr", q / scale, k_emb)
        scores = scores + _rel_to_abs(rel_logits, T)

        if attn_mask is not None:
            scores = jnp.where(attn_mask, scores, -1e4)
        p = nn.softmax(scores, axis=-1)
        p = nn.Dropout(self.dropout)(p, deterministic=deterministic)
        output = jnp.einsum("bhqk,bhkd->bhqd", p, v)

        v_emb = _window_to_full(emb_rel_v, T, self.window_size)
        rel_w = _abs_to_rel(p, T)  # [B, H, T, 2T-1]
        output = output + jnp.einsum("bhqr,rd->bhqd", rel_w, v_emb)

        output = output.transpose(0, 2, 1, 3).reshape(B, T, C)
        return conv1d(self.channels, 1, name="conv_o")(output)


class FFN(nn.Module):
    """Conv FFN (`transformer.py:138-152`)."""

    channels: int
    kernel_size: int
    dropout: float
    scale: int

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        x = conv1d(self.channels * self.scale, self.kernel_size,
                   name="conv1")(x * mask)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = conv1d(self.channels, 1, name="conv2")(x * mask)
        return x * mask


class TransformerLayer(nn.Module):
    """post-norm attention + FFN (`transformer.py:155-222`)."""

    channels: int
    num_head: int
    kernel_size: int
    dropout: float
    scale: int
    window_size: Optional[int] = None
    use_rel: bool = False

    @nn.compact
    def __call__(self, x, mask, attn_mask, train: bool = False):
        det = not train
        drop = nn.Dropout(self.dropout)
        if self.use_rel:
            attn = RelativeMultiHeadAttention(
                self.channels, self.num_head, self.dropout,
                self.window_size, name="attention_attention_layer")
        else:
            attn = MultiHeadAttention(self.channels, self.num_head,
                                      self.dropout,
                                      name="attention_attention_layer")
        y = attn(x, attn_mask, deterministic=det)
        y = drop(y, deterministic=det)
        x = ChannelLayerNorm(self.channels, name="attention_norm")(x + y)

        y = FFN(self.channels, self.kernel_size, self.dropout, self.scale,
                name="ffn_ffn")(x, mask, deterministic=det)
        y = drop(y, deterministic=det)
        x = ChannelLayerNorm(self.channels, name="ffn_norm")(x + y)
        return x * mask


class Transformer(nn.Module):
    """(`transformer.py:225-263`). x [B,T,C]; mask float [B,T,1];
    optional g [B,1,C] added before every layer."""

    channels: int
    num_head: int
    num_layers: int
    kernel_size: int
    dropout: float
    scale: int = 4
    window_size: Optional[int] = None
    use_rel: bool = False

    @nn.compact
    def __call__(self, x, mask, g: Optional[jnp.ndarray] = None,
                 train: bool = False):
        m = mask[:, :, 0]
        attn_mask = (m[:, None, :] * m[:, :, None])[:, None] > 0  # [B,1,T,T]
        for i in range(self.num_layers):
            if g is not None:
                x = x + g
            x = TransformerLayer(
                self.channels, self.num_head, self.kernel_size, self.dropout,
                self.scale, self.window_size, self.use_rel,
                name=f"layers_{i}",
            )(x, mask, attn_mask, train=train)
        return x
