"""Transformer decoder (vendored-ESPnet equivalent).

Behavioral equivalent of
`/root/reference/promptttspp/modules/esp/transformer/{decoder,
decoder_layer}.py` (SURVEY.md §2.7): embedding (token or linear) +
absolute positional encoding, N pre/post-norm blocks of
[self-attention | light/dynamic convolution] -> source attention -> FFN,
optional final norm and output projection.

TPU notes: the full ``__call__`` is the jit path (static shapes, causal
masking via ``ops.masks.target_mask``). ``forward_one_step`` mirrors the
reference's incremental API (per-layer output cache, last-position
query); it re-embeds the growing prefix per step exactly like the
reference, so it is an eager/beam-search convenience, not a jit target —
wrap a fixed-length ``__call__`` in ``lax.scan`` for compiled
autoregressive decoding.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from promptttspp_tpu.nn.attention import MultiHeadedAttention
from promptttspp_tpu.nn.conformer import PositionwiseFeedForward
from promptttspp_tpu.nn.embedding import (PositionalEncoding,
                                          ScaledPositionalEncoding)
from promptttspp_tpu.nn.layers import layer_norm
from promptttspp_tpu.nn.lightconv import (DynamicConvolution,
                                          LightweightConvolution)
from promptttspp_tpu.nn.lightconv2d import (DynamicConvolution2D,
                                            LightweightConvolution2D)

_CONV_ATTN = {
    "lightconv": LightweightConvolution,
    "lightconv2d": LightweightConvolution2D,
    "dynamicconv": DynamicConvolution,
    "dynamicconv2d": DynamicConvolution2D,
}


class DecoderLayer(nn.Module):
    """One decoder block (`decoder_layer.py:15-134`)."""

    size: int
    selfattention_layer_type: str
    attention_heads: int
    self_attention_dropout_rate: float
    src_attention_dropout_rate: float
    linear_units: int
    dropout_rate: float
    conv_wshare: int = 4
    conv_kernel_length: str = "11"
    conv_usebias: bool = False
    lnum: int = 0
    normalize_before: bool = True
    concat_after: bool = False

    def setup(self):
        if self.selfattention_layer_type == "selfattn":
            self.self_attn = MultiHeadedAttention(
                self.attention_heads, self.size,
                self.self_attention_dropout_rate, name="self_attn")
        else:
            self.self_attn = _CONV_ATTN[self.selfattention_layer_type](
                self.conv_wshare, self.size,
                self.self_attention_dropout_rate,
                kernel_size_str=self.conv_kernel_length, lnum=self.lnum,
                use_kernel_mask=True, use_bias=self.conv_usebias,
                name="self_attn")
        self.src_attn = MultiHeadedAttention(
            self.attention_heads, self.size, self.src_attention_dropout_rate,
            name="src_attn")
        self.feed_forward = PositionwiseFeedForward(
            self.size, self.linear_units, self.dropout_rate,
            name="feed_forward")
        self.norm1 = layer_norm("norm1")
        self.norm2 = layer_norm("norm2")
        self.norm3 = layer_norm("norm3")
        self.drop = nn.Dropout(self.dropout_rate)
        if self.concat_after:
            self.concat_linear1 = nn.Dense(self.size, name="concat_linear1")
            self.concat_linear2 = nn.Dense(self.size, name="concat_linear2")

    def __call__(self, tgt, tgt_mask, memory, memory_mask,
                 cache: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        residual = tgt
        x = self.norm1(tgt) if self.normalize_before else tgt

        if cache is None:
            tgt_q, tgt_q_mask = x, tgt_mask
        else:
            # compute only the last position's query (`:88-104`)
            assert cache.shape == (tgt.shape[0], tgt.shape[1] - 1, self.size)
            tgt_q = x[:, -1:, :]
            residual = residual[:, -1:, :]
            tgt_q_mask = None if tgt_mask is None else tgt_mask[:, -1:, :]

        sa = self.self_attn(tgt_q, x, x, tgt_q_mask,
                            deterministic=deterministic)
        if self.concat_after:
            y = residual + self.concat_linear1(
                jnp.concatenate([tgt_q, sa], axis=-1))
        else:
            y = residual + self.drop(sa, deterministic=deterministic)
        if not self.normalize_before:
            y = self.norm1(y)

        residual = y
        x = self.norm2(y) if self.normalize_before else y
        ca = self.src_attn(x, memory, memory, memory_mask,
                           deterministic=deterministic)
        if self.concat_after:
            y = residual + self.concat_linear2(
                jnp.concatenate([x, ca], axis=-1))
        else:
            y = residual + self.drop(ca, deterministic=deterministic)
        if not self.normalize_before:
            y = self.norm2(y)

        residual = y
        x = self.norm3(y) if self.normalize_before else y
        ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
        y = residual + self.drop(
            self.feed_forward(x, ones, deterministic=deterministic),
            deterministic=deterministic)
        if not self.normalize_before:
            y = self.norm3(y)

        if cache is not None:
            y = jnp.concatenate([cache, y], axis=1)
        return y, tgt_mask, memory, memory_mask


class Decoder(nn.Module):
    """Transformer decoder stack (`decoder.py:26-232`)."""

    odim: int
    selfattention_layer_type: str = "selfattn"
    attention_dim: int = 256
    attention_heads: int = 4
    conv_wshare: int = 4
    conv_kernel_length: str = "11"
    conv_usebias: bool = False
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    input_layer: str = "embed"  # embed | linear
    use_output_layer: bool = True
    pos_enc_type: str = "abs"  # abs | scaled
    normalize_before: bool = True
    concat_after: bool = False

    def setup(self):
        if self.input_layer == "embed":
            self.embed_0 = nn.Embed(self.odim, self.attention_dim,
                                    name="embed_0")
        elif self.input_layer == "linear":
            self.embed_0 = nn.Dense(self.attention_dim, name="embed_0")
            # plain torch.nn.LayerNorm (eps 1e-5), not the esp 1e-12 one
            self.embed_1 = nn.LayerNorm(epsilon=1e-5, name="embed_1")
            self.embed_drop = nn.Dropout(self.dropout_rate)
        else:
            raise NotImplementedError(self.input_layer)
        pe_cls = (ScaledPositionalEncoding if self.pos_enc_type == "scaled"
                  else PositionalEncoding)
        self.pos_enc = pe_cls(self.attention_dim,
                              self.positional_dropout_rate, name="pos_enc")
        self.decoders = [
            DecoderLayer(
                self.attention_dim, self.selfattention_layer_type,
                self.attention_heads, self.self_attention_dropout_rate,
                self.src_attention_dropout_rate, self.linear_units,
                self.dropout_rate, conv_wshare=self.conv_wshare,
                conv_kernel_length=self.conv_kernel_length,
                conv_usebias=self.conv_usebias, lnum=i,
                normalize_before=self.normalize_before,
                concat_after=self.concat_after, name=f"decoders_{i}")
            for i in range(self.num_blocks)
        ]
        if self.normalize_before:
            self.after_norm = layer_norm("after_norm")
        if self.use_output_layer:
            self.output_layer = nn.Dense(self.odim, name="output_layer")

    def _embed(self, tgt, deterministic):
        x = self.embed_0(tgt)
        if self.input_layer == "linear":
            x = nn.relu(self.embed_drop(self.embed_1(x),
                                        deterministic=deterministic))
        return self.pos_enc(x, deterministic=deterministic)

    def __call__(self, tgt, tgt_mask, memory, memory_mask,
                 deterministic: bool = True):
        """tgt int ids [B, L] (or [B, L, odim] for linear input);
        tgt_mask bool [B, L, L] (see ops.masks.target_mask); memory
        [B, T, D]; memory_mask bool [B, 1, T] -> (scores [B, L, odim],
        tgt_mask)."""
        x = self._embed(tgt, deterministic)
        for layer in self.decoders:
            x, tgt_mask, memory, memory_mask = layer(
                x, tgt_mask, memory, memory_mask,
                deterministic=deterministic)
        if self.normalize_before:
            x = self.after_norm(x)
        if self.use_output_layer:
            x = self.output_layer(x)
        return x, tgt_mask

    def forward_one_step(self, tgt, tgt_mask, memory, memory_mask=None,
                         cache: Optional[Sequence[jnp.ndarray]] = None,
                         deterministic: bool = True):
        """Incremental step (`decoder.py:234-278`): returns
        (log-softmax scores of the LAST position [B, odim], new_cache)."""
        x = self._embed(tgt, deterministic)
        if cache is None:
            cache = [None] * len(self.decoders)
        new_cache = []
        for c, layer in zip(cache, self.decoders):
            x, tgt_mask, memory, memory_mask = layer(
                x, tgt_mask, memory, memory_mask, cache=c,
                deterministic=deterministic)
            new_cache.append(x)
        y = self.after_norm(x[:, -1]) if self.normalize_before else x[:, -1]
        if self.use_output_layer:
            y = nn.log_softmax(self.output_layer(y), axis=-1)
        return y, new_cache
