"""Plain (non-conformer) transformer encoder.

Behavioral equivalent of
`/root/reference/promptttspp/modules/esp/transformer/{encoder,
encoder_layer}.py` (SURVEY.md §2.7): input layer (linear / conv2d
subsampling / token embedding / bare positional encoding), N pre/post-norm
blocks of [self-attention | light/dynamic convolution] -> FFN, optional
final norm. The conformer flavor (macaron FFN + conv module) lives in
nn/conformer.py; this is the vanilla stack the vendored suite also ships.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from promptttspp_tpu.nn.attention import MultiHeadedAttention
from promptttspp_tpu.nn.conformer import (Conv1dLinear, MultiLayeredConv1d,
                                          PositionwiseFeedForward)
from promptttspp_tpu.nn.decoder import _CONV_ATTN
from promptttspp_tpu.nn.embedding import (PositionalEncoding,
                                          ScaledPositionalEncoding)
from promptttspp_tpu.nn.layers import layer_norm
from promptttspp_tpu.nn.subsampling import (Conv2dSubsampling,
                                            Conv2dSubsampling6,
                                            Conv2dSubsampling8)

_SUBSAMPLERS = {"conv2d": Conv2dSubsampling, "conv2d6": Conv2dSubsampling6,
                "conv2d8": Conv2dSubsampling8}


class TransformerEncoderLayer(nn.Module):
    """One encoder block (`encoder_layer.py:14-118`)."""

    size: int
    selfattention_layer_type: str
    attention_heads: int
    attention_dropout_rate: float
    linear_units: int
    dropout_rate: float
    positionwise_layer_type: str = "linear"
    positionwise_conv_kernel_size: int = 1
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
                self.attention_dropout_rate, name="self_attn")
        else:
            self.self_attn = _CONV_ATTN[self.selfattention_layer_type](
                self.conv_wshare, self.size, self.attention_dropout_rate,
                kernel_size_str=self.conv_kernel_length, lnum=self.lnum,
                use_kernel_mask=False, use_bias=self.conv_usebias,
                name="self_attn")
        if self.positionwise_layer_type == "linear":
            self.feed_forward = PositionwiseFeedForward(
                self.size, self.linear_units, self.dropout_rate,
                name="feed_forward")
        elif self.positionwise_layer_type == "conv1d":
            self.feed_forward = MultiLayeredConv1d(
                self.size, self.linear_units,
                self.positionwise_conv_kernel_size, self.dropout_rate,
                name="feed_forward")
        elif self.positionwise_layer_type == "conv1d-linear":
            self.feed_forward = Conv1dLinear(
                self.size, self.linear_units,
                self.positionwise_conv_kernel_size, self.dropout_rate,
                name="feed_forward")
        else:
            raise NotImplementedError(self.positionwise_layer_type)
        self.norm1 = layer_norm("norm1")
        self.norm2 = layer_norm("norm2")
        self.drop = nn.Dropout(self.dropout_rate)
        if self.concat_after:
            self.concat_linear = nn.Dense(self.size, name="concat_linear")

    def __call__(self, x, mask, deterministic: bool = True):
        residual = x
        if self.normalize_before:
            x = self.norm1(x)
        sa = self.self_attn(x, x, x, mask, deterministic=deterministic)
        if self.concat_after:
            x = residual + self.concat_linear(
                jnp.concatenate([x, sa], axis=-1))
        else:
            x = residual + self.drop(sa, deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm1(x)

        residual = x
        if self.normalize_before:
            x = self.norm2(x)
        ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
        x = residual + self.drop(
            self.feed_forward(x, ones, deterministic=deterministic),
            deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm2(x)
        return x, mask


class TransformerEncoder(nn.Module):
    """Encoder stack (`encoder.py:25-262`).

    ``__call__(xs, masks)``: xs [B, T, idim] (or int ids [B, T] for
    input_layer='embed'); masks bool [B, 1, T] or None -> (ys, masks'),
    subsampled when the input layer subsamples.
    """

    idim: int
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
    attention_dropout_rate: float = 0.0
    input_layer: Optional[str] = "conv2d"
    pos_enc_type: str = "abs"  # abs | scaled
    normalize_before: bool = True
    concat_after: bool = False
    positionwise_layer_type: str = "linear"
    positionwise_conv_kernel_size: int = 1
    padding_idx: int = -1

    def setup(self):
        pe_cls = (ScaledPositionalEncoding if self.pos_enc_type == "scaled"
                  else PositionalEncoding)
        if self.input_layer in _SUBSAMPLERS:
            self.embed = _SUBSAMPLERS[self.input_layer](
                self.attention_dim, self.dropout_rate, name="embed")
        elif self.input_layer == "linear":
            self.embed_0 = nn.Dense(self.attention_dim, name="embed_0")
            self.embed_1 = nn.LayerNorm(epsilon=1e-5, name="embed_1")
            self.embed_drop = nn.Dropout(self.dropout_rate)
            self.pos_enc = pe_cls(self.attention_dim,
                                  self.positional_dropout_rate,
                                  name="pos_enc")
        elif self.input_layer == "embed":
            self.embed_0 = nn.Embed(self.idim, self.attention_dim,
                                    name="embed_0")
            self.pos_enc = pe_cls(self.attention_dim,
                                  self.positional_dropout_rate,
                                  name="pos_enc")
        elif self.input_layer is None:
            self.pos_enc = pe_cls(self.attention_dim,
                                  self.positional_dropout_rate,
                                  name="pos_enc")
        elif self.input_layer != "no_pos_enc":
            raise ValueError(f"unknown input_layer: {self.input_layer}")
        self.encoders = [
            TransformerEncoderLayer(
                self.attention_dim, self.selfattention_layer_type,
                self.attention_heads, self.attention_dropout_rate,
                self.linear_units, self.dropout_rate,
                positionwise_layer_type=self.positionwise_layer_type,
                positionwise_conv_kernel_size=(
                    self.positionwise_conv_kernel_size),
                conv_wshare=self.conv_wshare,
                conv_kernel_length=self.conv_kernel_length,
                conv_usebias=self.conv_usebias, lnum=i,
                normalize_before=self.normalize_before,
                concat_after=self.concat_after, name=f"encoders_{i}")
            for i in range(self.num_blocks)
        ]
        if self.normalize_before:
            self.after_norm = layer_norm("after_norm")

    def __call__(self, xs, masks, deterministic: bool = True):
        if self.input_layer in _SUBSAMPLERS:
            xs, masks = self.embed(xs, masks, deterministic=deterministic)
        elif self.input_layer == "linear":
            xs = nn.relu(self.embed_drop(self.embed_1(self.embed_0(xs)),
                                         deterministic=deterministic))
            xs = self.pos_enc(xs, deterministic=deterministic)
        elif self.input_layer == "embed":
            xs = self.pos_enc(self.embed_0(xs), deterministic=deterministic)
        elif self.input_layer is None:
            xs = self.pos_enc(xs, deterministic=deterministic)
        # 'no_pos_enc': identity
        for layer in self.encoders:
            xs, masks = layer(xs, masks, deterministic=deterministic)
        if self.normalize_before:
            xs = self.after_norm(xs)
        return xs, masks
