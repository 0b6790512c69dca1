"""Self-contained conformer variant with per-layer ``g`` conditioning.

Behavioral equivalent of `/root/reference/promptttspp/modules/conformer.py`
(SURVEY.md §2.7): differs from the ESPnet stack in that the rel-PE does
NOT scale x by sqrt(d), FFNs use SiLU with scale-4 hidden width and no
internal masking, the conv module is unmasked, and a conditioning vector
``g`` is added to the input of every layer.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from promptttspp_tpu.nn.attention import RelPositionMultiHeadedAttention
from promptttspp_tpu.nn.embedding import rel_sinusoid_table
from promptttspp_tpu.nn.layers import conv1d, layer_norm, swish


class LocalRelPositionalEncoding(nn.Module):
    """Rel PE without the x*sqrt(d) scale (`conformer.py:7-79`)."""

    d_model: int
    dropout_rate: float
    max_len: int = 5000

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        T = x.shape[1]
        table_len = max(self.max_len, T)
        table = rel_sinusoid_table(table_len, self.d_model)
        center = table_len - 1
        pos_emb = jnp.asarray(table[center - T + 1: center + T])[None]
        drop = nn.Dropout(self.dropout_rate)
        return (drop(x, deterministic=deterministic),
                drop(pos_emb, deterministic=deterministic))


class LocalConvolutionModule(nn.Module):
    """Unmasked conv module with ReLU (`conformer.py:280-347`)."""

    channels: int
    kernel_size: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv1d(2 * self.channels, 1, name="pointwise_conv1")(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * nn.sigmoid(b)
        x = conv1d(self.channels, self.kernel_size, groups=self.channels,
                   name="depthwise_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="norm")(x)
        x = nn.relu(x)
        return conv1d(self.channels, 1, name="pointwise_conv2")(x)


class LocalFFN(nn.Module):
    """SiLU FFN without masking (`conformer.py:350-371`)."""

    idim: int
    hidden_units: int
    dropout_rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = swish(nn.Dense(self.hidden_units, name="w_1")(x))
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return nn.Dense(self.idim, name="w_2")(x)


class ConformerLayer(nn.Module):
    """(`conformer.py:374-432`)."""

    channels: int
    num_head: int
    kernel_size: int
    dropout: float
    ffn_scale: int = 4

    @nn.compact
    def __call__(self, x, pos_emb, mask, train: bool = False):
        """x [B,T,C]; mask float [B,T,1]."""
        det = not train
        drop = nn.Dropout(self.dropout)

        y = layer_norm("norm1")(x)
        y = LocalFFN(self.channels, self.channels * self.ffn_scale,
                     self.dropout, name="ffn1")(y, deterministic=det)
        x = x + 0.5 * drop(y, deterministic=det) * mask

        attn_mask = (mask[:, :, 0][:, None, :] *
                     mask[:, :, 0][:, :, None]) > 0  # [B, T, T]
        y = layer_norm("norm_attn")(x)
        y = RelPositionMultiHeadedAttention(
            self.num_head, self.channels, self.dropout, name="attn",
        )(y, y, y, pos_emb, attn_mask, deterministic=det)
        x = x + drop(y, deterministic=det) * mask

        y = layer_norm("norm_conv")(x)
        y = LocalConvolutionModule(self.channels, self.kernel_size,
                                   name="conv_module")(y, train=train)
        x = x + drop(y, deterministic=det) * mask

        y = layer_norm("norm2")(x)
        y = LocalFFN(self.channels, self.channels * self.ffn_scale,
                     self.dropout, name="ffn2")(y, deterministic=det)
        x = x + 0.5 * drop(y, deterministic=det) * mask

        return layer_norm("norm_final")(x)


class Conformer(nn.Module):
    """(`conformer.py:435-462`). x [B,T,C]; mask float [B,T,1];
    optional g [B,1,C] added before every layer."""

    num_layers: int
    channels: int
    num_head: int
    kernel_size: int
    dropout: float
    ffn_scale: int = 4
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, mask, g: Optional[jnp.ndarray] = None,
                 train: bool = False):
        x, pos_emb = LocalRelPositionalEncoding(
            self.channels, self.dropout, name="rel_pos_emb",
        )(x, deterministic=not train)
        for i in range(self.num_layers):
            if g is not None:
                x = x + g
            x = ConformerLayer(
                self.channels, self.num_head, self.kernel_size, self.dropout,
                self.ffn_scale, name=f"layers_{i}",
            )(x, pos_emb, mask, train=train)
        return x
