"""Global style token (GST) encoder.

Behavioral equivalent of
`/root/reference/promptttspp/modules/{style_encoder,reference_encoder}.py`:
mel [B, Tf, 80] -> 6x strided Conv2d+BN+ReLU -> GRU (packed-length
semantics) -> 10-token 4-head cross-attention -> style embedding
[B, 1, C].

Conv/BN submodules are named ``convs_{3i}`` / ``convs_{3i+1}`` to match the
torch ``nn.Sequential`` state_dict indices (ReLU occupies ``3i+2``), so
checkpoint conversion stays a pure name map.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from promptttspp_tpu.nn.attention import GSTCrossAttention
from promptttspp_tpu.nn.gru import GRU
from promptttspp_tpu.nn.layers import WeightedBatchNorm


class ReferenceEncoder(nn.Module):
    """(`reference_encoder.py:21-124`). Input [B, Tf, idim] (time-major;
    the reference takes [B, idim, Tf] and transposes)."""

    idim: int = 80
    conv_layers: int = 6
    conv_chans_list: Sequence[int] = (32, 32, 64, 64, 128, 128)
    conv_kernel_size: int = 3
    conv_stride: int = 2
    gru_layers: int = 1
    gru_units: int = 128

    def setup(self):
        assert self.conv_kernel_size % 2 == 1
        assert len(self.conv_chans_list) == self.conv_layers
        pad = (self.conv_kernel_size - 1) // 2
        self._convs = [
            nn.Conv(
                features=self.conv_chans_list[i],
                kernel_size=(self.conv_kernel_size,) * 2,
                strides=(self.conv_stride,) * 2,
                padding=[(pad, pad), (pad, pad)],
                use_bias=False,
                name=f"convs_{3 * i}",
            )
            for i in range(self.conv_layers)
        ]
        self._bns = [
            WeightedBatchNorm(momentum=0.9, epsilon=1e-5,
                              name=f"convs_{3 * i + 1}")
            for i in range(self.conv_layers)
        ]
        gru_in = self.idim
        for _ in range(self.conv_layers):
            gru_in = (
                gru_in - self.conv_kernel_size + 2 * pad
            ) // self.conv_stride + 1
        gru_in *= self.conv_chans_list[-1]
        self.gru = GRU(gru_in, self.gru_units, self.gru_layers, name="gru")

    def __call__(self, speech, in_lens=None, train: bool = False,
                 row_weight=None):
        """speech [B, Tf, idim] -> [B, gru_units]. row_weight [B] float
        or None: weight-0 rows (device-count padding) are excluded from
        the BatchNorm batch statistics (WeightedBatchNorm)."""
        B, Tf, _ = speech.shape
        h = speech[..., None]  # NHWC: [B, Tf, idim, 1]
        for conv, bn in zip(self._convs, self._bns):
            h = conv(h)
            h = bn(h, use_running_average=not train,
                   row_weight=row_weight)
            h = nn.relu(h)
        # [B, Tf', idim', C] -> [B, Tf', idim'*C]; torch flattens
        # (C, idim') with C-major after its transpose(1,2) of NCHW.
        h = jnp.transpose(h, (0, 1, 3, 2))  # [B, Tf', C, idim']
        h = h.reshape(B, h.shape[1], -1)
        if in_lens is not None:
            hs_lens = jnp.ceil(
                in_lens.astype(jnp.float32)
                / (self.conv_stride ** self.conv_layers)
            ).astype(jnp.int32)
            hs_lens = jnp.maximum(hs_lens, 1)
        else:
            hs_lens = None
        return self.gru(h, hs_lens)


class StyleTokenLayer(nn.Module):
    """Learned token bank + cross-attention (`style_encoder.py:83-135`)."""

    ref_embed_dim: int = 128
    gst_tokens: int = 10
    gst_token_dim: int = 256
    gst_heads: int = 4
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, ref_embs, deterministic: bool = True):
        """ref_embs [B, ref_embed_dim] -> [B, gst_token_dim]."""
        gst_embs = self.param(
            "gst_embs", nn.initializers.normal(stddev=1.0),
            (self.gst_tokens, self.gst_token_dim // self.gst_heads),
        )
        B = ref_embs.shape[0]
        tokens = jnp.tanh(gst_embs)[None].repeat(B, axis=0)
        out = GSTCrossAttention(
            self.gst_heads, self.gst_token_dim, self.dropout_rate, name="mha",
        )(ref_embs[:, None, :], tokens, deterministic=deterministic)
        return out[:, 0, :]


class StyleEncoder(nn.Module):
    """mel [B, Tf, idim] -> style embedding [B, 1, gst_token_dim]
    (`style_encoder.py:14-80`; the reference returns [B, C, 1])."""

    idim: int = 80
    gst_tokens: int = 10
    gst_token_dim: int = 256
    gst_heads: int = 4
    conv_layers: int = 6
    conv_chans_list: Sequence[int] = (32, 32, 64, 64, 128, 128)
    conv_kernel_size: int = 3
    conv_stride: int = 2
    gru_layers: int = 1
    gru_units: int = 128

    def setup(self):
        self.ref_enc = ReferenceEncoder(
            idim=self.idim,
            conv_layers=self.conv_layers,
            conv_chans_list=tuple(self.conv_chans_list),
            conv_kernel_size=self.conv_kernel_size,
            conv_stride=self.conv_stride,
            gru_layers=self.gru_layers,
            gru_units=self.gru_units,
            name="ref_enc",
        )
        self.stl = StyleTokenLayer(
            ref_embed_dim=self.gru_units,
            gst_tokens=self.gst_tokens,
            gst_token_dim=self.gst_token_dim,
            gst_heads=self.gst_heads,
            name="stl",
        )

    def __call__(self, speech, in_lens=None, train: bool = False,
                 row_weight=None):
        ref = self.ref_enc(speech, in_lens, train=train,
                           row_weight=row_weight)
        style = self.stl(ref, deterministic=not train)
        return style[:, None, :]  # [B, 1, C]
