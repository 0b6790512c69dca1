"""Conformer encoder stack.

Behavioral equivalent of the vendored ESPnet conformer
(`/root/reference/promptttspp/modules/esp/conformer/{encoder,encoder_layer,
convolution}.py`, `modules/esp/transformer/{multi_layer_conv,
positionwise_feed_forward}.py`, wrapper `modules/esp/__init__.py:11-65`),
re-expressed for [B, T, C]:

- pre-norm macaron block: 0.5*FFN -> rel-MHA -> conv module -> 0.5*FFN ->
  final LayerNorm, with the reference's exact mask-multiply points.
- LayerNorm eps 1e-12 everywhere; BatchNorm in the conv module computes
  batch stats over ALL positions (padding included), replicating the
  reference's unmasked BatchNorm1d semantics for training parity.
- both 'new' (2T-1) and 'legacy' relative position variants.

Shipped text-encoder config (`conf/model/...final.yaml:13-30`): 4 blocks,
d=256, 2 heads, ff 1024 conv1d k9, macaron, cnn k7, rel_pos new.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from promptttspp_tpu.nn import attention as attn_mod
from promptttspp_tpu.nn import embedding as emb_mod
from promptttspp_tpu.nn.layers import (
    WeightedBatchNorm, conv1d, layer_norm, swish)
from promptttspp_tpu.ops.masks import sequence_mask


class ConvolutionModule(nn.Module):
    """pointwise(2C)+GLU -> depthwise k -> BatchNorm -> swish -> pointwise
    (`conformer/convolution.py:13-85`)."""

    channels: int
    kernel_size: int

    @nn.compact
    def __call__(self, x, mask, train: bool = False, row_weight=None):
        """x [B,T,C]; mask [B,T,1] float; row_weight [B] float or None —
        rows with weight 0 (device-count padding) are excluded from the
        BatchNorm batch statistics (see WeightedBatchNorm)."""
        x = conv1d(2 * self.channels, 1, name="pointwise_conv1")(x) * mask
        a, b = jnp.split(x, 2, axis=-1)
        x = a * nn.sigmoid(b)  # GLU over channel dim
        x = conv1d(
            self.channels, self.kernel_size, groups=self.channels,
            name="depthwise_conv",
        )(x) * mask
        x = WeightedBatchNorm(
            momentum=0.9, epsilon=1e-5, name="norm",
        )(x, use_running_average=not train, row_weight=row_weight)
        x = swish(x)
        return conv1d(self.channels, 1, name="pointwise_conv2")(x) * mask


class MultiLayeredConv1d(nn.Module):
    """FastSpeech conv1d FFN (`multi_layer_conv.py:12-66`)."""

    in_chans: int
    hidden_chans: int
    kernel_size: int
    dropout_rate: float

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        x = x * mask
        x = nn.relu(conv1d(self.hidden_chans, self.kernel_size, name="w_1")(x)) * mask
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return conv1d(self.in_chans, self.kernel_size, name="w_2")(x) * mask


class Conv1dLinear(nn.Module):
    """Conv1d + Linear FFN variant (`multi_layer_conv.py:69-113`)."""

    in_chans: int
    hidden_chans: int
    kernel_size: int
    dropout_rate: float

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        x = x * mask
        x = nn.relu(conv1d(self.hidden_chans, self.kernel_size, name="w_1")(x)) * mask
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return nn.Dense(self.in_chans, name="w_2")(x) * mask


class PositionwiseFeedForward(nn.Module):
    """Linear FFN (`positionwise_feed_forward.py`)."""

    idim: int
    hidden_units: int
    dropout_rate: float

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        x = nn.relu(nn.Dense(self.hidden_units, name="w_1")(x) * mask)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return nn.Dense(self.idim, name="w_2")(x) * mask


class EncoderLayer(nn.Module):
    """One conformer block (`conformer/encoder_layer.py:15-162`)."""

    size: int
    attention_heads: int
    attention_dropout_rate: float
    dropout_rate: float
    linear_units: int
    positionwise_layer_type: str  # linear | conv1d | conv1d-linear
    positionwise_conv_kernel_size: int
    macaron_style: bool
    use_cnn_module: bool
    cnn_module_kernel: int
    selfattention_layer_type: str  # selfattn | rel_selfattn | legacy_rel_selfattn
    normalize_before: bool = True

    def _make_ff(self, name):
        if self.positionwise_layer_type == "linear":
            return PositionwiseFeedForward(
                self.size, self.linear_units, self.dropout_rate, name=name)
        if self.positionwise_layer_type == "conv1d":
            return MultiLayeredConv1d(
                self.size, self.linear_units, self.positionwise_conv_kernel_size,
                self.dropout_rate, name=name)
        if self.positionwise_layer_type == "conv1d-linear":
            return Conv1dLinear(
                self.size, self.linear_units, self.positionwise_conv_kernel_size,
                self.dropout_rate, name=name)
        raise ValueError(self.positionwise_layer_type)

    def setup(self):
        atype = self.selfattention_layer_type
        if atype == "selfattn":
            self.self_attn = attn_mod.MultiHeadedAttention(
                self.attention_heads, self.size, self.attention_dropout_rate,
                name="self_attn")
        elif atype == "rel_selfattn":
            self.self_attn = attn_mod.RelPositionMultiHeadedAttention(
                self.attention_heads, self.size, self.attention_dropout_rate,
                name="self_attn")
        elif atype == "legacy_rel_selfattn":
            self.self_attn = attn_mod.LegacyRelPositionMultiHeadedAttention(
                self.attention_heads, self.size, self.attention_dropout_rate,
                name="self_attn")
        else:
            raise ValueError(atype)

        self.feed_forward = self._make_ff("feed_forward")
        self.norm_ff = layer_norm("norm_ff")
        self.norm_mha = layer_norm("norm_mha")
        if self.macaron_style:
            self.feed_forward_macaron = self._make_ff("feed_forward_macaron")
            self.norm_ff_macaron = layer_norm("norm_ff_macaron")
        if self.use_cnn_module:
            self.conv_module = ConvolutionModule(
                self.size, self.cnn_module_kernel, name="conv_module")
            self.norm_conv = layer_norm("norm_conv")
            self.norm_final = layer_norm("norm_final")
        self.dropout = nn.Dropout(self.dropout_rate)

    def __call__(self, x, pos_emb, attn_mask, mask_, train: bool = False,
                 row_weight=None, cache=None):
        """x [B,T,C]; pos_emb [1,P,C] or None; attn_mask bool [B,T,T];
        mask_ float [B,T,1]; row_weight [B] float or None (BatchNorm
        row exclusion, see ConvolutionModule).

        cache [B,T-1,C]: streaming decode step (`encoder_layer.py:114-120`)
        — attention queries only the LAST frame (keys/values over the
        full x), the post-attention modules run on that one frame, and
        the cached previous output is concatenated back, returning
        [B,T,C]. Streaming callers pass an all-valid single-step mask
        (mask_ [B,1,1], attn_mask covering the one query row), matching
        the reference's contract."""
        det = not train
        ff_scale = 0.5 if self.macaron_style else 1.0

        x = x * mask_
        if self.macaron_style:
            residual = x
            x = self.norm_ff_macaron(x)
            x = residual + ff_scale * self.dropout(
                self.feed_forward_macaron(x, mask_, deterministic=det),
                deterministic=det)

        residual = x
        xn = self.norm_mha(x)
        if cache is not None:
            if cache.shape != (x.shape[0], x.shape[1] - 1, self.size):
                raise ValueError(
                    f"cache shape {cache.shape} != "
                    f"{(x.shape[0], x.shape[1] - 1, self.size)}")
            x_q = xn[:, -1:, :]
            residual = residual[:, -1:, :]
        else:
            x_q = xn
        if pos_emb is not None:
            x_att = self.self_attn(x_q, xn, xn, pos_emb, attn_mask,
                                   deterministic=det)
        else:
            x_att = self.self_attn(x_q, xn, xn, attn_mask, deterministic=det)
        x_att = x_att * mask_
        x = residual + self.dropout(x_att, deterministic=det)

        if self.use_cnn_module:
            residual = x
            xn = self.norm_conv(x)
            x = residual + self.dropout(
                self.conv_module(xn, mask_, train=train,
                                 row_weight=row_weight),
                deterministic=det) * mask_

        residual = x
        xn = self.norm_ff(x)
        x = residual + ff_scale * self.dropout(
            self.feed_forward(xn, mask_, deterministic=det), deterministic=det) * mask_

        if self.use_cnn_module:
            x = self.norm_final(x) * mask_
        if cache is not None:
            x = jnp.concatenate([cache, x], axis=1)
        return x


class Encoder(nn.Module):
    """Conformer encoder (`conformer/encoder.py:60-282`), input_layer in
    {None, 'linear'} (the only modes the reference models exercise)."""

    idim: int
    attention_dim: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: Optional[str] = None
    normalize_before: bool = True
    positionwise_layer_type: str = "linear"
    positionwise_conv_kernel_size: int = 1
    macaron_style: bool = False
    pos_enc_layer_type: str = "abs_pos"
    selfattention_layer_type: str = "selfattn"
    activation_type: str = "swish"
    use_cnn_module: bool = False
    cnn_module_kernel: int = 31
    # return each block's output (after_norm applied to every one),
    # `encoder.py:266-274` — the reference's layer-probing option
    mid_out: bool = False

    def setup(self):
        ptype = self.pos_enc_layer_type
        if ptype == "abs_pos":
            self.pos_enc = emb_mod.PositionalEncoding(
                self.attention_dim, self.positional_dropout_rate, name="pos_enc")
        elif ptype == "scaled_abs_pos":
            self.pos_enc = emb_mod.ScaledPositionalEncoding(
                self.attention_dim, self.positional_dropout_rate, name="pos_enc")
        elif ptype == "rel_pos":
            assert self.selfattention_layer_type == "rel_selfattn"
            self.pos_enc = emb_mod.RelPositionalEncoding(
                self.attention_dim, self.positional_dropout_rate, name="pos_enc")
        elif ptype == "legacy_rel_pos":
            assert self.selfattention_layer_type == "legacy_rel_selfattn"
            self.pos_enc = emb_mod.LegacyRelPositionalEncoding(
                self.attention_dim, self.positional_dropout_rate, name="pos_enc")
        else:
            raise ValueError(ptype)

        if self.input_layer == "linear":
            self.embed_linear = nn.Dense(self.attention_dim, name="embed_linear")
        elif self.input_layer is not None:
            raise ValueError(f"input_layer {self.input_layer} not supported")

        self.encoders = [
            EncoderLayer(
                size=self.attention_dim,
                attention_heads=self.attention_heads,
                attention_dropout_rate=self.attention_dropout_rate,
                dropout_rate=self.dropout_rate,
                linear_units=self.linear_units,
                positionwise_layer_type=self.positionwise_layer_type,
                positionwise_conv_kernel_size=self.positionwise_conv_kernel_size,
                macaron_style=self.macaron_style,
                use_cnn_module=self.use_cnn_module,
                cnn_module_kernel=self.cnn_module_kernel,
                selfattention_layer_type=self.selfattention_layer_type,
                normalize_before=self.normalize_before,
                name=f"encoders_{i}",
            )
            for i in range(self.num_blocks)
        ]
        if self.normalize_before:
            self.after_norm = layer_norm("after_norm")

    def __call__(self, x, attn_mask, mask_, train: bool = False,
                 row_weight=None):
        """x [B,T,idim]; attn_mask bool [B,T,T]; mask_ float [B,T,1]."""
        det = not train
        if self.input_layer == "linear":
            x = self.embed_linear(x)
        rel = self.pos_enc_layer_type in ("rel_pos", "legacy_rel_pos")
        if rel:
            x, pos_emb = self.pos_enc(x, deterministic=det)
        else:
            x = self.pos_enc(x, deterministic=det)
            pos_emb = None
        if self.mid_out:
            outs = []
            for layer in self.encoders:
                x = layer(x, pos_emb, attn_mask, mask_, train=train,
                          row_weight=row_weight)
                outs.append(x)
            if self.normalize_before:
                outs = [self.after_norm(o) for o in outs]
            return outs
        for layer in self.encoders:
            x = layer(x, pos_emb, attn_mask, mask_, train=train,
                      row_weight=row_weight)
        if self.normalize_before:
            x = self.after_norm(x)
        return x


class ConformerEncoder(nn.Module):
    """The reference wrapper (`modules/esp/__init__.py:11-65`): builds the
    square length mask, runs the encoder, re-masks the output.

    [B, T, C] in and out (the reference transposes around it;
    `models/prompttts_mdn_v2_final/model.py:92-95`)."""

    idim: int = 8
    attention_dim: int = 8
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    normalize_before: bool = True
    positionwise_layer_type: str = "linear"
    positionwise_conv_kernel_size: int = 1
    macaron_style: bool = False
    pos_enc_layer_type: str = "abs_pos"
    selfattention_layer_type: str = "selfattn"
    activation_type: str = "swish"
    use_cnn_module: bool = False
    cnn_module_kernel: int = 31
    return_mask: bool = False
    rel_pos_type: Optional[str] = None

    def setup(self):
        pos_type, attn_type = self.pos_enc_layer_type, self.selfattention_layer_type
        if self.rel_pos_type is None or self.rel_pos_type == "legacy":
            if pos_type == "rel_pos":
                pos_type = "legacy_rel_pos"
            if attn_type == "rel_selfattn":
                attn_type = "legacy_rel_selfattn"
        elif self.rel_pos_type != "new":
            raise ValueError(f"Unknown rel_pos_type: {self.rel_pos_type}")

        self.encoder = Encoder(
            idim=self.idim,
            attention_dim=self.attention_dim,
            attention_heads=self.attention_heads,
            linear_units=self.linear_units,
            num_blocks=self.num_blocks,
            dropout_rate=self.dropout_rate,
            positional_dropout_rate=self.positional_dropout_rate,
            attention_dropout_rate=self.attention_dropout_rate,
            input_layer=None if self.idim == self.attention_dim else "linear",
            normalize_before=self.normalize_before,
            positionwise_layer_type=self.positionwise_layer_type,
            positionwise_conv_kernel_size=self.positionwise_conv_kernel_size,
            macaron_style=self.macaron_style,
            pos_enc_layer_type=pos_type,
            selfattention_layer_type=attn_type,
            activation_type=self.activation_type,
            use_cnn_module=self.use_cnn_module,
            cnn_module_kernel=self.cnn_module_kernel,
            name="encoder",
        )

    @property
    def out_dim(self):
        return self.attention_dim

    def __call__(self, emb, input_lens, train: bool = False,
                 row_weight=None):
        """emb [B, T, idim]; input_lens [B] -> [B, T, attention_dim]."""
        T = emb.shape[1]
        non_pad = sequence_mask(input_lens, T)  # [B, T] bool
        attn_mask = non_pad[:, None, :] & non_pad[:, :, None]  # [B, T, T]
        mask_ = non_pad[:, :, None].astype(emb.dtype)  # [B, T, 1]
        outs = self.encoder(emb, attn_mask, mask_, train=train,
                            row_weight=row_weight)
        outs = outs * mask_
        if self.return_mask:
            return outs, mask_
        return outs
