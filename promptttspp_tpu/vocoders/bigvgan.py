"""BigVGAN generator.

Behavioral equivalent of
`/root/reference/promptttspp/vocoders/bigvgan.py:20-139`: mel [B, T, 80] ->
conv k7 -> 4x [ConvTranspose1d upsample (6,5,4,2 = x240) -> mean of 3
AMPBlocks (k 3/7/11, dilations 1/3/5)] -> anti-aliased snake -> conv k7 ->
tanh -> wav [B, 240*T, 1].

Weight-norm is folded at checkpoint-conversion time
(compat.torch_ckpt.fold_weight_norm), equivalent to the reference's
``remove_weight_norm`` before inference. Channel-last throughout; the
ConvTranspose1d keeps its parameter in a torch-derived layout
(``kernel_t`` [K, in, out]) so conversion is a fixed transpose.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from promptttspp_tpu.nn.layers import conv1d
from promptttspp_tpu.vocoders.activations import AntiAliasActivation


class ConvTranspose1d(nn.Module):
    """torch-semantics transposed conv over [B, T, C].

    out_len = (T-1)*stride - 2*padding + kernel_size + output_padding.
    Parameter ``kernel_t`` is [K, in, out] (= torch [in, out, K]
    transposed); taps are flipped at call time, which XLA folds into the
    convolution.
    """

    features: int
    kernel_size: int
    stride: int
    padding: int
    output_padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        from promptttspp_tpu.ops.packed_conv import subpixel_conv_transpose

        in_features = x.shape[-1]
        k = self.param(
            "kernel_t",
            nn.initializers.lecun_normal(batch_axis=(0,)),
            (self.kernel_size, in_features, self.features),
        )
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        out_len = ((x.shape[1] - 1) * self.stride - 2 * self.padding
                   + self.kernel_size + self.output_padding)
        if out_len == self.stride * x.shape[1]:
            # sub-pixel phase decomposition: dense matmuls instead of an
            # lhs-dilated conv chewing through stride-1 zeros (~10x faster
            # on TPU for the stride-5 stage)
            return subpixel_conv_transpose(
                x, k, self.stride, self.padding, self.output_padding, bias)
        w = jnp.flip(k, 0)
        pad_l = self.kernel_size - 1 - self.padding
        pad_r = pad_l + self.output_padding
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=[(pad_l, pad_r)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        if bias is not None:
            y = y + bias
        return y


class PackableConv1d(nn.Module):
    """SAME dilated conv; parameter layout identical to nn.Conv so
    checkpoints are unaffected. Setup-style so parents (the fused
    AMPLayer) can read ``.kernel``/``.bias``."""

    features: int
    in_features: int
    kernel_size: int
    dilation: int = 1

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, self.in_features, self.features))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,))

    def __call__(self, x):
        import jax as _jax

        y = _jax.lax.conv_general_dilated(
            x, self.kernel, (1,), "SAME", rhs_dilation=(self.dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"))
        return y + self.bias


class AMPLayer(nn.Module):
    """AA-snake -> dilated conv -> AA-snake -> conv, residual
    (`bigvgan.py:20-50`).

    On TPU with C <= 128 the entire layer runs as ONE fused Pallas
    kernel (ops.pallas.amp) — one HBM read/write per tile instead of
    eight. ``conv_precision``: "default" runs the kernel's channel-mixing
    matmuls in bf16 with f32 accumulation (jax's own default matmul
    precision on TPU); "highest" keeps them f32-exact."""

    channels: int
    kernel_size: int
    dilation: int
    conv_precision: str = "default"

    def setup(self):
        self.act1 = AntiAliasActivation(self.channels)
        self.conv1 = PackableConv1d(self.channels, self.channels,
                                    self.kernel_size,
                                    dilation=self.dilation)
        self.act2 = AntiAliasActivation(self.channels)
        self.conv2 = PackableConv1d(self.channels, self.channels,
                                    self.kernel_size)

    def __call__(self, x):
        import jax as _jax

        C = self.channels
        if (C in (16, 32, 64, 128) or C % 128 == 0) \
                and _jax.default_backend() == "tpu":
            from promptttspp_tpu.ops.pallas.amp import fused_amp_layer

            return fused_amp_layer(
                x, self.act1.act.alpha, self.conv1.kernel, self.conv1.bias,
                self.act2.act.alpha, self.conv2.kernel, self.conv2.bias,
                self.dilation,
                mxu_bf16=self.conv_precision != "highest")
        y = self.act1(x)
        y = self.conv1(y)
        y = self.act2(y)
        y = self.conv2(y)
        return x + y


class AMPBlock(nn.Module):
    """Stack of AMPLayers over one kernel size (`bigvgan.py:53-68`).

    Each layer runs as its own fused Pallas kernel (AMPLayer). Fusing the
    WHOLE block into one kernel (ops.pallas.amp.fused_amp_block) was
    measured and is a net LOSS here: chaining 3 layers in one tile
    triples the halo rows recomputed per layer (k=11 d=(1,3,5) needs a
    96-sample halo vs ~18 per layer), which outweighs the two saved
    DMA/writeback floors (~0.09 ms each) — full vocoder 27.4 -> 29.8 ms.
    The block kernel stays available (and parity-tested) for
    small-kernel chains where the trade can flip."""

    channels: int
    kernel_size: int
    dilations: Sequence[int]
    conv_precision: str = "default"

    def setup(self):
        self.layers = [
            AMPLayer(self.channels, self.kernel_size, d,
                     conv_precision=self.conv_precision)
            for d in self.dilations]

    def __call__(self, x):
        for layer in self.layers:
            x = layer(x)
        return x


class MRFStage(nn.Module):
    """One upsample stage's multi-receptive-field block set."""

    channels: int
    resblock_kernel_sizes: Sequence[int]
    resblock_dilations: Sequence[Sequence[int]]
    conv_precision: str = "default"

    @nn.compact
    def __call__(self, x):
        acc = 0.0
        for j, (k, d) in enumerate(
            zip(self.resblock_kernel_sizes, self.resblock_dilations)
        ):
            # named by bare index: the torch side is an anonymous nested
            # ModuleList ("mrfs.<i>.<j>.layers...")
            acc = acc + AMPBlock(self.channels, k, tuple(d),
                                 conv_precision=self.conv_precision,
                                 name=str(j))(x)
        return acc / len(self.resblock_kernel_sizes)


class BigVGAN(nn.Module):
    in_channel: int = 80
    upsample_initial_channel: int = 512
    upsample_rates: Sequence[int] = (6, 5, 4, 2)
    upsample_kernel_sizes: Sequence[int] = (12, 10, 8, 4)
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilations: Sequence[Sequence[int]] = ((1, 3, 5),) * 3
    conv_precision: str = "default"

    def setup(self):
        self.conv_pre = conv1d(self.upsample_initial_channel, 7,
                               name="conv_pre")
        ups, mrfs = [], []
        for i, (u, k) in enumerate(
            zip(self.upsample_rates, self.upsample_kernel_sizes)
        ):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            ups.append(ConvTranspose1d(
                features=ch, kernel_size=k, stride=u,
                padding=u // 2 + u % 2, output_padding=u % 2,
                name=f"upsamples_{i}"))
            mrfs.append(MRFStage(
                ch, self.resblock_kernel_sizes, self.resblock_dilations,
                conv_precision=self.conv_precision, name=f"mrfs_{i}"))
        self.upsamples = ups
        self.mrfs = mrfs
        last_ch = self.upsample_initial_channel // (2 ** len(self.upsample_rates))
        self.act_post = AntiAliasActivation(last_ch, name="act_post")
        self.conv_post = conv1d(1, 7, name="conv_post")

    def __call__(self, mel):
        """mel [B, T, in_channel] -> wav [B, T * prod(rates), 1]."""
        x = self.conv_pre(mel)
        for up, mrf in zip(self.upsamples, self.mrfs):
            x = up(x)
            x = mrf(x)
        x = self.act_post(x)
        x = self.conv_post(x)
        return jnp.tanh(x)
