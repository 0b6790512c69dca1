"""F0-aware BigVGAN (the shipped demo vocoder, `conf/vocoder/bigvgan_f0.yaml`).

Behavioral equivalent of
`/root/reference/promptttspp/vocoders/bigvgan_f0.py:25-123`: F0 upsampled
x240 (nearest) -> harmonic-plus-noise NSF source -> per-stage strided
``noise_convs`` inject the excitation after every transposed-conv
upsample; otherwise identical to BigVGAN.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from promptttspp_tpu.nn.layers import conv1d
from promptttspp_tpu.vocoders.activations import AntiAliasActivation
from promptttspp_tpu.vocoders.bigvgan import ConvTranspose1d, MRFStage
from promptttspp_tpu.vocoders.nsf import SourceModuleHnNSF


class F0AwareBigVGAN(nn.Module):
    sampling_rate: int = 24000
    harmonic_num: int = 8
    in_channel: int = 80
    upsample_initial_channel: int = 512
    upsample_rates: Sequence[int] = (6, 5, 4, 2)
    upsample_kernel_sizes: Sequence[int] = (12, 10, 8, 4)
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilations: Sequence[Sequence[int]] = ((1, 3, 5),) * 3
    conv_precision: str = "default"  # see bigvgan.AMPLayer

    def setup(self):
        self.m_source = SourceModuleHnNSF(
            sampling_rate=self.sampling_rate, harmonic_num=self.harmonic_num,
            name="m_source")
        self.conv_pre = conv1d(self.upsample_initial_channel, 7,
                               name="conv_pre")
        ups, noise_convs, mrfs = [], [], []
        n = len(self.upsample_rates)
        for i, (u, k) in enumerate(
            zip(self.upsample_rates, self.upsample_kernel_sizes)
        ):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            ups.append(ConvTranspose1d(
                features=ch, kernel_size=k, stride=u,
                padding=u // 2 + u % 2, output_padding=u % 2,
                name=f"upsamples_{i}"))
            if i + 1 < n:
                stride_f0 = int(np.prod(self.upsample_rates[i + 1:]))
                noise_convs.append(nn.Conv(
                    features=ch, kernel_size=(stride_f0 * 2,),
                    strides=(stride_f0,),
                    padding=[(stride_f0 // 2, stride_f0 // 2)],
                    name=f"noise_convs_{i}"))
            else:
                noise_convs.append(nn.Conv(
                    features=ch, kernel_size=(1,), padding="VALID",
                    name=f"noise_convs_{i}"))
            mrfs.append(MRFStage(
                ch, self.resblock_kernel_sizes, self.resblock_dilations,
                conv_precision=self.conv_precision, name=f"mrfs_{i}"))
        self.upsamples = ups
        self.noise_convs = noise_convs
        self.mrfs = mrfs
        last_ch = self.upsample_initial_channel // (2 ** n)
        self.act_post = AntiAliasActivation(last_ch, name="act_post")
        self.conv_post = conv1d(1, 7, name="conv_post")

    def __call__(self, mel, f0, rng=None, deterministic: bool = False,
                 phase0=None):
        """mel [B, T, in_channel]; f0 [B, T, 1] (Hz, 0 = unvoiced)
        -> wav [B, 240*T, 1]. phase0 [B, 1]: initial source phase in
        revolutions (chunk-continuous synthesis, vocoders/streaming.py)."""
        total_up = int(np.prod(self.upsample_rates))
        f0_up = jnp.repeat(f0, total_up, axis=1)  # nearest upsample x240
        har_source, _, _ = self.m_source(f0_up, rng, deterministic, phase0)

        x = self.conv_pre(mel)
        for up, noise_conv, mrf in zip(self.upsamples, self.noise_convs,
                                       self.mrfs):
            x = up(x)
            x = x + noise_conv(har_source)
            x = mrf(x)
        x = self.act_post(x)
        x = self.conv_post(x)
        return jnp.tanh(x)
