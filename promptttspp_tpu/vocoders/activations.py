"""Anti-aliased Snake activation and kaiser-sinc resampling.

Behavioral equivalents of
`/root/reference/promptttspp/layers/activations.py:22-138` (BigVGAN-style):
Snake ``x + (1/alpha) sin^2(alpha x)`` with per-channel learned log-alpha,
bracketed by 2x kaiser-windowed-sinc up/downsampling with replicate
padding. Filters are numpy constants; the resamplers are depthwise
(feature-grouped) convolutions — the kaiser-sinc kernel is symmetric, so
the transposed upsampler is expressed as an lhs-dilated convolution with
the same taps.

Channel-last layout [B, T, C]: the C axis stays on vector lanes through
the whole activation, which is what makes the later Pallas fusion of
up2 -> snake -> down2 profitable.
"""

from __future__ import annotations

import functools
import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int):
    """[kernel_size] normalized lowpass taps (`activations.py:42-64`)."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    A = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if A > 50.0:
        beta = 0.1102 * (A - 8.7)
    elif A >= 21.0:
        beta = 0.5842 * (A - 21) ** 0.4 + 0.07886 * (A - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    filt /= filt.sum()
    return filt.astype(np.float32)


def _depthwise_kernel(filt: np.ndarray, channels: int):
    """[K] -> [K, 1, C] HIO kernel for feature_group_count=C."""
    return jnp.asarray(np.tile(filt[:, None, None], (1, 1, channels)))


def upsample2(x, ratio: int = 2, kernel_size: int = 12):
    """Kaiser-sinc 2x upsampling (`UpSample1d`, `activations.py:67-88`).

    x [B, T, C] -> [B, ratio*T, C]. Replicate pad, lhs-dilated depthwise
    conv (== conv_transpose with the symmetric kernel), crop, scale.
    """
    C = x.shape[-1]
    stride = ratio
    pad = kernel_size // ratio - 1
    pad_left = pad * stride + (kernel_size - stride) // 2
    pad_right = pad * stride + (kernel_size - stride + 1) // 2
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    y = jax.lax.conv_general_dilated(
        x, _depthwise_kernel(filt, C),
        window_strides=(1,),
        padding=[(kernel_size - 1, kernel_size - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=C,
    )
    y = ratio * y
    return y[:, pad_left:-pad_right, :]


def lowpass(x, cutoff: float, half_width: float, stride: int = 1,
            kernel_size: int = 12):
    """(`LowPassFilter1d`, `activations.py:91-112`). x [B, T, C]."""
    C = x.shape[-1]
    even = kernel_size % 2 == 0
    pad_left = kernel_size // 2 - int(even)
    pad_right = kernel_size // 2
    filt = kaiser_sinc_filter1d(cutoff, half_width, kernel_size)
    x = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
    return jax.lax.conv_general_dilated(
        x, _depthwise_kernel(filt, C),
        window_strides=(stride,), padding=[(0, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=C,
    )


def downsample2(x, ratio: int = 2, kernel_size: int = 12):
    """(`DownSample1d`, `activations.py:115-131`)."""
    return lowpass(x, 0.5 / ratio, 0.6 / ratio, stride=ratio,
                   kernel_size=kernel_size)


def snake(x, alpha):
    """Snake with log-parameterized per-channel alpha
    (`activations.py:36-44`): alpha = exp(param)."""
    a = jnp.exp(alpha)
    return x + (1.0 / (a + 1e-9)) * jnp.square(jnp.sin(x * a))


class Snake(nn.Module):
    """Learned per-channel snake (`activations.py:36-44`)."""

    channels: int

    def setup(self):
        self.alpha = self.param(
            "alpha", nn.initializers.zeros, (self.channels,))

    def __call__(self, x):
        return snake(x, self.alpha)


class AntiAliasActivation(nn.Module):
    """up2 -> snake -> down2 (`activations.py:22-33`). [B, T, C].

    On TPU the sandwich runs as one fused Pallas kernel
    (ops.pallas.snake) — identical numerics, ~3x less HBM traffic;
    elsewhere (and under ``use_pallas=False``) the three-op XLA path.
    Setup-style so parents (the fused AMPLayer) can read ``.act.alpha``.
    """

    channels: int
    use_pallas: bool = None  # None = auto (TPU only)

    def setup(self):
        self.act = Snake(self.channels)

    def __call__(self, x):
        use_pallas = self.use_pallas
        if use_pallas is None:
            import jax

            use_pallas = jax.default_backend() == "tpu"
        if use_pallas:
            from promptttspp_tpu.ops.pallas.snake import fused_antialias_snake

            return fused_antialias_snake(x, self.act.alpha)
        x = upsample2(x, 2, 12)
        x = self.act(x)
        return downsample2(x, 2, 12)
