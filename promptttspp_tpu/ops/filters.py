"""IIR filtering on TPU: lfilter as a lax.scan, zero-phase filtfilt, and the
Butterworth F0 smoother.

Behavioral contract: ``lowpass_filter`` matches the reference
(`/root/reference/promptttspp/utils/model.py:164-196`): Butterworth N=5,
cutoff 20 Hz at fs 100 (frame rate), zero-phase. For device tensors the
reference uses torchaudio ``filtfilt`` which is plain forward-backward
filtering with NO edge padding; ``filtfilt(..., pad=False)`` reproduces
that. ``pad=True`` adds scipy-style odd-reflection padding.

Coefficients are designed on host with scipy at trace time (static); the
recurrence runs as a ``lax.scan`` over time with a [B]-wide carry, so the
batch dimension stays vectorized on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as _scipy_signal


@functools.lru_cache(maxsize=None)
def butter_lowpass(order: int, cutoff_hz: float, fs: float):
    nyquist = fs // 2
    b, a = _scipy_signal.butter(order, [cutoff_hz / nyquist], "lowpass")
    return np.asarray(b, np.float32), np.asarray(a, np.float32)


def lfilter(x, b, a):
    """Direct-form II transposed IIR filter along the last axis.

    x: [..., T]; b, a: [K] with a[0] == 1 (normalized internally).
    """
    b = jnp.asarray(b, x.dtype)
    a = jnp.asarray(a, x.dtype)
    b = b / a[0]
    a = a / a[0]
    K = b.shape[0]
    batch_shape = x.shape[:-1]
    xf = x.reshape((-1, x.shape[-1]))  # [B, T]

    def step(z, x_t):
        # z: [B, K-1] delay line; x_t: [B]
        y_t = b[0] * x_t + z[:, 0]
        z_new = jnp.concatenate(
            [z[:, 1:], jnp.zeros_like(z[:, :1])], axis=1
        ) + (b[1:][None, :] * x_t[:, None] - a[1:][None, :] * y_t[:, None])
        return z_new, y_t

    z0 = jnp.zeros((xf.shape[0], K - 1), x.dtype)
    _, y = jax.lax.scan(step, z0, xf.T)
    return y.T.reshape(batch_shape + (x.shape[-1],))


def filtfilt(x, b, a, pad: bool = False):
    """Zero-phase filtering: forward pass, then backward pass.

    pad=False reproduces torchaudio's filtfilt (the reference's on-device
    path); pad=True uses scipy's default odd-extension padding.
    """
    if pad:
        padlen = 3 * max(len(np.atleast_1d(a)), len(np.atleast_1d(b)))
        left = 2 * x[..., :1] - x[..., 1 : padlen + 1][..., ::-1]
        right = 2 * x[..., -1:] - x[..., -padlen - 1 : -1][..., ::-1]
        ext = jnp.concatenate([left, x, right], axis=-1)
    else:
        padlen = 0
        ext = x
    y = lfilter(ext, b, a)
    y = lfilter(y[..., ::-1], b, a)[..., ::-1]
    if padlen:
        y = y[..., padlen:-padlen]
    return y


def lowpass_filter(x, fs: int = 100, cutoff: int = 20, N: int = 5, pad: bool = False):
    """Zero-phase Butterworth lowpass of an F0 contour, [..., T]."""
    b, a = butter_lowpass(N, cutoff, fs)
    if x.shape[-1] <= max(len(a), len(b)) * (N // 2 + 1):
        return x  # too short, reference returns input unchanged
    return filtfilt(x, b, a, pad=pad)
