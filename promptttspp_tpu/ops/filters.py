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
    b, a = _scipy_signal.butter(order, cutoff_hz / nyquist, "lowpass")
    return np.asarray(b, np.float32), np.asarray(a, np.float32)


def lfilter(x, b, a, associative: bool = True):
    """Direct-form II transposed IIR filter along the last axis.

    x: [..., T]; b, a: [K] with a[0] == 1 (normalized internally).

    associative=True runs the recurrence as a parallel prefix
    (``lax.associative_scan`` over (A, c) state-space pairs, O(log T)
    depth) instead of a sequential ``lax.scan`` — the TPU-native shape
    for a latency-bound IIR over a few hundred F0 frames. The delay-line
    state obeys z_{t+1} = A z_t + g x_t with the (K-1)x(K-1) companion
    matrix A, so prefix composition (M2@M1, M2@c1 + c2) yields every
    state in log2(T) sweeps of tiny matmuls.
    """
    b = jnp.asarray(b, x.dtype)
    a = jnp.asarray(a, x.dtype)
    b = b / a[0]
    a = a / a[0]
    K = b.shape[0]
    batch_shape = x.shape[:-1]
    xf = x.reshape((-1, x.shape[-1]))  # [B, T]
    T = xf.shape[-1]

    if associative and K > 1:
        k = K - 1
        # companion matrix of the DF2T delay-line update
        A = jnp.zeros((k, k), x.dtype)
        A = A.at[:, 0].set(-a[1:])
        A = A.at[jnp.arange(k - 1), jnp.arange(1, k)].set(1.0)
        g = b[1:] - a[1:] * b[0]  # [k]

        v = xf.T[:, :, None] * g[None, None, :]      # [T, B, k]
        M = jnp.broadcast_to(A, (T, k, k))

        def combine(left, right):
            Ml, vl = left
            Mr, vr = right
            return (jnp.einsum("tij,tjk->tik", Mr, Ml),
                    jnp.einsum("tij,tbj->tbi", Mr, vl) + vr)

        _, z_after = jax.lax.associative_scan(combine, (M, v))
        # y_t needs the state BEFORE absorbing x_t
        z_before = jnp.concatenate(
            [jnp.zeros_like(z_after[:1]), z_after[:-1]], axis=0)
        y = b[0] * xf.T + z_before[..., 0]           # [T, B]
        return y.T.reshape(batch_shape + (x.shape[-1],))

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
