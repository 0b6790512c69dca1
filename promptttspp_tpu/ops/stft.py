"""Batched STFT on TPU.

Matches the semantics the reference gets from ``torchaudio`` (center=True,
reflect padding, Hann(win_length, periodic) window zero-padded symmetrically
to n_fft; `/root/reference/promptttspp/transforms/mel.py:18-34` with
`conf/transforms/mel.yaml`: sr 24000, n_fft 512, win 480, hop 240, power 1).

Framing is a gather over precomputed indices (static shapes), the FFT is
XLA's native rfft — both map well to TPU; no torch anywhere.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def hann_window(win_length: int, periodic: bool = True) -> np.ndarray:
    n = win_length + 1 if periodic else win_length
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / max(n - 1, 1))
    return w[:win_length].astype(np.float32)


@functools.lru_cache(maxsize=None)
def padded_window(win_length: int, n_fft: int) -> np.ndarray:
    w = hann_window(win_length)
    left = (n_fft - win_length) // 2
    out = np.zeros(n_fft, dtype=np.float32)
    out[left : left + win_length] = w
    return out


def num_frames(num_samples: int, n_fft: int, hop_length: int, center: bool = True) -> int:
    if center:
        return 1 + num_samples // hop_length
    return 1 + (num_samples - n_fft) // hop_length


def frame_signal(wav, n_fft: int, hop_length: int, center: bool = True):
    """[..., Ts] -> [..., n_frames, n_fft] with reflect center padding."""
    if center:
        pad = n_fft // 2
        wav = jnp.pad(
            wav, [(0, 0)] * (wav.ndim - 1) + [(pad, pad)], mode="reflect"
        )
    n = 1 + (wav.shape[-1] - n_fft) // hop_length
    idx = (
        np.arange(n)[:, None] * hop_length + np.arange(n_fft)[None, :]
    )  # [n_frames, n_fft], static
    return wav[..., idx]


def stft(wav, n_fft: int, hop_length: int, win_length: int, center: bool = True):
    """Complex STFT, [..., n_frames, n_fft//2+1]."""
    frames = frame_signal(wav, n_fft, hop_length, center)
    window = jnp.asarray(padded_window(win_length, n_fft))
    return jnp.fft.rfft(frames * window, n=n_fft, axis=-1)


def spectrogram(wav, n_fft: int, hop_length: int, win_length: int,
                power: float = 1.0, center: bool = True):
    """Magnitude (power=1) / power spectrogram, [..., n_frames, n_freqs]."""
    s = jnp.abs(stft(wav, n_fft, hop_length, win_length, center))
    if power == 1.0:
        return s
    return s ** power
