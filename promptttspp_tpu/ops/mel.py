"""Slaney-scale mel filterbank and the log-mel transform.

Behavioral contract: identical numbers to the reference's
``MelSpectrogramTransform`` (torchaudio MelSpectrogram with
``mel_scale='slaney', norm='slaney'`` + ``clamp_min(1e-5).log()``,
`/root/reference/promptttspp/transforms/mel.py:18-34`,
`conf/transforms/mel.yaml:1-12`). The filterbank is a static numpy matrix
baked at trace time; the mel projection is one [T, n_freqs] x
[n_freqs, n_mels] matmul on the MXU.

Output layout is TPU-native [..., T, n_mels] (time-major). Use
``.T``-style transposes only at parity-test edges.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from promptttspp_tpu.ops import stft as stft_ops


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    min_log_hz = 1000.0
    lin = 3.0 * f / 200.0
    logstep = np.log(6.4) / 27.0
    return np.where(
        f >= min_log_hz, 15.0 + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, lin
    )


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    min_log_mel = 15.0
    lin = 200.0 * m / 3.0
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, 1000.0 * np.exp(logstep * (m - min_log_mel)), lin)


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    sample_rate: int, n_fft: int, n_mels: int, f_min: float, f_max: float
) -> np.ndarray:
    """[n_freqs, n_mels] slaney-scale, slaney-normalized triangle bank."""
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_pts = np.linspace(
        _hz_to_mel_slaney(f_min), _hz_to_mel_slaney(f_max), n_mels + 2
    )
    f_pts = _mel_to_hz_slaney(m_pts)  # [n_mels + 2]
    f_diff = np.diff(f_pts)  # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels + 2]
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    # slaney norm: area-normalize each triangle
    enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
    fb = fb * enorm[None, :]
    return fb.astype(np.float32)


@dataclass(frozen=True)
class MelSpectrogramTransform:
    """Functional counterpart of the reference transform; jit-safe."""

    sample_rate: int = 24000
    n_fft: int = 512
    win_length: int = 480
    hop_length: int = 240
    power: float = 1.0
    f_min: float = 63.0
    f_max: float = 12000.0
    n_mels: int = 80
    mel_scale: str = "slaney"
    norm: str = "slaney"
    center: bool = True

    def __post_init__(self):
        if self.mel_scale != "slaney" or self.norm != "slaney":
            raise NotImplementedError("only slaney scale/norm (reference config)")

    @property
    def fbank(self) -> np.ndarray:
        return mel_filterbank(
            self.sample_rate, self.n_fft, self.n_mels, self.f_min, self.f_max
        )

    def to_spec(self, wav):
        """wav [..., Ts] -> magnitude/power spec [..., T, n_freqs]."""
        return stft_ops.spectrogram(
            wav, self.n_fft, self.hop_length, self.win_length,
            power=self.power, center=self.center,
        )

    def spec_to_mel(self, spec):
        """[..., T, n_freqs] -> log-mel [..., T, n_mels]."""
        mel = jnp.einsum(
            "...tf,fm->...tm", spec, jnp.asarray(self.fbank),
            preferred_element_type=jnp.float32,
        )
        return jnp.log(jnp.clip(mel, min=1e-5))

    def to_mel(self, wav):
        return self.spec_to_mel(self.to_spec(wav))

    def __call__(self, wav):
        return self.to_mel(wav)
