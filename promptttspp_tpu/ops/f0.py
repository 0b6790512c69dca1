"""Batched F0 extraction on TPU.

TPU-native replacement for the reference's pyworld (C++ WORLD) DIO +
StoneMask path (`/root/reference/promptttspp/preprocess/pitch.py:20-35`):
a YIN-style estimator — cumulative-mean-normalized difference function
computed via FFT autocorrelation per frame, per-item f0 floor/ceil masking
(the reference uses per-speaker bounds from
`metadata/libritts_r_f0_stats.yaml`), absolute-threshold trough picking and
parabolic refinement. Documented delta: this is YIN, not DIO — agreement
with pyworld is typically within a few cents on voiced frames but the
voicing decision differs near boundaries; training targets remain
self-consistent because the whole pipeline uses this extractor.

Everything is static-shaped: frames are gathered with precomputed indices,
the lag search is masked rather than sliced, so one compilation serves all
utterances of a bucket.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from promptttspp_tpu.ops.interp import interp1d
from promptttspp_tpu.ops.masks import to_log_scale


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


@functools.partial(
    jax.jit,
    static_argnames=("sample_rate", "hop_length", "max_lag", "win_length"),
)
def _yin_frames(wav, sample_rate: int, hop_length: int, max_lag: int, win_length: int):
    """Returns CMND [B, n_frames, max_lag] and frame RMS [B, n_frames]."""
    B, Ts = wav.shape
    seg = win_length + max_lag
    n_frames = 1 + Ts // hop_length
    pad = seg  # center-ish padding so every frame has a full segment
    wavp = jnp.pad(wav, ((0, 0), (win_length // 2, pad)))
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(seg)[None, :]
    frames = wavp[:, idx]  # [B, n_frames, seg]

    # autocorrelation via FFT
    nfft = _next_pow2(2 * seg)
    spec = jnp.fft.rfft(frames, n=nfft, axis=-1)
    acf = jnp.fft.irfft(spec * jnp.conj(spec), n=nfft, axis=-1)[..., :max_lag]

    # energy terms: e[tau] = sum_{j=tau}^{tau+W-1} x[j]^2
    sq = frames**2
    csum = jnp.cumsum(sq, axis=-1)
    zero = jnp.zeros_like(csum[..., :1])
    csum = jnp.concatenate([zero, csum], axis=-1)  # [B, n_frames, seg+1]
    tau_idx = np.arange(max_lag)
    e_tau = csum[..., tau_idx + win_length] - csum[..., tau_idx]  # [B,nf,max_lag]
    e0 = e_tau[..., :1]

    # difference function d[tau] = e0 + e_tau - 2*acf_w[tau], windowed corr:
    # acf over full seg approximates sum_{j<W} x[j] x[j+tau]; use truncated
    # correlation computed exactly via FFT of (frame, frame[:W]):
    specw = jnp.fft.rfft(frames[..., :win_length], n=nfft, axis=-1)
    corr = jnp.fft.irfft(jnp.conj(specw) * spec, n=nfft, axis=-1)[..., :max_lag]
    d = e0 + e_tau - 2.0 * corr
    d = jnp.maximum(d, 0.0)

    # cumulative mean normalization
    cmnd_denom = jnp.cumsum(d[..., 1:], axis=-1) / jnp.arange(
        1, max_lag, dtype=wav.dtype
    )
    cmnd = jnp.concatenate(
        [jnp.ones_like(d[..., :1]), d[..., 1:] / jnp.maximum(cmnd_denom, 1e-12)],
        axis=-1,
    )
    rms = jnp.sqrt(e0[..., 0] / win_length)
    del acf
    return cmnd, rms


def extract_f0(
    wav,
    sample_rate: int = 24000,
    hop_length: int = 240,
    f0_floor=60.0,
    f0_ceil=600.0,
    trough_threshold: float = 0.25,
    voicing_threshold: float = 0.35,
    rms_floor: float = 0.01,
    lag_search_floor: float = 40.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """wav [B, Ts] (float, ±1 range) -> (f0 [B, T], vuv [B, T]).

    ``f0_floor`` / ``f0_ceil`` may be scalars or [B] arrays (per-speaker
    bounds). T = 1 + Ts // hop_length.
    """
    wav = jnp.asarray(wav)
    squeeze = wav.ndim == 1
    if squeeze:
        wav = wav[None]
    f0_floor = jnp.broadcast_to(jnp.asarray(f0_floor, wav.dtype), (wav.shape[0],))
    f0_ceil = jnp.broadcast_to(jnp.asarray(f0_ceil, wav.dtype), (wav.shape[0],))

    max_lag = int(round(sample_rate / lag_search_floor))
    win_length = max_lag
    cmnd, rms = _yin_frames(wav, sample_rate, hop_length, max_lag, win_length)

    lags = jnp.arange(max_lag, dtype=wav.dtype)
    lag_min = (sample_rate / f0_ceil)[:, None, None]  # [B,1,1]
    lag_max = (sample_rate / f0_floor)[:, None, None]
    in_range = (lags[None, None, :] >= lag_min) & (lags[None, None, :] <= lag_max)
    masked = jnp.where(in_range, cmnd, jnp.inf)

    # YIN rule: the first local minimum (trough) below threshold, else the
    # global minimum. Crossing points are NOT troughs — picking the first
    # sub-threshold sample would bias F0 sharp.
    left = jnp.pad(masked[..., :-1], ((0, 0), (0, 0), (1, 0)), constant_values=jnp.inf)
    right = jnp.pad(masked[..., 1:], ((0, 0), (0, 0), (0, 1)), constant_values=jnp.inf)
    is_trough = (masked <= left) & (masked <= right) & jnp.isfinite(masked)
    below = is_trough & (masked < trough_threshold)
    big = jnp.array(max_lag, jnp.int32)
    first_below = jnp.min(
        jnp.where(below, jnp.arange(max_lag, dtype=jnp.int32), big), axis=-1
    )
    global_min = jnp.argmin(masked, axis=-1).astype(jnp.int32)
    tau = jnp.where(first_below < big, first_below, global_min)

    # octave-high (half-period) guard: when a dominant 2nd harmonic
    # (e.g. near a formant) dips the CMND below threshold at tau0/2, the
    # first-below rule picks the half period. Discriminator (measured on
    # formant-filtered pulse trains): for a TRUE period pick every lag
    # multiple troughs equally deep, but for a half-period pick the
    # depths ALTERNATE — odd multiples (tau, 3*tau = 0.5 and 1.5 true
    # periods) stay moderate while even multiples (2*tau = the true
    # period) are decisively deeper. Jump to 2*tau only on that
    # alternating signature; plain depth comparison would also fire on
    # correct picks where jitter makes the subharmonic marginally deeper.
    def _minw(t, w=4):
        tc = jnp.clip(t, 1 + w, max_lag - 1 - w)
        vals = jnp.stack([
            jnp.take_along_axis(cmnd, (tc + o)[..., None], axis=-1)[..., 0]
            for o in range(-w, w + 1)], axis=-1)
        off = jnp.argmin(vals, axis=-1).astype(jnp.int32) - w
        return tc + off, jnp.min(vals, axis=-1)

    cm_tau = jnp.take_along_axis(cmnd, tau[..., None], axis=-1)[..., 0]
    tau2, cm_tau2 = _minw(2 * tau)
    _, cm_tau3 = _minw(3 * tau)
    in_lag = (2 * tau).astype(wav.dtype)[..., None] <= lag_max
    in_lag3 = 3 * tau <= max_lag - 5
    jump = (in_lag[..., 0] & in_lag3
            & (cm_tau > 0.08)
            & (cm_tau2 < 0.5 * jnp.minimum(cm_tau, cm_tau3)))
    tau = jnp.where(jump, tau2, tau)

    # parabolic interpolation around tau
    tau_c = jnp.clip(tau, 1, max_lag - 2)
    gather = lambda off: jnp.take_along_axis(
        cmnd, (tau_c + off)[..., None], axis=-1
    )[..., 0]
    d0, d1, d2 = gather(-1), gather(0), gather(1)
    denom = d0 + d2 - 2.0 * d1
    shift = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (d0 - d2) / denom, 0.0)
    shift = jnp.clip(shift, -0.5, 0.5)
    refined = tau_c.astype(wav.dtype) + shift

    f0 = sample_rate / jnp.maximum(refined, 1.0)
    cm_best = jnp.take_along_axis(cmnd, tau[..., None], axis=-1)[..., 0]
    voiced = (
        (cm_best < voicing_threshold)
        & (rms > rms_floor)
        & (f0 >= f0_floor[:, None] * 0.9)
        & (f0 <= f0_ceil[:, None] * 1.1)
    )
    f0 = jnp.where(voiced, f0, 0.0)
    if squeeze:
        return f0[0], voiced[0].astype(jnp.float32)
    return f0, voiced.astype(jnp.float32)


def extract_pitch(wav, sample_rate: int, hop_length: int, f0_floor, f0_ceil):
    """Reference-shaped API (`preprocess/pitch.py:20-35`):
    returns (f0, cf0, vuv) where cf0 = log of gap-interpolated f0."""
    f0, vuv = extract_f0(
        wav, sample_rate=sample_rate, hop_length=hop_length,
        f0_floor=f0_floor, f0_ceil=f0_ceil,
    )
    cf0 = to_log_scale(interp1d(f0))
    return f0, cf0, vuv
