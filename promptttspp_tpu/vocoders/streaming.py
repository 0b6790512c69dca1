"""Chunked / streaming vocoder synthesis (BASELINE.md config #3).

The frame axis is the one genuinely long axis in this system
(SURVEY.md §5.7: T x 240 samples). For long utterances or continuous
synthesis, the vocoder runs over fixed-size overlapping mel chunks:

- ``vocode_chunked``: fold chunks into the batch axis and synthesize them
  in ONE device call (throughput mode — keeps a single compiled shape and
  saturates the chip regardless of utterance length);
- ``vocode_streaming``: generator yielding waveform chunks sequentially
  (latency/constant-memory mode).

Each chunk carries ``halo`` context frames on both sides which are
synthesized and discarded; with halo >= the vocoder's effective receptive
field (~12 frames for the shipped config), the stitched waveform matches
full-utterance synthesis to float tolerance in the interior and shows no
boundary artifacts (tests/test_streaming.py quantifies this).
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _pad_to(x, length, axis=1):
    pad = length - x.shape[axis]
    if pad <= 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg, mode="edge")


def _chunk_phase0(f0_p, starts, halo_frames, upsample, sample_rate):
    """Fundamental NSF-source phase (in revolutions) accumulated before
    each chunk's input start, measured from the UNPADDED stream's t=0.

    The sine source integrates f0 over samples (nsf.py _f02sine); nearest
    x`upsample` frame upsampling means the phase at the start of padded
    frame p is (upsample/sr) * sum(f0_p[:, :p]); subtracting the left-halo
    pad's contribution re-references to the real t=0, so chunk ci's
    OUTPUT region carries exactly the full-synthesis phase. -> [B, n]."""
    cum = jnp.cumsum(f0_p[..., 0], axis=1)
    excl = jnp.pad(cum, ((0, 0), (1, 0)))[:, :-1]  # exclusive cumsum
    ph = excl[:, starts] - excl[:, halo_frames:halo_frames + 1]
    return (ph * (upsample / sample_rate)) % 1.0


def _vocoder_sr(vocoder, sample_rate):
    return sample_rate or getattr(vocoder, "sampling_rate", None)


def _chunk_grid(T, step, first=None):
    """Output spans [(start, width), ...] covering [0, padded T).

    ``first`` < ``step`` shrinks only the FIRST chunk — the
    time-to-first-audio ramp: the first audible chunk costs
    ~first/step of a full chunk's vocoder compute (plus one extra
    compiled shape), while steady-state throughput keeps the full
    chunk size. Returns (spans, padded_total)."""
    if first is None or first >= step or first >= T:
        n = -(-T // step)
        return [(i * step, step) for i in range(n)], n * step
    n_rest = -(-(T - first) // step)
    spans = [(0, first)] + [(first + i * step, step)
                            for i in range(n_rest)]
    return spans, first + n_rest * step


# jitted vocoder apply per (vocoder, static kwargs), shared by the
# chunked/streaming/sharded paths: a fresh jax.jit (or eager apply)
# every call would recompile (or op-by-op dispatch) on each synthesis.
# Keyed by id() — the caller owns the vocoder for its lifetime; shape
# changes retrace within the one cached jit as usual.
_APPLY_JIT = {}


def _cached_apply(vocoder, apply_kwargs):
    key = (id(vocoder), tuple(sorted(apply_kwargs.items())))
    if key not in _APPLY_JIT:
        kw = dict(apply_kwargs)
        _APPLY_JIT[key] = jax.jit(
            lambda v, a, dkw: vocoder.apply(v, *a, **dkw, **kw))
    return _APPLY_JIT[key]


def vocode_chunked(vocoder, variables, mel, f0=None, chunk_frames: int = 256,
                   halo_frames: int = 16, upsample: int = 240,
                   sample_rate: Optional[int] = None,
                   **apply_kwargs):
    """mel [B, T, n_mels] (+ f0 [B, T, 1]) -> wav [B, T*upsample, 1].

    All chunks are synthesized in one batched call. For F0-aware (NSF)
    vocoders, each chunk receives the global source phase accumulated
    before its input start, so the harmonic excitation is continuous
    across chunk boundaries and matches full-utterance synthesis.
    """
    B, T, M = mel.shape
    step = chunk_frames
    n_chunks = -(-T // step)
    Tp = n_chunks * step
    mel_p = _pad_to(mel, Tp + halo_frames)  # right edge context
    mel_p = jnp.pad(mel_p, ((0, 0), (halo_frames, 0), (0, 0)), mode="edge")
    if f0 is not None:
        f0_p = _pad_to(f0, Tp + halo_frames)
        f0_p = jnp.pad(f0_p, ((0, 0), (halo_frames, 0), (0, 0)), mode="edge")

    win = step + 2 * halo_frames
    idx = (np.arange(n_chunks)[:, None] * step
           + np.arange(win)[None, :])  # [n_chunks, win]
    mel_c = mel_p[:, idx, :].reshape(B * n_chunks, win, M)
    args = (mel_c,)
    kwargs = {}
    if f0 is not None:
        f0_c = f0_p[:, idx, :].reshape(B * n_chunks, win, 1)
        args = (mel_c, f0_c)
        sr = _vocoder_sr(vocoder, sample_rate)
        if sr:
            starts = np.arange(n_chunks) * step
            phase0 = _chunk_phase0(f0_p, starts, halo_frames, upsample, sr)
            kwargs["phase0"] = phase0.reshape(B * n_chunks, 1)

    wav_c = _cached_apply(vocoder, apply_kwargs)(variables, args, kwargs)
    h = halo_frames * upsample
    wav_c = wav_c[:, h:h + step * upsample, :]
    wav = wav_c.reshape(B, n_chunks * step * upsample, 1)
    return wav[:, : T * upsample, :]


def vocode_streaming(vocoder, variables, mel, f0=None,
                     chunk_frames: int = 256, halo_frames: int = 16,
                     upsample: int = 240, sample_rate: Optional[int] = None,
                     first_chunk_frames: Optional[int] = None,
                     **apply_kwargs) -> Iterator[jnp.ndarray]:
    """Sequential generator of wav chunks [B, chunk*upsample, 1] (the last
    chunk may be shorter). One compiled shape regardless of utterance
    length; constant device memory; NSF source phase continuous across
    chunks (see vocode_chunked).

    first_chunk_frames: optional smaller FIRST chunk (the
    time-to-first-audio ramp; see _chunk_grid) — one extra compiled
    shape, same stitched waveform."""
    B, T, M = mel.shape
    step = chunk_frames
    spans, Tp = _chunk_grid(T, step, first_chunk_frames)
    mel_p = _pad_to(mel, Tp + halo_frames)
    mel_p = jnp.pad(mel_p, ((0, 0), (halo_frames, 0), (0, 0)), mode="edge")
    phase0 = None
    if f0 is not None:
        f0_p = _pad_to(f0, Tp + halo_frames)
        f0_p = jnp.pad(f0_p, ((0, 0), (halo_frames, 0), (0, 0)), mode="edge")
        sr = _vocoder_sr(vocoder, sample_rate)
        if sr:
            starts = np.array([s for s, _ in spans])
            phase0 = _chunk_phase0(f0_p, starts, halo_frames, upsample, sr)

    run = _cached_apply(vocoder, apply_kwargs)
    h = halo_frames * upsample

    for ci, (s, w) in enumerate(spans):
        win = w + 2 * halo_frames
        margs = (jax.lax.dynamic_slice_in_dim(mel_p, s, win, axis=1),)
        kwargs = {}
        if f0 is not None:
            margs = margs + (
                jax.lax.dynamic_slice_in_dim(f0_p, s, win, axis=1),)
            if phase0 is not None:
                kwargs["phase0"] = phase0[:, ci:ci + 1]
        wav = run(variables, margs, kwargs)[:, h:h + w * upsample, :]
        remaining = T * upsample - s * upsample
        if remaining < w * upsample:
            wav = wav[:, :remaining, :]
        yield wav


def vocode_sharded(mesh, vocoder, variables, mel, f0=None,
                   chunk_frames: int = 256, halo_frames: int = 16,
                   upsample: int = 240, sample_rate: Optional[int] = None,
                   **apply_kwargs):
    """Mesh-parallel chunked synthesis: the chunk batch is sharded over the
    mesh's ``data`` axis, so an utterance's frame axis spreads across
    chips (the v5e-8 answer to the RTF target — the vocoder is
    embarrassingly parallel given halo context). Pads the chunk count to a
    multiple of the data-axis size.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    B, T, M = mel.shape
    step = chunk_frames
    n_data = mesh.shape["data"]
    n_chunks = -(-T // step)
    n_chunks = -(-n_chunks // n_data) * n_data  # device multiple
    Tp = n_chunks * step
    mel_p = _pad_to(mel, Tp + halo_frames)
    mel_p = jnp.pad(mel_p, ((0, 0), (halo_frames, 0), (0, 0)), mode="edge")
    if f0 is not None:
        f0_p = _pad_to(f0, Tp + halo_frames)
        f0_p = jnp.pad(f0_p, ((0, 0), (halo_frames, 0), (0, 0)), mode="edge")

    win = step + 2 * halo_frames
    idx = (np.arange(n_chunks)[:, None] * step + np.arange(win)[None, :])
    shard = NamedSharding(mesh, P("data"))
    mel_c = jax.device_put(
        mel_p[:, idx, :].reshape(B * n_chunks, win, M), shard)
    args = (mel_c,)
    kwargs = {}
    if f0 is not None:
        f0_c = jax.device_put(
            f0_p[:, idx, :].reshape(B * n_chunks, win, 1), shard)
        args = (mel_c, f0_c)
        sr = _vocoder_sr(vocoder, sample_rate)
        if sr:
            starts = np.arange(n_chunks) * step
            phase0 = _chunk_phase0(f0_p, starts, halo_frames, upsample, sr)
            kwargs["phase0"] = jax.device_put(
                np.asarray(phase0).reshape(B * n_chunks, 1), shard)

    wav_c = _cached_apply(vocoder, apply_kwargs)(variables, args, kwargs)
    h = halo_frames * upsample
    wav_c = wav_c[:, h:h + step * upsample, :]
    wav = wav_c.reshape(B, n_chunks * step * upsample, 1)
    return wav[:, : T * upsample, :]
