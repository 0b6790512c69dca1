"""Chunked/streaming vocoder synthesis vs full-utterance synthesis."""

import numpy as np

import jax
import jax.numpy as jnp

from promptttspp_tpu.vocoders.bigvgan import BigVGAN
from promptttspp_tpu.vocoders.streaming import vocode_chunked, vocode_streaming


def small_vocoder():
    # modest receptive field, fast on CPU
    voc = BigVGAN(in_channel=12, upsample_initial_channel=16,
                  upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                  resblock_kernel_sizes=(3,), resblock_dilations=((1, 2),))
    mel = jnp.zeros((1, 16, 12))
    variables = voc.init(jax.random.PRNGKey(0), mel)
    return voc, variables


def test_chunked_matches_full():
    voc, variables = small_vocoder()
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(2, 100, 12).astype(np.float32))
    full = voc.apply(variables, mel)
    chunked = vocode_chunked(voc, variables, mel, chunk_frames=32,
                             halo_frames=12, upsample=8)
    assert chunked.shape == full.shape
    # interior parity: identical up to halo truncation effects at the
    # extreme edges of the utterance
    err = np.abs(np.asarray(chunked) - np.asarray(full))
    assert err[:, 12 * 8: -12 * 8].max() < 1e-4, err.max()


def test_streaming_concatenates_to_chunked():
    voc, variables = small_vocoder()
    rng = np.random.RandomState(1)
    mel = jnp.asarray(rng.randn(1, 70, 12).astype(np.float32))
    chunked = vocode_chunked(voc, variables, mel, chunk_frames=32,
                             halo_frames=12, upsample=8)
    parts = list(vocode_streaming(voc, variables, mel, chunk_frames=32,
                                  halo_frames=12, upsample=8))
    stream = np.concatenate([np.asarray(p) for p in parts], axis=1)
    assert stream.shape == chunked.shape
    np.testing.assert_allclose(stream, np.asarray(chunked), atol=1e-5)


def test_sharded_matches_chunked():
    from promptttspp_tpu.parallel.mesh import make_mesh
    from promptttspp_tpu.vocoders.streaming import vocode_sharded

    voc, variables = small_vocoder()
    rng = np.random.RandomState(2)
    mel = jnp.asarray(rng.randn(1, 100, 12).astype(np.float32))
    chunked = vocode_chunked(voc, variables, mel, chunk_frames=16,
                             halo_frames=12, upsample=8)
    mesh = make_mesh()
    with mesh:
        sharded = vocode_sharded(mesh, voc, variables, mel, chunk_frames=16,
                                 halo_frames=12, upsample=8)
    assert sharded.shape == chunked.shape
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(chunked),
                               atol=1e-5)


def f0_vocoder():
    from promptttspp_tpu.vocoders.bigvgan_f0 import F0AwareBigVGAN

    voc = F0AwareBigVGAN(
        sampling_rate=24000, harmonic_num=2, in_channel=12,
        upsample_initial_channel=16, upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 2),))
    mel = jnp.zeros((1, 16, 12))
    f0 = jnp.zeros((1, 16, 1))
    variables = voc.init(jax.random.PRNGKey(3), mel, f0, deterministic=True)
    return voc, variables


def test_f0_aware_chunked_phase_continuity():
    """NSF source phase must be continuous across chunk boundaries:
    with per-chunk global phase offsets (streaming._chunk_phase0), chunked
    synthesis of a VOICED utterance matches full synthesis — the hard
    case the plain (phase-reset) chunking gets wrong."""
    voc, variables = f0_vocoder()
    rng = np.random.RandomState(4)
    T = 96
    mel = jnp.asarray(rng.randn(1, T, 12).astype(np.float32))
    # fully voiced, varying f0 (vibrato around 150 Hz)
    f0 = jnp.asarray(
        (150 + 20 * np.sin(np.linspace(0, 6, T)))[None, :, None]
        .astype(np.float32))
    full = voc.apply(variables, mel, f0, deterministic=True)
    chunked = vocode_chunked(voc, variables, mel, f0, chunk_frames=16,
                             halo_frames=12, upsample=8,
                             deterministic=True)
    assert chunked.shape == full.shape
    err = np.abs(np.asarray(chunked) - np.asarray(full))
    assert err[:, 12 * 8: -12 * 8].max() < 2e-3, err.max()

    # counterfactual: WITHOUT phase continuity the chunks diverge, which
    # proves the test would catch a phase reset
    import promptttspp_tpu.vocoders.streaming as streaming

    orig = streaming._chunk_phase0
    streaming._chunk_phase0 = lambda *a, **k: jnp.zeros(
        (1, len(a[1]))) if True else orig(*a, **k)
    try:
        broken = vocode_chunked(voc, variables, mel, f0, chunk_frames=16,
                                halo_frames=12, upsample=8,
                                deterministic=True)
    finally:
        streaming._chunk_phase0 = orig
    err_b = np.abs(np.asarray(broken) - np.asarray(full))
    assert err_b[:, 12 * 8: -12 * 8].max() > 10 * err[:, 12 * 8: -12 * 8].max()


def test_f0_aware_sharded_matches_full():
    from promptttspp_tpu.parallel.mesh import make_mesh
    from promptttspp_tpu.vocoders.streaming import vocode_sharded

    voc, variables = f0_vocoder()
    rng = np.random.RandomState(5)
    T = 80
    mel = jnp.asarray(rng.randn(1, T, 12).astype(np.float32))
    f0 = jnp.asarray(
        (120 + 30 * np.sin(np.linspace(0, 4, T)))[None, :, None]
        .astype(np.float32))
    full = voc.apply(variables, mel, f0, deterministic=True)
    mesh = make_mesh()
    with mesh:
        sharded = vocode_sharded(mesh, voc, variables, mel, f0,
                                 chunk_frames=16, halo_frames=12,
                                 upsample=8, deterministic=True)
    assert sharded.shape == full.shape
    err = np.abs(np.asarray(sharded) - np.asarray(full))
    assert err[:, 12 * 8: -12 * 8].max() < 2e-3, err.max()


def test_streaming_first_chunk_ramp_matches_full():
    """TTFA ramp: a smaller FIRST chunk must not change the stitched
    stream (interior parity with full synthesis, exact parity with the
    un-ramped stream everywhere both are halo-converged)."""
    voc, variables = small_vocoder()
    rng = np.random.RandomState(6)
    mel = jnp.asarray(rng.randn(1, 70, 12).astype(np.float32))
    full = voc.apply(variables, mel)
    parts = list(vocode_streaming(voc, variables, mel, chunk_frames=32,
                                  halo_frames=12, upsample=8,
                                  first_chunk_frames=8))
    assert parts[0].shape[1] == 8 * 8  # first audio after 8 frames
    stream = np.concatenate([np.asarray(p) for p in parts], axis=1)
    assert stream.shape == full.shape
    err = np.abs(stream - np.asarray(full))
    assert err[:, 12 * 8: -12 * 8].max() < 1e-4, err.max()


def test_f0_aware_streaming_ramp_phase_continuous():
    """The ramp's irregular chunk grid must keep the NSF source phase
    continuous (starts are no longer multiples of chunk_frames)."""
    voc, variables = f0_vocoder()
    rng = np.random.RandomState(7)
    T = 96
    mel = jnp.asarray(rng.randn(1, T, 12).astype(np.float32))
    f0 = jnp.asarray(
        (150 + 20 * np.sin(np.linspace(0, 6, T)))[None, :, None]
        .astype(np.float32))
    full = voc.apply(variables, mel, f0, deterministic=True)
    parts = list(vocode_streaming(voc, variables, mel, f0,
                                  chunk_frames=32, halo_frames=12,
                                  upsample=8, first_chunk_frames=8,
                                  deterministic=True))
    stream = np.concatenate([np.asarray(p) for p in parts], axis=1)
    assert stream.shape == full.shape
    err = np.abs(stream - np.asarray(full))
    assert err[:, 12 * 8: -12 * 8].max() < 2e-3, err.max()
