"""Vocoder parity vs the PyTorch reference (weight-norm folding included)
plus unit checks of the kaiser-sinc resamplers and NSF source."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from promptttspp_tpu.compat.torch_ckpt import convert_tree

GOLDENS = Path(__file__).parent / "goldens"


def load(name, io_keys):
    data = dict(np.load(GOLDENS / f"{name}.npz"))
    sd = {k: v for k, v in data.items() if k not in io_keys}
    io = {k: v for k, v in data.items() if k in io_keys}
    return sd, io


def test_bigvgan_parity():
    from promptttspp_tpu.vocoders.bigvgan import BigVGAN

    sd, io = load("bigvgan", {"mel", "wav"})
    bv = BigVGAN(in_channel=20, upsample_initial_channel=32,
                 upsample_rates=(6, 5, 4, 2),
                 upsample_kernel_sizes=(12, 10, 8, 4),
                 resblock_kernel_sizes=(3, 7),
                 resblock_dilations=((1, 3), (1, 3)))
    mel = jnp.asarray(io["mel"]).transpose(0, 2, 1)  # [B, T, C]
    variables = bv.init(jax.random.PRNGKey(0), mel)
    params = convert_tree(variables["params"], sd)
    wav = bv.apply({"params": params}, mel)
    ref = io["wav"].transpose(0, 2, 1)  # [B, Tw, 1]
    assert wav.shape == ref.shape == (1, 13 * 240, 1)
    np.testing.assert_allclose(np.asarray(wav), ref, atol=2e-5, rtol=1e-4)


def test_bigvgan_f0_parity():
    from promptttspp_tpu.vocoders.bigvgan_f0 import F0AwareBigVGAN

    sd, io = load("bigvgan_f0", {"mel", "f0", "wav"})
    fbv = F0AwareBigVGAN(sampling_rate=24000, harmonic_num=3, in_channel=20,
                         upsample_initial_channel=32,
                         upsample_rates=(6, 5, 4, 2),
                         upsample_kernel_sizes=(12, 10, 8, 4),
                         resblock_kernel_sizes=(3, 7),
                         resblock_dilations=((1, 3), (1, 3)))
    mel = jnp.asarray(io["mel"]).transpose(0, 2, 1)
    f0 = jnp.asarray(io["f0"]).transpose(0, 2, 1)  # [B, T, 1]
    variables = fbv.init(jax.random.PRNGKey(0), mel, f0, deterministic=True)
    params = convert_tree(variables["params"], sd)
    wav = fbv.apply({"params": params}, mel, f0, deterministic=True)
    ref = io["wav"].transpose(0, 2, 1)
    assert wav.shape == ref.shape
    np.testing.assert_allclose(np.asarray(wav), ref, atol=5e-5, rtol=1e-3)


def test_resamplers_roundtrip():
    """up2 then down2 should approximately reconstruct a bandlimited signal."""
    from promptttspp_tpu.vocoders.activations import downsample2, upsample2

    t = np.arange(256) / 256.0
    x = np.sin(2 * np.pi * 8 * t).astype(np.float32)[None, :, None]
    y = downsample2(upsample2(jnp.asarray(x)))
    assert y.shape == x.shape
    # interior parity (edges are affected by replicate padding)
    np.testing.assert_allclose(
        np.asarray(y)[0, 32:-32, 0], x[0, 32:-32, 0], atol=5e-3)


def test_sine_gen_frequency():
    """Deterministic NSF sine source should oscillate at f0."""
    from promptttspp_tpu.vocoders.nsf import SineGen

    sg = SineGen(samp_rate=24000, harmonic_num=0)
    T = 24000
    f0 = jnp.full((1, T, 1), 300.0)
    sines, uv, _ = sg.apply({}, f0, deterministic=True)
    s = np.asarray(sines)[0, :, 0]
    assert np.asarray(uv).min() == 1.0
    # count zero crossings: 2 per period -> 600 over 1 s of 300 Hz
    crossings = np.sum(np.abs(np.diff(np.signbit(s))))
    assert abs(crossings - 600) <= 2
    np.testing.assert_allclose(np.max(np.abs(s)), 0.1, atol=1e-3)
