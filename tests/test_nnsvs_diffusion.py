"""Parity of the nnsvs-style CFG diffusion (CondLayerNorm denoiser,
classifier-free guidance, PLMS) vs the PyTorch reference, plus PLMS in the
main decoder."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from promptttspp_tpu.compat.torch_ckpt import convert_tree

GOLDEN = Path(__file__).parent / "goldens" / "nnsvs_cfg.npz"
IO = {"cond", "g", "y", "t", "noise", "x_T", "model_out", "mel_anc",
      "mel_plms"}


def build(pndm=None):
    from promptttspp_tpu.models.nnsvs_diffusion import (
        DiffNetG, GaussianDiffusionCFG)

    return GaussianDiffusionCFG(
        in_dim=24, out_dim=12,
        denoise_fn=DiffNetG(in_dim=12, encoder_hidden_dim=24,
                            residual_layers=3, residual_channels=16,
                            dilation_cycle_length=2, gin_channels=8,
                            g_proj_dim=16, g_dropout=0.0, cond_norm=True),
        K_step=20, schedule_type="linear", norm_scale=6.0,
        do_classifier_free_guidance=True, guidance_scale=2.0,
        clip_denoised=True, pndm_speedup=pndm)


def load():
    data = dict(np.load(GOLDEN))
    sd = {k: v for k, v in data.items() if k not in IO}
    io = {k: v for k, v in data.items() if k in IO}
    return sd, io


def test_cfg_training_and_sampling_parity():
    sd, io = load()
    diff = build()
    cond = jnp.asarray(io["cond"]).transpose(0, 2, 1)  # [B, T, H]
    g = jnp.asarray(io["g"])                           # [B, 1, 8]
    y = jnp.asarray(io["y"])                           # [B, T, 12]
    t = jnp.asarray(io["t"].astype(np.int32))
    noise = jnp.asarray(io["noise"][:, 0].transpose(0, 2, 1))

    variables = diff.init(jax.random.PRNGKey(0), cond, y, g=g, t=t,
                          noise=noise)
    variables = {"params": convert_tree(variables["params"], sd)}

    target, model_out = diff.apply(variables, cond, y, g=g, t=t, noise=noise)
    ref_out = io["model_out"][:, 0].transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(model_out), ref_out, atol=2e-5,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(target), np.asarray(noise),
                               atol=1e-6)

    # zero-noise ancestral sampling with CFG guidance
    x_T = jnp.asarray(io["x_T"][:, 0].transpose(0, 2, 1))
    mel = diff.apply(variables, cond, g=g, x_T=x_T, zero_noise=True,
                     method=type(diff).inference)
    np.testing.assert_allclose(np.asarray(mel), io["mel_anc"], atol=5e-4,
                               rtol=1e-3)


def test_cfg_plms_parity():
    sd, io = load()
    diff = build(pndm=5)
    cond = jnp.asarray(io["cond"]).transpose(0, 2, 1)
    g = jnp.asarray(io["g"])
    y = jnp.asarray(io["y"])
    variables = diff.init(jax.random.PRNGKey(0), cond, y, g=g,
                          t=jnp.zeros(2, jnp.int32),
                          noise=jnp.zeros_like(y))
    variables = {"params": convert_tree(variables["params"], sd)}
    x_T = jnp.asarray(io["x_T"][:, 0].transpose(0, 2, 1))
    mel = diff.apply(variables, cond, g=g, x_T=x_T, zero_noise=True,
                     method=type(diff).inference)
    np.testing.assert_allclose(np.asarray(mel), io["mel_plms"], atol=5e-4,
                               rtol=1e-3)


def test_main_decoder_plms_runs():
    """PLMS on the main decoder: deterministic, finite, right shape, and
    close-ish to the 100-step ancestral result on the same seed."""
    from promptttspp_tpu.models.diffusion import DiffNet, GaussianDiffusion

    net = DiffNet(in_dim=12, encoder_hidden_dim=24, residual_layers=2,
                  residual_channels=16, kernel_size=3,
                  dilation_cycle_length=2)
    slow = GaussianDiffusion(in_dim=24, out_dim=12, denoise_fn=net,
                             K_step=100, norm_scale=6.0)
    fast = GaussianDiffusion(in_dim=24, out_dim=12, denoise_fn=net,
                             K_step=100, norm_scale=6.0, pndm_speedup=10)
    rng = np.random.RandomState(0)
    cond = jnp.asarray(rng.randn(1, 9, 24).astype(np.float32))
    y = jnp.asarray(rng.randn(1, 9, 12).astype(np.float32))
    variables = slow.init(jax.random.PRNGKey(0), cond, y,
                          t=jnp.zeros(1, jnp.int32), noise=jnp.zeros_like(y))
    x_T = jnp.asarray(rng.randn(1, 9, 12).astype(np.float32))
    mel_slow = slow.apply(variables, cond, x_T=x_T, zero_noise=True,
                          method=GaussianDiffusion.inference)
    mel_fast = fast.apply(variables, cond, x_T=x_T, zero_noise=True,
                          method=GaussianDiffusion.inference)
    assert mel_fast.shape == mel_slow.shape
    assert np.isfinite(np.asarray(mel_fast)).all()
    # deterministic given x_T (with a random-weight denoiser the PLMS and
    # ancestral trajectories legitimately differ, so no closeness check)
    mel_fast2 = fast.apply(variables, cond, x_T=x_T, zero_noise=True,
                           method=GaussianDiffusion.inference)
    np.testing.assert_array_equal(np.asarray(mel_fast), np.asarray(mel_fast2))
