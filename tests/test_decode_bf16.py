"""bf16-STORED decode (serving lever): infer_io_dtype + bf16 denoiser
params must track the f32 chain closely — the math stays f32 (flax
promotes bf16 params against f32 activations; the x carry is f32), only
the HBM storage of weights and hoisted cond projections changes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from promptttspp_tpu.models.diffusion import DiffNet, GaussianDiffusion

B, T, MEL, H = 2, 24, 8, 16


def _build(io_dtype=None, pndm=None):
    dn = DiffNet(in_dim=MEL, encoder_hidden_dim=H, residual_layers=4,
                 residual_channels=16, kernel_size=3,
                 dilation_cycle_length=2)
    return GaussianDiffusion(in_dim=H, out_dim=MEL, denoise_fn=dn,
                             K_step=20, norm_scale=6.0,
                             infer_io_dtype=io_dtype, pndm_speedup=pndm)


def _cast_bf16(params):
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)


@pytest.mark.parametrize("pndm", [None, 5])
def test_bf16_decode_tracks_f32(pndm):
    rng = np.random.RandomState(0)
    cond = jnp.asarray(rng.randn(B, T, H).astype(np.float32))
    m32 = _build(None, pndm)
    mbf = _build("bfloat16", pndm)
    y = jnp.asarray(rng.randn(B, T, MEL).astype(np.float32))
    variables = m32.init(
        {"params": jax.random.PRNGKey(0),
         "diffusion": jax.random.PRNGKey(1)}, cond, y)
    x_T = jnp.asarray(rng.randn(B, T, MEL).astype(np.float32))

    def run(model, params):
        return np.asarray(model.apply(
            {"params": params}, cond, x_T=x_T, zero_noise=True,
            rng=jax.random.PRNGKey(2),
            method=GaussianDiffusion.inference))

    ref = run(m32, variables["params"])
    out = run(mbf, _cast_bf16(variables["params"]))
    assert out.dtype == np.float32  # the carry/output math stays f32
    assert np.all(np.isfinite(out))
    # bf16 storage rounding (2^-8 relative) accumulated over the chain:
    # small against the ±norm_scale signal, far from f32-exactness
    dev = np.max(np.abs(out - ref))
    assert dev < 0.15 * 6.0, dev
    # and it IS the same chain, not a different sample
    assert np.mean(np.abs(out - ref)) < 0.02 * 6.0


def test_f32_default_bit_exact_when_no_knob():
    """infer_io_dtype=None changes nothing (golden parity stays valid)."""
    rng = np.random.RandomState(3)
    cond = jnp.asarray(rng.randn(B, T, H).astype(np.float32))
    y = jnp.asarray(rng.randn(B, T, MEL).astype(np.float32))
    m = _build(None)
    variables = m.init(
        {"params": jax.random.PRNGKey(0),
         "diffusion": jax.random.PRNGKey(1)}, cond, y)
    x_T = jnp.asarray(rng.randn(B, T, MEL).astype(np.float32))
    a = m.apply({"params": variables["params"]}, cond, x_T=x_T,
                zero_noise=True, rng=jax.random.PRNGKey(2),
                method=GaussianDiffusion.inference)
    b = _build(None).apply({"params": variables["params"]}, cond, x_T=x_T,
                           zero_noise=True, rng=jax.random.PRNGKey(2),
                           method=GaussianDiffusion.inference)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
