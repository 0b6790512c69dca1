"""Parity tests for the auxiliary/experimental nets: ConvNeXt1d, MRFNet,
Unet1d, Glow (+ invertibility), CNF and ScoreSDE functional checks."""

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


def test_convnext_parity():
    from promptttspp_tpu.nn.convnext import ConvNeXt1d

    sd, io = load("convnext", {"x", "mask", "out"})
    net = ConvNeXt1d(channels=16, h_channels=32, num_layers=2)
    x = jnp.asarray(io["x"]).transpose(0, 2, 1)
    mask = jnp.asarray(io["mask"])[:, :, None]
    variables = net.init(jax.random.PRNGKey(0), x, mask)
    params = convert_tree(variables["params"], sd)
    out = net.apply({"params": params}, x, mask)
    np.testing.assert_allclose(np.asarray(out),
                               io["out"].transpose(0, 2, 1),
                               atol=2e-5, rtol=1e-4)


def test_mrf_parity():
    from promptttspp_tpu.nn.mrf import MRFNet

    sd, io = load("mrf", {"x", "mask", "g", "out"})
    net = MRFNet(in_channels=16, channels=16, out_channels=16,
                 kernel_sizes=(3, 7), dilations=(1, 3))
    x = jnp.asarray(io["x"]).transpose(0, 2, 1)
    mask = jnp.asarray(io["mask"])[:, :, None]
    g = jnp.asarray(io["g"]).transpose(0, 2, 1)
    variables = net.init(jax.random.PRNGKey(0), x, mask, g=g)
    params = convert_tree(variables["params"], sd)
    out = net.apply({"params": params}, x, mask, g=g)
    np.testing.assert_allclose(np.asarray(out),
                               io["out"].transpose(0, 2, 1),
                               atol=2e-5, rtol=1e-4)


def test_unet_parity():
    from promptttspp_tpu.models.unet import Unet1d

    sd, io = load("unet", {"x", "cond", "t", "mask", "out"})
    net = Unet1d(in_channels=10, encoder_channels=14, out_channels=10,
                 dim=16, dim_mults=(1, 2, 4))
    x = jnp.asarray(io["x"]).transpose(0, 2, 1)
    cond = jnp.asarray(io["cond"]).transpose(0, 2, 1)
    t = jnp.asarray(io["t"].astype(np.int32))
    mask = jnp.asarray(io["mask"])[:, :, None]
    variables = net.init(jax.random.PRNGKey(0), x, t, cond, mask)
    params = convert_tree(variables["params"], sd,
                          rename={"mid_attn_fn": "mid_attn.fn"})
    out = net.apply({"params": params}, x, t, cond, mask)
    np.testing.assert_allclose(np.asarray(out),
                               io["out"].transpose(0, 2, 1),
                               atol=5e-5, rtol=1e-3)


def test_glow_parity_and_invertibility():
    from promptttspp_tpu.models.glow import Glow

    sd, io = load("glow", {"z", "zf", "ld", "zr"})
    gl = Glow(in_channels=16, channels=24, num_flows=2, n_blocks=2)
    z = jnp.asarray(io["z"]).transpose(0, 2, 1)  # [B, 1, C]
    variables = gl.init(jax.random.PRNGKey(0), z)
    params = convert_tree(variables["params"], sd)
    zf, ld = gl.apply({"params": params}, z)
    np.testing.assert_allclose(np.asarray(zf),
                               io["zf"].transpose(0, 2, 1),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(float(ld), float(io["ld"]), atol=1e-3)
    zr, _ = gl.apply({"params": params}, zf, method=Glow.reverse)
    np.testing.assert_allclose(np.asarray(zr), np.asarray(z), atol=1e-4)


def test_cnf_and_score_sde_functional():
    from promptttspp_tpu.models.cnf import CNF
    from promptttspp_tpu.models.score_sde import ScoreSDE
    import flax.linen as nn

    class TinyNet(nn.Module):
        out: int

        @nn.compact
        def __call__(self, x, t, cond, mask=None):
            h = jnp.concatenate(
                [x, cond, jnp.broadcast_to(t[:, None, None],
                                           x.shape[:2] + (1,))], axis=-1)
            h = nn.Dense(32)(h)
            h = nn.tanh(h)
            return nn.Dense(self.out)(h)

    rng = np.random.RandomState(0)
    B, T = 2, 8
    x1 = jnp.asarray(rng.randn(B, T, 6).astype(np.float32))
    cond = jnp.asarray(rng.randn(B, T, 5).astype(np.float32))
    mask = jnp.ones((B, T, 1))

    cnf = CNF(net=TinyNet(6), out_channels=6)
    variables = cnf.init({"params": jax.random.PRNGKey(0),
                          "diffusion": jax.random.PRNGKey(1)}, x1, cond)
    ut, vt = cnf.apply(variables, x1, cond,
                       rngs={"diffusion": jax.random.PRNGKey(2)})
    assert ut.shape == vt.shape == x1.shape
    sample = cnf.apply(variables, cond, 8, "rk4",
                       rngs={"diffusion": jax.random.PRNGKey(3)},
                       method=CNF.sample)
    assert sample.shape == (B, T, 6)
    assert np.isfinite(np.asarray(sample)).all()

    sde = ScoreSDE(mel_dim=6, denoise_fn=TinyNet(6))
    variables = sde.init({"params": jax.random.PRNGKey(0),
                          "diffusion": jax.random.PRNGKey(1)},
                         x1, jnp.zeros_like(x1), mask,
                         method=ScoreSDE.compute_loss)
    loss = sde.apply(variables, x1, jnp.zeros_like(x1), mask,
                     rngs={"diffusion": jax.random.PRNGKey(2)},
                     method=ScoreSDE.compute_loss)
    assert np.isfinite(float(loss))
    out = sde.apply(variables, x1, jnp.zeros_like(x1), mask, 10)
    assert out.shape == x1.shape
    assert np.isfinite(np.asarray(out)).all()
