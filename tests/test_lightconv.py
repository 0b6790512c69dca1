"""Parity of lightweight/dynamic convolution vs the PyTorch reference."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from promptttspp_tpu.compat.torch_ckpt import convert_tree

GOLDEN = Path(__file__).parent / "goldens" / "lightconv.npz"


def load():
    data = dict(np.load(GOLDEN))
    io = {k: data[k] for k in ("x", "mask", "out_lc", "out_dc")}
    lc_sd = {k[3:]: v for k, v in data.items() if k.startswith("lc.")}
    dc_sd = {k[3:]: v for k, v in data.items() if k.startswith("dc.")}
    return io, lc_sd, dc_sd


def test_lightweight_convolution_parity():
    from promptttspp_tpu.nn.lightconv import LightweightConvolution

    io, lc_sd, _ = load()
    x = jnp.asarray(io["x"])
    mask = jnp.asarray(io["mask"])[:, None, :]  # [B, 1, T]
    mod = LightweightConvolution(4, 16, 0.0, "5", 0, use_bias=True)
    variables = mod.init(jax.random.PRNGKey(0), x, mask=mask)
    params = convert_tree(variables["params"], lc_sd)
    out = mod.apply({"params": params}, x, mask=mask)
    np.testing.assert_allclose(np.asarray(out), io["out_lc"], atol=2e-5,
                               rtol=1e-4)


def test_dynamic_convolution_parity():
    from promptttspp_tpu.nn.lightconv import DynamicConvolution

    io, _, dc_sd = load()
    x = jnp.asarray(io["x"])
    mask = jnp.asarray(io["mask"])[:, None, :]
    mod = DynamicConvolution(4, 16, 0.0, "5", 0, use_bias=True)
    variables = mod.init(jax.random.PRNGKey(0), x, mask=mask)
    params = convert_tree(variables["params"], dc_sd)
    out = mod.apply({"params": params}, x, mask=mask)
    np.testing.assert_allclose(np.asarray(out), io["out_dc"], atol=2e-5,
                               rtol=1e-4)
