"""Parity of the local conformer variant (g-conditioning) and VITS-style
windowed-relative-attention transformer vs the PyTorch reference."""

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


def test_local_conformer_parity():
    from promptttspp_tpu.nn.conformer_local import Conformer

    sd, io = load("local_conformer", {"x", "mask", "g", "out", "out_nog"})
    conf = Conformer(num_layers=2, channels=32, num_head=2, kernel_size=7,
                     dropout=0.0)
    x = jnp.asarray(io["x"])
    mask = jnp.asarray(io["mask"])[:, :, None]
    g = jnp.asarray(io["g"]).transpose(0, 2, 1)  # [B, 1, C]

    variables = conf.init(jax.random.PRNGKey(0), x, mask, g=g)
    converted = {"params": convert_tree(variables["params"], sd)}
    if "batch_stats" in variables:
        converted["batch_stats"] = convert_tree(
            variables["batch_stats"], sd, "batch_stats")

    out = conf.apply(converted, x, mask, g=g)
    np.testing.assert_allclose(np.asarray(out), io["out"], atol=2e-5,
                               rtol=1e-4)
    out_nog = conf.apply(converted, x, mask)
    np.testing.assert_allclose(np.asarray(out_nog), io["out_nog"],
                               atol=2e-5, rtol=1e-4)


def _rename_for_transformer(n_layers):
    r = {}
    for i in range(n_layers):
        r[f"layers.{i}.attention_attention_layer"] = \
            f"layers.{i}.attention.attention_layer"
        r[f"layers.{i}.attention_norm"] = f"layers.{i}.attention.norm"
        r[f"layers.{i}.ffn_ffn"] = f"layers.{i}.ffn.ffn"
        r[f"layers.{i}.ffn_norm"] = f"layers.{i}.ffn.norm"
    return r


def test_vits_transformer_parity():
    from promptttspp_tpu.nn.transformer import Transformer

    sd, io = load("vits_transformer", {"x", "mask", "out", "out_abs"})
    x = jnp.asarray(io["x"]).transpose(0, 2, 1)  # [B, T, C]
    mask = jnp.asarray(io["mask"])[:, :, None]

    rel_sd = {k[len("rel."):]: v for k, v in sd.items()
              if k.startswith("rel.")}
    abs_sd = {k[len("abs."):]: v for k, v in sd.items()
              if k.startswith("abs.")}

    rel = Transformer(channels=32, num_head=2, num_layers=2, kernel_size=3,
                      dropout=0.0, scale=4, window_size=4, use_rel=True)
    variables = rel.init(jax.random.PRNGKey(0), x, mask)
    params = convert_tree(variables["params"], rel_sd,
                          rename=_rename_for_transformer(2))
    out = rel.apply({"params": params}, x, mask)
    np.testing.assert_allclose(
        np.asarray(out), io["out"].transpose(0, 2, 1), atol=2e-5, rtol=1e-4)

    absn = Transformer(channels=32, num_head=2, num_layers=2, kernel_size=3,
                       dropout=0.0, scale=4, use_rel=False)
    variables = absn.init(jax.random.PRNGKey(0), x, mask)
    params = convert_tree(variables["params"], abs_sd,
                          rename=_rename_for_transformer(2))
    out_abs = absn.apply({"params": params}, x, mask)
    np.testing.assert_allclose(
        np.asarray(out_abs), io["out_abs"].transpose(0, 2, 1), atol=2e-5,
        rtol=1e-4)
