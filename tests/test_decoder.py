"""Parity of the transformer decoder / subsampling front-ends vs the
PyTorch reference (goldens from scripts/gen_goldens.py), plus the mask /
sos-eos utilities."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from promptttspp_tpu.compat.torch_ckpt import convert_tree

GOLDENS = Path(__file__).parent / "goldens"


def _decoder_case(variant):
    data = dict(np.load(GOLDENS / f"decoder_{variant}.npz"))
    from promptttspp_tpu.nn.decoder import Decoder

    dec = Decoder(
        odim=20, selfattention_layer_type=variant, attention_dim=32,
        attention_heads=4, conv_wshare=4, conv_kernel_length="5_5",
        conv_usebias=True, linear_units=64, num_blocks=2, dropout_rate=0.0,
        positional_dropout_rate=0.0)
    ys = jnp.asarray(np.where(data["ys"] == -1, 0, data["ys"]))
    tgt_mask = jnp.asarray(data["tgt_mask"]) > 0
    memory = jnp.asarray(data["memory"])
    mem_mask = jnp.asarray(data["mem_mask"]) > 0
    variables = dec.init(jax.random.PRNGKey(0), ys, tgt_mask, memory,
                         mem_mask)
    sd = {k: v for k, v in data.items()
          if k not in ("ys", "memory", "mem_mask", "tgt_mask", "out",
                       "onestep")}
    params = convert_tree(variables["params"], sd)
    return dec, params, data, (ys, tgt_mask, memory, mem_mask)


@pytest.mark.parametrize("variant",
                         ["selfattn", "lightconv2d", "dynamicconv2d"])
def test_decoder_parity(variant):
    dec, params, data, args = _decoder_case(variant)
    out, _ = dec.apply({"params": params}, *args)
    # padded target positions produce arbitrary values in both frameworks
    valid = np.asarray(data["tgt_mask"]).any(axis=2)  # [B, L]
    np.testing.assert_allclose(
        np.asarray(out)[valid], data["out"][valid], atol=3e-5, rtol=1e-4)


def test_decoder_one_step_matches_reference():
    from promptttspp_tpu.ops.masks import subsequent_mask

    dec, params, data, (ys, _, memory, _) = _decoder_case("selfattn")
    cache = None
    for t in range(1, 5):
        logp, cache = dec.apply(
            {"params": params}, ys[:1, :t], subsequent_mask(t)[None],
            memory[:1], None, cache=cache,
            method=type(dec).forward_one_step)
        np.testing.assert_allclose(np.asarray(logp),
                                   data["onestep"][t - 1], atol=3e-5,
                                   rtol=1e-4)


@pytest.mark.parametrize("name,cls_name", [
    ("4", "Conv2dSubsampling"), ("6", "Conv2dSubsampling6"),
    ("8", "Conv2dSubsampling8")])
def test_subsampling_parity(name, cls_name):
    import promptttspp_tpu.nn.subsampling as sub_mod

    data = dict(np.load(GOLDENS / f"subsampling_{name}.npz"))
    sub = getattr(sub_mod, cls_name)(odim=32, dropout_rate=0.0)
    x = jnp.asarray(data["x"])
    mask = jnp.asarray(data["mask"]) > 0
    variables = sub.init(jax.random.PRNGKey(0), x, mask)
    sd = {k: v for k, v in data.items()
          if k not in ("x", "mask", "out", "out_mask")}
    params = convert_tree(variables["params"], sd)
    out, m = sub.apply({"params": params}, x, mask)
    np.testing.assert_allclose(np.asarray(out), data["out"], atol=3e-5,
                               rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(m), data["out_mask"] > 0)


@pytest.mark.parametrize("case,kw", [
    ("conv2d", dict(input_layer="conv2d",
                    selfattention_layer_type="selfattn",
                    positionwise_layer_type="linear")),
    ("linear_lightconv", dict(input_layer="linear",
                              selfattention_layer_type="lightconv",
                              conv_kernel_length="5_5",
                              positionwise_layer_type="conv1d",
                              positionwise_conv_kernel_size=3)),
])
def test_transformer_encoder_parity(case, kw):
    from promptttspp_tpu.nn.transformer_encoder import TransformerEncoder

    data = dict(np.load(GOLDENS / f"trans_encoder_{case}.npz"))
    enc = TransformerEncoder(
        idim=40, attention_dim=32, attention_heads=4, linear_units=64,
        num_blocks=2, dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0, conv_wshare=4, conv_usebias=True, **kw)
    x = jnp.asarray(data["x"])
    mask = jnp.asarray(data["mask"]) > 0
    variables = enc.init(jax.random.PRNGKey(0), x, mask)
    sd = {k: v for k, v in data.items()
          if k not in ("x", "mask", "out", "out_mask")}
    params = convert_tree(variables["params"], sd)
    out, m = enc.apply({"params": params}, x, mask)
    valid = np.asarray(data["out_mask"])[:, 0, :] > 0  # [B, T']
    np.testing.assert_allclose(np.asarray(out)[valid], data["out"][valid],
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(m), data["out_mask"] > 0)


def test_add_sos_eos_and_target_mask():
    import torch

    from promptttspp_tpu.ops.masks import add_sos_eos, target_mask

    ys = np.array([[3, 4, 5, -1, -1], [6, 7, 8, 9, 2]], np.int32)
    ys_in, ys_out = add_sos_eos(jnp.asarray(ys), sos=1, eos=2, ignore_id=-1)
    # reference semantics via the list construction. APPEND (not prepend):
    # the reference root also has an app.py/bench.py that would otherwise
    # shadow ours for tests that run later in the session.
    import sys
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    from promptttspp.modules.esp.transformer.add_sos_eos import (
        add_sos_eos as ref_add)

    ref_in, ref_out = ref_add(torch.from_numpy(ys.astype(np.int64)), 1, 2, -1)
    np.testing.assert_array_equal(np.asarray(ys_in), ref_in.numpy())
    np.testing.assert_array_equal(np.asarray(ys_out), ref_out.numpy())

    from promptttspp.modules.esp.transformer.mask import (
        target_mask as ref_target_mask)

    tm = target_mask(jnp.asarray(ys), -1)
    ref_tm = ref_target_mask(torch.from_numpy(ys.astype(np.int64)), -1)
    np.testing.assert_array_equal(np.asarray(tm), ref_tm.numpy())


def test_initialization_families():
    from promptttspp_tpu.nn.initialization import initialize

    params = {"dense": {"kernel": jnp.ones((64, 32)),
                        "bias": jnp.ones((32,))},
              "conv": {"kernel": jnp.ones((3, 16, 32))}}
    for t in ("xavier_uniform", "xavier_normal", "kaiming_uniform",
              "kaiming_normal"):
        out = initialize(params, t, jax.random.PRNGKey(0))
        assert np.allclose(out["dense"]["bias"], 0.0)
        w = np.asarray(out["dense"]["kernel"])
        assert w.std() > 0
        if t == "xavier_uniform":
            assert np.abs(w).max() <= (6.0 / (64 + 32)) ** 0.5 + 1e-6
        if t == "kaiming_normal":
            # std ~ sqrt(2/fan_in); loose 3-sigma-ish band
            assert abs(w.std() - (2.0 / 64) ** 0.5) < 0.05
    same = initialize(params, "pytorch", jax.random.PRNGKey(0))
    assert same is params
