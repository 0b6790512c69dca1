"""Parity for the three esp streaming sub-features (VERDICT r3 #7) —
the last reference inventory lines:

- ``StreamPositionalEncoding`` (`/root/reference/promptttspp/modules/esp/
  transformer/embedding.py:333-385`): absolute sinusoidal PE with a
  stream offset.
- ``Encoder(mid_out=True)`` (`esp/conformer/encoder.py:266-274`):
  per-block outputs, each after_norm'ed.
- ``EncoderLayer`` streaming ``cache`` (`esp/conformer/encoder_layer.py:
  114-120`): attention queries only the last frame, post-attention
  modules run on that frame, cached output concatenated back — under
  both absolute and rel-pos attention.

Goldens from scripts/gen_goldens.py gen_esp_streaming (live reference).
"""

from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from tests.test_parity import convert_variables


def _split_sd(sd, prefix):
    return {k[len(prefix):]: v for k, v in sd.items()
            if k.startswith(prefix)}


def _load_all():
    return dict(np.load(Path(__file__).parent / "goldens"
                        / "esp_streaming.npz"))


def test_stream_positional_encoding():
    from promptttspp_tpu.nn.embedding import StreamPositionalEncoding

    data = _load_all()
    pe = StreamPositionalEncoding(d_model=32, dropout_rate=0.0)
    x = jnp.asarray(data["pe_x"])
    out0 = pe.apply({}, x)
    out4 = pe.apply({}, x, start_idx=4)
    np.testing.assert_allclose(np.asarray(out0), data["pe_out0"],
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out4), data["pe_out4"],
                               atol=1e-5, rtol=1e-5)


def test_encoder_mid_out():
    from promptttspp_tpu.nn.conformer import Encoder

    data = _load_all()
    enc = Encoder(
        idim=32, attention_dim=32, attention_heads=2, linear_units=64,
        num_blocks=3, dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0, input_layer=None,
        positionwise_layer_type="conv1d", positionwise_conv_kernel_size=3,
        macaron_style=True, pos_enc_layer_type="rel_pos",
        selfattention_layer_type="rel_selfattn", use_cnn_module=True,
        cnn_module_kernel=7, mid_out=True)
    x = jnp.asarray(data["enc_x"])
    lens = data["enc_lens"]
    T = x.shape[1]
    non_pad = jnp.asarray(np.arange(T)[None, :] < lens[:, None])
    attn_mask = non_pad[:, None, :] & non_pad[:, :, None]
    mask_ = non_pad[:, :, None].astype(jnp.float32)

    variables = convert_variables(
        enc, _split_sd(data, "enc."), (x, attn_mask, mask_))
    outs = enc.apply(variables, x, attn_mask, mask_)
    assert len(outs) == 3
    # the reference returns unmasked per-block outputs; compare valid
    # positions (padded tail positions of the shorter row are not
    # mask-multiplied on the way out in either implementation)
    valid = np.asarray(non_pad)
    for i, o in enumerate(outs):
        got = np.asarray(o)[valid]
        want = data[f"mid_{i}"][valid]
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3,
                                   err_msg=f"block {i}")


def _cache_layer(attn_type):
    from promptttspp_tpu.nn.conformer import EncoderLayer

    return EncoderLayer(
        size=32, attention_heads=2, attention_dropout_rate=0.0,
        dropout_rate=0.0, linear_units=64,
        positionwise_layer_type="conv1d", positionwise_conv_kernel_size=3,
        macaron_style=True, use_cnn_module=True, cnn_module_kernel=7,
        selfattention_layer_type=attn_type)


def test_encoder_layer_cache_selfattn():
    data = _load_all()
    layer = _cache_layer("selfattn")
    x = jnp.asarray(data["cache_x"])
    cache = jnp.asarray(data["cache"])
    T = x.shape[1]
    attn_mask = jnp.ones((1, 1, T), bool)
    mask_ = jnp.ones((1, 1, 1), jnp.float32)
    variables = convert_variables(
        layer, _split_sd(data, "abs."), (x, None, attn_mask, mask_))
    out = layer.apply(variables, x, None, attn_mask, mask_, cache=cache)
    assert out.shape == x.shape
    # frames 0..T-2 are the cache verbatim; the last frame is computed
    np.testing.assert_array_equal(np.asarray(out[:, :-1]),
                                  np.asarray(cache))
    np.testing.assert_allclose(np.asarray(out), data["cache_out_abs"],
                               atol=2e-5, rtol=1e-4)


def test_encoder_layer_cache_rel_pos():
    data = _load_all()
    layer = _cache_layer("rel_selfattn")
    x = jnp.asarray(data["cache_x"])
    cache = jnp.asarray(data["cache"])
    pos_emb = jnp.asarray(data["cache_pos_emb"])
    T = x.shape[1]
    attn_mask = jnp.ones((1, 1, T), bool)
    mask_ = jnp.ones((1, 1, 1), jnp.float32)
    variables = convert_variables(
        layer, _split_sd(data, "rel."), (x, pos_emb, attn_mask, mask_))
    out = layer.apply(variables, x, pos_emb, attn_mask, mask_, cache=cache)
    np.testing.assert_allclose(np.asarray(out), data["cache_out_rel"],
                               atol=2e-5, rtol=1e-4)


def test_stream_pe_offset_consistency():
    """Chunked streaming contract: encoding chunk [4:4+T] with
    start_idx=4 equals slicing the full-sequence encoding."""
    from promptttspp_tpu.nn.embedding import StreamPositionalEncoding

    pe = StreamPositionalEncoding(d_model=16, dropout_rate=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 16))
    full = pe.apply({}, x)
    part = pe.apply({}, x[:, 4:], start_idx=4)
    np.testing.assert_allclose(np.asarray(full[:, 4:]), np.asarray(part),
                               atol=1e-6)
