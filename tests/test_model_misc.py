"""Coverage for secondary model APIs: SepPromptEncoder,
generate_style_emb, infer_frame_lengths, app.py text frontend."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_sep_prompt_encoder():
    from promptttspp_tpu.models.bert import BertConfig
    from promptttspp_tpu.models.prompt_encoder import SepPromptEncoder

    cfg = BertConfig(vocab_size=50, hidden_size=16, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=32,
                     max_position_embeddings=16)
    enc = SepPromptEncoder(in_channels=16, mid_channels=16, out_channels=8,
                           bert_config=cfg)
    ids = jnp.ones((2, 6), jnp.int32)
    mask = jnp.ones((2, 6), jnp.int32)
    variables = enc.init(jax.random.PRNGKey(0), ids, mask, ids, mask)
    out = enc.apply(variables, ids, mask, ids, mask)
    assert out.shape == (2, 1, 8)
    total, x1, x2 = enc.apply(variables, ids, mask, ids, mask,
                              method=SepPromptEncoder.infer)
    np.testing.assert_allclose(np.asarray(total), np.asarray(x1 + x2),
                               atol=1e-6)
    # two separate BERTs
    assert "style_enc" in variables["params"]
    assert "spk_enc" in variables["params"]


@pytest.fixture(scope="module")
def tiny():
    import tests.test_train as tt

    model = tt.tiny_model()
    ds = tt.SyntheticDataset(4)
    from promptttspp_tpu.data.collate import PromptTTSCollator

    batch = PromptTTSCollator(tokenizer=tt.TokenHashTokenizer())(
        [ds[i] for i in range(4)])
    from promptttspp_tpu.train.trainer import model_batch

    mb = model_batch(batch)
    rngs = {k: jax.random.PRNGKey(i) for i, k in
            enumerate(("params", "dropout", "diffusion", "style"))}
    variables = model.init(rngs, mb, train=True)
    return model, variables, mb


def test_generate_style_emb(tiny):
    model, variables, mb = tiny
    prompt_emb, ref_emb = model.apply(
        variables, mb["prompt_ids"], mb["prompt_mask"], mb["mel"],
        mb["frame_lengths"], use_max=True, noise_scale=0.0,
        method=type(model).generate_style_emb)
    assert prompt_emb.shape == ref_emb.shape == (4, 1, 32)
    # norm_style_emb=True -> unit norms
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(ref_emb), axis=-1), 1.0, atol=1e-5)


def test_infer_frame_lengths_matches_infer(tiny):
    model, variables, mb = tiny
    flens_pre = model.apply(
        variables, mb["phoneme"], mb["phone_lengths"],
        prompt_ids=mb["prompt_ids"], prompt_mask=mb["prompt_mask"],
        use_max=True, noise_scale=0.0,
        method=type(model).infer_frame_lengths)
    max_frames = int(np.asarray(flens_pre).max())
    max_frames = ((max_frames + 63) // 64) * 64
    mel, flens = model.apply(
        variables, mb["phoneme"], mb["phone_lengths"], max_frames,
        prompt_ids=mb["prompt_ids"], prompt_mask=mb["prompt_mask"],
        use_max=True, noise_scale=0.0, zero_noise=True,
        x_T=jnp.zeros((4, max_frames, 20)),
        method=type(model).infer)
    np.testing.assert_array_equal(np.asarray(flens_pre), np.asarray(flens))


def test_app_content_to_sequence():
    import app

    seq = app.content_to_sequence("HH AH0 L OW1")
    assert seq[0] == 1 and seq[-1] == 2 and len(seq) == 6
    with pytest.raises(SystemExit):
        app.content_to_sequence("plain english words")
