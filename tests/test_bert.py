"""Parity of our from-scratch flax BERT + WordPiece tokenizer against
transformers' torch implementations (constructed offline from config —
no pretrained downloads)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from promptttspp_tpu.compat.torch_ckpt import convert_tree
from promptttspp_tpu.models.bert import (
    BertConfig, BertModel, WordPieceTokenizer, bert_rename_map)

VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "a", "man", "with", "low", "voice", "speak", "##s", "slow", "##ly",
    "deep", "and", "fast", "she", "talk", "very", "high", "pitch", "##ed",
    ",", ".", "!", "her", "his",
]


@pytest.fixture(scope="module")
def hf_tokenizer(tmp_path_factory):
    from transformers import BertTokenizer

    path = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    path.write_text("\n".join(VOCAB) + "\n")
    return BertTokenizer(vocab_file=str(path)), str(path)


def test_wordpiece_matches_hf(hf_tokenizer):
    hf, path = hf_tokenizer
    ours = WordPieceTokenizer.from_vocab_file(path)
    texts = [
        "A man with LOW voice speaks slowly.",
        "She talks very fast, and high pitched!",
        "his voice is unknownword deep",
    ]
    for t in texts:
        assert ours.encode(t) == hf.encode(t), t

    ids, mask = ours.batch_encode(texts)
    enc = hf(texts, padding=True, return_tensors="np")
    np.testing.assert_array_equal(ids, enc["input_ids"])
    np.testing.assert_array_equal(mask, enc["attention_mask"])


def test_bert_matches_transformers():
    import torch
    from transformers import BertConfig as HFConfig
    from transformers import BertModel as HFBert

    hf_cfg = HFConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(11)
    hf = HFBert(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    cfg = BertConfig(vocab_size=100, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=40, type_vocab_size=2,
                     hidden_dropout=0.0, attention_dropout=0.0)
    model = BertModel(cfg)

    rng = np.random.RandomState(0)
    ids = rng.randint(0, 100, size=(3, 12)).astype(np.int32)
    lens = np.array([12, 9, 4])
    mask = (np.arange(12)[None] < lens[:, None]).astype(np.int32)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                           jnp.asarray(mask))
    params = convert_tree(variables["params"], sd,
                          rename=bert_rename_map(2))
    out = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))

    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids.astype(np.int64)),
                 attention_mask=torch.from_numpy(mask.astype(np.int64)))
    ref_h = ref.last_hidden_state.numpy()
    # compare only unmasked positions (HF computes garbage on pads too, but
    # identically; CLS position is what the prompt encoder consumes)
    valid = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(out)[valid], ref_h[valid], atol=2e-5, rtol=1e-4)
