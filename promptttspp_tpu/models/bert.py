"""BERT encoder + WordPiece tokenizer, built from scratch for TPU.

The reference wraps HF ``bert-base-uncased``
(`/root/reference/promptttspp/modules/prompt_encoder.py:22-38`), calling
the tokenizer inside ``forward`` on raw strings. Here the split is
TPU-native: tokenization happens on host (data pipeline), the encoder is a
flax module whose parameter tree mirrors the HF torch ``state_dict``
(``encoder.layer.N.attention.self.query`` ...) so pretrained weights load
through promptttspp_tpu.compat.torch_ckpt.

Only what PromptTTS++ needs is implemented: last_hidden_state (the CLS
vector is consumed downstream). Freezing all-but-last-layer-attention is
an optimizer-mask concern (see promptttspp_tpu.train.state), not a module
concern — gradients flow everywhere, updates are masked.
"""

from __future__ import annotations

import dataclasses
import unicodedata
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1


class BertSelfAttention(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, hidden, attention_mask, deterministic=True):
        cfg = self.config
        H, D = cfg.num_attention_heads, cfg.hidden_size // cfg.num_attention_heads
        B, T, _ = hidden.shape
        split = lambda x: x.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        q = split(nn.Dense(cfg.hidden_size, name="query")(hidden))
        k = split(nn.Dense(cfg.hidden_size, name="key")(hidden))
        v = split(nn.Dense(cfg.hidden_size, name="value")(hidden))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(D)
        if attention_mask is not None:
            bias = (1.0 - attention_mask[:, None, None, :]) * jnp.finfo(
                scores.dtype).min
            scores = scores + bias
        probs = nn.softmax(scores, axis=-1)
        probs = nn.Dropout(cfg.attention_dropout)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        return ctx.transpose(0, 2, 1, 3).reshape(B, T, cfg.hidden_size)


class BertLayer(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, hidden, attention_mask, deterministic=True):
        cfg = self.config
        # attention block (HF: attention.self + attention.output)
        attn_out = BertSelfAttention(cfg, name="attention_self")(
            hidden, attention_mask, deterministic)
        attn_out = nn.Dense(cfg.hidden_size, name="attention_output_dense")(attn_out)
        attn_out = nn.Dropout(cfg.hidden_dropout)(attn_out, deterministic=deterministic)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                              name="attention_output_LayerNorm")(attn_out + hidden)
        # feed-forward
        inter = nn.Dense(cfg.intermediate_size, name="intermediate_dense")(hidden)
        inter = nn.gelu(inter, approximate=False)
        out = nn.Dense(cfg.hidden_size, name="output_dense")(inter)
        out = nn.Dropout(cfg.hidden_dropout)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                            name="output_LayerNorm")(out + hidden)


class BertModel(nn.Module):
    """Returns last_hidden_state [B, T, hidden]."""

    config: BertConfig = BertConfig()

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 deterministic: bool = True):
        cfg = self.config
        B, T = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        pos_ids = jnp.arange(T)[None, :]
        emb = (
            nn.Embed(cfg.vocab_size, cfg.hidden_size,
                     name="embeddings_word_embeddings")(input_ids)
            + nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       name="embeddings_position_embeddings")(pos_ids)
            + nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                       name="embeddings_token_type_embeddings")(token_type_ids)
        )
        emb = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                           name="embeddings_LayerNorm")(emb)
        emb = nn.Dropout(cfg.hidden_dropout)(emb, deterministic=deterministic)
        mask = None if attention_mask is None else attention_mask.astype(emb.dtype)
        hidden = emb
        for i in range(cfg.num_hidden_layers):
            hidden = BertLayer(cfg, name=f"encoder_layer_{i}")(
                hidden, mask, deterministic)
        return hidden


# HF torch key mapping for convert_tree(rename=...): flax path -> torch path
def bert_rename_map(num_layers: int) -> Dict[str, str]:
    m = {
        "embeddings_word_embeddings": "embeddings.word_embeddings",
        "embeddings_position_embeddings": "embeddings.position_embeddings",
        "embeddings_token_type_embeddings": "embeddings.token_type_embeddings",
        "embeddings_LayerNorm": "embeddings.LayerNorm",
    }
    for i in range(num_layers):
        f = f"encoder_layer_{i}"
        t = f"encoder.layer.{i}"
        m[f"{f}.attention_self.query"] = f"{t}.attention.self.query"
        m[f"{f}.attention_self.key"] = f"{t}.attention.self.key"
        m[f"{f}.attention_self.value"] = f"{t}.attention.self.value"
        m[f"{f}.attention_output_dense"] = f"{t}.attention.output.dense"
        m[f"{f}.attention_output_LayerNorm"] = f"{t}.attention.output.LayerNorm"
        m[f"{f}.intermediate_dense"] = f"{t}.intermediate.dense"
        m[f"{f}.output_dense"] = f"{t}.output.dense"
        m[f"{f}.output_LayerNorm"] = f"{t}.output.LayerNorm"
    return m


# ---------------------------------------------------------------------------
# WordPiece tokenizer (host-side)
# ---------------------------------------------------------------------------

def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


class WordPieceTokenizer:
    """bert-base-uncased-compatible tokenizer: lowercase, strip accents,
    punctuation split, greedy longest-match WordPiece."""

    def __init__(self, vocab: Dict[str, int], max_input_chars_per_word: int = 100):
        self.vocab = vocab
        self.max_chars = max_input_chars_per_word
        self.cls_id = vocab["[CLS]"]
        self.sep_id = vocab["[SEP]"]
        self.pad_id = vocab["[PAD]"]
        self.unk_id = vocab["[UNK]"]

    @classmethod
    def from_vocab_file(cls, path: str) -> "WordPieceTokenizer":
        vocab = {}
        with open(path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                vocab[line.rstrip("\n")] = i
        return cls(vocab)

    def _basic_tokenize(self, text: str) -> List[str]:
        text = unicodedata.normalize("NFD", text.lower())
        text = "".join(c for c in text if unicodedata.category(c) != "Mn")
        out, buf = [], []
        for ch in text:
            if ch.isspace():
                if buf:
                    out.append("".join(buf))
                    buf = []
            elif _is_punctuation(ch):
                if buf:
                    out.append("".join(buf))
                    buf = []
                out.append(ch)
            else:
                buf.append(ch)
        if buf:
            out.append("".join(buf))
        return out

    def _wordpiece(self, word: str) -> List[int]:
        if len(word) > self.max_chars:
            return [self.unk_id]
        pieces, start = [], 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = self.vocab[sub]
                    break
                end -= 1
            if cur is None:
                return [self.unk_id]
            pieces.append(cur)
            start = end
        return pieces

    def encode(self, text: str) -> List[int]:
        ids = [self.cls_id]
        for word in self._basic_tokenize(text):
            ids.extend(self._wordpiece(word))
        ids.append(self.sep_id)
        return ids

    def batch_encode(
        self, texts: Sequence[str], max_length: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """-> (input_ids [B, L], attention_mask [B, L]) padded arrays."""
        seqs = [self.encode(t) for t in texts]
        L = max_length or max(len(s) for s in seqs)
        ids = np.full((len(seqs), L), self.pad_id, np.int32)
        mask = np.zeros((len(seqs), L), np.int32)
        for i, s in enumerate(seqs):
            s = s[:L]
            ids[i, : len(s)] = s
            mask[i, : len(s)] = 1
        return ids, mask
