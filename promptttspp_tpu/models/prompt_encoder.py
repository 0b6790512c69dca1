"""Prompt encoder: BERT CLS vector -> MLP adaptor -> style space.

Behavioral equivalent of
`/root/reference/promptttspp/modules/prompt_encoder.py:22-56`. Key
TPU-native change: prompts arrive pre-tokenized ([B, L] ids + mask from
``WordPieceTokenizer``, host side) instead of raw strings inside forward.
The adaptor Linear names (``adaptor_0/2/4``) match the torch
``nn.Sequential`` indices (ReLUs at 1/3).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn

from promptttspp_tpu.models.bert import BertConfig, BertModel


class PromptEncoder(nn.Module):
    model_name: str = "bert-base-uncased"
    in_channels: int = 768
    mid_channels: int = 512
    out_channels: int = 256
    bert_config: Optional[BertConfig] = None
    # dryrun/testing knobs; defaults = bert-base
    bert_num_layers: int = 12
    bert_num_heads: int = 12

    @nn.compact
    def __call__(self, input_ids, attention_mask, train: bool = False):
        """[B, L] ids + mask -> [B, 1, out_channels]."""
        cfg = self.bert_config or BertConfig(
            hidden_size=self.in_channels,
            num_hidden_layers=self.bert_num_layers,
            num_attention_heads=self.bert_num_heads,
            intermediate_size=4 * self.in_channels)
        hidden = BertModel(cfg, name="bert")(
            input_ids, attention_mask, deterministic=not train)
        cls = hidden[:, 0, :]
        x = nn.relu(nn.Dense(self.mid_channels, name="adaptor_0")(cls))
        x = nn.relu(nn.Dense(self.mid_channels, name="adaptor_2")(x))
        x = nn.Dense(self.out_channels, name="adaptor_4")(x)
        return x[:, None, :]  # [B, 1, C]


class SepPromptEncoder(nn.Module):
    """Split style|speaker dual-BERT encoder
    (`modules/prompt_encoder.py:59-87`). Takes the two prompt halves
    pre-tokenized (the reference splits raw strings on '|' inside forward;
    the host-side tokenizer does that split here)."""

    model_name: str = "bert-base-uncased"
    in_channels: int = 768
    mid_channels: int = 512
    out_channels: int = 256
    bert_config: Optional[BertConfig] = None
    bert_num_layers: int = 12
    bert_num_heads: int = 12

    def setup(self):
        kw = dict(model_name=self.model_name, in_channels=self.in_channels,
                  mid_channels=self.mid_channels,
                  out_channels=self.out_channels,
                  bert_config=self.bert_config,
                  bert_num_layers=self.bert_num_layers,
                  bert_num_heads=self.bert_num_heads)
        self.style_enc = PromptEncoder(**kw, name="style_enc")
        self.spk_enc = PromptEncoder(**kw, name="spk_enc")

    def __call__(self, style_ids, style_mask, spk_ids, spk_mask,
                 train: bool = False):
        x1 = self.style_enc(style_ids, style_mask, train=train)
        x2 = self.spk_enc(spk_ids, spk_mask, train=train)
        return x1 + x2

    def infer(self, style_ids, style_mask, spk_ids, spk_mask):
        x1 = self.style_enc(style_ids, style_mask, train=False)
        x2 = self.spk_enc(spk_ids, spk_mask, train=False)
        return x1 + x2, x1, x2
