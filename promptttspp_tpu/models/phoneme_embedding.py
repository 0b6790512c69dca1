"""Phoneme embedding (`/root/reference/promptttspp/layers/embedding.py:21-48`).

[B, Tp] int ids -> [B, Tp, C] masked embeddings. padding_idx=0 semantics
(zero row) are enforced by the mask multiply, matching the reference's
output; the id-0 row is additionally zero-initialized so converted
checkpoints agree exactly.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp


class PhonemeEmbedding(nn.Module):
    num_vocab: int
    channels: int
    do_scale: bool = True
    init_normal: bool = True

    @nn.compact
    def __call__(self, ids, mask):
        """ids [B, Tp]; mask float [B, Tp, 1] -> [B, Tp, C]."""
        if self.init_normal:
            init = nn.initializers.normal(stddev=self.channels ** -0.5)
        else:
            init = nn.initializers.normal(stddev=1.0)  # torch nn.Embedding default
        x = nn.Embed(self.num_vocab, self.channels,
                     embedding_init=init, name="emb")(ids)
        if self.do_scale:
            x = x * math.sqrt(self.channels)
        return x * mask


class PhonemeEmbedding2(nn.Module):
    """Unscaled variant (`layers/embedding.py:39-48`)."""

    num_vocab: int
    channels: int

    @nn.compact
    def __call__(self, ids, mask):
        x = nn.Embed(self.num_vocab, self.channels,
                     embedding_init=nn.initializers.normal(1.0), name="emb")(ids)
        return x * mask
