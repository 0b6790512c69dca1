"""Multi-head attention variants.

Behavioral equivalents of the vendored ESPnet attention
(`/root/reference/promptttspp/modules/esp/transformer/attention.py:15-305`)
plus the GST cross-attention
(`modules/style_encoder.py:137-171`). Everything is batched matmul on the
MXU; masking uses finfo.min fill + re-zero exactly like the reference so
fully-padded rows produce zeros, not NaNs.

Masks here are boolean [B, Tq, Tk] (True = attend), converted from the
reference's uint8 convention at the wrapper level.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


def _masked_softmax(scores, mask):
    """scores [B,H,Tq,Tk]; mask bool [B,1|Tq,Tk] or None."""
    if mask is None:
        return nn.softmax(scores, axis=-1)
    m = mask[:, None] if mask.ndim == 3 else mask
    min_value = jnp.finfo(scores.dtype).min
    scores = jnp.where(m, scores, min_value)
    attn = nn.softmax(scores, axis=-1)
    return jnp.where(m, attn, 0.0)


class MultiHeadedAttention(nn.Module):
    """Standard MHA (`attention.py:15-111`)."""

    n_head: int
    n_feat: int
    dropout_rate: float

    def setup(self):
        assert self.n_feat % self.n_head == 0
        self.d_k = self.n_feat // self.n_head
        self.linear_q = nn.Dense(self.n_feat, name="linear_q")
        self.linear_k = nn.Dense(self.n_feat, name="linear_k")
        self.linear_v = nn.Dense(self.n_feat, name="linear_v")
        self.linear_out = nn.Dense(self.n_feat, name="linear_out")
        self.attn_dropout = nn.Dropout(self.dropout_rate)

    def _qkv(self, query, key, value):
        B = query.shape[0]
        split = lambda x: x.reshape(B, -1, self.n_head, self.d_k).transpose(0, 2, 1, 3)
        return (
            split(self.linear_q(query)),
            split(self.linear_k(key)),
            split(self.linear_v(value)),
        )

    def _attend(self, v, scores, mask, deterministic):
        B = v.shape[0]
        attn = _masked_softmax(scores, mask)
        attn = self.attn_dropout(attn, deterministic=deterministic)
        x = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        x = x.transpose(0, 2, 1, 3).reshape(B, -1, self.n_head * self.d_k)
        return self.linear_out(x)

    def __call__(self, query, key, value, mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        q, k, v = self._qkv(query, key, value)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(self.d_k)
        return self._attend(v, scores, mask, deterministic)


def _rel_shift_new(x):
    """[B,H,T,2T-1] -> [B,H,T,T] Transformer-XL shift, 'new' variant
    (`attention.py:237-260`)."""
    B, H, T, P = x.shape  # P == 2T-1
    zero_pad = jnp.zeros((B, H, T, 1), x.dtype)
    x_padded = jnp.concatenate([zero_pad, x], axis=-1)  # [B,H,T,2T]
    x_padded = x_padded.reshape(B, H, P + 1, T)
    x = x_padded[:, :, 1:].reshape(B, H, T, P)
    return x[..., : P // 2 + 1]  # keep relative positions 0..-(T-1)


def _rel_shift_legacy(x):
    """[B,H,T,T] legacy shift (`attention.py:142-162`)."""
    B, H, T1, T2 = x.shape
    zero_pad = jnp.zeros((B, H, T1, 1), x.dtype)
    x_padded = jnp.concatenate([zero_pad, x], axis=-1)  # [B,H,T1,T2+1]
    x_padded = x_padded.reshape(B, H, T2 + 1, T1)
    return x_padded[:, :, 1:].reshape(B, H, T1, T2)


class RelPositionMultiHeadedAttention(MultiHeadedAttention):
    """Transformer-XL relative attention, 'new' 2T-1 variant
    (`attention.py:209-305`)."""

    def setup(self):
        super().setup()
        self.linear_pos = nn.Dense(self.n_feat, use_bias=False, name="linear_pos")
        init = nn.initializers.xavier_uniform()
        self.pos_bias_u = self.param("pos_bias_u", init, (self.n_head, self.d_k))
        self.pos_bias_v = self.param("pos_bias_v", init, (self.n_head, self.d_k))

    def __call__(self, query, key, value, pos_emb, mask=None, deterministic=True):
        q, k, v = self._qkv(query, key, value)
        p = self.linear_pos(pos_emb)  # [1, 2T-1, n_feat]
        p = p.reshape(p.shape[0], -1, self.n_head, self.d_k).transpose(0, 2, 1, 3)

        q = q.transpose(0, 2, 1, 3)  # [B, T, H, d_k]
        q_u = (q + self.pos_bias_u).transpose(0, 2, 1, 3)
        q_v = (q + self.pos_bias_v).transpose(0, 2, 1, 3)

        matrix_ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k)
        matrix_bd = jnp.einsum("bhqd,bhpd->bhqp", q_v, p)
        matrix_bd = _rel_shift_new(matrix_bd)
        scores = (matrix_ac + matrix_bd) / math.sqrt(self.d_k)
        return self._attend(v, scores, mask, deterministic)


class LegacyRelPositionMultiHeadedAttention(MultiHeadedAttention):
    """Legacy relative attention, T-length pos table (`attention.py:114-206`)."""

    def setup(self):
        super().setup()
        self.linear_pos = nn.Dense(self.n_feat, use_bias=False, name="linear_pos")
        init = nn.initializers.xavier_uniform()
        self.pos_bias_u = self.param("pos_bias_u", init, (self.n_head, self.d_k))
        self.pos_bias_v = self.param("pos_bias_v", init, (self.n_head, self.d_k))

    def __call__(self, query, key, value, pos_emb, mask=None, deterministic=True):
        q, k, v = self._qkv(query, key, value)
        p = self.linear_pos(pos_emb)
        p = p.reshape(p.shape[0], -1, self.n_head, self.d_k).transpose(0, 2, 1, 3)

        q = q.transpose(0, 2, 1, 3)
        q_u = (q + self.pos_bias_u).transpose(0, 2, 1, 3)
        q_v = (q + self.pos_bias_v).transpose(0, 2, 1, 3)

        matrix_ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k)
        matrix_bd = jnp.einsum("bhqd,bhpd->bhqp", q_v, p)
        matrix_bd = _rel_shift_legacy(matrix_bd)
        scores = (matrix_ac + matrix_bd) / math.sqrt(self.d_k)
        return self._attend(v, scores, mask, deterministic)


class GSTCrossAttention(nn.Module):
    """GST token cross-attention with distinct q/k/v input dims and the
    sqrt(d_k * h) scale quirk (`modules/style_encoder.py:137-171`)."""

    n_head: int
    n_feat: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, ref_emb, gst_emb, deterministic: bool = True):
        """ref_emb [B, 1, q_dim]; gst_emb [B, n_tokens, kv_dim] -> [B, 1, n_feat]."""
        d_k = self.n_feat // self.n_head
        B = ref_emb.shape[0]
        split = lambda x: x.reshape(B, -1, self.n_head, d_k).transpose(0, 2, 1, 3)
        q = split(nn.Dense(self.n_feat, name="linear_q")(ref_emb))
        k = split(nn.Dense(self.n_feat, name="linear_k")(gst_emb))
        v = split(nn.Dense(self.n_feat, name="linear_v")(gst_emb))
        score = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(d_k * self.n_head)
        score = nn.softmax(score, axis=-1)
        score = nn.Dropout(self.dropout_rate)(score, deterministic=deterministic)
        o = jnp.einsum("bhqk,bhkd->bhqd", score, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, 1, self.n_head * d_k)
        return nn.Dense(self.n_feat, name="linear_out")(o)
