"""Sinusoidal positional-encoding variants.

Behavioral equivalents of the vendored ESPnet embeddings
(`/root/reference/promptttspp/modules/esp/transformer/embedding.py:35-331`)
and the local duplicate used by FramePriorNetwork
(`modules/embedding.py`). Tables are built as numpy constants at trace
time (static T), so they fold into the compiled program — no state, no
``extend_pe`` machinery.
"""

from __future__ import annotations

import functools
import math

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def sinusoid_table(length: int, d_model: int, reverse: bool = False) -> np.ndarray:
    """[length, d_model]: sin on even dims, cos on odd."""
    if reverse:
        position = np.arange(length - 1, -1, -1.0, dtype=np.float32)[:, None]
    else:
        position = np.arange(0, length, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32)
        * -(math.log(10000.0) / d_model)
    )
    pe = np.zeros((length, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


@functools.lru_cache(maxsize=None)
def rel_sinusoid_table(length: int, d_model: int) -> np.ndarray:
    """[2*length-1, d_model] relative table: positions length-1 ... -(length-1).

    Matches the 'new' RelPositionalEncoding layout (`embedding.py:293-313`):
    flipped positive part then negative part (skipping position 0 twice).
    """
    position = np.arange(0, length, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32)
        * -(math.log(10000.0) / d_model)
    )
    pos = np.zeros((length, d_model), dtype=np.float32)
    neg = np.zeros((length, d_model), dtype=np.float32)
    pos[:, 0::2] = np.sin(position * div_term)
    pos[:, 1::2] = np.cos(position * div_term)
    neg[:, 0::2] = np.sin(-position * div_term)
    neg[:, 1::2] = np.cos(-position * div_term)
    return np.concatenate([pos[::-1], neg[1:]], axis=0)


class PositionalEncoding(nn.Module):
    """x*sqrt(d) + PE, dropout (`embedding.py:35-92`)."""

    d_model: int
    dropout_rate: float
    reverse: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        T = x.shape[1]
        pe = jnp.asarray(sinusoid_table(T, self.d_model, self.reverse))
        x = x * math.sqrt(self.d_model) + pe[None]
        return nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)


class ScaledPositionalEncoding(nn.Module):
    """x + alpha*PE with learned scalar alpha (`embedding.py:95-135`)."""

    d_model: int
    dropout_rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        T = x.shape[1]
        alpha = self.param("alpha", nn.initializers.ones, (1,))
        pe = jnp.asarray(sinusoid_table(T, self.d_model))
        x = x + alpha * pe[None]
        return nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)


class RelPositionalEncoding(nn.Module):
    """'New' relative PE: returns (dropout(x*sqrt(d)), dropout(pos_emb))
    with pos_emb [1, 2T-1, d] (`embedding.py:260-331`)."""

    d_model: int
    dropout_rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        T = x.shape[1]
        pos_emb = jnp.asarray(rel_sinusoid_table(T, self.d_model))[None]
        x = x * math.sqrt(self.d_model)
        drop = nn.Dropout(self.dropout_rate)
        return (
            drop(x, deterministic=deterministic),
            drop(pos_emb, deterministic=deterministic),
        )


class LegacyRelPositionalEncoding(nn.Module):
    """Legacy relative PE (`embedding.py:220-257`): pos_emb is the FIRST T
    rows of the reversed max_len table (positions max_len-1 .. max_len-T),
    because ``extend_pe`` only regrows the table when T exceeds max_len —
    a reference quirk that must be matched bit-for-bit."""

    d_model: int
    dropout_rate: float
    max_len: int = 5000

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        T = x.shape[1]
        table_len = max(self.max_len, T)
        pos_emb = jnp.asarray(
            sinusoid_table(table_len, self.d_model, reverse=True)[:T])[None]
        x = x * math.sqrt(self.d_model)
        drop = nn.Dropout(self.dropout_rate)
        return (
            drop(x, deterministic=deterministic),
            drop(pos_emb, deterministic=deterministic),
        )


class StreamPositionalEncoding(nn.Module):
    """Streaming positional encoding (`embedding.py:333-385`):
    ``x*sqrt(d) + PE[start_idx : start_idx+T]``, dropout.

    The reference grows a ``pe`` buffer lazily (``extend_pe``); here the
    table is a trace-time constant sized ``start_idx + T`` (both static
    under jit — a streaming server compiles one program per chunk size,
    consistent with the bucketed serving design)."""

    d_model: int
    dropout_rate: float

    @nn.compact
    def __call__(self, x, start_idx: int = 0, deterministic: bool = True):
        T = x.shape[1]
        pe = jnp.asarray(sinusoid_table(start_idx + T, self.d_model))
        x = x * math.sqrt(self.d_model) + pe[None, start_idx:start_idx + T]
        return nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
