"""Host-side (numpy) utilities.

Equivalents of the remaining reference helpers
(`/root/reference/promptttspp/utils/model.py:67-161`, `utils/seed.py`):
list padding, duration-repeat expansion, pad masks, and global seeding.
The on-device counterparts live in promptttspp_tpu.ops.masks.
"""

from __future__ import annotations

import random
from typing import List, Optional, Sequence

import numpy as np


def seed_everything(seed: int):
    """(`utils/seed.py:22-28`): python + numpy (+ jax keys are derived
    explicitly from the seed by callers)."""
    random.seed(seed)
    np.random.seed(seed)


def pad_list(xs: Sequence[np.ndarray], pad_value: float,
             max_len: Optional[int] = None) -> np.ndarray:
    """Pad a list of [T_i, ...] arrays into [N, max_len, ...]
    (`utils/model.py:67-87`)."""
    n = len(xs)
    max_len = max(x.shape[0] for x in xs) if max_len is None else max_len
    out = np.full((n, max_len) + tuple(xs[0].shape[1:]), pad_value,
                  dtype=xs[0].dtype)
    for i, x in enumerate(xs):
        out[i, : x.shape[0]] = x
    return out


def repeat_by_durations(xs: Sequence[np.ndarray], ds: Sequence[np.ndarray],
                        pad_value: float = 0,
                        max_len: Optional[int] = None) -> np.ndarray:
    """Repeat each [T_in, C] by its durations, then pad
    (`utils/model.py:90-100`)."""
    expanded = [np.repeat(x, np.asarray(d).reshape(-1).astype(int), axis=0)
                for x, d in zip(xs, ds)]
    return pad_list(expanded, pad_value, max_len)


def make_pad_mask(lengths, maxlen: Optional[int] = None) -> np.ndarray:
    """True at PADDED positions, [B, maxlen] (`utils/model.py:103-161`)."""
    lengths = np.asarray(lengths)
    maxlen = int(lengths.max()) if maxlen is None else maxlen
    return np.arange(maxlen)[None, :] >= lengths[:, None]


def make_non_pad_mask(lengths, maxlen: Optional[int] = None) -> np.ndarray:
    return ~make_pad_mask(lengths, maxlen)
