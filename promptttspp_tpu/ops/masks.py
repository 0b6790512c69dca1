"""Mask and duration-alignment primitives.

Functional equivalents of the reference's mask/path utilities
(`/root/reference/promptttspp/utils/model.py:30-161`), re-shaped for the
TPU-native [B, T, C] layout: masks are boolean [B, T]; the duration->frame
alignment is a dense 0/1 matrix built from a cumulative-sum band trick
(identical math to reference ``generate_path``), applied with a single
batched matmul that XLA maps onto the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp


def sequence_mask(lengths, max_length: int):
    """[B] lengths -> bool [B, max_length]; True inside the sequence.

    ``max_length`` must be static (XLA shapes), unlike the reference which
    defaults to ``lengths.max()`` (`utils/model.py:30-35`).
    """
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def generate_path(durations, phone_mask, num_frames: int):
    """Duration -> hard alignment path.

    Args:
      durations: int [B, Tp] frames per phone (zeros on padding).
      phone_mask: bool [B, Tp].
      num_frames: static Tf.

    Returns:
      float [B, Tp, Tf] with path[b, p, f] == 1 iff frame f is assigned to
      phone p. Same band construction as reference ``generate_path``
      (`utils/model.py:37-47`): cum = cumsum(d); band_p = (f < cum_p) and
      not (f < cum_{p-1}).
    """
    durations = durations * phone_mask.astype(durations.dtype)
    cum = jnp.cumsum(durations, axis=1)  # [B, Tp]
    frame_pos = jnp.arange(num_frames, dtype=cum.dtype)  # [Tf]
    below = frame_pos[None, None, :] < cum[:, :, None]  # [B, Tp, Tf]
    prev = jnp.pad(below[:, :-1, :], ((0, 0), (1, 0), (0, 0)))
    path = jnp.logical_and(below, jnp.logical_not(prev))
    path = jnp.logical_and(path, phone_mask[:, :, None])
    return path.astype(jnp.float32)


def expand_by_durations(x, durations, phone_mask, num_frames: int):
    """Expand phone-level features to frame level.

    x: [B, Tp, C]; returns [B, Tf, C] (frame f gets the features of its
    phone). Equivalent to the reference's ``x @ generate_path(...)`` on
    [B, C, Tp] (`modules/variance_adaptor.py:129-131`), transposed for
    [B, T, C].
    """
    path = generate_path(durations, phone_mask, num_frames)  # [B, Tp, Tf]
    return jnp.einsum("bpf,bpc->bfc", path, x.astype(jnp.float32)).astype(x.dtype)


def to_log_scale(x):
    """log of nonzero entries, zeros stay zero (`utils/model.py:62-64`)."""
    return jnp.where(x != 0, jnp.log(jnp.where(x != 0, x, 1.0)), x)


def subsequent_mask(size: int):
    """Causal bool [size, size]: True at (t, s) iff s <= t. Equivalent of
    `modules/esp/transformer/mask.py:20-38`."""
    idx = jnp.arange(size)
    return idx[None, :] <= idx[:, None]


def target_mask(ys_in_pad, ignore_id: int):
    """Decoder self-attention mask [B, L, L]: padding AND causal
    (`mask.py:41-51`)."""
    ys_mask = ys_in_pad != ignore_id  # [B, L]
    return ys_mask[:, None, :] & subsequent_mask(ys_in_pad.shape[-1])[None]


def add_sos_eos(ys_pad, sos: int, eos: int, ignore_id: int):
    """Prepend <sos> / append <eos> to padded targets, static shapes.

    Equivalent of `modules/esp/transformer/add_sos_eos.py:13-30` for the
    standard trailing-padding layout: ys_pad int [B, L] padded with
    ``ignore_id`` -> (ys_in [B, L+1] = [sos]+ys padded with eos,
    ys_out [B, L+1] = ys+[eos] padded with ignore_id). The reference's
    list-of-tensors round trip becomes a shift + one scatter-free where.
    """
    B, L = ys_pad.shape
    lengths = jnp.sum(ys_pad != ignore_id, axis=1)  # [B]
    pos = jnp.arange(L + 1)
    ys_ext = jnp.pad(ys_pad, ((0, 0), (0, 1)), constant_values=ignore_id)
    ys_in = jnp.concatenate(
        [jnp.full((B, 1), sos, ys_pad.dtype), ys_pad], axis=1)
    ys_in = jnp.where(pos[None, :] <= lengths[:, None], ys_in, eos)
    ys_out = jnp.where(pos[None, :] == lengths[:, None], eos, ys_ext)
    ys_out = jnp.where(pos[None, :] > lengths[:, None], ignore_id, ys_out)
    return ys_in, ys_out
