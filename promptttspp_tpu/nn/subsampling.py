"""Convolutional 2-D subsampling front-ends.

Behavioral equivalents of
`/root/reference/promptttspp/modules/esp/transformer/subsampling.py`
(SURVEY.md §2.7): stacks of VALID strided Conv2d+ReLU over [B, T, F] as a
1-channel image, flattened (channel-major, matching torch's
``transpose(1, 2).view``) into a linear projection + positional encoding;
masks are strided-sliced exactly like the reference.

[B, T, F] in, ([B, T', D], mask') out; mask [B, 1, T] or None.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn

from promptttspp_tpu.nn.embedding import PositionalEncoding


class _ConvSubsampling(nn.Module):
    """Shared core: conv specs (kernel, stride) applied channel-VALID."""

    odim: int
    dropout_rate: float
    conv_specs: Sequence[Tuple[int, int]]  # (kernel, stride) per layer

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        B = x.shape[0]
        h = x[..., None]  # NHWC: [B, T, F, 1]
        for i, (k, s) in enumerate(self.conv_specs):
            # torch Sequential interleaves ReLU, so convs sit at 0, 2, 4
            h = nn.Conv(self.odim, (k, k), strides=(s, s), padding="VALID",
                        name=f"conv_{2 * i}")(h)
            h = nn.relu(h)
        # [B, T', F', C] -> channel-major flatten [B, T', C*F']
        Bt, Tt, Ft, Ct = h.shape
        h = h.transpose(0, 1, 3, 2).reshape(B, Tt, Ct * Ft)
        h = nn.Dense(self.odim, name="out_0")(h)
        h = PositionalEncoding(self.odim, self.dropout_rate, name="pos_enc")(
            h, deterministic=deterministic)
        if x_mask is None:
            return h, None
        for k, s in self.conv_specs:
            x_mask = x_mask[:, :, : -(k - 1): s]
        return h, x_mask


class Conv2dSubsampling(_ConvSubsampling):
    """1/4-length subsampling (`subsampling.py:14-70`)."""

    conv_specs: Sequence[Tuple[int, int]] = ((3, 2), (3, 2))


class Conv2dSubsampling6(_ConvSubsampling):
    """1/6-length subsampling (`subsampling.py:73-120`)."""

    conv_specs: Sequence[Tuple[int, int]] = ((3, 2), (5, 3))


class Conv2dSubsampling8(_ConvSubsampling):
    """1/8-length subsampling (`subsampling.py:123-168`)."""

    conv_specs: Sequence[Tuple[int, int]] = ((3, 2), (3, 2), (3, 2))
