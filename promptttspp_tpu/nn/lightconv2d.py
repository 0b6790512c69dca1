"""2-D (time + feature axis) lightweight / dynamic convolution.

Behavioral equivalents of the vendored fairseq-style modules
(`/root/reference/promptttspp/modules/esp/transformer/{lightconv2d,
dynamic_conv2d}.py`, SURVEY.md §2.7): on top of the 1-D time convolution
(see nn/lightconv.py) these add a second convolution along the FEATURE
axis and concatenate both paths before the output linear.

The torch versions express the feature-axis convolution as a grouped
conv1d with B*T groups; here it is a sum of k static channel shifts —
identical math, and XLA fuses the shifts into one vectorized pass.

[B, T, C] layout; mask [B, 1, T] (attention-style); odd kernel sizes only
(even sizes would change the length in the reference's `.view` as well).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _feature_axis_conv(x, w):
    """x [B, T, C], w [..., k] broadcastable to [B, T, k] (or [k]) ->
    out[b,t,c] = sum_j w[..., j] * x_zero-padded[b, t, c + j - k//2]."""
    k = w.shape[-1]
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)))
    C = x.shape[-1]
    out = 0.0
    for j in range(k):
        wj = w[..., j] if w.ndim == 1 else w[..., j][..., None]
        out = out + wj * xp[:, :, j:j + C]
    return out


class LightweightConvolution2D(nn.Module):
    """(`lightconv2d.py:11-130`). Query-only attention-compatible API."""

    wshare: int
    n_feat: int
    dropout_rate: float
    kernel_size_str: str = "3"
    lnum: int = 0
    use_kernel_mask: bool = False
    use_bias: bool = False

    @nn.compact
    def __call__(self, query, key=None, value=None, mask=None,
                 deterministic: bool = True):
        x = query
        B, T, C = x.shape
        H = self.wshare
        k = int(self.kernel_size_str.split("_")[self.lnum])
        assert k % 2 == 1, "2-D lightconv requires odd kernel sizes"
        pad = k // 2

        x = nn.Dense(2 * self.n_feat, name="linear1")(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * nn.sigmoid(b)  # GLU

        # feature-axis conv: shared kernel, softmax THEN dropout
        # (`lightconv2d.py:98-104` — note the opposite order vs the time
        # kernel below)
        weight_f = self.param(
            "weight_f", nn.initializers.uniform(scale=1.0), (1, 1, k))
        wf = nn.softmax(weight_f[0, 0], axis=-1)
        wf = nn.Dropout(self.dropout_rate)(wf, deterministic=deterministic)
        xf = _feature_axis_conv(x, wf)

        # time-axis lightconv: dropout -> causal mask -> softmax
        weight = self.param(
            "weight", nn.initializers.uniform(scale=1.0), (H, 1, k))
        weight = nn.Dropout(self.dropout_rate)(
            weight, deterministic=deterministic)
        if self.use_kernel_mask:
            km = jnp.concatenate(
                [jnp.ones((H, 1, k // 2 + 1)), jnp.zeros((H, 1, k // 2))],
                axis=-1)
            weight = jnp.where(km == 0.0, -jnp.inf, weight)
        weight = nn.softmax(weight, axis=-1)
        # channel c uses kernel c % H (torch view(B*C/H, H, T) fold)
        per = C // H
        w_full = jnp.tile(weight[:, 0, :], (per, 1))  # [C, k]
        w_hio = w_full.T[:, None, :]  # [k, 1, C]
        xt = jax.lax.conv_general_dilated(
            x, w_hio, (1,), [(pad, pad)], feature_group_count=C,
            dimension_numbers=("NHC", "HIO", "NHC"))
        if self.use_bias:
            xt = xt + self.param("bias", nn.initializers.zeros,
                                 (self.n_feat,))

        x = jnp.concatenate([xt, xf], axis=-1)  # [B, T, 2C]
        if mask is not None and not self.use_kernel_mask:
            valid = mask[:, 0:1, :].transpose(0, 2, 1)  # [B, T, 1]
            x = jnp.where(valid > 0, x, 0.0)
        return nn.Dense(self.n_feat, name="linear2")(x)


class DynamicConvolution2D(nn.Module):
    """(`dynamic_conv2d.py:11-140`): per-position kernels predicted from
    the input on both axes; the time-axis band matrix is an explicit
    banded gather (static shapes) instead of torch's as_strided trick."""

    wshare: int
    n_feat: int
    dropout_rate: float
    kernel_size_str: str = "3"
    lnum: int = 0
    use_kernel_mask: bool = False
    use_bias: bool = False

    @nn.compact
    def __call__(self, query, key=None, value=None, mask=None,
                 deterministic: bool = True):
        x = query
        B, T, C = x.shape
        H = self.wshare
        k = int(self.kernel_size_str.split("_")[self.lnum])
        assert k % 2 == 1, "2-D dynamic conv requires odd kernel sizes"

        x = nn.Dense(2 * self.n_feat, name="linear1")(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * nn.sigmoid(b)

        # feature-axis conv: raw predicted kernel, no softmax/dropout
        # (`dynamic_conv2d.py:96-101`)
        wf = nn.Dense(k, name="linear_weight_f")(x)  # [B, T, k]
        xf = _feature_axis_conv(x, wf)

        # time-axis dynamic conv
        w = nn.Dense(H * k, name="linear_weight")(x)
        w = nn.Dropout(self.dropout_rate)(w, deterministic=deterministic)
        w = w.reshape(B, T, H, k).transpose(0, 2, 1, 3)  # [B, H, T, k]
        t_idx = jnp.arange(T)[:, None]
        s_idx = jnp.arange(T)[None, :]
        rel = s_idx - t_idx + (k - 1) // 2
        in_band = (rel >= 0) & (rel < k)
        band = jnp.take_along_axis(
            w, jnp.broadcast_to(jnp.clip(rel, 0, k - 1), (B, H, T, T)),
            axis=-1)
        band = jnp.where(in_band[None, None], band, -jnp.inf)
        if self.use_kernel_mask:
            band = jnp.where(s_idx[None, None] <= t_idx[None, None],
                             band, -jnp.inf)
        band = nn.softmax(band, axis=-1)

        # contiguous channel blocks per kernel group (torch view(B*H, C/H, T))
        xh = x.reshape(B, T, H, C // H).transpose(0, 2, 1, 3)
        xt = jnp.einsum("bhts,bhsd->bhtd", band, xh)
        xt = xt.transpose(0, 2, 1, 3).reshape(B, T, C)
        if self.use_bias:
            xt = xt + self.param("bias", nn.initializers.zeros,
                                 (self.n_feat,))

        x = jnp.concatenate([xt, xf], axis=-1)
        if mask is not None and not self.use_kernel_mask:
            valid = mask[:, 0:1, :].transpose(0, 2, 1)
            x = jnp.where(valid > 0, x, 0.0)
        return nn.Dense(self.n_feat, name="linear2")(x)
