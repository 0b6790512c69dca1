"""MXU-friendly reformulations of the vocoder's awkward convolutions.

Two transforms, both bit-equivalent to the naive lowering (weights are
rearranged at trace time; no approximation):

1. ``subpixel_conv_transpose``: a stride-s transposed conv as s phase
   convolutions + interleave. The naive lhs-dilated form makes XLA chew
   through s-1 zeros per sample (measured 28 ms for the 256->128 stride-5
   BigVGAN stage); the phase form is dense matmuls with K = ceil(k/s)*Cin.

2. ``packed_conv1d``: space-to-depth for narrow channels. A k-tap dilated
   conv over [T, C] with C << 128 runs the MXU at C/128 lane utilization.
   Packing p = 128/C consecutive samples into the channel dim turns it
   into a k'-tap conv over [T/p, p*C=128] with a block-sparse packed
   weight — 128x128 contractions at full tile utilization. FLOPs grow ~p/2
   -fold but utilization grows ~p^2-fold.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def subpixel_conv_transpose(x, kernel_t, stride: int, padding: int,
                            output_padding: int, bias=None):
    """Equivalent of vocoders.bigvgan.ConvTranspose1d's lhs-dilated conv.

    x [B, T, Cin]; kernel_t [K, Cin, Cout] (taps flipped at use, like the
    module). Requires out_len == stride * T (true for all BigVGAN stages).
    """
    B, T, Cin = x.shape
    K, _, Cout = kernel_t.shape
    out_len = (T - 1) * stride - 2 * padding + K + output_padding
    assert out_len == stride * T, (out_len, stride, T)
    wf = jnp.flip(kernel_t, 0)
    pl = K - 1 - padding

    phases = []
    for r in range(stride):
        i0 = (pl - r) % stride
        taps = wf[i0::stride]  # [K_r, Cin, Cout]
        K_r = taps.shape[0]
        shift0 = (r + i0 - pl) // stride
        pad_left = -shift0
        pad_right = K_r - 1 + shift0
        y_r = jax.lax.conv_general_dilated(
            x, taps, window_strides=(1,),
            padding=[(pad_left, pad_right)],
            dimension_numbers=("NHC", "HIO", "NHC"))
        phases.append(y_r)  # [B, T, Cout]

    y = jnp.stack(phases, axis=2).reshape(B, stride * T, Cout)
    if bias is not None:
        y = y + bias
    return y


def packed_conv1d(x, kernel, dilation: int, pack: int, bias=None):
    """SAME dilated conv over [B, T, C] via space-to-depth packing.

    kernel [k, C, Cout] (odd k). Returns [B, T, Cout], identical to
    conv1d(..., padding='SAME', kernel_dilation=dilation).
    """
    B, T, C = x.shape
    k, _, Cout = kernel.shape
    P = pack
    c = (k - 1) // 2 * dilation  # SAME half-span

    pad_t = (-T) % P
    Tp = T + pad_t
    xp = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
    xpk = xp.reshape(B, Tp // P, P * C)

    # offsets o = r + (j - (k-1)/2) * d decompose as o = P*q + s
    o_min = 0 - c
    o_max = (P - 1) + c
    q_min = o_min // P
    q_max = o_max // P
    k2 = q_max - q_min + 1

    w2 = jnp.zeros((k2, P * C, P * Cout), kernel.dtype)
    for r in range(P):
        for j in range(k):
            o = r + (j - (k - 1) // 2) * dilation
            q = o // P
            s = o - q * P
            w2 = w2.at[q - q_min, s * C:(s + 1) * C,
                       r * Cout:(r + 1) * Cout].add(kernel[j])

    y = jax.lax.conv_general_dilated(
        xpk, w2, window_strides=(1,),
        padding=[(-q_min, q_max)],
        dimension_numbers=("NHC", "HIO", "NHC"))
    y = y.reshape(B, Tp, Cout)[:, :T, :]
    if bias is not None:
        y = y + bias
    return y
