"""Fused anti-aliased Snake activation as a Pallas TPU kernel.

The vocoder applies `up2 (kaiser-sinc transposed conv) -> snake ->
down2 (kaiser-sinc strided conv)` around every Snake
(`promptttspp_tpu/vocoders/activations.py`, reference
`layers/activations.py:22-33`). Unfused, XLA materializes the 2x-rate
intermediate (the largest tensors in the network: up to 2*240*T_frames
samples per channel) through HBM twice. This kernel computes the whole
sandwich per VMEM tile: one HBM read of x, one HBM write of y — roughly
3x less HBM traffic on a bandwidth-bound op.

Derivation (bit-matching activations.py; f = 12-tap kaiser-sinc,
cutoff 0.25, half-width 0.3):
  up:    u[2q]   = 2 * sum_i f[2i]   * xr[q + i - 3]      (i = 0..5)
         u[2q+1] = 2 * sum_i f[2i+1] * xr[q + i - 2]
         (xr = edge-replicated x)
  snake: s[m] = u[m] + (1/exp(a)) * sin(u[m] * exp(a))^2
  down:  y[t] = sum_j f[2j] * s_pad(2t + 2j - 5)
              + sum_j f[2j+1] * s_pad(2t + 2j - 4)
         s_pad(m) = s[clamp(m, 0, 2T-1)]   (edge-replication of s)

y[t] depends on x[t-6 .. t+5]; input tiles carry a HALO=8 halo DMA'd
from HBM (x is edge-padded by HALO on host so tile reads need no
boundary conditionals). The s-level edge replication is applied with
global row masks so it lands exactly where the unfused path pads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from promptttspp_tpu.ops.pallas.polyops import sin2 as _sin2
from promptttspp_tpu.vocoders.activations import kaiser_sinc_filter1d

HALO = 8


def _kernel(x_hbm, alpha_ref, out_ref, scratch, sem, *, tile: int,
            n_time: int):
    b = pl.program_id(0)
    t_idx = pl.program_id(1)
    t0 = t_idx * tile
    nq = tile + 7  # s rows: q in [t0 - 3, t0 + tile + 3]

    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t0, tile + 2 * HALO), :], scratch, sem)
    dma.start()
    dma.wait()
    # compute in f32: Mosaic has no bf16 transcendentals (math.sin)
    xt = scratch[:].astype(jnp.float32)  # row l = x[t0 + l - HALO]

    f = kaiser_sinc_filter1d(0.25, 0.3, 12)
    alpha = alpha_ref[0, :].astype(jnp.float32)
    a = jnp.exp(alpha)
    inv_a = 1.0 / (a + 1e-9)

    def snake(u):
        return u + inv_a * _sin2(u * a)

    def taps(base, weights):
        acc = weights[0] * xt[base:base + nq, :]
        for i, w in enumerate(weights[1:], start=1):
            acc = acc + w * xt[base + i:base + i + nq, :]
        return acc

    even_w = [2.0 * float(f[2 * i]) for i in range(6)]
    odd_w = [2.0 * float(f[2 * i + 1]) for i in range(6)]
    # u_even(q): x[q-3+i] -> local row (q - t0) + HALO - 3 + i; with
    # d = q - (t0 - 3): row = d + HALO - 6 + i = d + 2 + i
    s_even = snake(taps(2, even_w))  # s[2q],   d = 0..nq-1
    s_odd = snake(taps(3, odd_w))    # s[2q+1]

    # global edge replication of s: rows with q < 0 read s[0] (= s_even at
    # q=0); rows with q > T-1 read s[2T-1] (= s_odd at q=T-1). The row
    # indices are traced (depend on the tile id), so extract them with a
    # masked reduction instead of a dynamic slice.
    def _edge_replicate(se_so):
        s_even, s_odd = se_so
        rows = jax.lax.broadcasted_iota(jnp.int32, (nq, 1), 0)
        qg = t0 - 3 + rows
        d_first = jnp.clip(0 - (t0 - 3), 0, nq - 1)
        d_last = jnp.clip((n_time - 1) - (t0 - 3), 0, nq - 1)
        s_first = jnp.sum(jnp.where(rows == d_first, s_even, 0.0), axis=0,
                          keepdims=True)
        s_last = jnp.sum(jnp.where(rows == d_last, s_odd, 0.0), axis=0,
                         keepdims=True)
        s_even = jnp.where(qg < 0, s_first, s_even)
        s_odd = jnp.where(qg < 0, s_first, s_odd)
        s_even = jnp.where(qg > n_time - 1, s_last, s_even)
        s_odd = jnp.where(qg > n_time - 1, s_last, s_odd)
        return s_even, s_odd

    # identity on interior tiles (the s range stays inside [0, 2T))
    boundary = jnp.logical_or(t0 - 3 < 0, t0 + tile + 3 > n_time - 1)
    s_even, s_odd = jax.lax.cond(
        boundary, _edge_replicate, lambda p_: p_, (s_even, s_odd))

    # y row r (t' = t0 + r): sum_j f[2j] * s_odd[d = r + j]
    #                      + sum_j f[2j+1] * s_even[d = r + j + 1]
    acc = float(f[0]) * s_odd[0:tile, :]
    for j in range(1, 6):
        acc = acc + float(f[2 * j]) * s_odd[j:j + tile, :]
    for j in range(6):
        acc = acc + float(f[2 * j + 1]) * s_even[j + 1:j + 1 + tile, :]
    out_ref[0] = acc.astype(out_ref.dtype)


def _kernel_packed(x_hbm, alpha_ref, out_ref, scratch, sem, *, rows: int,
                   p: int, c: int, n_time: int):
    """Lane-packed variant for C < 128 (p = 128 // C samples per row).

    The flat layout [row, lane] holds sample t = origin + row*p + lane//C,
    channel lane % C. Sample-offset taps decompose into a row shift plus a
    lane roll; HBM traffic is exact (no channel padding).
    """
    t_idx = pl.program_id(1)
    b = pl.program_id(0)
    R = rows
    U = R + 8
    t0 = t_idx * R * p  # first output sample of this tile

    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t_idx * R, R + 16), :], scratch, sem)
    dma.start()
    dma.wait()
    xt = scratch[:].astype(jnp.float32)  # row 0 = sample t0 - 8p

    f = kaiser_sinc_filter1d(0.25, 0.3, 12)
    alpha = alpha_ref[0, :].astype(jnp.float32)  # [128] = alpha tiled p times
    a = jnp.exp(alpha)
    inv_a = 1.0 / (a + 1e-9)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def tap(arr, o, row0, nrows):
        r, rem = divmod(o, p)
        l = rem * c
        A = arr[row0 + r: row0 + r + nrows, :]
        if l == 0:
            return A
        B = arr[row0 + r + 1: row0 + r + 1 + nrows, :]
        rA = pltpu.roll(A, 128 - l, 1)
        rB = pltpu.roll(B, 128 - l, 1)
        return jnp.where(lane < 128 - l, rA, rB)

    def snake(u):
        return u + inv_a * _sin2(u * a)

    even_w = [2.0 * float(f[2 * i]) for i in range(6)]
    odd_w = [2.0 * float(f[2 * i + 1]) for i in range(6)]
    u_even = even_w[0] * tap(xt, -3, 4, U)
    for i in range(1, 6):
        u_even = u_even + even_w[i] * tap(xt, i - 3, 4, U)
    u_odd = odd_w[0] * tap(xt, -2, 4, U)
    for i in range(1, 6):
        u_odd = u_odd + odd_w[i] * tap(xt, i - 2, 4, U)
    s_even = snake(u_even)  # s[2q]; row 0 = sample t0 - 4p
    s_odd = snake(u_odd)

    # global s edge replication (samples < 0 use s[0]; > T-1 use s[2T-1])
    def _edge_replicate(se_so):
        s_even, s_odd = se_so
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (U, 1), 0)
        qg = t0 - 4 * p + rows_i * p + lane // c  # [U, 128] sample index
        lane_in_c = lane < c

        s0_idx = jnp.clip((0 - (t0 - 4 * p)) // p, 0, U - 1)
        s0_row = jnp.sum(jnp.where(rows_i == s0_idx, s_even, 0.0), axis=0,
                         keepdims=True)
        s0_rep = jnp.where(lane_in_c, s0_row, 0.0)
        acc0 = s0_rep
        for g in range(1, p):
            acc0 = acc0 + pltpu.roll(s0_rep, g * c, 1)

        g_last = (n_time - 1) % p
        sl_idx = jnp.clip((n_time - 1 - (t0 - 4 * p)) // p, 0, U - 1)
        sl_row = jnp.sum(jnp.where(rows_i == sl_idx, s_odd, 0.0), axis=0,
                         keepdims=True)
        sl_grp = jnp.where(lane // c == g_last, sl_row, 0.0)
        accl = jnp.zeros_like(sl_grp)
        for g in range(p):
            shift = ((g - g_last) % p) * c
            accl = accl + (sl_grp if shift == 0
                           else pltpu.roll(sl_grp, shift, 1))

        s_even = jnp.where(qg < 0, acc0, s_even)
        s_odd = jnp.where(qg < 0, acc0, s_odd)
        s_even = jnp.where(qg > n_time - 1, accl, s_even)
        s_odd = jnp.where(qg > n_time - 1, accl, s_odd)
        return s_even, s_odd

    # identity on interior tiles
    boundary = jnp.logical_or(t0 - 4 * p < 0,
                              t0 + (R + 4) * p > n_time)
    s_even, s_odd = jax.lax.cond(
        boundary, _edge_replicate, lambda p_: p_, (s_even, s_odd))

    y = float(f[0]) * tap(s_odd, -3, 4, R)
    for j in range(1, 6):
        y = y + float(f[2 * j]) * tap(s_odd, j - 3, 4, R)
    for j in range(6):
        y = y + float(f[2 * j + 1]) * tap(s_even, j - 2, 4, R)
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _fused_packed(x, alpha, tile: int, interpret: bool):
    """C < 128 path: [B, T, C] in the flat lane-packed layout."""
    B, T, C = x.shape
    p = 128 // C
    if tile == 0:
        tile = 2048  # measured optimum on v5e (VMEM-safe, overhead-amortized)
    tile = max(tile, 8 * p)
    pad_t = (-T) % tile
    Tp = T + pad_t
    halo = 8 * p
    xp = jnp.pad(x, ((0, 0), (halo, halo + pad_t), (0, 0)), mode="edge")
    rows_total = (Tp + 2 * halo) * C // 128
    xf = xp.reshape(B, rows_total, 128)

    R = tile // p
    n_tiles = Tp // tile
    out = pl.pallas_call(
        functools.partial(_kernel_packed, rows=R, p=p, c=C, n_time=T),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * R, 128), x.dtype),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 128), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, 128), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((R + 16, 128), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xf, jnp.tile(alpha, 128 // C)[None, :])
    return out.reshape(B, Tp, C)[:, :T, :]


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_antialias_snake(x, alpha, tile: int = 0,
                          interpret: bool = False):
    """[B, T, C] x, [C] alpha -> [B, T, C]; numerically equal to
    downsample2(snake(upsample2(x), alpha))."""
    B, T, C = x.shape
    if C < 128 and 128 % C == 0:
        # lane-packed path: exact HBM traffic, no channel padding
        return _fused_packed(x, alpha, tile, interpret)
    if tile == 0:
        # auto: amortize per-program overhead. Footprint per program is
        # roughly 6 live (tile, c_pad) f32 arrays (scratch, f32 copy,
        # s_even/s_odd, acc, out block); stay well under the 16 MB VMEM.
        c_pad = C + ((-C) % 128)
        budget = 8 * 1024 * 1024
        tile = max(512, min(4096, budget // (6 * 4 * c_pad) // 512 * 512))
    pad_c = (-C) % 128  # Mosaic DMA slices must fill whole 128-lane tiles
    if pad_c:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_c)))
        alpha = jnp.pad(alpha, (0, pad_c))
        out = fused_antialias_snake(x, alpha, tile=tile, interpret=interpret)
        return out[:, :, :C]
    pad_t = (-T) % tile
    Tp = T + pad_t
    xp = jnp.pad(x, ((0, 0), (HALO, HALO + pad_t), (0, 0)), mode="edge")

    out = pl.pallas_call(
        functools.partial(_kernel, tile=tile, n_time=T),
        out_shape=jax.ShapeDtypeStruct((B, Tp, C), x.dtype),
        grid=(B, Tp // tile),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec((1, C), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * HALO, C), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, alpha[None, :])
    return out[:, :T, :]
