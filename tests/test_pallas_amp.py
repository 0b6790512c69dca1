"""Fused AMPLayer kernel vs the unfused module composition (interpret
mode on CPU; compiles natively on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from promptttspp_tpu.ops.pallas.amp import fused_amp_layer
from promptttspp_tpu.vocoders.activations import (
    downsample2, snake, upsample2)


def unfused(x, a1, w1, b1, a2, w2, b2, dilation):
    y = downsample2(snake(upsample2(x), a1))
    y = jax.lax.conv_general_dilated(
        y, w1, (1,), "SAME", rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC")) + b1
    y = downsample2(snake(upsample2(y), a2))
    y = jax.lax.conv_general_dilated(
        y, w2, (1,), "SAME",
        dimension_numbers=("NHC", "HIO", "NHC")) + b2
    return x + y


@pytest.mark.parametrize("T,C,k,dil,tile", [
    (400, 32, 3, 1, 128),
    (400, 32, 11, 5, 128),
    (300, 64, 7, 3, 128),
    (97, 32, 3, 5, 64),      # short input, odd length
    (520, 16, 11, 5, 256),   # p=8
    (400, 128, 11, 5, 128),  # p=1 (row-per-sample, strided dilated taps)
    (300, 128, 7, 3, 128),   # p=1
    (200, 256, 3, 5, 64),    # p=1, C>128 (stage-0 MRF shape)
    (150, 256, 7, 3, 64),    # p=1, C>128
])
def test_fused_amp_matches_unfused(T, C, k, dil, tile):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, T, C).astype(np.float32) * 0.3)
    a1 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.2)
    a2 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.2)
    w1 = jnp.asarray(rng.randn(k, C, C).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.randn(k, C, C).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)

    ref = unfused(x, a1, w1, b1, a2, w2, b2, dil)
    out = fused_amp_layer(x, a1, w1, b1, a2, w2, b2, dil, tile=tile,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5,
                               rtol=1e-3)


def test_fused_amp_mxu_bf16():
    """conv_precision="default" (bf16 MXU matmuls, f32 accumulation):
    same result to bf16 input-rounding tolerance."""
    rng = np.random.RandomState(5)
    T, C, k, dil = 300, 32, 7, 3
    x = jnp.asarray(rng.randn(1, T, C).astype(np.float32) * 0.3)
    a1 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.2)
    a2 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.2)
    w1 = jnp.asarray(rng.randn(k, C, C).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.randn(k, C, C).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    ref = unfused(x, a1, w1, b1, a2, w2, b2, dil)
    out = fused_amp_layer(x, a1, w1, b1, a2, w2, b2, dil, tile=128,
                          interpret=True, mxu_bf16=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-2,
                               rtol=1e-2)


@pytest.mark.parametrize("T,C,k,dils,tile", [
    (400, 32, 3, (1, 3, 5), 128),   # full MRF block shape, p=4
    (200, 64, 7, (1, 3, 5), 64),    # p=2, short input (boundary-heavy)
    (300, 128, 3, (1, 3), 128),     # p=1
    (150, 256, 3, (1, 3, 5), 64),   # p=1, C>128 (stage-0 block)
])
def test_fused_amp_block_matches_layer_chain(T, C, k, dils, tile):
    """A whole AMPBlock in ONE kernel == the chain of unfused layers."""
    from promptttspp_tpu.ops.pallas.amp import fused_amp_block

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, T, C).astype(np.float32) * 0.3)
    params, ref = [], x
    for d in dils:
        a1 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.2)
        a2 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.2)
        w1 = jnp.asarray(rng.randn(k, C, C).astype(np.float32) * 0.05)
        w2 = jnp.asarray(rng.randn(k, C, C).astype(np.float32) * 0.05)
        b1 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
        b2 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
        params.append((a1, w1, b1, a2, w2, b2))
        ref = unfused(ref, a1, w1, b1, a2, w2, b2, d)
    out = fused_amp_block(x, tuple(params), dils, tile=tile,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5,
                               rtol=1e-3)
