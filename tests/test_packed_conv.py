"""Bit-equivalence of the MXU-friendly conv reformulations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from promptttspp_tpu.ops.packed_conv import (
    packed_conv1d, subpixel_conv_transpose)


@pytest.mark.parametrize("stride,k,pad,op", [
    (6, 12, 3, 0), (5, 10, 3, 1), (4, 8, 2, 0), (2, 4, 1, 0),
])
def test_subpixel_matches_dilated(stride, k, pad, op):
    rng = np.random.RandomState(0)
    T, Cin, Cout = 40, 12, 8
    x = jnp.asarray(rng.randn(2, T, Cin).astype(np.float32))
    w = jnp.asarray(rng.randn(k, Cin, Cout).astype(np.float32))
    b = jnp.asarray(rng.randn(Cout).astype(np.float32))

    # reference: the module's lhs-dilated formulation
    wf = jnp.flip(w, 0)
    pl = k - 1 - pad
    ref = jax.lax.conv_general_dilated(
        x, wf, (1,), [(pl, pl + op)], lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC")) + b

    out = subpixel_conv_transpose(x, w, stride, pad, op, bias=b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("k,dilation,pack,T", [
    (3, 1, 4, 64), (3, 5, 4, 64), (7, 3, 2, 50), (11, 5, 4, 100),
    (7, 1, 2, 33),  # T not a multiple of pack
])
def test_packed_matches_same_conv(k, dilation, pack, T):
    rng = np.random.RandomState(1)
    C = 32 if pack == 4 else 64
    x = jnp.asarray(rng.randn(2, T, C).astype(np.float32))
    w = jnp.asarray(rng.randn(k, C, C).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(C).astype(np.float32))

    ref = jax.lax.conv_general_dilated(
        x, w, (1,), "SAME", rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC")) + b
    out = packed_conv1d(x, w, dilation, pack, bias=b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)
