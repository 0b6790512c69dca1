"""Correctness of the fused Pallas anti-aliased Snake kernel against the
unfused reference path (interpret mode on CPU; the same kernel compiles
natively on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from promptttspp_tpu.ops.pallas.snake import fused_antialias_snake
from promptttspp_tpu.vocoders.activations import (
    downsample2, snake, upsample2)


def reference(x, alpha):
    return downsample2(snake(upsample2(x), alpha))


@pytest.mark.parametrize("shape,tile", [
    ((1, 256, 8), 128),     # multi-tile, edges in first/last tile
    ((2, 100, 16), 64),     # padding to tile multiple, batch > 1
    ((1, 64, 8), 64),       # single tile: both edges in one tile
    ((1, 700, 32), 256),    # interior tiles
    ((1, 300, 64), 128),    # lane-packed p=2
    ((2, 513, 32), 256),    # lane-packed p=4, odd length
])
def test_fused_matches_unfused(shape, tile):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    alpha = jnp.asarray(rng.randn(shape[-1]).astype(np.float32) * 0.3)
    ref = reference(x, alpha)
    out = fused_antialias_snake(x, alpha, tile=tile, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_constant_signal():
    # constant input: up/down are DC-preserving, so y == snake(x)
    x = jnp.full((1, 128, 8), 0.7)
    alpha = jnp.zeros((8,))
    out = fused_antialias_snake(x, alpha, tile=64, interpret=True)
    ref = reference(x, alpha)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
