"""Whole-model parameter re-initialization.

Behavioral equivalent of
`/root/reference/promptttspp/modules/esp/transformer/{initialization,
initializer}.py` (SURVEY.md §2.7): re-draw every >1-D parameter from a
chosen family and zero every 1-D one, as a pure function on a flax
parameter pytree (the torch versions mutate ``module.parameters()`` in
place).

Fan-in/fan-out conventions match torch: for a flax Dense ``kernel``
[in, out], torch's Linear weight is the transpose, so torch's
(fan_in, fan_out) = flax (shape[0], shape[1]) — which is also what
flax's variance initializers use. Conv kernels [*k, in, out] likewise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax.core import FrozenDict


def _receptive(shape):
    r = 1
    for s in shape[:-2]:
        r *= s
    return r


def _draw(key, leaf, init_type: str):
    shape = jnp.shape(leaf)
    if len(shape) <= 1:
        return jnp.zeros_like(leaf)
    fan_in = shape[-2] * _receptive(shape)
    fan_out = shape[-1] * _receptive(shape)
    if init_type == "xavier_uniform":
        a = (6.0 / (fan_in + fan_out)) ** 0.5
        return jax.random.uniform(key, shape, jnp.float32, -a, a).astype(
            leaf.dtype)
    if init_type == "xavier_normal":
        std = (2.0 / (fan_in + fan_out)) ** 0.5
        return (std * jax.random.normal(key, shape)).astype(leaf.dtype)
    if init_type == "kaiming_uniform":
        # torch kaiming with nonlinearity="relu": gain = sqrt(2)
        a = (6.0 / fan_in) ** 0.5
        return jax.random.uniform(key, shape, jnp.float32, -a, a).astype(
            leaf.dtype)
    if init_type == "kaiming_normal":
        std = (2.0 / fan_in) ** 0.5
        return (std * jax.random.normal(key, shape)).astype(leaf.dtype)
    raise ValueError(f"Unknown initialization: {init_type}")


def initialize(params, init_type: str, rng):
    """Return ``params`` re-initialized like esp ``initialize(model, t)``
    (`initializer.py:14-39`). ``init_type='pytorch'`` returns unchanged."""
    if init_type == "pytorch":
        return params
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(rng, len(leaves))
    out = [_draw(k, leaf, init_type) for k, leaf in zip(keys, leaves)]
    tree = jax.tree_util.tree_unflatten(treedef, out)
    return FrozenDict(tree) if isinstance(params, FrozenDict) else tree


def lecun_normal_init(params, rng):
    """`initialization.py:12-31`: biases zero, weights N(0, 1/fan_in)
    with torch's layout convention."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(rng, len(leaves))
    out = []
    for k, leaf in zip(keys, leaves):
        shape = jnp.shape(leaf)
        if len(shape) <= 1:
            out.append(jnp.zeros_like(leaf))
        else:
            fan_in = shape[-2] * _receptive(shape)
            out.append((fan_in ** -0.5 * jax.random.normal(k, shape))
                       .astype(leaf.dtype))
    tree = jax.tree_util.tree_unflatten(treedef, out)
    return FrozenDict(tree) if isinstance(params, FrozenDict) else tree
