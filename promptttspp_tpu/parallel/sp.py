"""Sequence (frame-axis) parallel diffusion decoding.

SURVEY §5.7: the reference has no long-context machinery — utterances
are ≤ ~1000 frames and attention is phone-level. The one genuinely long
axis at inference is the mel frame axis consumed by the diffusion
decoder (100 sequential DDPM steps × 20 dilated-conv layers) and the
vocoder. The vocoder is served chunk-parallel with explicit halos
(vocoders/streaming.py); the diffusion decoder CANNOT be halo-chunked —
each of the 100 steps mixes neighbors, so the effective receptive field
is ~100× a single step's and halo error compounds.

The exact TPU answer: shard the frame axis over the mesh's data axis and
let XLA's spatial partitioning insert the halo exchanges *inside* every
step of the compiled scan. No approximation — results are bitwise the
mel the unsharded decode produces (threefry noise is placement-
invariant) — and the 100-step loop's compute spreads across chips.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def frame_sharding(mesh: Mesh) -> NamedSharding:
    """[B, Tf, C] arrays sharded along frames over the data axis."""
    return NamedSharding(mesh, P(None, "data", None))


# jitted decode per (model, zero_noise): building a fresh jax.jit every
# call would retrace/recompile on each synthesize. Keyed by id() — the
# caller (Synthesizer) owns the model for its lifetime.
_DECODE_CACHE = {}


def _decode_fn(model, zero_noise: bool):
    key = (id(model), zero_noise)
    if key not in _DECODE_CACHE:

        def decode(variables, cond, rng, x_T):
            return model.apply(
                variables, cond, rng=rng, x_T=x_T, zero_noise=zero_noise,
                method=lambda m, cond, rng, x_T, zero_noise:
                    m.decoder.inference(cond, rng=rng, x_T=x_T,
                                        zero_noise=zero_noise))

        _DECODE_CACHE[key] = jax.jit(decode)
    return _DECODE_CACHE[key]


def decode_frames_sharded(mesh: Mesh, model, variables, cond,
                          diffusion_rng=None, x_T=None,
                          zero_noise: bool = False):
    """Run ``model.decoder.inference`` with ``cond`` [B, Tf, C] sharded
    along the frame axis. Tf must be divisible by the data-axis size
    (the frame buckets guarantee it for power-of-two quanta)."""
    n_data = mesh.shape["data"]
    assert cond.shape[1] % n_data == 0, (
        f"frame axis {cond.shape[1]} not divisible by data axis {n_data}")
    sharding = frame_sharding(mesh)
    cond = jax.device_put(cond, sharding)
    if x_T is not None:
        x_T = jax.device_put(x_T, sharding)

    with mesh:
        return _decode_fn(model, zero_noise)(
            variables, cond, diffusion_rng, x_T)
