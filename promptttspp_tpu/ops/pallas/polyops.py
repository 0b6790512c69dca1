"""Shared VPU-cheap math for the Pallas vocoder kernels."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# sin^2 is pi-periodic and even: reduce t = z/pi - round(z/pi) to
# [-1/2, 1/2] and evaluate a degree-7 Chebyshev-fit polynomial in t^2
# (max abs error 2.0e-10 over the full period — below f32 rounding of
# jnp.sin itself). 7 fmas on the VPU instead of the lowered sin
# expansion; measured ~1.7x faster for the snake stage, which the
# ablation profiler shows is the dominant per-layer cost at C<=64.
_SIN2_COEF = (
    0.7304793718262736, -3.903308433149872, 13.203381813096923,
    -30.121232542884073, 42.72834270494695, -32.46969505718645,
    9.869604379110031, 4.0317083005447785e-11,
)
_INV_PI = float(1.0 / np.pi)


def sin2(z):
    """sin(z)^2 via range reduction + even polynomial (f32, VPU-cheap)."""
    t = z * _INV_PI
    t = t - jnp.round(t)
    u = t * t
    p = _SIN2_COEF[0]
    for c in _SIN2_COEF[1:]:
        p = p * u + c
    return p
