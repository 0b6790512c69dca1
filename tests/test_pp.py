"""Pipeline parallelism (parallel/pp.py): the GPipe microbatch schedule
over the mesh 'model' axis is EXACTLY the single-device DiffNet forward.

Reference anchor: the denoiser being staged is
`/root/reference/promptttspp/modules/denoiser.py:86-143`; the reference
itself has no pipeline parallelism (DDP only, SURVEY §2.4) — this is a
beyond-reference capability, so the contract is self-consistency:
pipelined == unpipelined to float tolerance, for several stage counts
and microbatch factors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from promptttspp_tpu.models.diffusion import DiffNet
from promptttspp_tpu.parallel.mesh import make_mesh
from promptttspp_tpu.parallel.pp import denoise_pipelined


def _build(L=8, R=16, H=12, B=4, T=24, seed=0):
    net = DiffNet(in_dim=10, encoder_hidden_dim=H, residual_layers=L,
                  residual_channels=R, kernel_size=3,
                  dilation_cycle_length=4)
    k = jax.random.PRNGKey(seed)
    kx, kc, kp = jax.random.split(k, 3)
    x = jax.random.normal(kx, (B, T, 10), jnp.float32)
    cond = jax.random.normal(kc, (B, T, H), jnp.float32)
    t = jnp.arange(B, dtype=jnp.int32) * 13 % 100
    params = net.init(kp, x, t, cond)["params"]
    return net, params, x, t, cond


@pytest.mark.parametrize("stages,micro,layers", [(2, 2, 8), (2, 4, 8),
                                                 (4, 4, 16)])
def test_pipelined_matches_single_device(stages, micro, layers):
    net, params, x, t, cond = _build(L=layers)
    ref = net.apply({"params": params}, x, t, cond)
    mesh = make_mesh(data=8 // stages, model=stages,
                     devices=jax.devices()[:8])
    out = denoise_pipelined(mesh, net, params, x, t, cond,
                            n_microbatches=micro)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipelined_under_jit():
    """The whole schedule compiles as one program (no host round-trips):
    jit(denoise_pipelined) lowers and matches eager."""
    net, params, x, t, cond = _build(L=8)
    mesh = make_mesh(data=4, model=2, devices=jax.devices()[:8])
    fn = jax.jit(lambda p, x, t, c: denoise_pipelined(
        mesh, net, p, x, t, c, n_microbatches=2))
    ref = net.apply({"params": params}, x, t, cond)
    np.testing.assert_allclose(np.asarray(fn(params, x, t, cond)),
                               np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_stage_constraint_raises():
    """Stage sizes that break the dilation cycle are rejected loudly,
    not silently wrong (dilation would differ between stages)."""
    net, params, x, t, cond = _build(L=8)
    mesh = make_mesh(data=2, model=4, devices=jax.devices()[:8])
    # L=8, S=4 -> 2 layers/stage, not a multiple of cycle 4
    with pytest.raises(AssertionError):
        denoise_pipelined(mesh, net, params, x, t, cond)
