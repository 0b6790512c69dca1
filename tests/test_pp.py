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
    not silently wrong (dilation would differ between stages) — with
    ValueError, which survives python -O (unlike assert)."""
    net, params, x, t, cond = _build(L=8)
    mesh = make_mesh(data=2, model=4, devices=jax.devices()[:8])
    # L=8, S=4 -> 2 layers/stage, not a multiple of cycle 4
    with pytest.raises(ValueError):
        denoise_pipelined(mesh, net, params, x, t, cond)


def test_pipelined_masked_forward():
    """The per-frame mask is threaded through every stage exactly like
    the single-device forward multiplies it inside each block."""
    net, params, x, t, cond = _build(L=8, B=4, T=24)
    lens = np.array([24, 17, 9, 24])
    mask = jnp.asarray(
        (np.arange(24)[None, :, None] < lens[:, None, None])
        .astype(np.float32))
    ref = net.apply({"params": params}, x, t, cond, mask)
    mesh = make_mesh(data=4, model=2, devices=jax.devices()[:8])
    out = denoise_pipelined(mesh, net, params, x, t, cond, mask=mask,
                            n_microbatches=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # and the masked result differs from the unmasked one (mask matters)
    out_nomask = denoise_pipelined(mesh, net, params, x, t, cond,
                                   n_microbatches=2)
    assert float(jnp.max(jnp.abs(out - out_nomask))) > 1e-3


def test_pipelined_grads_match():
    """BACKWARD exactness: jax.grad through the GPipe schedule (scan +
    ppermute + scatter) equals single-device gradients — the property
    that makes this a *training* parallelism axis, not just a forward
    trick."""
    net, params, x, t, cond = _build(L=8, B=4, T=16)
    mesh = make_mesh(data=4, model=2, devices=jax.devices()[:8])

    def loss_single(p):
        out = net.apply({"params": p}, x, t, cond)
        return jnp.mean(out * out)

    def loss_pp(p):
        out = denoise_pipelined(mesh, net, p, x, t, cond,
                                n_microbatches=2)
        return jnp.mean(out * out)

    g_ref = jax.grad(loss_single)(params)
    g_pp = jax.jit(jax.grad(loss_pp))(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pp = dict(jax.tree_util.tree_leaves_with_path(g_pp))
    # every param receives a gradient, and it matches to float tolerance
    for path, leaf in flat_ref:
        got = flat_pp[path]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(leaf), rtol=1e-4, atol=1e-5,
            err_msg=str(path))


def test_pipelined_batch_axis_dp_composition():
    """batch_axis='data' keeps the microbatch batch dim sharded over the
    data axis while pipelining over model — the DPxPP composition the
    trainer uses — and stays exact."""
    net, params, x, t, cond = _build(L=8, B=8, T=16)
    mesh = make_mesh(data=4, model=2, devices=jax.devices()[:8])
    ref = net.apply({"params": params}, x, t, cond)
    out = jax.jit(lambda p, x, t, c: denoise_pipelined(
        mesh, net, p, x, t, c, n_microbatches=2, batch_axis="data"))(
            params, x, t, cond)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipelined_gaussian_diffusion_module():
    """GaussianDiffusion(pipeline_mesh=...) — the integration the trainer
    and Synthesizer knobs build via .clone() — produces the same
    train-mode (noise, eps_pred) and the same sampled mel as the plain
    module."""
    from promptttspp_tpu.models.diffusion import GaussianDiffusion

    H, OUT, B, T = 12, 10, 4, 16
    mesh = make_mesh(data=4, model=2, devices=jax.devices()[:8])
    net = DiffNet(in_dim=OUT, encoder_hidden_dim=H, residual_layers=8,
                  residual_channels=16, kernel_size=3,
                  dilation_cycle_length=4)
    plain = GaussianDiffusion(in_dim=H, out_dim=OUT, denoise_fn=net,
                              K_step=10, norm_scale=6.0)
    piped = plain.clone(pipeline_mesh=mesh, pipeline_microbatches=2)

    k = jax.random.PRNGKey(3)
    kc, ky, kp, kn = jax.random.split(k, 4)
    cond = jax.random.normal(kc, (B, T, H), jnp.float32)
    y = jax.random.normal(ky, (B, T, OUT), jnp.float32)
    mask = jnp.ones((B, T, 1), jnp.float32).at[1, 9:].set(0.0)
    t = jnp.array([0, 3, 7, 9], jnp.int32)
    noise = jax.random.normal(kn, y.shape, jnp.float32)
    variables = plain.init(
        {"params": kp, "diffusion": jax.random.PRNGKey(0)}, cond, y, mask)

    n_ref, e_ref = plain.apply(variables, cond, y, mask, t=t, noise=noise)
    n_pp, e_pp = piped.apply(variables, cond, y, mask, t=t, noise=noise)
    np.testing.assert_allclose(np.asarray(n_pp), np.asarray(n_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(e_pp), np.asarray(e_ref),
                               rtol=2e-5, atol=2e-5)

    rng = jax.random.PRNGKey(11)
    mel_ref = plain.apply(variables, cond, rng=rng,
                          method=GaussianDiffusion.inference)
    mel_pp = piped.apply(variables, cond, rng=rng,
                         method=GaussianDiffusion.inference)
    np.testing.assert_allclose(np.asarray(mel_pp), np.asarray(mel_ref),
                               rtol=3e-5, atol=3e-5)
