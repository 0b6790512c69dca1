"""Sequence-parallel (frame-axis sharded) diffusion decoding
(parallel/sp.py, SURVEY §5.7c): the 100-step DDPM decode with cond
sharded along frames over the mesh data axis must EXACTLY reproduce the
unsharded decode — XLA's spatial partitioning inserts halo exchanges
inside the compiled scan, no approximation (unlike halo-chunked
vocoding, which cannot be applied to the diffusion loop at all)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from promptttspp_tpu.parallel.mesh import make_mesh
from promptttspp_tpu.parallel.sp import decode_frames_sharded

from test_train import MEL, SyntheticDataset, TokenHashTokenizer, tiny_model


@pytest.fixture(scope="module")
def model_vars_cond():
    from promptttspp_tpu.data.collate import PromptTTSCollator
    from promptttspp_tpu.train.trainer import model_batch

    model = tiny_model()
    ds = SyntheticDataset(4)
    batch = PromptTTSCollator(tokenizer=TokenHashTokenizer())(
        [ds[i] for i in range(4)])
    mb = model_batch(batch)
    rngs = {k: jax.random.PRNGKey(i) for i, k in
            enumerate(("params", "dropout", "diffusion", "style"))}
    variables = model.init(rngs, mb, train=True)

    # frame-level conditioner from the real infer_cond path, Tf a
    # multiple of the 8-device data axis
    cond, flens, fmask, log_cf0, vuv, _raw = model.apply(
        variables,
        jnp.asarray(mb["phoneme"]), jnp.asarray(mb["phone_lengths"]), 64,
        prompt_ids=jnp.asarray(mb["prompt_ids"]),
        prompt_mask=jnp.asarray(mb["prompt_mask"]),
        use_max=True, noise_scale=0.0,
        style_rng=jax.random.PRNGKey(5),
        method=type(model).infer_cond)
    return model, variables, cond


def test_sharded_decode_matches_unsharded(model_vars_cond):
    model, variables, cond = model_vars_cond
    rng = jax.random.PRNGKey(9)

    mel_ref = model.apply(
        variables, cond, rng=rng,
        method=lambda m, cond, rng: m.decoder.inference(cond, rng=rng))

    mesh = make_mesh()
    mel_sp = decode_frames_sharded(mesh, model, variables, cond,
                                   diffusion_rng=rng)
    assert mel_sp.shape == mel_ref.shape
    np.testing.assert_allclose(np.asarray(mel_sp), np.asarray(mel_ref),
                               atol=1e-5, rtol=1e-5)


def test_sharded_decode_deterministic_xt(model_vars_cond):
    model, variables, cond = model_vars_cond
    B, Tf = cond.shape[:2]
    x_T = jnp.asarray(
        np.random.RandomState(3).randn(B, Tf, MEL).astype(np.float32))
    mel_ref = model.apply(
        variables, cond, rng=None, x_T=x_T, zero_noise=True,
        method=lambda m, cond, rng, x_T, zero_noise: m.decoder.inference(
            cond, rng=rng, x_T=x_T, zero_noise=zero_noise))
    mesh = make_mesh()
    mel_sp = decode_frames_sharded(mesh, model, variables, cond,
                                   x_T=x_T, zero_noise=True)
    np.testing.assert_allclose(np.asarray(mel_sp), np.asarray(mel_ref),
                               atol=1e-5, rtol=1e-5)


def test_synthesizer_frame_sharded_mode(model_vars_cond):
    """Synthesizer(frame_sharded_decode=True) equals the default path."""
    from promptttspp_tpu.infer import Synthesizer

    model, variables, _ = model_vars_cond
    ds = SyntheticDataset(4)
    seqs = [list(ds[i]["phonemes"]) for i in range(2)]
    kw = dict(tokenizer=TokenHashTokenizer(),
              mel_stats={"mean": -1.0, "std": 2.0},
              frame_quantum=64, max_frames_cap=512)
    plain = Synthesizer(model, variables, **kw)
    sharded = Synthesizer(model, variables, frame_sharded_decode=True,
                          mesh=make_mesh(), **kw)
    _, mels_a = plain.synthesize(seqs, prompts=["a", "b"], seed=4)
    _, mels_b = sharded.synthesize(seqs, prompts=["a", "b"], seed=4)
    for a, b in zip(mels_a, mels_b):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_sharded_decode_plms(model_vars_cond):
    """Frame-sharded decoding also covers the PLMS fast path (multistep
    scan with an eps-history carry)."""
    from promptttspp_tpu.models.diffusion import DiffNet, GaussianDiffusion

    model, variables, cond = model_vars_cond
    plms = GaussianDiffusion(
        in_dim=32, out_dim=MEL,
        denoise_fn=DiffNet(in_dim=MEL, encoder_hidden_dim=32,
                           residual_layers=2, residual_channels=16,
                           kernel_size=3, dilation_cycle_length=2),
        K_step=10, schedule_type="linear", norm_scale=6.0,
        pndm_speedup=5)
    dec_vars = {"params": variables["params"]["decoder"]}
    rng = jax.random.PRNGKey(11)
    mel_ref = plms.apply(dec_vars, cond, rng=rng,
                         method=GaussianDiffusion.inference)

    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = make_mesh()
    sh = NamedSharding(mesh, P(None, "data", None))
    cond_sp = jax.device_put(cond, sh)
    with mesh:
        mel_sp = jax.jit(lambda v, c, r: plms.apply(
            v, c, rng=r, method=GaussianDiffusion.inference))(
            dec_vars, cond_sp, rng)
    np.testing.assert_allclose(np.asarray(mel_sp), np.asarray(mel_ref),
                               atol=1e-5, rtol=1e-5)
