"""Numerical parity vs the PyTorch reference.

Each test loads a golden (reference state_dict + inputs + outputs generated
by scripts/gen_goldens.py), converts the weights through
compat.torch_ckpt.convert_tree into our flax module, and compares outputs.
This validates module numerics AND the checkpoint converter in one shot.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from promptttspp_tpu.compat.torch_ckpt import convert_tree

GOLDENS = Path(__file__).parent / "goldens"

RESERVED = {
    "x", "lens", "out", "target", "mask", "log_pi", "log_sigma", "mu",
    "loss", "sigma_max", "mu_max", "log_dur", "mel", "cond", "t", "y",
    "noise", "x_T", "eps", "x_noisy", "eps_pred", "mel_out", "plens",
    "durs", "flens", "log_cf0", "vuv", "dur_log_pi", "dur_log_sigma",
    "dur_mu", "log_cf0_pred", "vuv_pred", "x_inf", "fmask_inf",
}


def load_golden(name):
    data = dict(np.load(GOLDENS / f"{name}.npz"))
    sd = {k: v for k, v in data.items() if k not in RESERVED}
    io = {k: v for k, v in data.items() if k in RESERVED}
    return sd, io


def convert_variables(module, sd, example_args, example_kwargs=None,
                      rename=None, method=None):
    """init -> convert params (+ batch_stats) -> bound variables dict."""
    variables = module.init(jax.random.PRNGKey(0), *example_args,
                            **(example_kwargs or {}), method=method)
    out = {"params": convert_tree(variables["params"], sd, "params",
                                  rename=rename)}
    if "batch_stats" in variables:
        out["batch_stats"] = convert_tree(
            variables["batch_stats"], sd, "batch_stats", rename=rename)
    return out


# ------------------------------------------------------------------ conformer
@pytest.mark.parametrize("variant", ["new", "legacy"])
def test_conformer_parity(variant):
    from promptttspp_tpu.nn.conformer import ConformerEncoder

    sd, io = load_golden(f"conformer_{variant}")
    enc = ConformerEncoder(
        idim=64, attention_dim=64, attention_heads=2, linear_units=128,
        num_blocks=2, positionwise_layer_type="conv1d",
        positionwise_conv_kernel_size=9, dropout_rate=0.0,
        pos_enc_layer_type="rel_pos", selfattention_layer_type="rel_selfattn",
        macaron_style=True, use_cnn_module=True, cnn_module_kernel=7,
        rel_pos_type=variant,
    )
    x = jnp.asarray(io["x"])
    lens = jnp.asarray(io["lens"])
    variables = convert_variables(enc, sd, (x, lens))
    out = enc.apply(variables, x, lens)
    np.testing.assert_allclose(np.asarray(out), io["out"], atol=2e-4, rtol=1e-3)


# ------------------------------------------------------------------ mdn
def test_mdn_parity():
    from promptttspp_tpu.nn.mdn import (
        MDNLayer, mdn_loss, mdn_get_most_probable_sigma_and_mu)

    sd, io = load_golden("mdn")
    layer = MDNLayer(in_dim=32, out_dim=1, num_gaussians=4, dim_wise=True)
    x = jnp.asarray(io["x"])
    variables = convert_variables(layer, sd, (x,))
    log_pi, log_sigma, mu = layer.apply(variables, x)
    np.testing.assert_allclose(np.asarray(log_pi), io["log_pi"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(log_sigma), io["log_sigma"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(mu), io["mu"], atol=1e-5)

    mask = jnp.asarray(io["mask"])
    loss = mdn_loss(log_pi, log_sigma, mu, jnp.asarray(io["target"]),
                    reduce=False, mask=mask)
    valid = io["mask"][..., 0].astype(bool)
    np.testing.assert_allclose(
        np.asarray(loss)[valid], io["loss"][valid], atol=1e-4, rtol=1e-4)

    sigma_max, mu_max = mdn_get_most_probable_sigma_and_mu(log_pi, log_sigma, mu)
    np.testing.assert_allclose(np.asarray(sigma_max), io["sigma_max"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(mu_max), io["mu_max"], atol=1e-5)


# ------------------------------------------------------------------ predictors
def test_predictor_parity():
    from promptttspp_tpu.models.variance_adaptor import Predictor

    sd, io = load_golden("predictor")
    pred = Predictor(channels=48, out_channels=2, kernel_size=5, dropout=0.5,
                     num_layers=5, detach=False)
    x = jnp.asarray(io["x"]).transpose(0, 2, 1)  # -> [B, T, C]
    mask = jnp.asarray(io["mask"])[:, :, None]
    variables = convert_variables(pred, sd, (x, mask))
    out = pred.apply(variables, x, mask)
    np.testing.assert_allclose(
        np.asarray(out), io["out"].transpose(0, 2, 1), atol=1e-5, rtol=1e-4)


def test_mdn_predictor_parity():
    from promptttspp_tpu.models.variance_adaptor import MDNPredictor

    sd, io = load_golden("mdn_predictor")
    pred = MDNPredictor(channels=48, out_channels=1, kernel_size=3, dropout=0.5,
                        num_layers=2, num_gaussians=4, dim_wise=True,
                        detach=True, disable_amp=True)
    x = jnp.asarray(io["x"]).transpose(0, 2, 1)
    mask = jnp.asarray(io["mask"])[:, :, None]
    variables = convert_variables(pred, sd, (x, mask))
    log_pi, log_sigma, mu = pred.apply(variables, x, mask)
    np.testing.assert_allclose(np.asarray(log_pi), io["log_pi"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(log_sigma), io["log_sigma"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(mu), io["mu"], atol=1e-5)

    log_dur = pred.apply(variables, x, mask,
                         method=MDNPredictor.infer_log_duration)
    np.testing.assert_allclose(
        np.asarray(log_dur), io["log_dur"].transpose(0, 2, 1), atol=1e-5)


# ------------------------------------------------------------------ frame prior
def test_frame_prior_parity():
    from promptttspp_tpu.models.frame_prior import FramePriorNetwork

    sd, io = load_golden("frame_prior")
    fpn = FramePriorNetwork(out_channels=64, hidden_channels=64, n_layers=6,
                            kernel_size=17, p_dropout=0.1)
    x = jnp.asarray(io["x"]).transpose(0, 2, 1)
    mask = jnp.asarray(io["mask"])[:, :, None]
    variables = convert_variables(fpn, sd, (x, mask))
    out = fpn.apply(variables, x, mask)
    np.testing.assert_allclose(
        np.asarray(out), io["out"].transpose(0, 2, 1), atol=2e-5, rtol=1e-4)


# ------------------------------------------------------------------ style enc
def test_style_encoder_parity():
    from promptttspp_tpu.models.style_encoder import StyleEncoder

    sd, io = load_golden("style_encoder")
    se = StyleEncoder(idim=80, gst_tokens=10, gst_heads=4, conv_layers=6,
                      conv_chans_list=(8, 8, 16, 16, 32, 32),
                      conv_kernel_size=3, conv_stride=2, gru_layers=1,
                      gru_units=64, gst_token_dim=64)
    mel = jnp.asarray(io["mel"]).transpose(0, 2, 1)  # -> [B, T, 80]
    lens = jnp.asarray(io["lens"])
    variables = convert_variables(se, sd, (mel, lens))
    out = se.apply(variables, mel, lens)  # [B, 1, C]
    ref = io["out"][:, :, 0]  # [B, C, 1] -> [B, C]
    np.testing.assert_allclose(np.asarray(out)[:, 0, :], ref, atol=2e-5,
                               rtol=1e-4)


# ------------------------------------------------------------------ diffusion
def test_diffnet_parity():
    from promptttspp_tpu.models.diffusion import DiffNet

    sd, io = load_golden("diffusion")
    net = DiffNet(in_dim=20, encoder_hidden_dim=48, residual_layers=4,
                  residual_channels=32, kernel_size=3, dilation_cycle_length=4)
    x = jnp.asarray(io["x"]).transpose(0, 2, 1)
    cond = jnp.asarray(io["cond"]).transpose(0, 2, 1)
    t = jnp.asarray(io["t"])
    net_sd = {k[len("denoise_fn."):]: v for k, v in sd.items()}
    variables = convert_variables(net, net_sd, (x, t, cond))
    eps = net.apply(variables, x, t, cond)
    np.testing.assert_allclose(
        np.asarray(eps), io["eps"].transpose(0, 2, 1), atol=2e-5, rtol=1e-4)


def test_diffusion_parity():
    from promptttspp_tpu.models.diffusion import DiffNet, GaussianDiffusion

    sd, io = load_golden("diffusion")
    diff = GaussianDiffusion(
        in_dim=48, out_dim=20,
        denoise_fn=DiffNet(in_dim=20, encoder_hidden_dim=48,
                           residual_layers=4, residual_channels=32,
                           kernel_size=3, dilation_cycle_length=4),
        K_step=100, schedule_type="linear", norm_scale=6.0)
    y = jnp.asarray(io["y"])  # [B, T, 20]
    cond = jnp.asarray(io["cond"]).transpose(0, 2, 1)
    t = jnp.asarray(io["t"])
    noise = jnp.asarray(io["noise"]).transpose(0, 2, 1)

    variables = diff.init(jax.random.PRNGKey(0), cond, y, t=t, noise=noise)
    variables = {"params": convert_tree(variables["params"], sd)}

    noise_out, eps_pred = diff.apply(variables, cond, y, t=t, noise=noise)
    np.testing.assert_allclose(
        np.asarray(eps_pred), io["eps_pred"].transpose(0, 2, 1),
        atol=2e-5, rtol=1e-4)

    # zero-noise 100-step ancestral loop from fixed x_T
    x_T = jnp.asarray(io["x_T"]).transpose(0, 2, 1)
    mel = diff.apply(variables, cond, x_T=x_T, zero_noise=True,
                     method=GaussianDiffusion.inference)
    np.testing.assert_allclose(
        np.asarray(mel), io["mel_out"], atol=5e-4, rtol=1e-3)


# ------------------------------------------------------------------ adaptor
def test_variance_adaptor_parity():
    from promptttspp_tpu.models.frame_prior import FramePriorNetwork
    from promptttspp_tpu.models.variance_adaptor import (
        MDNPredictor, PitchEmb, Predictor, VarianceAdaptor)

    sd, io = load_golden("variance_adaptor")
    C = 48
    va = VarianceAdaptor(
        duration_predictor=MDNPredictor(
            channels=C, out_channels=1, kernel_size=3, dropout=0.5,
            num_layers=2, num_gaussians=4, dim_wise=True, detach=True,
            disable_amp=True),
        pitch_predictor=Predictor(
            channels=C, out_channels=2, kernel_size=5, dropout=0.5,
            num_layers=5, detach=False),
        pitch_emb=PitchEmb(1, C, 1),
        frame_prior_network=FramePriorNetwork(
            out_channels=C, hidden_channels=C, n_layers=3, kernel_size=17,
            p_dropout=0.1),
    )
    x = jnp.asarray(io["x"]).transpose(0, 2, 1)  # [B, Tp, C]
    plens = io["plens"]
    pmask = jnp.arange(x.shape[1])[None] < jnp.asarray(plens)[:, None]
    durs = jnp.asarray(io["durs"])
    Tf = io["log_cf0"].shape[-1]
    fmask = jnp.arange(Tf)[None] < jnp.asarray(io["flens"])[:, None]
    log_cf0 = jnp.asarray(io["log_cf0"]).transpose(0, 2, 1)
    vuv = jnp.asarray(io["vuv"]).transpose(0, 2, 1)

    variables = va.init(jax.random.PRNGKey(0), x, pmask, fmask, durs,
                        log_cf0, vuv)
    variables = {"params": convert_tree(variables["params"], sd)}

    out, mdn_out, log_cf0_pred, vuv_pred, _ = va.apply(
        variables, x, pmask, fmask, durs, log_cf0, vuv)
    np.testing.assert_allclose(
        np.asarray(out), io["out"].transpose(0, 2, 1), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mdn_out[0]), io["dur_log_pi"], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(log_cf0_pred), io["log_cf0_pred"].transpose(0, 2, 1),
        atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(vuv_pred), io["vuv_pred"].transpose(0, 2, 1),
        atol=2e-5, rtol=1e-4)

    # batched inference parity: reference pads to its dynamic max frames
    Tf_inf = io["x_inf"].shape[-1]
    x_out, flens_out, fmask_out, _, _, raw_flens = va.apply(
        variables, x, pmask, Tf_inf, method=VarianceAdaptor.infer)
    ref_flens = io["fmask_inf"][:, 0, :].sum(-1)
    np.testing.assert_array_equal(np.asarray(flens_out), ref_flens)
    # no overflow in this fixture: unclipped duration sums == clipped
    np.testing.assert_array_equal(np.asarray(raw_flens),
                                  np.asarray(flens_out))
    ref_x = io["x_inf"].transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(x_out), ref_x, atol=3e-5, rtol=1e-4)
