"""End-to-end parity of the full PromptTTSMDNDurCFG model vs the PyTorch
reference (tiny config, stub prompt encoder; goldens from
scripts/gen_goldens.py::gen_model)."""

from pathlib import Path

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from promptttspp_tpu.compat.torch_ckpt import convert_tree

GOLDEN = Path(__file__).parent / "goldens" / "model.npz"

IO_KEYS = {
    "phoneme", "plens", "durs", "flens", "mel", "log_cf0", "vuv",
    "prompt_feat", "t_fixed", "diff_noise", "loss", "loss_dec", "loss_dur",
    "loss_cf0", "loss_vuv", "loss_style", "style_emb", "mel_out",
    "inf_flens", "x_T",
}

C, MEL = 48, 20


class StubPromptEncoder(nn.Module):
    """Mirrors the golden script's stub: Linear(8 -> C) on a feature vector."""

    @nn.compact
    def __call__(self, feat, unused_mask=None, train: bool = False):
        return nn.Dense(C, name="proj")(feat)[:, None, :]  # [B, 1, C]


def build_model(decoder):
    from promptttspp_tpu.models.frame_prior import FramePriorNetwork
    from promptttspp_tpu.models.phoneme_embedding import PhonemeEmbedding
    from promptttspp_tpu.models.prompttts import PromptTTSMDNDurCFG
    from promptttspp_tpu.models.style_encoder import StyleEncoder
    from promptttspp_tpu.models.variance_adaptor import (
        MDNPredictor, PitchEmb, Predictor, VarianceAdaptor)
    from promptttspp_tpu.nn.conformer import ConformerEncoder
    from promptttspp_tpu.nn.mdn import MDNLayer

    return PromptTTSMDNDurCFG(
        phoneme_embedding=PhonemeEmbedding(90, C, do_scale=False,
                                           init_normal=False),
        encoder=ConformerEncoder(
            idim=C, attention_dim=C, attention_heads=2, linear_units=96,
            num_blocks=2, positionwise_layer_type="conv1d",
            positionwise_conv_kernel_size=9, dropout_rate=0.0,
            pos_enc_layer_type="rel_pos",
            selfattention_layer_type="rel_selfattn", macaron_style=True,
            use_cnn_module=True, cnn_module_kernel=7, rel_pos_type="new"),
        variance_adaptor=VarianceAdaptor(
            duration_predictor=MDNPredictor(
                channels=C, out_channels=1, kernel_size=3, dropout=0.0,
                num_layers=2, num_gaussians=4, dim_wise=True, detach=True,
                disable_amp=True),
            pitch_predictor=Predictor(
                channels=C, out_channels=2, kernel_size=5, dropout=0.0,
                num_layers=5, detach=False),
            pitch_emb=PitchEmb(1, C, 1),
            frame_prior_network=FramePriorNetwork(
                out_channels=C, hidden_channels=C, n_layers=3,
                kernel_size=17, p_dropout=0.0)),
        reference_encoder=StyleEncoder(
            idim=MEL, gst_tokens=10, gst_heads=4, conv_layers=6,
            conv_chans_list=(4, 4, 8, 8, 16, 16), conv_kernel_size=3,
            conv_stride=2, gru_layers=1, gru_units=C, gst_token_dim=C),
        prompt_encoder=StubPromptEncoder(),
        style_mdn=MDNLayer(in_dim=C, out_dim=C, num_gaussians=4,
                           dim_wise=True),
        decoder=decoder,
        norm_style_emb=True,
        mdn_disable_amp=True,
    )


@pytest.fixture(scope="module")
def model_and_vars():
    from promptttspp_tpu.models.diffusion import DiffNet, GaussianDiffusion

    data = dict(np.load(GOLDEN))
    sd = {k: v for k, v in data.items() if k not in IO_KEYS}
    io = {k: v for k, v in data.items() if k in IO_KEYS}

    model = build_model(GaussianDiffusion(
        in_dim=C, out_dim=MEL,
        denoise_fn=DiffNet(in_dim=MEL, encoder_hidden_dim=C,
                           residual_layers=4, residual_channels=32,
                           kernel_size=3, dilation_cycle_length=4),
        K_step=100, schedule_type="linear", norm_scale=6.0))

    batch = make_batch(io)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        batch)
    params = convert_tree(
        variables["params"], sd,
        rename={"phoneme_embedding.emb": "phoneme_emb.emb"})
    converted = {"params": params}
    if "batch_stats" in variables:
        converted["batch_stats"] = convert_tree(
            variables["batch_stats"], sd, "batch_stats",
            rename={"phoneme_embedding.emb": "phoneme_emb.emb"})
    return model, converted, io


def make_batch(io):
    return dict(
        phoneme=jnp.asarray(io["phoneme"].astype(np.int32)),
        duration=jnp.asarray(io["durs"].astype(np.int32)),
        phone_lengths=jnp.asarray(io["plens"].astype(np.int32)),
        mel=jnp.asarray(io["mel"].transpose(0, 2, 1)),
        log_cf0=jnp.asarray(io["log_cf0"].transpose(0, 2, 1)),
        vuv=jnp.asarray(io["vuv"].transpose(0, 2, 1)),
        frame_lengths=jnp.asarray(io["flens"].astype(np.int32)),
        prompt_ids=jnp.asarray(io["prompt_feat"]),
        prompt_mask=None,
        diffusion_t=jnp.asarray(io["t_fixed"].astype(np.int32)),
        diffusion_noise=jnp.asarray(io["diff_noise"].transpose(0, 2, 1)),
    )


def test_forward_losses(model_and_vars):
    model, variables, io = model_and_vars
    losses = model.apply(variables, make_batch(io))
    for key, ref_key in [("loss", "loss"), ("dec", "loss_dec"),
                         ("dur", "loss_dur"), ("cf0", "loss_cf0"),
                         ("vuv", "loss_vuv"), ("style", "loss_style")]:
        np.testing.assert_allclose(
            float(losses[key]), float(io[ref_key]), atol=1e-4, rtol=1e-3,
            err_msg=key)


def test_infer_parity(model_and_vars):
    model, variables, io = model_and_vars
    max_frames = io["mel_out"].shape[-1]
    mel, flens = model.apply(
        variables,
        jnp.asarray(io["phoneme"].astype(np.int32)),
        jnp.asarray(io["plens"].astype(np.int32)),
        max_frames,
        prompt_ids=jnp.asarray(io["prompt_feat"]),
        prompt_mask=None,
        use_max=True, noise_scale=0.0,
        x_T=jnp.asarray(io["x_T"].transpose(0, 2, 1)),
        zero_noise=True,
        method=type(model).infer,
    )
    np.testing.assert_array_equal(np.asarray(flens), io["inf_flens"])
    ref = io["mel_out"].transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(mel), ref, atol=1e-3, rtol=1e-3)
