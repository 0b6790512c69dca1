"""FULL-SIZE flagship parity vs the PyTorch reference (VERDICT r1 #5).

tests/test_model_parity.py proves composition parity at toy dims; this
test runs the REAL `prompttts_mdn_v2_wo_erg_final` configuration — 256-d
4-block conformer, BERT-base prompt encoder (12 layers, 768 hidden),
10-component style MDN, 512-channel GST reference encoder, 20-layer
256-channel DiffNet with the 100-step DDPM loop — against the torch
reference built live from `/root/reference` with seeded random weights
(a frozen golden would be a ~400 MB file; a live seeded build is
equivalent and stronger). HF pretrained BERT weights are not
downloadable here, so `BertModel.from_pretrained` is patched to a seeded
random-init `BertModel(BertConfig())` — exactly the bert-base
architecture, exercised through the same checkpoint converter
(`compat/torch_ckpt.convert_reference_checkpoint`) the serving path uses
for published checkpoints.

Asserts the VERDICT bounds: every loss term at atol 1e-4 and the
deterministic 100-step inference mel at atol 1e-3.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parent.parent
if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")

torch = pytest.importorskip("torch")

B, TP, L = 2, 16, 16
MEL = 80


class FakeTokenizerOutput(dict):
    def to(self, device):
        return self


class FakeTokenizer:
    """Deterministic stand-in for BertTokenizer.from_pretrained (no
    network): fixed ids/mask per batch size, incl. a padded row."""

    def __init__(self):
        rng = np.random.RandomState(123)
        self.ids = rng.randint(1000, 29000, size=(8, L)).astype(np.int64)
        self.ids[:, 0] = 101  # [CLS]
        self.lens = np.array([L, L - 4, L, L - 2, L, L, L - 1, L])
        for i, n in enumerate(self.lens):
            self.ids[i, n - 1] = 102  # [SEP]
            self.ids[i, n:] = 0

    def arrays(self, n):
        mask = (np.arange(L)[None] < self.lens[:n, None]).astype(np.int64)
        return self.ids[:n], mask

    def __call__(self, prompts, padding=True, return_tensors="pt"):
        ids, mask = self.arrays(len(prompts))
        return FakeTokenizerOutput(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            token_type_ids=torch.zeros_like(torch.from_numpy(ids)),
        )


@pytest.fixture(scope="module")
def torch_side():
    import promptttspp.modules.prompt_encoder as pe_mod
    from transformers import BertConfig as HFBertConfig, BertModel

    fake_tok = FakeTokenizer()

    def fake_bert(name):
        torch.manual_seed(7)
        return BertModel(HFBertConfig())

    orig_model, orig_tok = pe_mod.BertModel, pe_mod.BertTokenizer
    pe_mod.BertModel = type("M", (), {"from_pretrained":
                                      staticmethod(fake_bert)})
    pe_mod.BertTokenizer = type("T", (), {"from_pretrained":
                                          staticmethod(lambda n: fake_tok)})
    try:
        model = build_reference_model()
    finally:
        pe_mod.BertModel, pe_mod.BertTokenizer = orig_model, orig_tok
    return model, fake_tok


def build_reference_model():
    import torch.nn as nn
    from promptttspp.layers.embedding import PhonemeEmbedding
    from promptttspp.models.prompttts_mdn_v2_final.model import (
        PromptTTSMDNDurCFG)
    from promptttspp.modules.denoiser import DiffNet
    from promptttspp.modules.diffusion import GaussianDiffusion
    from promptttspp.modules.esp import ConformerEncoder
    from promptttspp.modules.frame_prior import FramePriorNetwork
    from promptttspp.modules.mdn import MDNLayer
    from promptttspp.modules.prompt_encoder import PromptEncoder
    from promptttspp.modules.style_encoder import StyleEncoder
    from promptttspp.modules.variance_adaptor import (MDNPredictor,
                                                      Predictor,
                                                      VarianceAdaptor)

    torch.manual_seed(11)
    C = 256
    return PromptTTSMDNDurCFG(
        phoneme_embedding=PhonemeEmbedding(90, C, do_scale=False,
                                           init_normal=False),
        encoder=ConformerEncoder(
            idim=C, attention_dim=C, attention_heads=2, linear_units=1024,
            num_blocks=4, positionwise_layer_type="conv1d",
            positionwise_conv_kernel_size=9, dropout_rate=0.2,
            pos_enc_layer_type="rel_pos",
            selfattention_layer_type="rel_selfattn", activation_type="swish",
            macaron_style=True, use_cnn_module=True, cnn_module_kernel=7,
            rel_pos_type="new"),
        variance_adaptor=VarianceAdaptor(
            duration_predictor=MDNPredictor(
                channels=C, out_channels=1, kernel_size=3, dropout=0.5,
                num_layers=2, num_gaussians=4, dim_wise=True, detach=True,
                disable_amp=True),
            pitch_predictor=Predictor(
                channels=C, out_channels=2, kernel_size=5, dropout=0.5,
                num_layers=5, detach=False),
            pitch_emb=nn.Conv1d(1, C, 1),
            frame_prior_network=FramePriorNetwork(
                out_channels=C, hidden_channels=C, n_layers=6,
                kernel_size=17, p_dropout=0.1)),
        reference_encoder=StyleEncoder(
            idim=MEL, gst_tokens=10, gst_heads=4, conv_layers=6,
            conv_chans_list=(128, 128, 256, 256, 512, 512),
            conv_kernel_size=3, conv_stride=2, gru_layers=1, gru_units=C,
            gst_token_dim=C),
        prompt_encoder=PromptEncoder(
            model_name="bert-base-uncased", in_channels=768,
            mid_channels=512, out_channels=C),
        style_mdn=MDNLayer(in_dim=C, out_dim=C, num_gaussians=10,
                           dim_wise=True),
        decoder=GaussianDiffusion(
            in_dim=C, out_dim=MEL,
            denoise_fn=DiffNet(in_dim=MEL, encoder_hidden_dim=C,
                               residual_layers=20, residual_channels=256,
                               kernel_size=3, dilation_cycle_length=4),
            K_step=100, schedule_type="linear", norm_scale=6.0),
        norm_style_emb=True,
        mdn_disable_amp=True,
    ).eval()


def make_io(seed=20):
    rng = np.random.RandomState(seed)
    plens = np.array([TP, TP - 5], np.int64)
    pmask = np.arange(TP)[None] < plens[:, None]
    phoneme = (rng.randint(1, 90, size=(B, TP)) * pmask).astype(np.int64)
    durs = (rng.randint(1, 5, size=(B, TP)) * pmask).astype(np.int64)
    flens = durs.sum(1)
    Tf = int(flens.max())
    fmask = np.arange(Tf)[None] < flens[:, None]
    mel = (rng.randn(B, MEL, Tf) * fmask[:, None, :]).astype(np.float32)
    log_cf0 = (rng.randn(B, 1, Tf) * fmask[:, None, :]).astype(np.float32)
    vuv = ((rng.rand(B, 1, Tf) > 0.3) * fmask[:, None, :]).astype(np.float32)
    t_fixed = np.array([13, 77], np.int64)
    diff_noise = rng.randn(B, MEL, Tf).astype(np.float32)
    return dict(phoneme=phoneme, plens=plens, durs=durs, flens=flens,
                mel=mel, log_cf0=log_cf0, vuv=vuv, t_fixed=t_fixed,
                diff_noise=diff_noise)


@pytest.fixture(scope="module")
def torch_outputs(torch_side):
    model, fake_tok = torch_side
    io = make_io()
    orig_randint, orig_randn_like = torch.randint, torch.randn_like
    torch.randint = lambda *a, **k: torch.from_numpy(io["t_fixed"])
    torch.randn_like = lambda x: torch.from_numpy(io["diff_noise"])
    try:
        with torch.no_grad():
            losses = model((
                torch.from_numpy(io["phoneme"]),
                torch.from_numpy(io["durs"])[:, None, :].float(),
                torch.from_numpy(io["plens"]),
                torch.from_numpy(io["mel"]),
                torch.from_numpy(io["log_cf0"]),
                torch.from_numpy(io["vuv"]),
                None,
                torch.from_numpy(io["flens"]),
                ["prompt one", "prompt two"],
            ))
    finally:
        torch.randint, torch.randn_like = orig_randint, orig_randn_like

    # deterministic inference (mirrors gen_goldens.gen_model): max-style
    # MDN component, zero diffusion noise, fixed x_T
    with torch.no_grad():
        import torch.nn.functional as F
        from promptttspp.utils.model import sequence_mask as t_seqmask

        style_x = model.prompt_encoder(["prompt one", "prompt two"], "cpu")
        style_x = F.normalize(style_x, dim=1)
        log_pi, log_sigma, mu = model.style_mdn(
            style_x.transpose(-1, -2))
        style_emb = model.sample_style_emb(log_pi, log_sigma, mu,
                                           noise_scale=0.0, use_max=True)
        phone_mask_t = t_seqmask(
            torch.from_numpy(io["plens"])).unsqueeze(1).float()
        xh = model.phoneme_emb(torch.from_numpy(io["phoneme"]),
                               phone_mask_t)
        xh = model.encoder(xh.transpose(1, 2),
                           torch.from_numpy(io["plens"]))
        xh = xh.transpose(1, 2) + style_emb
        xh, frame_mask_t = model.variance_adaptor.infer_batch(
            xh, phone_mask_t, return_f0=False)
        inf_flens = frame_mask_t.sum(dim=(1, 2)).long()
        Tf_inf = xh.shape[-1]
        rng = np.random.RandomState(30)
        x_T = rng.randn(B, MEL, Tf_inf).astype(np.float32)
        xs = torch.from_numpy(x_T)
        zeros = lambda *shape, device=None: torch.zeros(shape, device=device)
        for i in reversed(range(100)):
            xs = model.decoder.p_sample(
                xs, torch.full((B,), i, dtype=torch.long), xh,
                noise_fn=zeros)
        mel_out = model.decoder._denorm(
            xs.transpose(1, 2)).transpose(-1, -2) * frame_mask_t

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return io, {k: float(v) for k, v in losses.items()}, dict(
        mel_out=mel_out.numpy(), inf_flens=inf_flens.numpy(), x_T=x_T,
    ), sd, fake_tok


@pytest.fixture(scope="module")
def jax_side(torch_outputs):
    from promptttspp_tpu.compat.torch_ckpt import (
        convert_reference_checkpoint)
    from promptttspp_tpu.config import compose

    io, t_losses, t_infer, sd, fake_tok = torch_outputs
    cfg = compose(REPO / "conf", "train")
    import promptttspp_tpu.models  # noqa: F401

    from promptttspp_tpu.config import instantiate

    model = instantiate(cfg.model)
    variables = convert_reference_checkpoint("model", sd, cfg)
    return model, variables, io, t_losses, t_infer, fake_tok


@pytest.mark.slow
def test_full_size_losses(jax_side):
    model, variables, io, t_losses, _, fake_tok = jax_side
    ids, mask = fake_tok.arrays(B)
    batch = dict(
        phoneme=jnp.asarray(io["phoneme"].astype(np.int32)),
        duration=jnp.asarray(io["durs"].astype(np.int32)),
        phone_lengths=jnp.asarray(io["plens"].astype(np.int32)),
        mel=jnp.asarray(io["mel"].transpose(0, 2, 1)),
        log_cf0=jnp.asarray(io["log_cf0"].transpose(0, 2, 1)),
        vuv=jnp.asarray(io["vuv"].transpose(0, 2, 1)),
        frame_lengths=jnp.asarray(io["flens"].astype(np.int32)),
        prompt_ids=jnp.asarray(ids.astype(np.int32)),
        prompt_mask=jnp.asarray(mask.astype(np.int32)),
        diffusion_t=jnp.asarray(io["t_fixed"].astype(np.int32)),
        diffusion_noise=jnp.asarray(io["diff_noise"].transpose(0, 2, 1)),
    )
    losses = jax.jit(
        lambda v, b: model.apply(v, b, train=False))(variables, batch)
    for key, ref_key in [("loss", "loss"), ("dec", "dec"), ("dur", "dur"),
                         ("cf0", "cf0"), ("vuv", "vuv"), ("style", "style")]:
        np.testing.assert_allclose(
            float(losses[key]), t_losses[ref_key], atol=1e-4, rtol=1e-3,
            err_msg=key)


@pytest.mark.slow
def test_full_size_deterministic_infer(jax_side):
    model, variables, io, _, t_infer, fake_tok = jax_side
    ids, mask = fake_tok.arrays(B)
    max_frames = t_infer["mel_out"].shape[-1]
    mel, flens = jax.jit(
        lambda v, p, pl, pi, pm, xt: model.apply(
            v, p, pl, max_frames, prompt_ids=pi, prompt_mask=pm,
            use_max=True, noise_scale=0.0, x_T=xt, zero_noise=True,
            method=type(model).infer),
    )(variables, jnp.asarray(io["phoneme"].astype(np.int32)),
      jnp.asarray(io["plens"].astype(np.int32)),
      jnp.asarray(ids.astype(np.int32)), jnp.asarray(mask.astype(np.int32)),
      jnp.asarray(t_infer["x_T"].transpose(0, 2, 1)))
    np.testing.assert_array_equal(np.asarray(flens), t_infer["inf_flens"])
    ref = t_infer["mel_out"].transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(mel), ref, atol=1e-3, rtol=1e-3)
