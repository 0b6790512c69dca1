"""Generate numerical-parity goldens from the PyTorch reference.

Runs reference modules (imported from /root/reference, torch CPU) on fixed
seeded inputs with small configs, and saves (state_dict, inputs, outputs)
into tests/goldens/*.npz. Tests then convert the saved state_dict through
promptttspp_tpu.compat.torch_ckpt into our flax modules and compare
outputs — one test per module exercises both numerics and the checkpoint
converter.

Usage: python scripts/gen_goldens.py  (regenerates all goldens)
"""

import sys
from pathlib import Path

import numpy as np
import torch

sys.path.insert(0, "/root/reference")

OUT = Path(__file__).resolve().parent.parent / "tests" / "goldens"
OUT.mkdir(parents=True, exist_ok=True)

torch.manual_seed(0)


def sd_to_np(module, prefix=""):
    return {
        f"{prefix}{k}": v.detach().numpy()
        for k, v in module.state_dict().items()
    }


def save(name, **arrays):
    np.savez_compressed(OUT / f"{name}.npz", **arrays)
    total = sum(a.size * a.itemsize for a in arrays.values()) / 1e6
    print(f"{name}: {len(arrays)} arrays, {total:.2f} MB raw")


# ---------------------------------------------------------------- conformer
def gen_conformer():
    from promptttspp.modules.esp import ConformerEncoder

    for variant in ("new", "legacy"):
        torch.manual_seed(42)
        enc = ConformerEncoder(
            idim=64, attention_dim=64, attention_heads=2, linear_units=128,
            num_blocks=2, positionwise_layer_type="conv1d",
            positionwise_conv_kernel_size=9, dropout_rate=0.0,
            pos_enc_layer_type="rel_pos", selfattention_layer_type="rel_selfattn",
            activation_type="swish", macaron_style=True, use_cnn_module=True,
            cnn_module_kernel=7, rel_pos_type=variant,
        ).eval()
        rng = np.random.RandomState(1)
        x = rng.randn(3, 17, 64).astype(np.float32)
        lens = np.array([17, 11, 5], np.int64)
        with torch.no_grad():
            out = enc(torch.from_numpy(x), torch.from_numpy(lens))
        save(f"conformer_{variant}", x=x, lens=lens, out=out.numpy(),
             **sd_to_np(enc))


# ---------------------------------------------------------------- mdn
def gen_mdn():
    from promptttspp.modules.mdn import (
        MDNLayer, mdn_loss, mdn_get_most_probable_sigma_and_mu)

    torch.manual_seed(7)
    layer = MDNLayer(in_dim=32, out_dim=1, num_gaussians=4, dim_wise=True).eval()
    rng = np.random.RandomState(2)
    x = rng.randn(2, 9, 32).astype(np.float32)
    target = rng.randn(2, 9, 1).astype(np.float32)
    mask = (np.arange(9)[None, :] < np.array([[9], [6]])).astype(bool)[..., None]
    with torch.no_grad():
        log_pi, log_sigma, mu = layer(torch.from_numpy(x))
        loss = mdn_loss(log_pi, log_sigma, mu, torch.from_numpy(target),
                        reduce=False, mask=torch.from_numpy(mask))
        sigma_max, mu_max = mdn_get_most_probable_sigma_and_mu(
            log_pi, log_sigma, mu)
    save("mdn", x=x, target=target, mask=mask,
         log_pi=log_pi.numpy(), log_sigma=log_sigma.numpy(), mu=mu.numpy(),
         loss=loss.numpy(), sigma_max=sigma_max.numpy(), mu_max=mu_max.numpy(),
         **sd_to_np(layer))


# ---------------------------------------------------------------- predictors
def gen_predictors():
    from promptttspp.modules.variance_adaptor import Predictor, MDNPredictor

    torch.manual_seed(3)
    pred = Predictor(channels=48, out_channels=2, kernel_size=5, dropout=0.5,
                     num_layers=5, detach=False).eval()
    rng = np.random.RandomState(3)
    x = rng.randn(2, 48, 13).astype(np.float32)  # torch layout [B, C, T]
    mask = (np.arange(13)[None, :] < np.array([[13], [8]])).astype(np.float32)
    mask_t = mask[:, None, :]  # [B, 1, T]
    with torch.no_grad():
        out = pred(torch.from_numpy(x), torch.from_numpy(mask_t))
    save("predictor", x=x, mask=mask, out=out.numpy(), **sd_to_np(pred))

    torch.manual_seed(4)
    mdnp = MDNPredictor(channels=48, out_channels=1, kernel_size=3, dropout=0.5,
                        num_layers=2, num_gaussians=4, dim_wise=True,
                        detach=True, disable_amp=True).eval()
    with torch.no_grad():
        log_pi, log_sigma, mu = mdnp(torch.from_numpy(x), torch.from_numpy(mask_t))
        log_dur = mdnp.infer(torch.from_numpy(x), torch.from_numpy(mask_t))
    save("mdn_predictor", x=x, mask=mask, log_pi=log_pi.numpy(),
         log_sigma=log_sigma.numpy(), mu=mu.numpy(), log_dur=log_dur.numpy(),
         **sd_to_np(mdnp))


# ---------------------------------------------------------------- frame prior
def gen_frame_prior():
    from promptttspp.modules.frame_prior import FramePriorNetwork

    torch.manual_seed(5)
    fpn = FramePriorNetwork(out_channels=64, hidden_channels=64, n_layers=6,
                            kernel_size=17, p_dropout=0.1).eval()
    rng = np.random.RandomState(5)
    x = rng.randn(2, 64, 29).astype(np.float32)
    mask = (np.arange(29)[None, :] < np.array([[29], [20]])).astype(np.float32)
    with torch.no_grad():
        out = fpn(torch.from_numpy(x), torch.from_numpy(mask[:, None, :]))
    save("frame_prior", x=x, mask=mask, out=out.numpy(), **sd_to_np(fpn))


# ---------------------------------------------------------------- style enc
def gen_style_encoder():
    from promptttspp.modules.style_encoder import StyleEncoder

    torch.manual_seed(6)
    se = StyleEncoder(idim=80, gst_tokens=10, gst_heads=4, conv_layers=6,
                      conv_chans_list=(8, 8, 16, 16, 32, 32),
                      conv_kernel_size=3, conv_stride=2, gru_layers=1,
                      gru_units=64, gst_token_dim=64).eval()
    rng = np.random.RandomState(6)
    mel = rng.randn(2, 80, 95).astype(np.float32)  # [B, idim, T]
    lens = np.array([95, 63], np.int64)
    with torch.no_grad():
        out = se(torch.from_numpy(mel), torch.from_numpy(lens))
    save("style_encoder", mel=mel, lens=lens, out=out.numpy(), **sd_to_np(se))


# ---------------------------------------------------------------- diffusion
def gen_diffusion():
    from promptttspp.modules.denoiser import DiffNet
    from promptttspp.modules.diffusion import GaussianDiffusion

    torch.manual_seed(8)
    net = DiffNet(in_dim=20, encoder_hidden_dim=48, residual_layers=4,
                  residual_channels=32, kernel_size=3, dilation_cycle_length=4)
    diff = GaussianDiffusion(in_dim=48, out_dim=20, denoise_fn=net,
                             K_step=100, schedule_type="linear",
                             norm_scale=6.0).eval()
    rng = np.random.RandomState(8)
    B, T = 2, 25
    x = rng.randn(B, 20, T).astype(np.float32)      # noisy mel, torch layout
    cond = rng.randn(B, 48, T).astype(np.float32)
    t = np.array([7, 93], np.int64)
    y = rng.randn(B, T, 20).astype(np.float32)      # [B, T, C] target
    noise = rng.randn(B, 20, T).astype(np.float32)
    x_T = rng.randn(B, 20, T).astype(np.float32)
    with torch.no_grad():
        eps = net(torch.from_numpy(x), torch.from_numpy(t),
                  torch.from_numpy(cond))
        # training path with fixed t/noise: replicate forward internals
        xn = diff._norm(torch.from_numpy(y)).transpose(1, 2)
        x_noisy = diff.q_sample(xn, torch.from_numpy(t), torch.from_numpy(noise))
        eps_pred = net(x_noisy, torch.from_numpy(t), torch.from_numpy(cond))
        # zero-noise ancestral loop from fixed x_T
        xs = torch.from_numpy(x_T)
        zeros = lambda *shape, device=None: torch.zeros(shape, device=device)
        for i in reversed(range(100)):
            xs = diff.p_sample(xs, torch.full((B,), i, dtype=torch.long),
                               torch.from_numpy(cond), noise_fn=zeros)
        mel_out = diff._denorm(xs.transpose(1, 2))
    save("diffusion", x=x, cond=cond, t=t, y=y, noise=noise, x_T=x_T,
         eps=eps.numpy(), x_noisy=x_noisy.numpy(), eps_pred=eps_pred.numpy(),
         mel_out=mel_out.numpy(), **sd_to_np(net, prefix="denoise_fn."))


# ---------------------------------------------------------------- variance adaptor
def gen_variance_adaptor():
    from promptttspp.modules.variance_adaptor import (
        VarianceAdaptor, Predictor, MDNPredictor)
    from promptttspp.modules.frame_prior import FramePriorNetwork
    import torch.nn as nn

    torch.manual_seed(9)
    C = 48
    va = VarianceAdaptor(
        duration_predictor=MDNPredictor(
            channels=C, out_channels=1, kernel_size=3, dropout=0.5,
            num_layers=2, num_gaussians=4, dim_wise=True, detach=True,
            disable_amp=True),
        pitch_predictor=Predictor(
            channels=C, out_channels=2, kernel_size=5, dropout=0.5,
            num_layers=5, detach=False),
        pitch_emb=nn.Conv1d(1, C, 1),
        frame_prior_network=FramePriorNetwork(
            out_channels=C, hidden_channels=C, n_layers=3, kernel_size=17,
            p_dropout=0.1),
    ).eval()

    rng = np.random.RandomState(9)
    B, Tp = 2, 11
    plens = np.array([11, 7], np.int64)
    pmask = (np.arange(Tp)[None] < plens[:, None])
    durs = (rng.randint(1, 5, size=(B, Tp)) * pmask).astype(np.int64)
    Tf = int(durs.sum(1).max())
    flens = durs.sum(1)
    fmask = (np.arange(Tf)[None] < flens[:, None])
    x = (rng.randn(B, C, Tp) * pmask[:, None, :]).astype(np.float32)
    log_cf0 = (rng.randn(B, 1, Tf) * fmask[:, None, :]).astype(np.float32)
    vuv = (rng.rand(B, 1, Tf) > 0.3).astype(np.float32) * fmask[:, None, :]
    vuv = vuv.astype(np.float32)

    with torch.no_grad():
        out, log_dur_pred, log_cf0_pred, vuv_pred, _ = va(
            torch.from_numpy(x),
            torch.from_numpy(pmask.astype(np.float32))[:, None, :],
            torch.from_numpy(fmask.astype(np.float32))[:, None, :],
            torch.from_numpy(durs)[:, None, :].float(),
            torch.from_numpy(log_cf0),
            torch.from_numpy(vuv),
            None,
        )
        x_inf, fmask_inf = va.infer_batch(
            torch.from_numpy(x),
            torch.from_numpy(pmask.astype(np.float32))[:, None, :],
        )
    save("variance_adaptor", x=x, plens=plens, durs=durs, flens=flens,
         log_cf0=log_cf0, vuv=vuv, out=out.numpy(),
         dur_log_pi=log_dur_pred[0].numpy(),
         dur_log_sigma=log_dur_pred[1].numpy(), dur_mu=log_dur_pred[2].numpy(),
         log_cf0_pred=log_cf0_pred.numpy(), vuv_pred=vuv_pred.numpy(),
         x_inf=x_inf.numpy(), fmask_inf=fmask_inf.numpy(), **sd_to_np(va))


# ---------------------------------------------------------------- top model
def gen_model():
    """Full PromptTTSMDNDurCFG on a tiny config, with a stub prompt encoder
    (our BERT is parity-tested separately against transformers)."""
    import torch.nn as nn
    from promptttspp.models.prompttts_mdn_v2_final.model import PromptTTSMDNDurCFG
    from promptttspp.layers.embedding import PhonemeEmbedding
    from promptttspp.modules.esp import ConformerEncoder
    from promptttspp.modules.variance_adaptor import (
        VarianceAdaptor, Predictor, MDNPredictor)
    from promptttspp.modules.frame_prior import FramePriorNetwork
    from promptttspp.modules.style_encoder import StyleEncoder
    from promptttspp.modules.mdn import MDNLayer
    from promptttspp.modules.denoiser import DiffNet
    from promptttspp.modules.diffusion import GaussianDiffusion

    C, MEL = 48, 20

    class StubPromptEncoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.proj = nn.Linear(8, C)

        def forward(self, prompts, device):
            x = torch.from_numpy(np.asarray(prompts, np.float32))
            return self.proj(x).unsqueeze(-1)  # [B, C, 1]

    torch.manual_seed(10)
    model = PromptTTSMDNDurCFG(
        phoneme_embedding=PhonemeEmbedding(90, C, do_scale=False,
                                           init_normal=False),
        encoder=ConformerEncoder(
            idim=C, attention_dim=C, attention_heads=2, linear_units=96,
            num_blocks=2, positionwise_layer_type="conv1d",
            positionwise_conv_kernel_size=9, dropout_rate=0.0,
            pos_enc_layer_type="rel_pos",
            selfattention_layer_type="rel_selfattn", activation_type="swish",
            macaron_style=True, use_cnn_module=True, cnn_module_kernel=7,
            rel_pos_type="new"),
        variance_adaptor=VarianceAdaptor(
            duration_predictor=MDNPredictor(
                channels=C, out_channels=1, kernel_size=3, dropout=0.0,
                num_layers=2, num_gaussians=4, dim_wise=True, detach=True,
                disable_amp=True),
            pitch_predictor=Predictor(
                channels=C, out_channels=2, kernel_size=5, dropout=0.0,
                num_layers=5, detach=False),
            pitch_emb=nn.Conv1d(1, C, 1),
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
        decoder=GaussianDiffusion(
            in_dim=C, out_dim=MEL,
            denoise_fn=DiffNet(in_dim=MEL, encoder_hidden_dim=C,
                               residual_layers=4, residual_channels=32,
                               kernel_size=3, dilation_cycle_length=4),
            K_step=100, schedule_type="linear", norm_scale=6.0),
        norm_style_emb=True,
        mdn_disable_amp=True,
    ).eval()

    rng = np.random.RandomState(10)
    B, Tp = 2, 9
    plens = np.array([9, 6], np.int64)
    pmask = np.arange(Tp)[None] < plens[:, None]
    phoneme = (rng.randint(1, 90, size=(B, Tp)) * pmask).astype(np.int64)
    durs = (rng.randint(1, 4, size=(B, Tp)) * pmask).astype(np.int64)
    flens = durs.sum(1)
    Tf = int(flens.max())
    fmask = np.arange(Tf)[None] < flens[:, None]
    mel = (rng.randn(B, MEL, Tf) * fmask[:, None, :]).astype(np.float32)
    log_cf0 = (rng.randn(B, 1, Tf) * fmask[:, None, :]).astype(np.float32)
    vuv = ((rng.rand(B, 1, Tf) > 0.3) * fmask[:, None, :]).astype(np.float32)
    prompt_feat = rng.randn(B, 8).astype(np.float32)
    t_fixed = np.array([13, 77], np.int64)
    diff_noise = rng.randn(B, MEL, Tf).astype(np.float32)  # torch layout

    orig_randint, orig_randn_like = torch.randint, torch.randn_like
    torch.randint = lambda *a, **k: torch.from_numpy(t_fixed)
    torch.randn_like = lambda x: torch.from_numpy(diff_noise)
    try:
        with torch.no_grad():
            batch = (
                torch.from_numpy(phoneme),
                torch.from_numpy(durs)[:, None, :].float(),
                torch.from_numpy(plens),
                torch.from_numpy(mel),
                torch.from_numpy(log_cf0),
                torch.from_numpy(vuv),
                None,
                torch.from_numpy(flens),
                prompt_feat,
            )
            losses = model(batch)
    finally:
        torch.randint, torch.randn_like = orig_randint, orig_randn_like

    # deterministic batched inference: fixed x_T, zero noise in p_sample
    with torch.no_grad():
        style_x = model.prompt_encoder(prompt_feat, "cpu")
        import torch.nn.functional as F
        style_x = F.normalize(style_x, dim=1)
        log_pi, log_sigma, mu = model.style_mdn(style_x.transpose(-1, -2))
        style_emb = model.sample_style_emb(log_pi, log_sigma, mu,
                                           noise_scale=0.0, use_max=True)
        # replicate infer_batch (`model.py:261-325`) with explicit zero
        # noise in the ancestral loop (p_sample's noise_fn default binds
        # torch.randn at definition time, so patching doesn't reach it)
        from promptttspp.utils.model import sequence_mask as t_seqmask

        phone_mask_t = t_seqmask(torch.from_numpy(plens)).unsqueeze(1).float()
        xh = model.phoneme_emb(torch.from_numpy(phoneme), phone_mask_t)
        xh = model.encoder(xh.transpose(1, 2), torch.from_numpy(plens))
        xh = xh.transpose(1, 2)
        xh = xh + style_emb  # [B, C, 1] broadcast
        xh, frame_mask_t = model.variance_adaptor.infer_batch(
            xh, phone_mask_t, return_f0=False)
        inf_flens = frame_mask_t.sum(dim=(1, 2)).long()

        cond_t = xh  # [B, C, Tf]
        Tf_inf = cond_t.shape[-1]
        x_T = rng.randn(B, MEL, Tf_inf).astype(np.float32)
        xs = torch.from_numpy(x_T)
        zeros = lambda *shape, device=None: torch.zeros(shape, device=device)
        for i in reversed(range(100)):
            xs = model.decoder.p_sample(
                xs, torch.full((B,), i, dtype=torch.long), cond_t,
                noise_fn=zeros)
        mel_out = model.decoder._denorm(xs.transpose(1, 2)).transpose(-1, -2)
        mel_out = mel_out * frame_mask_t

    save(
        "model", phoneme=phoneme, plens=plens, durs=durs, flens=flens,
        mel=mel, log_cf0=log_cf0, vuv=vuv, prompt_feat=prompt_feat,
        t_fixed=t_fixed, diff_noise=diff_noise,
        loss=np.float32(losses["loss"].item()),
        loss_dec=np.float32(losses["dec"].item()),
        loss_dur=np.float32(losses["dur"].item()),
        loss_cf0=np.float32(losses["cf0"].item()),
        loss_vuv=np.float32(losses["vuv"].item()),
        loss_style=np.float32(losses["style"].item()),
        style_emb=style_emb.numpy(),
        mel_out=mel_out.numpy(), inf_flens=inf_flens.numpy(),
        x_T=x_T,
        **sd_to_np(model),
    )




# ---------------------------------------------------------------- vocoder
def gen_vocoder():
    from promptttspp.vocoders.bigvgan import BigVGAN
    from promptttspp.vocoders.bigvgan_f0 import F0AwareBigVGAN

    torch.manual_seed(12)
    bv = BigVGAN(in_channel=20, upsample_initial_channel=32,
                 upsample_rates=[6, 5, 4, 2],
                 upsample_kernel_sizes=[12, 10, 8, 4],
                 resblock_kernel_sizes=[3, 7],
                 resblock_dilations=[[1, 3], [1, 3]]).eval()
    rng = np.random.RandomState(12)
    mel = rng.randn(1, 20, 13).astype(np.float32)
    with torch.no_grad():
        wav = bv(torch.from_numpy(mel))
    save("bigvgan", mel=mel, wav=wav.numpy(), **sd_to_np(bv))

    torch.manual_seed(13)
    fbv = F0AwareBigVGAN(sampling_rate=24000, harmonic_num=3, in_channel=20,
                         upsample_initial_channel=32,
                         upsample_rates=[6, 5, 4, 2],
                         upsample_kernel_sizes=[12, 10, 8, 4],
                         resblock_kernel_sizes=[3, 7],
                         resblock_dilations=[[1, 3], [1, 3]]).eval()
    f0 = np.zeros((1, 1, 13), np.float32)
    f0[0, 0, 3:11] = 180.0
    orig_rand, orig_randn_like = torch.rand, torch.randn_like
    torch.rand = lambda *a, **k: torch.zeros(a if not isinstance(a[0], (list, tuple)) else a[0], **{kk: vv for kk, vv in k.items() if kk != 'device'})
    torch.randn_like = lambda x: torch.zeros_like(x)
    try:
        with torch.no_grad():
            wav_f0 = fbv(torch.from_numpy(mel), torch.from_numpy(f0))
    finally:
        torch.rand, torch.randn_like = orig_rand, orig_randn_like
    save("bigvgan_f0", mel=mel, f0=f0, wav=wav_f0.numpy(), **sd_to_np(fbv))



# ---------------------------------------------------------------- nnsvs CFG
def gen_nnsvs():
    from promptttspp.modules.nnsvs.denoiser import DiffNet as DiffNetG
    from promptttspp.modules.nnsvs.diffusion import GaussianDiffusion as GD

    torch.manual_seed(14)
    net = DiffNetG(in_dim=12, encoder_hidden_dim=24, residual_layers=3,
                   residual_channels=16, dilation_cycle_length=2,
                   gin_channels=8, g_proj_dim=16, g_dropout=0.0,
                   cond_norm=True, time_varying_emb=False)
    diff = GD(in_dim=24, out_dim=12, denoise_fn=net, K_step=20,
              schedule_type="linear", norm_scale=6.0,
              do_classifier_free_guidance=True, guidance_scale=2.0,
              clip_denoised=True).eval()
    rng = np.random.RandomState(14)
    B, T = 2, 9
    cond = rng.randn(B, 24, T).astype(np.float32)          # torch [B,H,T]
    g = rng.randn(B, 1, 8).astype(np.float32)
    y = rng.randn(B, T, 12).astype(np.float32)             # [B,T,C]
    t = np.array([3, 17], np.int64)
    noise = rng.randn(B, 1, 12, T).astype(np.float32)      # [B,1,M,T]
    x_T = rng.randn(B, 1, 12, T).astype(np.float32)

    with torch.no_grad():
        # training internals with fixed t/noise
        x_start = diff._norm(torch.from_numpy(y), diff.norm_scale)
        x_start = x_start.transpose(1, 2)[:, None, :, :]
        x_noisy = diff.q_sample(x_start, torch.from_numpy(t),
                                torch.from_numpy(noise))
        model_out = net(x_noisy, torch.from_numpy(t),
                        torch.from_numpy(cond), g=torch.from_numpy(g))
        # zero-noise ancestral loop with CFG
        xs = torch.from_numpy(x_T)
        zeros = lambda *shape, device=None: torch.zeros(shape, device=device)
        for i in reversed(range(20)):
            xs = diff.p_sample(xs, torch.full((B,), i, dtype=torch.long),
                               torch.from_numpy(cond), noise_fn=zeros,
                               g=torch.from_numpy(g),
                               clip_denoised=True)
        mel_anc = diff._denorm(xs[:, 0].transpose(1, 2), diff.norm_scale)
        # PLMS loop interval 5
        from collections import deque
        diff.noise_list = deque(maxlen=4)
        xs = torch.from_numpy(x_T)
        for i in reversed(range(0, 20, 5)):
            xs = diff.p_sample_plms(xs, torch.full((B,), i, dtype=torch.long),
                                    5, torch.from_numpy(cond),
                                    g=torch.from_numpy(g))
        mel_plms = diff._denorm(xs[:, 0].transpose(1, 2), diff.norm_scale)
    save("nnsvs_cfg", cond=cond, g=g, y=y, t=t, noise=noise, x_T=x_T,
         model_out=model_out.numpy(), mel_anc=mel_anc.numpy(),
         mel_plms=mel_plms.numpy(), **sd_to_np(net, prefix="denoise_fn."))



# --------------------------------------------------- local conformer / vits
def gen_local_nets():
    from promptttspp.modules.conformer import Conformer as LocalConformer
    from promptttspp.modules.transformer import Transformer as VitsTransformer

    torch.manual_seed(15)
    conf = LocalConformer(num_layers=2, channels=32, num_head=2,
                          kernel_size=7, dropout=0.0, ffn_scale=4).eval()
    rng = np.random.RandomState(15)
    B, T = 2, 13
    x = rng.randn(B, T, 32).astype(np.float32)
    lens = np.array([13, 9])
    mask = (np.arange(T)[None] < lens[:, None]).astype(np.float32)
    g = rng.randn(B, 32, 1).astype(np.float32)
    with torch.no_grad():
        out = conf(torch.from_numpy(x), torch.from_numpy(mask[:, None, :]),
                   g=torch.from_numpy(g))
        out_nog = conf(torch.from_numpy(x),
                       torch.from_numpy(mask[:, None, :]))
    save("local_conformer", x=x, mask=mask, g=g, out=out.numpy(),
         out_nog=out_nog.numpy(), **sd_to_np(conf))

    torch.manual_seed(16)
    trans = VitsTransformer(channels=32, num_head=2, num_layers=2,
                            kernel_size=3, dropout=0.0, scale=4,
                            window_size=4, use_rel=True).eval()
    xt = rng.randn(B, 32, T).astype(np.float32)  # [B, C, T]
    with torch.no_grad():
        out_t = trans(torch.from_numpy(xt),
                      torch.from_numpy(mask[:, None, :]))
    trans2 = VitsTransformer(channels=32, num_head=2, num_layers=2,
                             kernel_size=3, dropout=0.0, scale=4,
                             use_rel=False).eval()
    torch.manual_seed(17)
    trans2 = VitsTransformer(channels=32, num_head=2, num_layers=2,
                             kernel_size=3, dropout=0.0, scale=4,
                             use_rel=False).eval()
    with torch.no_grad():
        out_abs = trans2(torch.from_numpy(xt),
                         torch.from_numpy(mask[:, None, :]))
    save("vits_transformer", x=xt, mask=mask, out=out_t.numpy(),
         out_abs=out_abs.numpy(),
         **sd_to_np(trans, prefix="rel."), **sd_to_np(trans2, prefix="abs."))



# ------------------------------------------------- convnext / mrf / unet / glow
def gen_aux_nets():
    from promptttspp.modules.convnext import ConvNeXt1d
    from promptttspp.modules.mrf import MRFNet
    from promptttspp.modules.unet import Unet1d
    from promptttspp.modules.glow import Glow

    rng = np.random.RandomState(18)
    B, T, C = 2, 12, 16
    mask = (np.arange(T)[None] < np.array([[12], [8]])).astype(np.float32)

    torch.manual_seed(18)
    cn = ConvNeXt1d(channels=C, h_channels=32, num_layers=2).eval()
    x = rng.randn(B, C, T).astype(np.float32)
    with torch.no_grad():
        out = cn(torch.from_numpy(x), torch.from_numpy(mask[:, None, :]))
    save("convnext", x=x, mask=mask, out=out.numpy(), **sd_to_np(cn))

    torch.manual_seed(19)
    mrf = MRFNet(in_channels=C, channels=C, out_channels=C,
                 kernel_sizes=[3, 7], dilations=[1, 3]).eval()
    g = rng.randn(B, C, 1).astype(np.float32)
    with torch.no_grad():
        out = mrf(torch.from_numpy(x), torch.from_numpy(mask[:, None, :]),
                  g=torch.from_numpy(g))
    save("mrf", x=x, mask=mask, g=g, out=out.numpy(), **sd_to_np(mrf))

    torch.manual_seed(20)
    un = Unet1d(in_channels=10, encoder_channels=14, out_channels=10,
                dim=16, dim_mults=(1, 2, 4)).eval()
    xu = rng.randn(B, 10, T).astype(np.float32)
    cond = rng.randn(B, 14, T).astype(np.float32)
    tt = np.array([5, 55], np.int64)
    with torch.no_grad():
        out = un(torch.from_numpy(xu), torch.from_numpy(tt),
                 torch.from_numpy(cond),
                 mask=torch.from_numpy(mask[:, None, :]))
    save("unet", x=xu, cond=cond, t=tt, mask=mask, out=out.numpy(),
         **sd_to_np(un))

    torch.manual_seed(21)
    gl = Glow(in_channels=C, channels=24, num_flows=2, n_blocks=2).eval()
    zx = rng.randn(B, C, 1).astype(np.float32)
    with torch.no_grad():
        zf, ld = gl(torch.from_numpy(zx))
        zr, ldr = gl.reverse(zf)
    save("glow", z=zx, zf=zf.numpy(), ld=np.float32(ld.item()),
         zr=zr.numpy(), **sd_to_np(gl))



# ------------------------------------------------------ light/dynamic conv
def gen_lightconv():
    from promptttspp.modules.esp.transformer.lightconv import (
        LightweightConvolution)
    from promptttspp.modules.esp.transformer.dynamic_conv import (
        DynamicConvolution)

    rng = np.random.RandomState(22)
    B, T, C, H = 2, 11, 16, 4
    x = rng.randn(B, T, C).astype(np.float32)
    lens = np.array([11, 7])
    mask = (np.arange(T)[None] < lens[:, None]).astype(np.float32)
    attn_mask = (mask[:, None, :] * mask[:, :, None])[:, :1, :]  # [B,1,T]

    torch.manual_seed(22)
    lc = LightweightConvolution(H, C, 0.0, "5", 0, use_kernel_mask=False,
                                use_bias=True).eval()
    with torch.no_grad():
        out_lc = lc(torch.from_numpy(x), None, None,
                    torch.from_numpy(attn_mask))
    torch.manual_seed(23)
    dc = DynamicConvolution(H, C, 0.0, "5", 0, use_kernel_mask=False,
                            use_bias=True).eval()
    with torch.no_grad():
        out_dc = dc(torch.from_numpy(x), None, None,
                    torch.from_numpy(attn_mask))
    save("lightconv", x=x, mask=mask, out_lc=out_lc.numpy(),
         out_dc=out_dc.numpy(),
         **sd_to_np(lc, prefix="lc."), **sd_to_np(dc, prefix="dc."))

def gen_decoder():
    from promptttspp.modules.esp.transformer.decoder import Decoder
    from promptttspp.modules.esp.transformer.mask import target_mask

    rng = np.random.RandomState(31)
    B, L, T, D, V = 2, 9, 13, 32, 20
    memory = rng.randn(B, T, D).astype(np.float32)
    mem_lens = np.array([13, 8])
    mem_mask = (np.arange(T)[None] < mem_lens[:, None])[:, None, :]  # [B,1,T]
    ys = rng.randint(1, V, size=(B, L)).astype(np.int64)
    ys[0, 7:] = -1  # trailing padding (ignore_id)
    ys[1, 5:] = -1
    tm = target_mask(torch.from_numpy(ys), -1)
    ys_clamped = np.where(ys == -1, 0, ys)

    for variant in ("selfattn", "lightconv2d", "dynamicconv2d"):
        torch.manual_seed(31)
        dec = Decoder(
            odim=V, selfattention_layer_type=variant, attention_dim=D,
            attention_heads=4, conv_wshare=4, conv_kernel_length="5_5",
            conv_usebias=True, linear_units=64, num_blocks=2,
            dropout_rate=0.0, positional_dropout_rate=0.0,
            self_attention_dropout_rate=0.0, src_attention_dropout_rate=0.0,
        ).eval()
        with torch.no_grad():
            out, _ = dec(torch.from_numpy(ys_clamped), tm,
                         torch.from_numpy(memory),
                         torch.from_numpy(mem_mask))
        extra = {}
        if variant == "selfattn":
            # incremental API golden: stepwise log-probs for sample 0
            cache = None
            steps = []
            from promptttspp.modules.esp.transformer.mask import (
                subsequent_mask)
            for t in range(1, 5):
                with torch.no_grad():
                    logp, cache = dec.forward_one_step(
                        torch.from_numpy(ys_clamped[:1, :t]),
                        subsequent_mask(t).unsqueeze(0),
                        torch.from_numpy(memory[:1]), cache=cache)
                steps.append(logp.numpy())
            extra["onestep"] = np.stack(steps)
        save(f"decoder_{variant}", ys=ys, memory=memory,
             mem_mask=mem_mask.astype(np.float32),
             tgt_mask=tm.numpy().astype(np.float32), out=out.numpy(),
             **extra, **sd_to_np(dec))


def gen_transformer_encoder():
    from promptttspp.modules.esp.transformer.encoder import Encoder

    rng = np.random.RandomState(37)
    B, T, F = 2, 23, 40
    x = rng.randn(B, T, F).astype(np.float32)
    lens = np.array([23, 15])
    mask = (np.arange(T)[None] < lens[:, None])[:, None, :]  # [B, 1, T]
    cases = {
        "conv2d": dict(input_layer="conv2d",
                       selfattention_layer_type="selfattn",
                       positionwise_layer_type="linear"),
        "linear_lightconv": dict(input_layer="linear",
                                 selfattention_layer_type="lightconv",
                                 conv_kernel_length="5_5",
                                 positionwise_layer_type="conv1d",
                                 positionwise_conv_kernel_size=3),
    }
    for name, kw in cases.items():
        torch.manual_seed(37)
        enc = Encoder(
            idim=F, attention_dim=32, attention_heads=4, linear_units=64,
            num_blocks=2, dropout_rate=0.0, positional_dropout_rate=0.0,
            attention_dropout_rate=0.0, conv_wshare=4, conv_usebias=True,
            **kw).eval()
        with torch.no_grad():
            out, m = enc(torch.from_numpy(x), torch.from_numpy(mask))
        save(f"trans_encoder_{name}", x=x, mask=mask.astype(np.float32),
             out=out.numpy(), out_mask=m.numpy().astype(np.float32),
             **sd_to_np(enc))


def gen_subsampling():
    from promptttspp.modules.esp.transformer.subsampling import (
        Conv2dSubsampling, Conv2dSubsampling6, Conv2dSubsampling8)

    rng = np.random.RandomState(33)
    B, T, F = 2, 31, 40
    x = rng.randn(B, T, F).astype(np.float32)
    lens = np.array([31, 20])
    mask = (np.arange(T)[None] < lens[:, None])[:, None, :]  # [B, 1, T]
    for name, cls in (("4", Conv2dSubsampling), ("6", Conv2dSubsampling6),
                      ("8", Conv2dSubsampling8)):
        torch.manual_seed(33)
        sub = cls(idim=F, odim=32, dropout_rate=0.0).eval()
        with torch.no_grad():
            out, m = sub(torch.from_numpy(x), torch.from_numpy(mask))
        save(f"subsampling_{name}", x=x, mask=mask.astype(np.float32),
             out=out.numpy(), out_mask=m.numpy().astype(np.float32),
             **sd_to_np(sub))




# ---------------------------------------------------------------- esp streaming
def gen_esp_streaming():
    """The three streaming sub-features (VERDICT r3 #7):
    StreamPositionalEncoding (`esp/transformer/embedding.py:333-385`),
    Encoder(mid_out=True) (`esp/conformer/encoder.py:266-274`), and the
    EncoderLayer streaming cache (`esp/conformer/encoder_layer.py:114-120`)."""
    from promptttspp.modules.esp.conformer.convolution import ConvolutionModule
    from promptttspp.modules.esp.conformer.encoder import Encoder
    from promptttspp.modules.esp.conformer.encoder_layer import EncoderLayer
    from promptttspp.modules.esp.conformer.swish import Swish
    from promptttspp.modules.esp.transformer.attention import (
        MultiHeadedAttention, RelPositionMultiHeadedAttention)
    from promptttspp.modules.esp.transformer.embedding import (
        RelPositionalEncoding, StreamPositionalEncoding)
    from promptttspp.modules.esp.transformer.multi_layer_conv import (
        MultiLayeredConv1d)

    rng = np.random.RandomState(9)
    D = 32

    # 1) StreamPositionalEncoding at two stream offsets
    pe = StreamPositionalEncoding(d_model=D, dropout_rate=0.0).eval()
    x_pe = rng.randn(2, 11, D).astype(np.float32)
    with torch.no_grad():
        pe_out0 = pe(torch.from_numpy(x_pe))
        pe_out4 = pe(torch.from_numpy(x_pe), start_idx=4)

    # 2) Encoder(mid_out=True): per-block outputs, each after_norm'ed
    torch.manual_seed(21)
    enc = Encoder(
        idim=D, attention_dim=D, attention_heads=2, linear_units=64,
        num_blocks=3, dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0, mid_out=True, input_layer=None,
        positionwise_layer_type="conv1d", positionwise_conv_kernel_size=3,
        macaron_style=True, pos_enc_layer_type="rel_pos",
        selfattention_layer_type="rel_selfattn", use_cnn_module=True,
        cnn_module_kernel=7).eval()
    xs = rng.randn(2, 13, D).astype(np.float32)
    lens = np.array([13, 9], np.int64)
    masks = (np.arange(13)[None, :] < lens[:, None])[:, None, :]
    with torch.no_grad():
        xss, _ = enc(torch.from_numpy(xs), torch.from_numpy(masks))
    mid = {f"mid_{i}": o.numpy() for i, o in enumerate(xss)}

    # 3) EncoderLayer streaming cache — selfattn and rel_selfattn
    torch.manual_seed(22)
    layer_abs = EncoderLayer(
        D, MultiHeadedAttention(2, D, 0.0),
        MultiLayeredConv1d(D, 64, 3, 0.0), MultiLayeredConv1d(D, 64, 3, 0.0),
        ConvolutionModule(D, 7, Swish()), 0.0).eval()
    torch.manual_seed(23)
    layer_rel = EncoderLayer(
        D, RelPositionMultiHeadedAttention(2, D, 0.0, zero_triu=False),
        MultiLayeredConv1d(D, 64, 3, 0.0), MultiLayeredConv1d(D, 64, 3, 0.0),
        ConvolutionModule(D, 7, Swish()), 0.0).eval()
    T = 9
    x_c = rng.randn(1, T, D).astype(np.float32)
    cache = rng.randn(1, T - 1, D).astype(np.float32)
    one_mask = torch.ones(1, 1, 1, dtype=torch.bool)
    rel_pe = RelPositionalEncoding(D, 0.0)
    with torch.no_grad():
        out_abs, _ = layer_abs(
            torch.from_numpy(x_c), one_mask, cache=torch.from_numpy(cache))
        _, pos_emb = rel_pe(torch.from_numpy(x_c))
        (out_rel, _), _ = layer_rel(
            (torch.from_numpy(x_c), pos_emb), one_mask,
            cache=torch.from_numpy(cache))

    save("esp_streaming",
         pe_x=x_pe, pe_out0=pe_out0.numpy(), pe_out4=pe_out4.numpy(),
         enc_x=xs, enc_lens=lens, **mid,
         cache_x=x_c, cache=cache, cache_pos_emb=pos_emb.numpy(),
         cache_out_abs=out_abs.numpy(), cache_out_rel=out_rel.numpy(),
         **sd_to_np(enc, prefix="enc."),
         **sd_to_np(layer_abs, prefix="abs."),
         **sd_to_np(layer_rel, prefix="rel."))


if __name__ == "__main__":
    which = sys.argv[1:] or ["conformer", "mdn", "predictors", "frame_prior",
                             "style_encoder", "diffusion", "variance_adaptor",
                             "model", "vocoder", "nnsvs", "local_nets",
                             "aux_nets", "lightconv", "decoder",
                             "subsampling", "transformer_encoder",
                             "esp_streaming"]
    for name in which:
        globals()[f"gen_{name}"]()
