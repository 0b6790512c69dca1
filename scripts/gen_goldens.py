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
            torch.from_numpy(durs)[:, None, :],
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


if __name__ == "__main__":
    which = sys.argv[1:] or ["conformer", "mdn", "predictors", "frame_prior",
                             "style_encoder", "diffusion", "variance_adaptor"]
    for name in which:
        globals()[f"gen_{name}"]()
