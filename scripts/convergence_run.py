"""End-to-end convergence run: train a small-but-complete PromptTTS++
model for a few hundred epochs on a LEARNABLE synthetic corpus, resume
mid-run, then objectively evaluate the resulting checkpoint against the
corpus ground truth (VERDICT r4 #7 — the committed train→eval quality
table; reference recipe anchor `/root/reference/promptttspp/trainers/
tts.py:194-258`, eval trees `egs/proposed/bin/synthesize.py:148-168`).

The throughput corpus (profile_epoch.make_corpus) is pure noise —
trainable only to the mean. This corpus is a deterministic function of
its inputs so the model can actually FIT it and the objective metrics
measure learning, not noise-floor chance:

- a fixed random "world": per-phone 80-bin spectral template (smooth
  across mel bins), per-speaker spectral offset, per-phone log-F0 mean
  and voicing class, per-phone mean duration;
- each utterance: phones drawn zipf-ish, durations lognormal around the
  phone means, mel = time-smoothed template track + speaker offset
  (+ σ=0.05 observation noise), log-cf0 = smoothed per-phone contour ×
  utterance rate, vuv = phone voicing;
- style prompts/speaker prompts follow the corpus CSV format, so the
  FULL conditioning path (BERT prompt encoder → GST reference encoder
  mixing → style MDN) trains exactly like production.

Training uses the shipped TTSTrainer end-to-end: all five losses
(diffusion dec, MDN duration NLL, cf0 L1, vuv L1, style MDN NLL), Noam
cadence, bf16, dynamic token-bucketed batching, orbax checkpointing,
and a RESUME at the midpoint (two trainer processes, the second starts
from ckpt/last). Evaluation decodes eval-split utterances with
PREDICTED durations (use_max) conditioned on the style prompt, and
scores mel MCD/L1 (DTW on predicted-vs-true lengths), F0 RMSE (cents),
VUV error, and duration ratio with the shipped metrics
(promptttspp_tpu/eval/metrics.py — the same module eval.py uses).

Usage:
  python scripts/convergence_run.py [--utts 256] [--epochs 300]
      [--resume-at 150] [--out results/convergence] [--model small]
"""

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from promptttspp_tpu.platform import apply_platform_env  # noqa: E402

apply_platform_env()

MEL_DIM = 80
N_PHONES = 90  # id 0 = pad, 1..89 usable (text/eng.py table size)
N_SPK = 8


class World:
    """The fixed generative process the model must learn."""

    def __init__(self, seed=7):
        rng = np.random.RandomState(seed)
        # smooth spectral template per phone: random walk over mel bins
        steps = rng.randn(N_PHONES, MEL_DIM) * 0.6
        tmpl = np.cumsum(steps, axis=1)
        tmpl -= tmpl.mean(axis=1, keepdims=True)
        self.template = tmpl * 1.2 - 4.0          # around the -4 corpus mean
        self.spk_offset = rng.randn(N_SPK, MEL_DIM) * 0.4
        self.phone_lf0 = np.log(180.0) + rng.randn(N_PHONES) * 0.25
        self.voiced = rng.rand(N_PHONES) > 0.25   # ~75% voiced inventory
        self.mean_dur = np.clip(
            7.0 * np.exp(rng.randn(N_PHONES) * 0.3), 3.0, 16.0)
        w = 1.0 / np.arange(1, N_PHONES) ** 0.6
        self.freq = w / w.sum()
        self.spk_rate = np.exp(rng.randn(N_SPK) * 0.08)

    def sample_durations(self, rng, ids, spk):
        return np.maximum(np.round(
            self.mean_dur[ids] * self.spk_rate[spk]
            * np.exp(rng.randn(len(ids)) * 0.25)), 2).astype(np.int64)

    def render(self, ids, dur, spk, noise_rng=None):
        """(mel, lf0, vuv) for a phone/duration sequence — THE corpus
        rendering math; convergence_anchors.py reuses it so the anchor
        predictors can never drift from the generator."""
        T = int(dur.sum())
        frame_phone = np.repeat(ids, dur)
        mel = self.template[frame_phone] + self.spk_offset[spk]
        # coarticulation: short moving-average over time
        k = 5
        pad = np.pad(mel, ((k // 2, k // 2), (0, 0)), mode="edge")
        mel = np.stack([pad[i:i + T] for i in range(k)]).mean(axis=0)
        if noise_rng is not None:                 # observation noise
            mel = mel + noise_rng.randn(T, MEL_DIM) * 0.05
        lf0 = self.phone_lf0[frame_phone]
        lf0 = np.convolve(np.pad(lf0, (4, 4), mode="edge"),
                          np.ones(9) / 9, mode="valid")
        vuv = self.voiced[frame_phone].astype(np.float32)
        lf0 = (lf0 * vuv).astype(np.float32)      # cf0 convention: 0 unvoiced
        return mel.astype(np.float32), lf0, vuv

    def utterance(self, rng, n_ph, spk):
        ids = rng.choice(np.arange(1, N_PHONES), size=n_ph, p=self.freq)
        dur = self.sample_durations(rng, ids, spk)
        mel, lf0, vuv = self.render(ids, dur, spk, noise_rng=rng)
        return ids, dur, mel, lf0, vuv


def make_learnable_corpus(root: Path, n_utts: int, seed=0):
    import yaml

    world = World()
    rng = np.random.RandomState(seed)
    mel_dir, feats = root / "mel63", root / "feats"
    rows = []
    all_mels = []
    for i in range(n_utts):
        spk_i = i % N_SPK
        spk = 10 + spk_i
        n_ph = rng.randint(16, 64)
        ids, dur, mel, lf0, vuv = world.utterance(rng, n_ph, spk_i)
        (mel_dir / str(spk)).mkdir(parents=True, exist_ok=True)
        (feats / str(spk) / "cf0").mkdir(parents=True, exist_ok=True)
        (feats / str(spk) / "vuv").mkdir(parents=True, exist_ok=True)
        utt = f"utt{i:05d}"
        np.save(mel_dir / str(spk) / f"{utt}.npy",
                np.ascontiguousarray(mel.T))  # [80, T] C-order on disk
        np.save(feats / str(spk) / "cf0" / f"{utt}.npy", lf0[None])
        np.save(feats / str(spk) / "vuv" / f"{utt}.npy", vuv[None])
        all_mels.append(mel)
        rows.append(
            f"{spk},{utt},M,normal,normal,normal,K{1 + spk_i % 2},"
            f"{' '.join(str(x) for x in ids)},"
            f"{' '.join(str(d) for d in dur)}")
    cat = np.concatenate(all_mels)
    stats = {"mean": float(cat.mean()), "std": float(cat.std()),
             "min": float(cat.min()), "max": float(cat.max()),
             "var": float(cat.var())}
    (mel_dir / "stats.yaml").write_text(yaml.dump(stats))
    hdr = ("spk_id,item_name,gender,pitch,speaking_speed,energy,"
           "style_prompt_key,seq,durations\n")
    n_eval = max(8, n_utts // 16)
    (root / "train.csv").write_text(hdr + "\n".join(rows[:-n_eval]) + "\n")
    (root / "eval.csv").write_text(hdr + "\n".join(rows[-n_eval:]) + "\n")
    (root / "style.csv").write_text(
        "K1|a man speaks slowly with a low voice;a calm low slow voice\n"
        "K2|bright quick energetic speech;a fast high clear voice\n")
    (root / "spk.csv").write_text("\n".join(
        f"{s}|deep,calm,soft,warm,clear,steady,low,quiet"
        for s in range(10, 10 + N_SPK)) + "\n")
    return stats


def build_small_model(norm_scale=6.0):
    """~8M-param model with every flagship component (all five losses),
    sized so hundreds of epochs fit in minutes: conformer 2 blocks C=128,
    DiffNet 10x64, 4-layer mini-BERT prompt encoder, GST, style MDN.

    norm_scale is corpus-dependent (it maps normalized mel into the
    diffusion's ~[-1,1] working range): the flagship's 6.0 matches the
    real corpus's normalized-mel spread; THIS corpus's normalized mels
    are ~N(0,1), so 6.0 leaves x0 at std 0.17 and starves the decoder's
    SNR — pass ~2.5 here (3-sigma to the range edge)."""
    from promptttspp_tpu.models.bert import BertConfig
    from promptttspp_tpu.models.diffusion import DiffNet, GaussianDiffusion
    from promptttspp_tpu.models.frame_prior import FramePriorNetwork
    from promptttspp_tpu.models.phoneme_embedding import PhonemeEmbedding
    from promptttspp_tpu.models.prompt_encoder import PromptEncoder
    from promptttspp_tpu.models.prompttts import PromptTTSMDNDurCFG
    from promptttspp_tpu.models.style_encoder import StyleEncoder
    from promptttspp_tpu.models.variance_adaptor import (
        MDNPredictor, PitchEmb, Predictor, VarianceAdaptor)
    from promptttspp_tpu.nn.conformer import ConformerEncoder
    from promptttspp_tpu.nn.mdn import MDNLayer

    C = 128
    return PromptTTSMDNDurCFG(
        phoneme_embedding=PhonemeEmbedding(N_PHONES, C, do_scale=False,
                                           init_normal=False),
        encoder=ConformerEncoder(
            idim=C, attention_dim=C, attention_heads=2, linear_units=512,
            num_blocks=2, positionwise_layer_type="conv1d",
            positionwise_conv_kernel_size=3, dropout_rate=0.1,
            pos_enc_layer_type="rel_pos",
            selfattention_layer_type="rel_selfattn", macaron_style=True,
            use_cnn_module=True, cnn_module_kernel=7, rel_pos_type="new"),
        variance_adaptor=VarianceAdaptor(
            duration_predictor=MDNPredictor(
                channels=C, out_channels=1, kernel_size=3, dropout=0.5,
                num_layers=2, num_gaussians=4, dim_wise=True, detach=True,
                disable_amp=True),
            pitch_predictor=Predictor(
                channels=C, out_channels=2, kernel_size=5, dropout=0.5,
                num_layers=2, detach=False),
            pitch_emb=PitchEmb(1, C, 3),
            frame_prior_network=FramePriorNetwork(
                out_channels=C, hidden_channels=C, n_layers=3,
                kernel_size=9, p_dropout=0.1)),
        reference_encoder=StyleEncoder(
            idim=MEL_DIM, gst_tokens=10, gst_heads=4, conv_layers=6,
            conv_chans_list=(32, 32, 64, 64, 128, 128), conv_kernel_size=3,
            conv_stride=2, gru_layers=1, gru_units=C, gst_token_dim=C),
        prompt_encoder=PromptEncoder(
            in_channels=256, mid_channels=256, out_channels=C,
            bert_config=BertConfig(
                vocab_size=30522, hidden_size=256, num_hidden_layers=4,
                num_attention_heads=4, intermediate_size=512,
                max_position_embeddings=64,
                hidden_dropout=0.1, attention_dropout=0.1)),
        style_mdn=MDNLayer(in_dim=C, out_dim=C, num_gaussians=4,
                           dim_wise=True),
        decoder=GaussianDiffusion(
            in_dim=C, out_dim=MEL_DIM,
            denoise_fn=DiffNet(in_dim=MEL_DIM, encoder_hidden_dim=C,
                               residual_layers=10, residual_channels=64,
                               kernel_size=3, dilation_cycle_length=5),
            K_step=100, schedule_type="linear", norm_scale=norm_scale),
        norm_style_emb=True,
        mdn_disable_amp=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--utts", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--resume-at", type=int, default=150)
    ap.add_argument("--max-tokens", type=int, default=12000)
    ap.add_argument("--out", default="results/convergence")
    ap.add_argument("--root", default=None,
                    help="corpus/work dir (default: temp)")
    ap.add_argument("--num-eval", type=int, default=12)
    ap.add_argument("--norm-scale", type=float, default=6.0,
                    help="diffusion norm_scale; ~2.5 fits THIS corpus's "
                    "~N(0,1) normalized mels (see build_small_model)")
    ap.add_argument("--extend", action="store_true",
                    help="skip phase 1: resume from --root's existing "
                    "ckpt/last and train on to --epochs, then re-eval "
                    "(loss.csv appends across phases)")
    args = ap.parse_args()

    import tempfile

    import jax

    from promptttspp_tpu.config import Config
    from promptttspp_tpu.data.dataset import AllWithSpkPromptNormDataset
    from promptttspp_tpu.train import checkpoint as ckpt_lib
    from promptttspp_tpu.train.trainer import TTSTrainer

    sys.path.insert(0, str(REPO / "scripts"))
    from profile_epoch import Vocab30kTokenizer

    root = Path(args.root or tempfile.mkdtemp(prefix="convergence_"))
    out_repo = REPO / args.out
    out_repo.mkdir(parents=True, exist_ok=True)
    stats = make_learnable_corpus(root, args.utts)
    print(f"corpus: {args.utts} utts at {root} "
          f"(mel mean {stats['mean']:.2f} std {stats['std']:.2f})",
          file=sys.stderr, flush=True)
    run_dir = root / "out"

    def make_trainer(num_epochs, resume=False):
        cfg = Config({
            "output_dir": str(run_dir),
            "train": {"seed": 0, "num_epochs": num_epochs,
                      "save_interval": 25, "bf16": True,
                      "input_pipeline": "sync_native",
                      "compilation_cache_dir": str(root / "jaxcache"),
                      "lr_scheduler": {"warmup_steps": 200}},
            "optimizer": {"lr": 1e-3, "betas": [0.9, 0.98],
                          "weight_decay": 0.0},
            "dataset": {"dynamic_batch": True,
                        "max_tokens": args.max_tokens},
        })
        if resume:
            cfg.ckpt_path = str(run_dir / "ckpt" / "last")
        ds = AllWithSpkPromptNormDataset(
            file_path=root / "train.csv", data_root=root,
            feats_dir=root / "feats", mel_dir=root / "mel63",
            prompt_candidate_file=root / "style.csv",
            spk_prompt_candidate_file=root / "spk.csv", seed=0)
        return TTSTrainer(cfg, train_ds=ds, tokenizer=Vocab30kTokenizer(),
                          model=build_small_model(args.norm_scale),
                          freeze_bert=False)

    t0 = time.time()
    if not args.extend:
        make_trainer(args.resume_at).run()
        mid_s = time.time() - t0
        print(f"phase 1 ({args.resume_at} epochs): {mid_s:.0f}s",
              file=sys.stderr, flush=True)
    trainer = make_trainer(args.epochs, resume=True)  # resume mid-run
    state = trainer.run()
    train_s = time.time() - t0
    ckpt_lib.wait_until_finished()

    shutil.copy(run_dir / "logs" / "loss.csv", out_repo / "loss.csv")

    # ---- objective eval: decode the EVAL split with predicted durations
    import pandas as pd

    from promptttspp_tpu.eval.metrics import (dtw_path, f0_metrics, mcd,
                                              mel_cepstra, mel_l1,
                                              summarize)

    df = pd.read_csv(root / "eval.csv").head(args.num_eval)
    model = trainer._model
    params = jax.device_get(state.params)
    bstats = jax.device_get(state.batch_stats)
    variables = {"params": params, "batch_stats": bstats}
    tok = Vocab30kTokenizer()
    style_map = dict(
        line.split("|") for line in
        (root / "style.csv").read_text().strip().splitlines())

    mean, std = stats["mean"], stats["std"]
    rows = []
    infer = jax.jit(
        lambda v, ph, pl, pi, pm, k: model.apply(
            v, ph, pl, max_frames=1024, prompt_ids=pi, prompt_mask=pm,
            use_max=True, noise_scale=0.0, return_f0=True,
            style_rng=k, diffusion_rng=jax.random.fold_in(k, 9),
            method=model.infer),
        static_argnums=())
    for i, r in df.iterrows():
        ids = np.asarray(str(r["seq"]).split(), np.int32)
        dur = np.asarray(str(r["durations"]).split(), np.int64)
        T = int(dur.sum())
        gt_mel = np.load(root / "mel63" / str(r["spk_id"])
                         / f"{r['item_name']}.npy").T      # [T, 80]
        gt_lf0 = np.load(root / "feats" / str(r["spk_id"]) / "cf0"
                         / f"{r['item_name']}.npy")[0]
        gt_vuv = np.load(root / "feats" / str(r["spk_id"]) / "vuv"
                         / f"{r['item_name']}.npy")[0]
        prompt = style_map[str(r["style_prompt_key"])].split(";")[0]
        pi, pm = tok.batch_encode([prompt], max_length=32)
        ph = np.zeros((1, 64), np.int32)
        ph[0, :len(ids)] = ids
        mel_n, flens, lf0_p, vuv_p = infer(
            variables, ph, np.asarray([len(ids)], np.int32), pi, pm,
            jax.random.PRNGKey(1000 + i))
        n = int(np.asarray(flens)[0])
        mel_p = np.asarray(mel_n)[0, :n] * std + mean     # denormalize
        lf0_p = np.asarray(lf0_p)[0, :n, 0]
        vuv_p = (np.asarray(vuv_p)[0, :n, 0] > 0.5).astype(np.float32)
        f0_p = np.where(vuv_p > 0, np.exp(lf0_p), 0.0)
        f0_t = np.where(gt_vuv > 0, np.exp(gt_lf0), 0.0)
        path = dtw_path(mel_cepstra(gt_mel)[:, 1:],
                        mel_cepstra(mel_p)[:, 1:])
        row = dict(
            mcd=mcd(gt_mel, mel_p, path=path),
            mel_l1=mel_l1(gt_mel, mel_p, path=path),
            dur_ratio=n / T,
            **f0_metrics(f0_t, gt_vuv, f0_p, vuv_p, path))
        rows.append(row)
        print(json.dumps({"utt": str(r["item_name"]),
                          **{k: round(v, 4) for k, v in row.items()}}),
              file=sys.stderr, flush=True)

    csv = (run_dir / "logs" / "loss.csv").read_text().strip().splitlines()
    cols = csv[0].split(",")
    first = dict(zip(cols, csv[1].split(",")))
    last = dict(zip(cols, csv[-1].split(",")))
    result = {
        "metric": "convergence_run",
        "backend": jax.default_backend(),
        "utts": args.utts, "epochs": len(csv) - 1,
        "resumed_at": args.resume_at,
        "norm_scale": args.norm_scale, "max_tokens": args.max_tokens,
        "steps": int(state.step), "train_s": round(train_s, 1),
        "loss_first_epoch": {k: round(float(v), 4)
                             for k, v in first.items() if k != "epoch"},
        "loss_last_epoch": {k: round(float(v), 4)
                            for k, v in last.items() if k != "epoch"},
        "eval": {k: round(v, 4)
                 for k, v in summarize(rows).items()},
        "per_utt": [{k: round(v, 4) for k, v in r.items()} for r in rows],
    }
    (out_repo / "convergence.json").write_text(json.dumps(result, indent=1))
    print(json.dumps({k: v for k, v in result.items() if k != "per_utt"}))
    sys.stdout.flush()
    import os

    os._exit(0)  # dodge tunnel teardown hangs


if __name__ == "__main__":
    main()
