"""End-to-end smoke of the full user workflow on a synthetic corpus:
preprocess (TextGrid + wav -> features/CSVs) -> split/filter -> train
(2 epochs, tiny model) -> synthesize (wav files out). Exercises the real
CLI modules (SURVEY.md §4 test pyramid, level 4)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

PHONES = ["HH", "AH0", "L", "OW1", "W", "ER1", "D", "B", "IY1", "M", "AA1", "N"]

TINY_MODEL_OVERRIDES = [
    "model.phoneme_embedding.channels=64",
    "model.encoder.idim=64", "model.encoder.attention_dim=64",
    "model.encoder.linear_units=128", "model.encoder.num_blocks=1",
    "model.decoder.denoise_fn.residual_layers=2",
    "model.decoder.denoise_fn.residual_channels=32",
    "model.variance_adaptor.frame_prior_network.n_layers=1",
    "model.prompt_encoder.in_channels=64",
    "model.prompt_encoder.mid_channels=64",
    "+model.prompt_encoder.bert_num_layers=1",
    "+model.prompt_encoder.bert_num_heads=4",
    "model.reference_encoder.conv_chans_list=[4,4,8,8,16,16]",
    "+model.reference_encoder.gst_token_dim=64",
]


def make_corpus(root: Path):
    from scipy.io import wavfile

    data_root = root / "data_prep/out/libritts_r_per_spk_cleaned"
    meta = root / "metadata"
    meta.mkdir(parents=True, exist_ok=True)
    rows = []
    for spk in (11, 22):
        (data_root / str(spk) / "wav24k").mkdir(parents=True, exist_ok=True)
        (data_root / str(spk) / "textgrid").mkdir(parents=True, exist_ok=True)
        for u in range(4):
            utt = f"utt_{spk}_{u}"
            dur_s = 1.0 + 0.3 * u
            n = int(24000 * dur_s)
            t = np.arange(n) / 24000.0
            f0 = 120 + 40 * (spk == 22)
            wav = (0.4 * np.sin(2 * np.pi * f0 * t)
                   * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t)))
            wavfile.write(data_root / str(spk) / "wav24k" / f"{utt}.wav",
                          24000, (wav * 32767).astype(np.int16))
            k = 4 + u
            bounds = np.linspace(0.05, dur_s - 0.05, k + 1)
            lines = ['File type = "ooTextFile"', 'Object class = "TextGrid"',
                     "", "xmin = 0 ", f"xmax = {dur_s} ", "tiers? <exists> ",
                     "size = 1 ", "item []: ", "    item [1]:",
                     '        class = "IntervalTier" ',
                     '        name = "phones" ', "        xmin = 0 ",
                     f"        xmax = {dur_s} ",
                     f"        intervals: size = {k + 2} "]
            ivs = [(0.0, bounds[0], "sil")]
            for j in range(k):
                ivs.append((bounds[j], bounds[j + 1],
                            PHONES[(u + j) % len(PHONES)]))
            ivs.append((bounds[-1], dur_s, "sp"))
            for j, (a, b, name) in enumerate(ivs):
                lines += [f"        intervals [{j + 1}]:",
                          f"            xmin = {a} ",
                          f"            xmax = {b} ",
                          f'            text = "{name}" ']
            (data_root / str(spk) / "textgrid" / f"{utt}.TextGrid"
             ).write_text("\n".join(lines))
            rows.append(f"{spk},{utt},{'M' if spk == 11 else 'F'},"
                        "normal,normal,normal,K1")
    (meta / "metadata_w_style_prompt_tags.csv").write_text(
        "spk_id,item_name,gender,pitch,speaking_speed,energy,"
        "style_prompt_key\n" + "\n".join(rows) + "\n")
    (meta / "style_prompt_candidates.csv").write_text(
        "K1|a man speaks slowly with low voice;a calm low slow male voice\n")
    (meta / "speaker_prompt_candidates.csv").write_text(
        "11|deep,calm,soft,warm,clear,steady\n"
        "22|bright,quick,clear,light,crisp,sharp\n")
    (meta / "bert-base-uncased-vocab.txt").write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "a", "man", "speaks",
         "slowly", "with", "low", "voice", "calm", "slow", "male", "the",
         "speaker", "identity", "can", "be", "described", "as", "deep",
         "soft", "warm", "clear", "steady", ",", "."]) + "\n")


def run_cli(script, *overrides):
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, str(REPO / script), *overrides],
        capture_output=True, text=True, env=env, timeout=560)
    assert proc.returncode == 0, (
        f"{script} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")
    return proc


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    make_corpus(root)
    return root


@pytest.mark.slow
def test_full_cli_workflow(corpus, tmp_path_factory):
    import yaml

    root_ov = f"path.root={corpus}"

    # 1. preprocess
    run_cli("egs/proposed/bin/preprocess.py", root_ov, "eval_ids=[22]",
            "batch_size=4")
    dump = corpus / "dump/libritts_r_per_spk_cleaned"
    with open(dump / "mel63/stats.yaml") as f:
        stats = yaml.safe_load(f)
    assert np.isfinite(stats["mean"]) and stats["std"] > 0
    cf0 = np.load(dump / "feats/11/cf0/utt_11_0.npy")
    voiced = cf0[cf0 > 0]
    np.testing.assert_allclose(np.exp(np.median(voiced)), 120.0, rtol=0.03)

    # 2. split + filter
    run_cli("egs/proposed/bin/split_df.py", root_ov)
    run_cli("egs/proposed/bin/filter_eval.py", root_ov, "min_sec=0.5")
    assert (dump / "df_filtered/trn.csv").exists()
    assert (dump / "df_filtered/eval_filtered.csv").exists()

    # 3. train 2 epochs
    out = tmp_path_factory.mktemp("train_out")
    run_cli("egs/proposed/bin/train.py", root_ov, f"output_dir={out}",
            *TINY_MODEL_OVERRIDES,
            "train.num_epochs=2", "train.save_interval=2",
            "train.lr_scheduler.warmup_steps=10", "dataset.max_tokens=2000")
    csv = (out / "logs/loss.csv").read_text().strip().splitlines()
    assert len(csv) == 3
    assert (out / "ckpt/last").exists()

    # 4. vocoder ckpt: a REAL torch reference checkpoint (weight-normed),
    # auto-converted by synthesize.py's load_variables — then synthesize
    # with BOTH conditioning modes (ref + prompt trees)
    voc_dir = tmp_path_factory.mktemp("voc")
    voc_ov = ["vocoder.upsample_initial_channel=32",
              "vocoder.harmonic_num=3",
              "vocoder.resblock_kernel_sizes=[3]",
              "vocoder.resblock_dilations=[[1,3]]"]
    _make_torch_vocoder_ckpt(voc_dir / "vocoder.ckpt")
    synth_out = tmp_path_factory.mktemp("synth")
    run_cli("egs/proposed/bin/synthesize.py", root_ov,
            f"output_dir={synth_out}",
            f"model_ckpt={out / 'ckpt/last'}",
            f"vocoder_ckpt={voc_dir / 'vocoder.ckpt'}",
            *TINY_MODEL_OVERRIDES, *voc_ov, "num_eval_utts=1")
    from scipy.io import wavfile

    for mode in ("ref", "prompt"):
        wavs = list(synth_out.glob(f"*/{mode}/wav/*.wav"))
        assert len(wavs) == 1, f"missing {mode} tree"
        sr, data = wavfile.read(wavs[0])
        assert sr == 24000 and len(data) > 24000 // 2
    assert (synth_out / "finish").exists()

    # 5. objective eval over the synthesized trees
    import json

    run_cli("egs/proposed/bin/eval.py", root_ov,
            f"output_dir={synth_out}", "num_eval_utts=1")
    rep = json.loads((synth_out / "eval_metrics.json").read_text())
    for mode in ("ref", "prompt"):
        mean = rep[mode]["mean"]
        assert rep[mode]["n_utts"] == 1
        assert np.isfinite(mean["mcd"]) and mean["mcd"] > 0
        assert 0.0 <= mean["vuv_error"] <= 1.0


def _make_torch_vocoder_ckpt(path):
    """Tiny reference F0AwareBigVGAN, saved the way the reference publishes
    vocoder checkpoints ({'generator': state_dict}, app.py:35-37)."""
    import torch

    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    from promptttspp.vocoders.bigvgan_f0 import F0AwareBigVGAN

    torch.manual_seed(0)
    voc = F0AwareBigVGAN(
        sampling_rate=24000, harmonic_num=3, in_channel=80,
        upsample_initial_channel=32, upsample_rates=[6, 5, 4, 2],
        upsample_kernel_sizes=[12, 10, 8, 4], resblock_kernel_sizes=[3],
        resblock_dilations=[[1, 3]])
    torch.save({"generator": voc.state_dict()}, path)
