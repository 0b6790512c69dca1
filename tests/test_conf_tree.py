"""Config-tree rot guard: every shipped YAML composes and every model /
vocoder / transforms group instantiates into real modules (flax modules
construct lazily, so this is cheap), and the flagship composition keeps
the reference's headline hyperparameters."""

from pathlib import Path

import pytest

import promptttspp_tpu.models  # noqa: F401 — registers aliases
from promptttspp_tpu.config import compose, instantiate

CONF = Path(__file__).resolve().parent.parent / "conf"


@pytest.mark.parametrize("name", ["train", "synthesize", "preprocess",
                                  "demo"])
def test_top_level_composes(name):
    cfg = compose(CONF, name)
    assert cfg is not None


@pytest.mark.parametrize("model_yaml", [
    p.stem for p in (CONF / "model").glob("*.yaml")])
def test_model_configs_instantiate(model_yaml):
    cfg = compose(CONF, "train", overrides=[f"model={model_yaml}"])
    model = instantiate(cfg.model)
    # flagship invariants of the reference's config of record
    assert model.norm_style_emb and model.mdn_disable_amp
    assert model.decoder.K_step == 100
    assert model.decoder.denoise_fn.residual_layers == 20
    enc = model.encoder
    assert enc.num_blocks == 4 and enc.attention_dim == 256
    assert enc.rel_pos_type in ("new", "legacy")


@pytest.mark.parametrize("voc_yaml", [
    p.stem for p in (CONF / "vocoder").glob("*.yaml")])
def test_vocoder_configs_instantiate(voc_yaml):
    cfg = compose(CONF, "synthesize", overrides=[f"vocoder={voc_yaml}"])
    voc = instantiate(cfg.vocoder)
    assert voc.in_channel == 80
    assert tuple(voc.upsample_rates) == (6, 5, 4, 2)


def test_transforms_instantiate():
    cfg = compose(CONF, "synthesize")
    to_mel = instantiate(cfg.transforms)
    assert to_mel.sample_rate == 24000 and to_mel.hop_length == 240
    assert to_mel.n_mels == 80


def test_reference_target_aliases():
    """Reference `promptttspp.*` _target_ strings resolve through the
    alias registry — a reference user's own YAML trees keep working."""
    cfg = compose(CONF, "train", overrides=[
        "model.phoneme_embedding._target_="
        "promptttspp.layers.embedding.PhonemeEmbedding"])
    model = instantiate(cfg.model)
    assert model.phoneme_embedding.num_vocab == 90


def test_reference_readme_train_cli_verbatim():
    """The reference README's exact training command line composes here
    unchanged (`/root/reference/README.md` "Train" section), including
    `train.fp16=false` — the AMP switch the trainer honors as a bf16
    alias (trainers/tts.py:92,203)."""
    cfg = compose(CONF, "train", overrides=[
        "model=prompttts_mdn_v2_wo_erg_final",
        "output_dir=./out/proposed", "train=noam", "path=default",
        "dataset.max_tokens=30000", "train.fp16=false", "dataset=mel"])
    assert cfg.select("train.fp16") is False
    assert cfg.select("dataset.max_tokens") == 30000
    cfg2 = compose(CONF, "train", overrides=["train.fp16=true"])
    assert cfg2.select("train.fp16") is True
