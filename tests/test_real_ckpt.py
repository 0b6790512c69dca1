"""Published-checkpoint end-to-end validation (VERDICT r3 #10 — staged).

The reference ships trained checkpoints (`/root/reference/app.py:28-39`:
`model.ckpt` + `vocoder.ckpt` + normalization stats); this environment
has zero egress, so they cannot be fetched. This test stages the full
convert -> serve -> wav pipeline so it runs THE MOMENT real files are
present:

    PROMPTTTSPP_CKPT=/path/to/model.ckpt \
    PROMPTTTSPP_VOC_CKPT=/path/to/vocoder.ckpt \
    [PROMPTTTSPP_STATS=/path/to/scaler.joblib-or-stats.yaml] \
    python -m pytest tests/test_real_ckpt.py -v

Two layers of validation:

1. ``test_real_ckpt_serves`` — converter on REAL trained tensors
   (weight-norm folding, BERT layout, MDN heads) + the shipped
   ``Synthesizer`` produce finite, non-degenerate audio at a plausible
   speech duration.
2. ``test_real_ckpt_wav_parity`` — if the torch reference is importable
   (it is in this image), run the reference's own app path
   (`/root/reference/app.py:49-82`) on the SAME checkpoint with
   deterministic noise and assert waveform parity, exactly like
   tests/test_e2e_wav_parity.py does on seeded weights. This is where a
   converter bug on real tensors (e.g. a weight-norm fold on a tensor
   whose g has train-time scale) would show.

Until the files exist both tests skip with a reason naming the env vars.
"""

import os
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")

CKPT = os.environ.get("PROMPTTTSPP_CKPT", "")
VOC_CKPT = os.environ.get("PROMPTTTSPP_VOC_CKPT", "")

pytestmark = pytest.mark.skipif(
    not (CKPT and Path(CKPT).exists() and VOC_CKPT
         and Path(VOC_CKPT).exists()),
    reason="set PROMPTTTSPP_CKPT + PROMPTTTSPP_VOC_CKPT to released "
           "checkpoint files to run the real-checkpoint validation "
           "(zero-egress image: files not fetchable here)",
)

# "hh ah l ow w er l d" in the 90-symbol table is data-dependent; use a
# neutral mid-table sequence long enough for a real duration head to
# produce >= 0.5 s of speech
SEQ = [12, 30, 5, 44, 61, 18, 73, 9, 27, 55, 40, 66, 21, 8, 35, 50]
PROMPT = "A calm female voice with moderate pitch and slow speaking rate."


def _load_stats():
    """Released scaler: joblib StandardScaler (app.py:42-47) or our
    stats yaml; fall back to identity (parity tests don't need it)."""
    p = os.environ.get("PROMPTTTSPP_STATS", "")
    if not p or not Path(p).exists():
        return {"mean": 0.0, "std": 1.0}
    if p.endswith((".yaml", ".yml")):
        import yaml

        d = yaml.safe_load(Path(p).read_text())
        return {"mean": np.asarray(d["mean"], np.float32),
                "std": np.asarray(d["std"], np.float32)}
    import joblib

    scaler = joblib.load(p)
    return {"mean": np.asarray(scaler.mean_, np.float32),
            "std": np.asarray(scaler.scale_, np.float32)}


class _IdTokenizer:
    """Used only when the real WordPiece vocab isn't available locally;
    prompt ids then differ from production but the converter/vocoder
    path under test is identical."""

    pad_id = 0

    def batch_encode(self, prompts):
        ids = np.array([[101] + [min(28000, 1000 + ord(c) % 5000)
                                 for c in p[:30]] + [102]
                        for p in prompts], np.int32)
        return ids, np.ones_like(ids)


def _tokenizer():
    tok_dir = os.environ.get("PROMPTTTSPP_TOKENIZER_DIR", "")
    if tok_dir and Path(tok_dir).exists():
        from transformers import BertTokenizer

        hf = BertTokenizer.from_pretrained(tok_dir)

        class _HF:
            pad_id = hf.pad_token_id

            def batch_encode(self, prompts):
                out = hf(list(prompts), return_tensors="np", padding=True)
                return (out["input_ids"].astype(np.int32),
                        out["attention_mask"].astype(np.int32))

        return _HF()
    return _IdTokenizer()


@pytest.fixture(scope="module")
def served():
    from promptttspp_tpu.compat.torch_ckpt import (
        convert_reference_checkpoint, torch_state_dict)
    from promptttspp_tpu.config import compose, instantiate
    from promptttspp_tpu.infer import Synthesizer
    import promptttspp_tpu.models  # noqa: F401

    cfg = compose(REPO / "conf", "train")
    model = instantiate(cfg.model)
    variables = convert_reference_checkpoint(
        "model", torch_state_dict(CKPT, "model"), cfg)

    voc_cfg = compose(REPO / "conf", "synthesize",
                      overrides=["vocoder=bigvgan_f0"])
    vocoder = instantiate(voc_cfg.vocoder)
    voc_vars = convert_reference_checkpoint(
        "vocoder", torch_state_dict(VOC_CKPT, "vocoder"), voc_cfg)

    synth = Synthesizer(
        model, variables, vocoder=vocoder, vocoder_variables=voc_vars,
        mel_stats=_load_stats(), tokenizer=_tokenizer(),
        phone_quantum=16, frame_quantum=128, max_frames_cap=4096)
    wavs, mels = synth.synthesize([SEQ], prompts=[PROMPT], use_max=True,
                                  noise_scale=0.0, seed=0,
                                  return_mels=True)
    return dict(synth=synth, wavs=wavs, mels=mels)


def test_real_ckpt_serves(served):
    wav, mel = served["wavs"][0], served["mels"][0]
    assert np.isfinite(wav).all() and np.isfinite(mel).all()
    # non-degenerate audio: real speech, not silence or clipping
    assert 1e-4 < float(np.abs(wav).max()) < 1.5
    assert float(np.std(wav)) > 1e-5
    # plausible speech duration for 16 phones: 0.3 .. 8 s at 24 kHz
    assert 0.3 * 24000 < len(wav) < 8.0 * 24000
    # mel frames consistent with the hop (240): 100 frames/s
    assert abs(len(wav) / 240 - mel.shape[0]) < 2


@pytest.mark.slow
def test_real_ckpt_wav_parity(served):
    torch = pytest.importorskip("torch")
    promptttspp = pytest.importorskip("promptttspp")  # noqa: F841

    from tests.test_e2e_wav_parity import (
        JaxTokenizerAdapter, _torchaudio_filtfilt_lowpass)
    import promptttspp.modules.diffusion as diffusion_mod
    from promptttspp.utils.joblib import load_hydra_conf  # noqa: F401

    # --- reference side: real ckpt through the app path ----------------
    import hydra
    from omegaconf import OmegaConf

    ref_cfg = OmegaConf.load(
        "/root/reference/egs/proposed/conf/train/config.yaml")
    model = hydra.utils.instantiate(ref_cfg.model.netG).eval()
    sd = torch.load(CKPT, map_location="cpu", weights_only=False)
    model.load_state_dict(sd["model"] if "model" in sd else sd)

    voc_sd = torch.load(VOC_CKPT, map_location="cpu", weights_only=False)
    from promptttspp.vocoders.bigvgan_f0 import F0AwareBigVGAN

    vocoder = F0AwareBigVGAN(
        sampling_rate=24000, harmonic_num=8, in_channel=80,
        upsample_initial_channel=512,
        upsample_rates=[6, 5, 4, 2], upsample_kernel_sizes=[12, 10, 8, 4],
        resblock_kernel_sizes=[3, 7, 11],
        resblock_dilations=[[1, 3, 5], [1, 3, 5], [1, 3, 5]]).eval()
    vocoder.load_state_dict(
        voc_sd["generator"] if "generator" in voc_sd else voc_sd)
    vocoder.remove_weight_norm_()

    stats = _load_stats()
    mean, std = np.asarray(stats["mean"]), np.asarray(stats["std"])

    phoneme_ids = torch.LongTensor(SEQ)[None, :]
    x_T_holder = {}

    def fake_randn(*args, **kw):
        shape = args[0] if isinstance(args[0], (tuple, list, torch.Size)) \
            else args
        arr = np.random.RandomState(77).randn(*shape).astype(np.float32)
        x_T_holder["x_T"] = arr
        return torch.from_numpy(arr)

    orig = (torch.randn, torch.randn_like, torch.rand,
            diffusion_mod.noise_like)
    torch.randn = fake_randn
    torch.randn_like = lambda x: torch.zeros_like(x)
    torch.rand = lambda *a, **k: torch.zeros(
        a if not isinstance(a[0], (list, tuple, torch.Size)) else a[0])
    diffusion_mod.noise_like = \
        lambda shape, noise_fn, device, repeat=False: torch.zeros(shape)
    try:
        with torch.no_grad():
            dec, log_cf0, vuv = model.infer(
                phoneme_ids, style_prompt=[PROMPT], use_max=True,
                noise_scale=0.0, return_f0=True)
            log_cf0_f = torch.from_numpy(_torchaudio_filtfilt_lowpass(
                log_cf0.numpy(), fs=100, cutoff=20))
            f0 = log_cf0_f.exp()
            f0[vuv < 0.5] = 0
            dec_denorm = dec * torch.as_tensor(std, dtype=torch.float32) \
                + torch.as_tensor(mean, dtype=torch.float32)
            ref_wav = vocoder(dec_denorm, f0).squeeze(1).numpy()[0]
    finally:
        (torch.randn, torch.randn_like, torch.rand,
         diffusion_mod.noise_like) = orig

    # --- our side: same ckpt, same noise, shipped Synthesizer ----------
    import jax.numpy as jnp

    synth = served["synth"]
    # production tokenizer must match the reference's for identical
    # prompt ids; without it parity over the BERT branch is meaningless
    if isinstance(synth.tokenizer, _IdTokenizer):
        class _Fake:
            def arrays(self, n):
                ids, mask = synth.tokenizer.batch_encode([PROMPT] * n)
                return ids, mask

        # reference model.infer tokenizes internally via its own
        # tokenizer; skip unless the real vocab dir is provided
        pytest.skip("set PROMPTTTSPP_TOKENIZER_DIR for prompt-id parity")

    x_T = jnp.asarray(np.transpose(x_T_holder["x_T"], (0, 2, 1)))
    wavs, _ = synth.synthesize([SEQ], prompts=[PROMPT], use_max=True,
                               noise_scale=0.0, x_T=x_T, zero_noise=True,
                               seed=0)
    assert wavs[0].shape == ref_wav.shape
    err = np.abs(wavs[0] - ref_wav)
    assert float(err.max()) < 2e-2, float(err.max())
    assert float(err.mean()) < 1e-3, float(err.mean())
