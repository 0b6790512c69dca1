"""Interactive demo (counterpart of the reference `app.py:28-150`).

Gradio UI when available (two tabs: style-prompt and reference-wav
conditioning); otherwise a CLI fallback that synthesizes one utterance.
G2P via g2p_en when installed; otherwise the content must be given as a
space-separated ARPA phoneme string.
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

from promptttspp_tpu.platform import apply_platform_env  # noqa: E402

apply_platform_env()

from promptttspp_tpu.config import (  # noqa: E402
    apply_hydra_runtime, compose, instantiate)
from promptttspp_tpu.text import eng  # noqa: E402

PUNCT_TO_SIL = {",", ".", "!", "?", ";"}


def content_to_sequence(content: str):
    """g2p (if available) with punctuation -> sil and OOV dropping
    (`app.py:53-57`); falls back to direct phoneme input."""
    try:
        from g2p_en import G2p

        phones = G2p()(content)
        phones = ["sil" if p in PUNCT_TO_SIL else p for p in phones]
        phones = [p for p in phones if eng.is_symbol(p)]
        return eng.text_to_sequence(" ".join(phones))
    except ImportError:
        tokens = content.split()
        if all(eng.is_symbol(t) for t in tokens):
            return eng.text_to_sequence(content)
        raise SystemExit(
            "g2p_en is not installed; provide the content as a "
            "space-separated ARPA phoneme string instead")


def build_synthesizer(cfg):
    import yaml

    import promptttspp_tpu.models  # noqa: F401
    from egs.proposed.bin.synthesize import load_variables
    from promptttspp_tpu.infer import Synthesizer
    from promptttspp_tpu.models.bert import WordPieceTokenizer

    model = instantiate(cfg.model)
    vocoder = instantiate(cfg.vocoder)
    variables = load_variables(cfg.model_ckpt, "model", cfg)
    voc_vars = load_variables(cfg.vocoder_ckpt, "vocoder", cfg)
    to_mel = instantiate(cfg.transforms)
    with open(cfg.mel_stats_file) as f:
        mel_stats = yaml.safe_load(f)
    tokenizer = WordPieceTokenizer.from_vocab_file(cfg.path.bert_vocab_file)
    # multi-chip serving knobs, same surface as synthesize.py:
    # `+vocoder_mode=sharded +frame_sharded_decode=true`; latency knobs:
    # `+speculative=true` (one-dispatch requests) with an optional
    # per-phone duration table `+spec_duration_table=<npz>` (from
    # scripts/make_spec_duration_table.py — docs/SERVING.md)
    spec_kw = {}
    tbl = cfg.get("spec_duration_table")
    if tbl:
        t = np.load(tbl)
        spec_kw = dict(spec_duration_table=t["mean"],
                       spec_duration_std=t["std"])
    synth = Synthesizer(model, variables, vocoder, voc_vars,
                        mel_stats=mel_stats, tokenizer=tokenizer,
                        to_mel=to_mel,
                        vocoder_mode=cfg.get("vocoder_mode", "batched"),
                        frame_sharded_decode=cfg.get(
                            "frame_sharded_decode", False),
                        decode_param_dtype=cfg.get(
                            "decode_param_dtype", None),
                        speculative=cfg.get("speculative", False),
                        spec_margin=cfg.get("spec_margin", 3.0),
                        spec_rate_margin=cfg.get("spec_rate_margin", 0.2),
                        **spec_kw)
    if cfg.get("prewarm"):
        # compile the serving program grid before the first user request
        # (pair with JAX_COMPILATION_CACHE_DIR / prewarm_serving.py so
        # restarts deserialize instead — BENCHMARKS.md §Serving cold
        # start). use_max/noise_scale are STATIC jit args of the fused
        # program — the grid must be compiled at the deployment's values
        # or every "prewarmed" shape recompiles on first request. The
        # grid only covers the fused batched-vocoder path; sharded/
        # frame-sharded serving dispatches different programs.
        if (synth.vocoder_mode != "batched"
                or getattr(synth, "frame_sharded_decode", False)):
            print("prewarm: skipped — the fused-program grid does not "
                  "cover vocoder_mode="
                  f"{synth.vocoder_mode}/frame_sharded_decode",
                  file=sys.stderr, flush=True)
        else:
            # non-speculative serving buckets the TRUE durations — any
            # frame bucket per phone bucket — so it needs the full grid
            default_grid = ("speculative" if synth.speculative
                            else "full")
            synth.prewarm(
                grid=cfg.get("prewarm_grid", default_grid),
                max_phones=int(cfg.get("prewarm_max_phones", 208)),
                use_max=cfg.get("use_max", True),
                noise_scale=cfg.get("noise_scale", 0.5),
                log=lambda m: print(m, file=sys.stderr, flush=True))
    return synth


def load_wav_24k(path):
    """Read a wav file and resample to 24 kHz float32 if needed."""
    from scipy.io import wavfile

    sr, wav = wavfile.read(path)
    if wav.dtype.kind == "i":
        wav = wav.astype(np.float32) / np.iinfo(wav.dtype).max
    wav = wav.astype(np.float32)
    if wav.ndim > 1:
        wav = wav.mean(axis=-1)
    if sr != 24000:
        from scipy.signal import resample_poly

        wav = resample_poly(wav, 24000, sr).astype(np.float32)
    return wav


def main():
    cfg = compose(REPO / "conf", "demo", overrides=sys.argv[1:],
                  drop_hydra_node=False)
    apply_hydra_runtime(cfg)  # hydra.run.dir / job_logging semantics
    synth = build_synthesizer(cfg)

    def synthesize(content, style_prompt=None, reference_wav_path=None):
        seq = content_to_sequence(content)
        kwargs = dict(use_max=cfg.get("use_max", True),
                      noise_scale=cfg.get("noise_scale", 0.5))
        if style_prompt is not None:
            wavs, _ = synth.synthesize([seq], prompts=[style_prompt],
                                       **kwargs)
        else:
            wavs, _ = synth.synthesize(
                [seq], reference_wavs=[load_wav_24k(reference_wav_path)],
                **kwargs)
        return 24000, (np.clip(wavs[0], -1, 1) * 32767).astype(np.int16)

    try:
        import gradio as gr

        # two conditioning tabs, matching `/root/reference/app.py:102-133`
        with gr.Blocks() as demo:
            gr.Markdown("# PromptTTS++ (TPU)")
            content = gr.Textbox(label="Content prompt")
            with gr.Tabs():
                with gr.TabItem("Style prompt"):
                    style = gr.Textbox(
                        label="Style prompt",
                        value="A man speaks with a low voice slowly.")
                    btn1 = gr.Button("Synthesize")
                    audio1 = gr.Audio(label="Output wav", elem_id="prompt")
                with gr.TabItem("Reference wav"):
                    ref_wav = gr.Audio(type="filepath",
                                       label="Reference wav", elem_id="ref")
                    btn2 = gr.Button("Synthesize")
                    audio2 = gr.Audio(label="Output wav", elem_id="ref")
            btn1.click(lambda c, s: synthesize(c, style_prompt=s),
                       [content, style], audio1)
            btn2.click(lambda c, p: synthesize(c, reference_wav_path=p),
                       [content, ref_wav], audio2)
        demo.launch(server_name=cfg.get("host", "0.0.0.0"),
                    server_port=cfg.get("port", 7860))
    except ImportError:
        from promptttspp_tpu.infer import write_wav

        print("gradio not installed — CLI mode")
        content = input("content (text or ARPA phonemes): ")
        cond = input("style prompt (or @/path/to/reference.wav): ")
        if cond.startswith("@"):
            sr, wav = synthesize(content, reference_wav_path=cond[1:])
        else:
            sr, wav = synthesize(content, style_prompt=cond)
        write_wav("demo_out.wav", wav.astype(np.float32) / 32767.0, sr)
        print("wrote demo_out.wav")


if __name__ == "__main__":
    main()
