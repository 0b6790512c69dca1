"""Batch eval synthesis (counterpart of the reference
`egs/proposed/bin/synthesize.py:93-221`): for each filtered eval utterance
synthesize with BOTH reference-mel and style-prompt conditioning, writing
wavs under `<output_dir>/<spk>/{ref,prompt}/wav/<utt>.wav` plus a `finish`
marker — the same eval-tree layout the reference produces
(`synthesize.py:148-168,216-217`). The reference mel is computed from the
corpus wav on the fly (`synthesize.py:172-175`), falling back to the
precomputed mel63 npy when the wav tree is absent.
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[3]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

from promptttspp_tpu.platform import apply_platform_env  # noqa: E402

apply_platform_env()

from promptttspp_tpu.config import (  # noqa: E402
    apply_hydra_runtime, compose, instantiate)


def load_variables(path, kind="model", cfg=None):
    """Load model variables from an orbax train-checkpoint dir, a
    converted-npz, or directly from a reference torch ``.ckpt`` file
    (auto-converted through the weight-name mapping — matching the
    reference's `load_model`, `/root/reference/app.py:28-39`, which
    accepts the published checkpoints as-is)."""
    import promptttspp_tpu.train.checkpoint  # noqa: F401

    path = Path(path)
    if path.is_dir():
        import orbax.checkpoint as ocp

        tree = ocp.PyTreeCheckpointer().restore(path.absolute())
        # host numpy: restored arrays carry the saving topology's sharding,
        # which clashes with jit outputs on a different device set
        import jax

        tree = jax.tree.map(np.asarray, tree)
        return {"params": tree["params"],
                "batch_stats": tree.get("batch_stats", {})}
    if path.suffix in (".ckpt", ".pth", ".pt"):
        from promptttspp_tpu.compat.torch_ckpt import (
            convert_reference_checkpoint, torch_state_dict)

        assert cfg is not None, "cfg required for torch-ckpt conversion"
        return convert_reference_checkpoint(
            kind, torch_state_dict(path, kind), cfg)
    if path.suffix == ".npz":
        from promptttspp_tpu.compat.torch_ckpt import (
            convert_reference_checkpoint)

        assert cfg is not None, "cfg required for torch-ckpt conversion"
        sd = dict(np.load(path, allow_pickle=False))
        return convert_reference_checkpoint(kind, sd, cfg)
    raise ValueError(f"unsupported checkpoint {path}")


def build_synthesizer(cfg):
    import yaml

    import promptttspp_tpu.models  # noqa: F401
    from promptttspp_tpu.infer import Synthesizer
    from promptttspp_tpu.models.bert import WordPieceTokenizer

    model = instantiate(cfg.model)
    vocoder = instantiate(cfg.vocoder)
    variables = load_variables(cfg.model_ckpt, "model", cfg)
    voc_vars = load_variables(cfg.vocoder_ckpt, "vocoder", cfg)
    to_mel = instantiate(cfg.transforms)

    with open(Path(cfg.path.mel_dir) / "stats.yaml") as f:
        mel_stats = yaml.safe_load(f)
    tokenizer = WordPieceTokenizer.from_vocab_file(cfg.path.bert_vocab_file)

    # multi-chip serving knobs (parallel/sp.py, vocoders/streaming.py):
    # e.g. `+vocoder_mode=sharded +frame_sharded_decode=true`; latency
    # knobs (same surface as app.py, so prewarm_serving.py warms the
    # grid the deployment will actually dispatch): `+speculative=true`,
    # `+spec_duration_table=<npz>` (scripts/make_spec_duration_table.py),
    # `+spec_margin=3 +spec_rate_margin=0.2`
    spec_kw = {}
    tbl = cfg.get("spec_duration_table")
    if tbl:
        t = np.load(tbl)
        spec_kw = dict(spec_duration_table=t["mean"],
                       spec_duration_std=t["std"])
    return Synthesizer(model, variables, vocoder, voc_vars,
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


def load_reference_mel(synth, cfg, spk, utt):
    """Corpus wav -> log-mel; mel63 npy fallback (raw, pre-normalization —
    normalization happens inside the Synthesizer, matching
    `/root/reference/egs/proposed/bin/synthesize.py:172-175`)."""
    wav_path = Path(cfg.path.data_root) / str(spk) / "wav24k" / f"{utt}.wav"
    if wav_path.exists():
        from scipy.io import wavfile

        _, wav = wavfile.read(wav_path)
        if wav.dtype.kind == "i":
            wav = wav.astype(np.float32) / np.iinfo(wav.dtype).max
        return synth.wav_to_mel(wav.astype(np.float32))
    # mel63 npys are stored [80, T] like the reference's; -> [T, 80]
    return np.load(Path(cfg.path.mel_dir) / str(spk) / f"{utt}.npy").T


def main():
    cfg = compose(REPO / "conf", "synthesize", overrides=sys.argv[1:],
                  drop_hydra_node=False)
    apply_hydra_runtime(cfg)  # hydra.run.dir / job_logging semantics

    import pandas as pd

    from promptttspp_tpu.infer import write_wav
    from promptttspp_tpu.data.dataset import read_prompt_candidate

    synth = build_synthesizer(cfg)

    df = pd.read_csv(Path(cfg.path.filtered_df_dir) / "eval_filtered.csv")
    df = df.head(cfg.get("num_eval_utts", 50))
    prompt_candidate = read_prompt_candidate(cfg.path.prompt_candidate_file)
    out_dir = Path(cfg.output_dir)

    rng = np.random.RandomState(cfg.get("seed", 1234))
    for _, row in df.iterrows():
        spk, utt = row["spk_id"], row["item_name"]
        seq = [int(s) for s in row["seq"].split()]
        prompt = rng.choice(prompt_candidate[row["style_prompt_key"]])

        for mode in ("ref", "prompt"):
            wav_dir = out_dir / str(spk) / mode / "wav"
            wav_dir.mkdir(parents=True, exist_ok=True)
            if mode == "ref":
                ref_mel = load_reference_mel(synth, cfg, spk, utt)
                wavs, _ = synth.synthesize(
                    [seq], reference_mels=[ref_mel],
                    use_max=cfg.get("use_max", True),
                    noise_scale=cfg.get("noise_scale", 0.5))
            else:
                wavs, _ = synth.synthesize(
                    [seq], prompts=[f"{prompt}."],
                    use_max=cfg.get("use_max", True),
                    noise_scale=cfg.get("noise_scale", 0.5))
            write_wav(wav_dir / f"{utt}.wav", wavs[0])
        print(f"wrote {spk}/{utt} (ref + prompt)")

    (out_dir / "finish").write_text("finish")


if __name__ == "__main__":
    main()
