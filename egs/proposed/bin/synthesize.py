"""Batch eval synthesis (counterpart of the reference
`egs/proposed/bin/synthesize.py:93-221`): for each filtered eval utterance
synthesize with BOTH reference-mel and style-prompt conditioning, write
wavs under out/<ref|prompt>/.
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[3]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

from promptttspp_tpu.platform import apply_platform_env  # noqa: E402

apply_platform_env()

from promptttspp_tpu.config import compose, instantiate  # noqa: E402


def load_variables(path):
    """Load model variables from an orbax train checkpoint dir or a
    converted-npz of the torch reference checkpoint."""
    import promptttspp_tpu.train.checkpoint  # noqa: F401
    import orbax.checkpoint as ocp

    path = Path(path)
    if path.is_dir():
        tree = ocp.PyTreeCheckpointer().restore(path.absolute())
        # host numpy: restored arrays carry the saving topology's sharding,
        # which clashes with jit outputs on a different device set
        import jax

        tree = jax.tree.map(np.asarray, tree)
        return {"params": tree["params"],
                "batch_stats": tree.get("batch_stats", {})}
    raise ValueError(
        f"unsupported checkpoint {path}; use scripts/convert_torch_ckpt.py "
        "for torch checkpoints")


def main():
    cfg = compose(REPO / "conf", "synthesize", overrides=sys.argv[1:])

    import pandas as pd
    import yaml

    import promptttspp_tpu.models  # noqa: F401
    from promptttspp_tpu.infer import Synthesizer, write_wav
    from promptttspp_tpu.models.bert import WordPieceTokenizer
    from promptttspp_tpu.data.dataset import read_prompt_candidate

    model = instantiate(cfg.model)
    vocoder = instantiate(cfg.vocoder)
    variables = load_variables(cfg.model_ckpt)
    voc_vars = load_variables(cfg.vocoder_ckpt)

    with open(Path(cfg.path.mel_dir) / "stats.yaml") as f:
        mel_stats = yaml.safe_load(f)
    tokenizer = WordPieceTokenizer.from_vocab_file(cfg.path.bert_vocab_file)

    synth = Synthesizer(model, variables, vocoder, voc_vars,
                        mel_stats=mel_stats, tokenizer=tokenizer)

    df = pd.read_csv(Path(cfg.path.filtered_df_dir) / "eval_filtered.csv")
    df = df.head(cfg.get("num_eval_utts", 50))
    prompt_candidate = read_prompt_candidate(cfg.path.prompt_candidate_file)
    out_dir = Path(cfg.output_dir)
    (out_dir / "prompt").mkdir(parents=True, exist_ok=True)

    rng = np.random.RandomState(cfg.get("seed", 1234))
    for _, row in df.iterrows():
        seq = [int(s) for s in row["seq"].split()]
        prompt = rng.choice(prompt_candidate[row["style_prompt_key"]])
        wavs, _ = synth.synthesize(
            [seq], prompts=[f"{prompt}."],
            use_max=cfg.get("use_max", True),
            noise_scale=cfg.get("noise_scale", 0.5))
        write_wav(out_dir / "prompt" / f"{row['item_name']}.wav", wavs[0])
        print(f"wrote {row['item_name']} ({len(wavs[0]) / 24000:.2f}s)")


if __name__ == "__main__":
    main()
