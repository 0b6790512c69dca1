"""Objective evaluation of a synthesize.py output tree.

The reference scores the `ref/` + `prompt/` eval trees by human
listening only (`/root/reference/egs/proposed/bin/synthesize.py:148-168`;
SURVEY.md §4). This scores them objectively against the corpus
ground-truth wavs: MCD (DTW-aligned), mel L1, F0 RMSE (cents), VUV
error rate, duration ratio (`promptttspp_tpu/eval/metrics.py`).

Usage (same config surface as synthesize.py):
    python egs/proposed/bin/eval.py path.root=/data/corpus \
        output_dir=./out/synth [num_eval_utts=50] [modes=[ref,prompt]]

Writes `<output_dir>/eval_metrics.json` (per-mode means + per-utterance
rows) and prints the per-mode summary as one JSON line each.
"""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[3]
sys.path.insert(0, str(REPO))

from promptttspp_tpu.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import numpy as np  # noqa: E402

from promptttspp_tpu.config import (  # noqa: E402
    apply_hydra_runtime, compose)


def read_wav(path: Path) -> np.ndarray:
    from scipy.io import wavfile

    _, wav = wavfile.read(path)
    if wav.dtype.kind == "i":
        wav = wav.astype(np.float32) / np.iinfo(wav.dtype).max
    return wav.astype(np.float32)


def main():
    cfg = compose(REPO / "conf", "synthesize", overrides=sys.argv[1:],
                  drop_hydra_node=False)
    apply_hydra_runtime(cfg)

    import pandas as pd

    from promptttspp_tpu.eval.metrics import evaluate_pair, summarize
    from promptttspp_tpu.ops.mel import MelSpectrogramTransform

    df = pd.read_csv(Path(cfg.path.filtered_df_dir) / "eval_filtered.csv")
    df = df.head(cfg.get("num_eval_utts", 50))
    out_dir = Path(cfg.output_dir)
    modes = list(cfg.get("modes", ["ref", "prompt"]))
    sr = cfg.select("transforms.sample_rate", 24000)
    to_mel = MelSpectrogramTransform(sample_rate=sr)

    report = {}
    for mode in modes:
        rows = []
        for _, row in df.iterrows():
            spk, utt = row["spk_id"], row["item_name"]
            syn_path = out_dir / str(spk) / mode / "wav" / f"{utt}.wav"
            gt_path = (Path(cfg.path.data_root) / str(spk) / "wav24k"
                       / f"{utt}.wav")
            if not syn_path.exists() or not gt_path.exists():
                print(f"skip {spk}/{utt} ({mode}): missing wav",
                      file=sys.stderr)
                continue
            m = evaluate_pair(read_wav(gt_path), read_wav(syn_path),
                              sample_rate=sr, to_mel=to_mel)
            m["spk_id"], m["item_name"] = int(spk), str(utt)
            rows.append(m)
        if not rows:
            continue
        mean = summarize([{k: v for k, v in r.items()
                           if isinstance(v, float)} for r in rows])
        report[mode] = {"mean": mean, "n_utts": len(rows), "utts": rows}
        print(json.dumps({"mode": mode, "n_utts": len(rows), **mean}))

    (out_dir / "eval_metrics.json").write_text(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
