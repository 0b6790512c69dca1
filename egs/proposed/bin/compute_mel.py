"""Standalone mel extraction + global stats (counterpart of the reference
`egs/proposed/bin/compute_mel.py:28-74`). The main preprocess.py already
computes mels inline; this CLI exists for workflows that re-extract mels
(e.g. after changing the transform) without re-running duration/F0.
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[3]
sys.path.insert(0, str(REPO))

from promptttspp_tpu.platform import apply_platform_env  # noqa: E402

apply_platform_env()

from promptttspp_tpu.config import (  # noqa: E402
    apply_hydra_runtime, compose, instantiate)


def main():
    cfg = compose(REPO / "conf", "preprocess", overrides=sys.argv[1:],
                  drop_hydra_node=False)
    apply_hydra_runtime(cfg)  # hydra.run.dir / job_logging semantics

    import numpy as np
    import pandas as pd
    import yaml

    import jax
    import jax.numpy as jnp

    from promptttspp_tpu.data.batching import bucket_shape
    from promptttspp_tpu.preprocess.pipeline import read_wav

    to_mel = instantiate(cfg.transforms)
    mel_dir = Path(cfg.path.mel_dir)
    finish = mel_dir / "finish"
    if finish.exists():
        print("compute_mel: already finished (marker present)")
        return

    df = pd.read_csv(Path(cfg.path.df_dir) / "data.csv")
    if cfg.get("debug", False):
        df = df.head(50)

    mel_fns = {}
    mel_sum = mel_sqsum = 0.0
    count = 0
    mmin, mmax = np.inf, -np.inf
    records = df.to_dict("records")
    bs = cfg.get("batch_size", 16)
    for start in range(0, len(records), bs):
        chunk = records[start:start + bs]
        wavs, metas = [], []
        for r in chunk:
            spk, utt = str(r["spk_id"]), r["item_name"]
            path = Path(cfg.path.data_root) / spk / "wav24k" / f"{utt}.wav"
            if not path.exists():
                continue
            wav, sr = read_wav(path)
            assert sr == cfg.sample_rate
            wavs.append(wav.astype(np.float32))
            metas.append((spk, utt))
        if not wavs:
            continue
        Ts = bucket_shape(max(len(w) for w in wavs), cfg.sample_rate)
        if Ts not in mel_fns:
            mel_fns[Ts] = jax.jit(to_mel.to_mel)
        padded = np.zeros((len(wavs), Ts), np.float32)
        for i, w in enumerate(wavs):
            padded[i, :len(w)] = w
        mels = np.asarray(mel_fns[Ts](jnp.asarray(padded)))
        for i, (spk, utt) in enumerate(metas):
            n = (len(wavs[i]) + to_mel.n_fft // 2) // to_mel.hop_length
            mel = mels[i, :n]
            d = mel_dir / spk
            d.mkdir(parents=True, exist_ok=True)
            np.save(d / f"{utt}.npy", np.ascontiguousarray(mel.T))
            mel_sum += mel.sum()
            mel_sqsum += (mel ** 2).sum()
            count += mel.size
            mmin = min(mmin, float(mel.min()))
            mmax = max(mmax, float(mel.max()))

    mean = mel_sum / max(count, 1)
    var = mel_sqsum / max(count, 1) - mean ** 2
    with open(mel_dir / "stats.yaml", "w") as f:
        yaml.safe_dump(dict(min=float(mmin), max=float(mmax),
                            mean=float(mean),
                            std=float(np.sqrt(max(var, 0.0))),
                            var=float(var)), f)
    finish.write_text("done\n")
    print(f"compute_mel: wrote stats (mean={mean:.3f})")


if __name__ == "__main__":
    main()
