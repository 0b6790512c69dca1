"""Feature preprocessing entry point (counterpart of the reference
`egs/proposed/bin/preprocess.py` + `compute_mel.py` merged): durations from
TextGrid, batched on-device F0 + mel, stats, CSVs.
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[3]
sys.path.insert(0, str(REPO))

from promptttspp_tpu.platform import apply_platform_env  # noqa: E402

apply_platform_env()

from promptttspp_tpu.config import (  # noqa: E402
    apply_hydra_runtime, compose)


def main():
    cfg = compose(REPO / "conf", "preprocess", overrides=sys.argv[1:],
                  drop_hydra_node=False)
    apply_hydra_runtime(cfg)  # hydra.run.dir / job_logging semantics
    import yaml

    from promptttspp_tpu.preprocess.pipeline import preprocess_corpus

    f0_stats = None
    stats_file = cfg.select("path.f0_stats_file")
    if stats_file and Path(stats_file).exists():
        with open(stats_file) as f:
            f0_stats = yaml.safe_load(f)

    preprocess_corpus(
        data_csv=cfg.path.data_csv_file,
        data_root=cfg.path.data_root,
        feats_dir=cfg.path.feats_dir,
        mel_dir=cfg.path.mel_dir,
        df_dir=cfg.path.df_dir,
        f0_stats=f0_stats,
        eval_ids=cfg.get("eval_ids", []),
        sample_rate=cfg.sample_rate,
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        batch_size=cfg.get("batch_size", 16),
        debug=cfg.get("debug", False),
        f0_method=cfg.get("f0_method", "yin"),
    )


if __name__ == "__main__":
    main()
