"""Filter eval utterances to 3-10 s (counterpart of the reference
`egs/proposed/bin/filter_eval.py`)."""

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
    from promptttspp_tpu.preprocess.pipeline import filter_eval

    filter_eval(cfg.path.df_dir, cfg.path.filtered_df_dir,
                hop_length=cfg.hop_length, sample_rate=cfg.sample_rate,
                min_sec=cfg.get("min_sec", 3.0),
                max_sec=cfg.get("max_sec", 10.0))


if __name__ == "__main__":
    main()
