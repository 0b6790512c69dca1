"""Speaker-level train/val split (counterpart of the reference
`egs/proposed/bin/split_df.py`)."""

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
    from promptttspp_tpu.preprocess.pipeline import split_train_valid

    split_train_valid(cfg.path.df_dir, cfg.path.filtered_df_dir)


if __name__ == "__main__":
    main()
