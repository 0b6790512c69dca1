"""Training entry point (counterpart of the reference
`egs/proposed/bin/train.py`): composes conf/train.yaml (+CLI overrides)
and runs the TPU trainer.

Usage:
    python egs/proposed/bin/train.py path.root=/data/promptttspp \
        model=prompttts_mdn_v2_wo_erg_final dataset.max_tokens=30000
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
    cfg = compose(REPO / "conf", "train", overrides=sys.argv[1:],
                  drop_hydra_node=False)
    apply_hydra_runtime(cfg)  # hydra.run.dir / job_logging semantics

    from promptttspp_tpu.models.bert import WordPieceTokenizer
    from promptttspp_tpu.train.trainer import TTSTrainer

    tokenizer = None
    vocab = cfg.select("path.bert_vocab_file")
    if vocab and Path(vocab).exists():
        tokenizer = WordPieceTokenizer.from_vocab_file(vocab)
    else:
        print(f"WARNING: BERT vocab not found at {vocab}; "
              "prompts cannot be tokenized — set path.bert_vocab_file")

    TTSTrainer(cfg, tokenizer=tokenizer).run()


if __name__ == "__main__":
    main()
