"""End-to-end TTSTrainer smoke on REAL hardware.

The CI suite trains on the virtual CPU mesh; this script runs the actual
trainer (flagship model, dynamic batches, async/sync_native input
pipeline, orbax checkpointing, resume) on whatever accelerator the
default backend exposes — the v5e chip under the tunnel in this image.

Usage: python scripts/train_tpu_smoke.py [--utts 128] [--epochs 2]
           [--pipeline sync_native]
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from promptttspp_tpu.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--utts", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--max-tokens", type=int, default=15000)
    ap.add_argument("--pipeline", default="sync_native",
                    choices=["prefetch", "sync", "sync_native"])
    ap.add_argument("--t-range", default="300,512")
    args = ap.parse_args()

    import jax

    from promptttspp_tpu.config import Config
    from promptttspp_tpu.data.dataset import AllWithSpkPromptNormDataset
    from promptttspp_tpu.flagship import build_flagship_model
    from promptttspp_tpu.train import checkpoint as ckpt_lib
    from promptttspp_tpu.train.trainer import TTSTrainer

    sys.path.insert(0, str(REPO / "scripts"))
    from profile_epoch import Vocab30kTokenizer, make_corpus

    print(f"backend: {jax.default_backend()} devices: {jax.devices()}",
          file=sys.stderr)

    root = Path(tempfile.mkdtemp(prefix="train_smoke_"))
    t_range = tuple(int(x) for x in args.t_range.split(","))
    make_corpus(root, args.utts, t_range=t_range)
    out = root / "out"

    def make_trainer(extra=None):
        cfg = Config({
            "output_dir": str(out),
            "train": {"seed": 0, "num_epochs": args.epochs,
                      "save_interval": args.epochs, "bf16": True,
                      "input_pipeline": args.pipeline,
                      "compilation_cache_dir": str(root / "jaxcache"),
                      "lr_scheduler": {"warmup_steps": 100},
                      **(extra or {})},
            "optimizer": {"lr": 1e-3, "betas": [0.9, 0.98],
                          "weight_decay": 0.0},
            "dataset": {"dynamic_batch": True,
                        "max_tokens": args.max_tokens},
        })
        ds = AllWithSpkPromptNormDataset(
            file_path=root / "train.csv", data_root=root,
            feats_dir=root / "feats", mel_dir=root / "mel63",
            prompt_candidate_file=root / "style.csv",
            spk_prompt_candidate_file=root / "spk.csv", seed=0)
        return TTSTrainer(cfg, train_ds=ds, tokenizer=Vocab30kTokenizer(),
                          model=build_flagship_model(), freeze_bert=False)

    t0 = time.time()
    state = make_trainer().run()
    train_s = time.time() - t0
    assert int(state.step) > 0

    # resume from the checkpoint for one more epoch
    trainer2 = make_trainer({"num_epochs": args.epochs + 1})
    trainer2.cfg.ckpt_path = str(out / "ckpt" / "last")
    state2 = trainer2.run()
    assert int(state2.step) > int(state.step)

    csv = (out / "logs" / "loss.csv").read_text().strip().splitlines()
    col = csv[0].split(",").index("loss")
    losses = [float(line.split(",")[col]) for line in csv[1:]]
    print(json.dumps({
        "backend": jax.default_backend(),
        "epochs": len(losses), "steps": int(state2.step),
        "first_loss": losses[0], "last_loss": losses[-1],
        "train_s": round(train_s, 1),
        "pipeline": args.pipeline,
        "resumed": True,
    }))
    import os

    sys.stdout.flush()
    os._exit(0)  # dodge tunnel teardown hangs


if __name__ == "__main__":
    main()
