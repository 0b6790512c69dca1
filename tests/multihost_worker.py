"""Subprocess worker for the multi-host integration test
(test_multihost.py). Runs the REAL TTSTrainer over a 2-process × 2-local-
CPU-device cluster (4 global devices) or the equivalent single-process
4-device mesh, then dumps a params checksum + per-epoch losses.

Usage: python multihost_worker.py <mode> <pid> <nproc> <port> <outdir>
  mode: "multi" (2 local devices, distributed init) | "single" (4 local)
"""

import json
import os
import sys
from pathlib import Path

mode, pid, nproc, port, outdir = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
    Path(sys.argv[5]))

# modes: multi / single (pure DP), multi_tp / single_tp (data=2, model=2
# mesh — multi_tp places the model axis within each host), multi_pp /
# single_pp (data=2, model=2 GPipe pipeline mesh — multi_pp places the
# MODEL axis ACROSS the two processes, so the stage-boundary ppermute
# crosses the inter-process link: the placement PP exists for)
local_devices = 2 if mode.startswith("multi") else 4
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={local_devices}")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from promptttspp_tpu.config import Config  # noqa: E402
from promptttspp_tpu.train.trainer import TTSTrainer  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent))
from test_train import C, MEL, SyntheticDataset, tiny_model  # noqa: E402


class FixedPromptDataset(SyntheticDataset):
    """Deterministic prompts (no sample-time RNG) so the multi-host run
    is numerically comparable to the single-process run; exposes
    num_phones for global shape buckets."""

    def __init__(self, n=16, seed=0):
        super().__init__(n, seed)
        for i, it in enumerate(self.items):
            it["prompt"] = f"speaker {it['spk_id']} utterance {i}"

    def num_phones(self, i):
        return len(self.items[i]["phonemes"])


class OrdTokenizer:
    """Hash-free tokenizer (process-hash-seed independent)."""

    pad_id = 0

    def batch_encode(self, texts, max_length=None):
        seqs = [[1] + [2 + (sum(map(ord, w)) % 50) for w in t.split()] + [3]
                for t in texts]
        L = max_length or max(len(s) for s in seqs)
        ids = np.zeros((len(seqs), L), np.int32)
        mask = np.zeros((len(seqs), L), np.int32)
        for i, s in enumerate(seqs):
            s = s[:L]
            ids[i, :len(s)] = s
            mask[i, :len(s)] = 1
        return ids, mask


def main():
    out = outdir / mode
    pp = mode.endswith("_pp")
    # _rag: fixed-size batches of 3 over 16 items -> a 1-row tail batch
    # on a data=4 mesh; exercises the zero-weight global batch padding
    # (mesh_process_rows) incl. a host whose slab is entirely padding
    ragged = mode.endswith("_rag")
    mesh_cfg = {"model": 2 if (mode.endswith("_tp") or pp) else 1}
    if pp:
        mesh_cfg["pipeline_microbatches"] = 2
        # the GPipe model axis spans the two processes (multi only):
        # ppermute over the inter-process link
        mesh_cfg["model_spans_processes"] = mode.startswith("multi")
    train_cfg = {"seed": 0, "num_epochs": 2, "save_interval": 100,
                 "lr_scheduler": {"warmup_steps": 10},
                 "prompt_pad_to": 16,
                 "mesh": mesh_cfg}
    if ragged:
        train_cfg["batch_size"] = 3
    cfg = Config({
        "output_dir": str(out),
        "train": train_cfg,
        "optimizer": {"lr": 1e-3, "betas": [0.9, 0.98], "weight_decay": 0.0},
        "dataset": {"dynamic_batch": not ragged, "max_tokens": 400},
    })
    if mode.startswith("multi"):
        cfg.train.distributed = Config({
            "coordinator_address": f"localhost:{port}",
            "num_processes": nproc,
            "process_id": pid,
        })
    model = tiny_model()
    if pp:
        # GPipe needs stages whose size is a multiple of the dilation
        # cycle: 4 layers -> 2 stages x 2 layers (cycle 2)
        from promptttspp_tpu.models.diffusion import DiffNet

        model = model.clone(decoder=model.decoder.clone(
            denoise_fn=DiffNet(
                in_dim=MEL, encoder_hidden_dim=C, residual_layers=4,
                residual_channels=16, kernel_size=3,
                dilation_cycle_length=2)))
    trainer = TTSTrainer(
        cfg, train_ds=FixedPromptDataset(16), valid_ds=FixedPromptDataset(8, 1),
        tokenizer=OrdTokenizer(), model=model, freeze_bert=False)
    state = trainer.run()

    leaves = jax.tree.leaves(state.params)
    checksum = float(sum(float(jax.numpy.sum(jax.numpy.abs(x)))
                         for x in leaves))
    result = {
        "mode": mode, "pid": pid,
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "step": int(state.step),
        "checksum": checksum,
    }
    (outdir / f"result-{mode}-{pid}.json").write_text(json.dumps(result))
    print("OK", json.dumps(result))


if __name__ == "__main__":
    main()
