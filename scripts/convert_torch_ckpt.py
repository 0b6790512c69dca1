"""Convert a reference PyTorch checkpoint into this framework's orbax
format.

Usage:
    python scripts/convert_torch_ckpt.py model  <in.ckpt> <out_dir>
    python scripts/convert_torch_ckpt.py vocoder <in.ckpt> <out_dir>

Model checkpoints are the reference trainer's
``{epoch, model, optimizer, lr_scheduler}`` dicts
(`/root/reference/promptttspp/trainers/tts.py:245-254`); vocoder
checkpoints carry the generator under ``generator`` (`app.py:35-37`).
Weight-norm is folded; optimizer state is NOT converted (warm-start only).

Note: `egs/proposed/bin/synthesize.py` and `app.py` also accept torch
``.ckpt`` files directly (auto-converted in memory); this script exists to
persist the conversion once for repeated runs.
"""

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    kind, in_path, out_dir = sys.argv[1], sys.argv[2], Path(sys.argv[3])

    import orbax.checkpoint as ocp

    from promptttspp_tpu.compat.torch_ckpt import (
        convert_reference_checkpoint, torch_state_dict)
    from promptttspp_tpu.config import compose

    cfg = compose(REPO / "conf", "train" if kind == "model" else "synthesize")
    converted = convert_reference_checkpoint(
        kind, torch_state_dict(in_path, kind), cfg)

    tree = {"epoch": 0, "step": np.int32(0), "params": converted["params"],
            "batch_stats": converted.get("batch_stats", {}),
            "opt_state": {}}
    ocp.PyTreeCheckpointer().save(out_dir.absolute(), tree, force=True)
    print(f"converted {kind} checkpoint -> {out_dir}")


if __name__ == "__main__":
    main()
