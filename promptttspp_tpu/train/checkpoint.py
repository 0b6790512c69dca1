"""Checkpoint save/resume via orbax.

Same logical contents and cadence as the reference
(`/root/reference/promptttspp/trainers/tts.py:245-254`): {epoch, model
(params + batch_stats), optimizer, step} written to ``ckpt/last`` every
epoch and ``ckpt/epoch-N`` every ``save_interval``; resume restores all
and continues at epoch+1; warm start loads model weights only.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(path, state, epoch: int):
    """state: TrainState. Writes a composite pytree."""
    path = Path(path).absolute()
    tree = {
        "epoch": epoch,
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    _checkpointer().save(path, tree, force=True)


def restore_checkpoint(path, state) -> tuple:
    """Returns (state, epoch). ``state`` provides the target structure."""
    path = Path(path).absolute()
    template = {
        "epoch": 0,
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    restored = _checkpointer().restore(path, item=template)
    new_state = state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
    return new_state, int(restored["epoch"])


def load_pretrained_params(path, state):
    """Warm start: model weights only, optimizer untouched
    (`trainers/tts.py:95-104`)."""
    path = Path(path).absolute()
    template = {
        "epoch": 0,
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    restored = _checkpointer().restore(path, item=template)
    return state.replace(params=restored["params"],
                         batch_stats=restored["batch_stats"])
