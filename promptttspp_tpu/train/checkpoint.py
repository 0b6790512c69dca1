"""Checkpoint save/resume via orbax.

Same logical contents and cadence as the reference
(`/root/reference/promptttspp/trainers/tts.py:245-254`): {epoch, model
(params + batch_stats), optimizer, step} written to ``ckpt/last`` every
epoch and ``ckpt/epoch-N`` every ``save_interval``; resume restores all
and continues at epoch+1; warm start loads model weights only.

TPU-native twist (VERDICT r2 #6): epoch-cadence saves go through
``ocp.AsyncCheckpointer`` — the device->host gather happens inline (so
the donated train state can keep mutating) but the ~GB-scale serialize +
fsync runs on a background thread, and the epoch loop stalls only on the
gather instead of the full write. ``wait_until_finished()`` joins the
writer; restores and process exit call it implicitly. The on-disk format
is the plain orbax PyTree layout.

Compatibility note: the structural-freeze change altered the
``opt_state`` TREE (optimizer state now covers only the trainable
subtree, and the optax.masked wrapper is gone), so a full RESUME of a
freeze_bert checkpoint written by pre-structural-freeze code fails on
the opt_state template mismatch. Params/batch_stats layouts are
unchanged — warm-start such checkpoints via ``pretrained_ckpt``
(load_pretrained_params) instead; ``scripts/convert_torch_ckpt.py``
outputs restore fine either way.
"""

from __future__ import annotations

import atexit
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

_async: Optional[ocp.AsyncCheckpointer] = None


def _async_checkpointer() -> ocp.AsyncCheckpointer:
    global _async
    if _async is None:
        _async = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        atexit.register(wait_until_finished)
    return _async


def wait_until_finished():
    """Join any in-flight async save (no-op when none)."""
    if _async is not None:
        _async.wait_until_finished()


def _tree(state, epoch: int) -> Dict:
    return {
        "epoch": epoch,
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def save_checkpoint(path, state, epoch: int, block: bool = False):
    """state: TrainState. Writes a composite pytree.

    block=False (default) returns after the device->host gather; the
    disk write completes on the orbax background thread. block=True
    additionally joins the write (crash/final checkpoints)."""
    path = Path(path).absolute()
    ckptr = _async_checkpointer()
    # AsyncCheckpointer.save waits for the previous save itself, but be
    # explicit so back-to-back saves ("last" then "epoch-N") serialize
    # deterministically
    ckptr.wait_until_finished()
    ckptr.save(path, args=ocp.args.PyTreeSave(_tree(state, epoch)),
               force=True)
    if block:
        ckptr.wait_until_finished()


def restore_checkpoint(path, state) -> tuple:
    """Returns (state, epoch). ``state`` provides the target structure."""
    wait_until_finished()
    path = Path(path).absolute()
    restored = _async_checkpointer().restore(
        path, args=ocp.args.PyTreeRestore(item=_tree(state, 0)))
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
    wait_until_finished()
    path = Path(path).absolute()
    restored = _async_checkpointer().restore(
        path, args=ocp.args.PyTreeRestore(item=_tree(state, 0)))
    return state.replace(params=restored["params"],
                         batch_stats=restored["batch_stats"])
