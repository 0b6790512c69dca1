"""Flagship-depth multichip dryrun as a suite citizen (VERDICT r2 #7):
the REAL model depth (4-block conformer, BERT-base 12 layers, 20-layer
DiffNet) jitted as a full train step over a 2-virtual-device
tensor-parallel CPU mesh — full-depth TP sharding is the thing that
breaks, so it runs every round, not ad hoc.

Spawned as a subprocess: the dryrun needs its own device count (2, not
the suite's 8 — a 1-core host cannot make XLA's collective rendezvous
with 8 oversubscribed virtual devices at this depth).
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_full_depth_tp_train_step():
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        GRAFT_DRYRUN_FULL_DEPTH="1",
    )
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(2)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=2400)
    assert proc.returncode == 0, (
        f"full-depth dryrun failed:\n{proc.stdout[-2000:]}\n"
        f"{proc.stderr[-2000:]}")
    assert "OK" in proc.stdout
