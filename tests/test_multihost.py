"""Multi-host distribution integration test (SURVEY.md §5.8).

Spawns a REAL 2-process jax.distributed cluster (2 local CPU devices per
process, 4 global) running the full TTSTrainer — jax.distributed
.initialize plumbing, per-host batch loading with global shape buckets
(parallel/distributed.py host_batches), global-array assembly via
jax.make_array_from_process_local_data, Gloo collectives, rank-0-only
logging, and the collective orbax checkpoint — then compares against the
identical single-process 4-device run. Replaces the reference's
mp.spawn+DDP capability (`trainers/tts.py:41-54,138-142`).
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "tests" / "multihost_worker.py"


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_worker(mode, pid, nproc, port, outdir):
    return subprocess.Popen(
        [sys.executable, str(WORKER), mode, str(pid), str(nproc),
         str(port), str(outdir)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)


@pytest.mark.slow
def test_two_process_training_matches_single(tmp_path):
    port = _free_port()
    procs = [_run_worker("multi", p, 2, port, tmp_path) for p in range(2)]
    outs = [p.communicate(timeout=560)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"multi worker failed:\n{out[-3000:]}"

    single = _run_worker("single", 0, 1, 0, tmp_path)
    out_s = single.communicate(timeout=560)[0]
    assert single.returncode == 0, f"single worker failed:\n{out_s[-3000:]}"

    r0 = json.loads((tmp_path / "result-multi-0.json").read_text())
    r1 = json.loads((tmp_path / "result-multi-1.json").read_text())
    rs = json.loads((tmp_path / "result-single-0.json").read_text())

    assert r0["process_count"] == 2 and r0["global_devices"] == 4
    assert rs["process_count"] == 1 and rs["global_devices"] == 4
    assert r0["step"] == r1["step"] == rs["step"] > 0

    # both hosts hold the identical replicated params
    assert r0["checksum"] == pytest.approx(r1["checksum"], rel=1e-12)
    # 2-process run numerically equals the single-process run
    assert r0["checksum"] == pytest.approx(rs["checksum"], rel=1e-6)

    # rank-0-only observability: process 0 wrote logs, process 1 didn't
    log = tmp_path / "multi" / "logs" / "train.log"
    assert log.exists()
    csv = (tmp_path / "multi" / "logs" / "loss.csv").read_text()
    assert len(csv.strip().splitlines()) == 3  # header + 2 epochs
    losses_multi = [float(line.split(",")[1])
                    for line in csv.strip().splitlines()[1:]]
    csv_s = (tmp_path / "single" / "logs" / "loss.csv").read_text()
    losses_single = [float(line.split(",")[1])
                     for line in csv_s.strip().splitlines()[1:]]
    np.testing.assert_allclose(losses_multi, losses_single, rtol=1e-4)

    # collective orbax checkpoint landed
    assert (tmp_path / "multi" / "ckpt" / "last").exists()


@pytest.mark.slow
def test_two_process_pipeline_parallel_training(tmp_path):
    """Multi-host + GPipe PP composed ACROSS the process boundary
    (VERDICT r4 #4): data=2 x model=2 mesh with the MODEL (pipeline)
    axis spanning the two processes — the decoder's stage-boundary
    `lax.ppermute` crosses the inter-process link, the placement PP
    exists for (parallel/pp.py: denoisers past one host's memory).
    Each process loads the FULL global batch (data shards are
    host-local replicas; distributed.mesh_process_slice derives this
    from the mesh). Numerically equals the single-process
    (data=2, model=2, 2-microbatch GPipe) run."""
    port = _free_port()
    procs = [_run_worker("multi_pp", p, 2, port, tmp_path)
             for p in range(2)]
    outs = [p.communicate(timeout=560)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"multi_pp worker failed:\n{out[-3000:]}"

    single = _run_worker("single_pp", 0, 1, 0, tmp_path)
    out_s = single.communicate(timeout=560)[0]
    assert single.returncode == 0, f"single_pp worker failed:\n{out_s[-3000:]}"

    r0 = json.loads((tmp_path / "result-multi_pp-0.json").read_text())
    r1 = json.loads((tmp_path / "result-multi_pp-1.json").read_text())
    rs = json.loads((tmp_path / "result-single_pp-0.json").read_text())
    assert r0["process_count"] == 2 and r0["global_devices"] == 4
    assert r0["checksum"] == pytest.approx(r1["checksum"], rel=1e-12)
    assert r0["checksum"] == pytest.approx(rs["checksum"], rel=1e-6)
    assert r0["step"] == rs["step"] > 0


@pytest.mark.slow
def test_two_process_tensor_parallel_training(tmp_path):
    """Multi-host + TP combined: data axis across the 2 processes, model
    axis within each host (parallel/tp.py multi-process placement via
    make_array_from_process_local_data). Numerically equals the
    single-process (data=2, model=2) run."""
    port = _free_port()
    procs = [_run_worker("multi_tp", p, 2, port, tmp_path)
             for p in range(2)]
    outs = [p.communicate(timeout=560)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"multi_tp worker failed:\n{out[-3000:]}"

    single = _run_worker("single_tp", 0, 1, 0, tmp_path)
    out_s = single.communicate(timeout=560)[0]
    assert single.returncode == 0, f"single_tp worker failed:\n{out_s[-3000:]}"

    r0 = json.loads((tmp_path / "result-multi_tp-0.json").read_text())
    r1 = json.loads((tmp_path / "result-multi_tp-1.json").read_text())
    rs = json.loads((tmp_path / "result-single_tp-0.json").read_text())
    assert r0["checksum"] == pytest.approx(r1["checksum"], rel=1e-12)
    assert r0["checksum"] == pytest.approx(rs["checksum"], rel=1e-6)
    assert r0["step"] == rs["step"] > 0


@pytest.mark.slow
def test_two_process_ragged_tail_batches(tmp_path):
    """Non-divisible global batches on a multi-host mesh: fixed-size
    batches of 3 over 16 items leave a 1-row tail on the data=4 mesh.
    mesh_process_rows pads the GLOBAL batch with zero-weight rows
    (single-process pad_batch_to_multiple semantics; the reference
    instead drops such batches, `tts.py:138-142`) — for the tail batch
    one host's slab is ENTIRELY padding (it borrows a row, fully
    zero-weighted). Must be numerically identical to the single-process
    run, which pads the same batches to 4 rows."""
    port = _free_port()
    procs = [_run_worker("multi_rag", p, 2, port, tmp_path)
             for p in range(2)]
    outs = [p.communicate(timeout=560)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"multi_rag worker failed:\n{out[-3000:]}"

    single = _run_worker("single_rag", 0, 1, 0, tmp_path)
    out_s = single.communicate(timeout=560)[0]
    assert single.returncode == 0, \
        f"single_rag worker failed:\n{out_s[-3000:]}"

    r0 = json.loads((tmp_path / "result-multi_rag-0.json").read_text())
    r1 = json.loads((tmp_path / "result-multi_rag-1.json").read_text())
    rs = json.loads((tmp_path / "result-single_rag-0.json").read_text())
    # 6 batches/epoch (16 items in 3s -> tail of 1), both runs
    assert r0["step"] == r1["step"] == rs["step"] == 12
    assert r0["checksum"] == pytest.approx(r1["checksum"], rel=1e-12)
    assert r0["checksum"] == pytest.approx(rs["checksum"], rel=1e-6)
