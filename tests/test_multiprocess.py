"""TRUE multi-process (multi-host) execution test: two CPU controller
processes over Gloo collectives reproduce the single-controller losses.

This exercises the real multi-host stack end-to-end — per-process
BatchLoader sharding (data/loader.py), make_array_from_process_local_data
assembly (parallel/mesh.py:shard_batch), and the SPMD train step — the
reference's DistributedSampler + NCCL DDP contract
(data_dataloaders.py:32-38, optimizer.py:78-84)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(pid: int, nproc: int, port: int) -> subprocess.Popen:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    # one CPU device per process: the 2-process run forms a 2-device mesh
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    # fresh shared dir per run for the resume-auto resolution check
    env["NRTPU_MP_TAG"] = f"{port}_{nproc}"
    return subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(nproc), str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)


def _results(proc: subprocess.Popen):
    out, err = proc.communicate(timeout=600)
    assert proc.returncode == 0, f"worker failed:\n{out}\n{err}"
    losses = evals = resumes = None
    for line in out.splitlines():
        if line.startswith("LOSSES "):
            losses = json.loads(line[len("LOSSES "):])
        elif line.startswith("EVAL "):
            evals = json.loads(line[len("EVAL "):])
        elif line.startswith("RESUME "):
            resumes = json.loads(line[len("RESUME "):])
    assert losses is not None and evals is not None and resumes is not None, \
        f"missing LOSSES/EVAL/RESUME line in worker output:\n{out}\n{err}"
    return losses, evals, resumes


@pytest.mark.slow
def test_two_process_losses_match_single_process():
    port = _free_port()
    p0 = _spawn(0, 2, port)
    p1 = _spawn(1, 2, port)
    losses0, evals0, resumes0 = _results(p0)
    losses1, evals1, resumes1 = _results(p1)
    single, evals_single, resumes_single = _results(
        _spawn(0, 1, _free_port()))

    assert len(losses0) == len(single) == 2
    np.testing.assert_allclose(losses0, losses1, rtol=0, atol=0)
    np.testing.assert_allclose(losses0, single, rtol=1e-5)
    # evaluate() over the 2-process mesh (per-process loader shards assembled
    # via make_array_from_process_local_data) reproduces the
    # single-controller metrics: both directions, every metric
    for d0, d1, ds_ in zip(evals0, evals1, evals_single):
        assert d0 == d1
        for k in ds_:
            np.testing.assert_allclose(d0[k], ds_[k], rtol=1e-5,
                                       err_msg=f"metric {k}")
    # --resume auto: only process 0 writes checkpoints; the broadcast
    # resolution must land every process on the SAME decision — None on an
    # empty dir, then the state process 0 just wrote
    assert resumes0 == resumes1, (resumes0, resumes1)
    assert resumes0[0] is None and resumes0[1].endswith("state_epoch0.npz")
    assert resumes_single[0] is None
    assert resumes_single[1].endswith("state_epoch0.npz")


def _spawn_cli(pid: int, nproc: int, port: int, outdir: str,
               extra=()) -> subprocess.Popen:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    cli = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "cli", "train.py")
    cmd = [sys.executable, cli, "--datatype", "synthetic", "--epochs", "1",
           "--batch_size", "8", "--batch_size_val", "8",
           "--max_words", "8", "--max_frames", "4", "--mb_batch", "1",
           "--synthetic_size", "16", "--n_display", "1",
           "--num_neighbors", "3", "--workers", "2",
           "--output_dir", outdir, *extra]
    if nproc > 1:
        cmd += ["--coordinator", f"localhost:{port}",
                "--num_processes", str(nproc), "--process_id", str(pid)]
    return subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True)


def _train_losses(outdir: str):
    rows = [json.loads(l) for l in
            open(os.path.join(outdir, "metrics.jsonl"))]
    return [(r["step"], r["loss"]) for r in rows if r.get("kind") == "train"]


@pytest.mark.slow
def test_train_cli_two_processes_match_single(tmp_path):
    """The user-facing multi-host contract: `cli/train.py --coordinator ...
    --num_processes 2 --process_id {0,1}` on two controllers produces the
    single-controller losses, process 0 owns the checkpoints/logs, and the
    run completes end-to-end (bank fill, train, mid-epoch + final eval)."""
    single = str(tmp_path / "single")
    r = _spawn_cli(0, 1, 0, single)
    out, err = r.communicate(timeout=1200)
    assert r.returncode == 0, (out[-2000:], err[-2000:])

    duo = str(tmp_path / "duo")
    port = _free_port()
    procs = [_spawn_cli(pid, 2, port, duo) for pid in range(2)]
    # drain both pipes CONCURRENTLY: the processes share collectives, so a
    # sequential communicate() deadlocks if the other fills its pipe buffer
    import threading
    outs = [None, None]

    def drain(i):
        outs[i] = procs[i].communicate(timeout=1200)

    drains = [threading.Thread(target=drain, args=(i,)) for i in range(2)]
    for t in drains:
        t.start()
    for t in drains:
        t.join(timeout=1300)
    for p, res in zip(procs, outs):
        assert res is not None, "worker pipe drain timed out"
        out, err = res
        assert p.returncode == 0, (out[-2000:], err[-2000:])

    want, got = _train_losses(single), _train_losses(duo)
    assert len(want) == len(got) >= 2
    for (ws, wl), (gs, gl) in zip(want, got):
        assert ws == gs
        np.testing.assert_allclose(gl, wl, rtol=0, atol=1e-4)
    # process-0-only artifacts exist exactly once
    assert os.path.exists(os.path.join(duo, "best.npz"))
    assert os.path.exists(os.path.join(duo, "state_epoch0.npz"))


def test_init_distributed_flag_validation():
    import argparse

    from cli.common import init_distributed
    ns = argparse.Namespace(coordinator="localhost:1", num_processes=None,
                            process_id=0)
    with pytest.raises(SystemExit, match="together"):
        init_distributed(ns)
    ns = argparse.Namespace(coordinator="localhost:1", num_processes=2,
                            process_id=5)
    with pytest.raises(SystemExit, match="out of range"):
        init_distributed(ns)
    # all-None is a no-op (single process)
    init_distributed(argparse.Namespace(coordinator=None, num_processes=None,
                                        process_id=None))
