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
