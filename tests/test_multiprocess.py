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
    return subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(nproc), str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)


def _losses(proc: subprocess.Popen):
    out, err = proc.communicate(timeout=600)
    assert proc.returncode == 0, f"worker failed:\n{out}\n{err}"
    for line in out.splitlines():
        if line.startswith("LOSSES "):
            return json.loads(line[len("LOSSES "):])
    raise AssertionError(f"no LOSSES line in worker output:\n{out}\n{err}")


@pytest.mark.slow
def test_two_process_losses_match_single_process():
    port = _free_port()
    p0 = _spawn(0, 2, port)
    p1 = _spawn(1, 2, port)
    losses0 = _losses(p0)
    losses1 = _losses(p1)
    single = _losses(_spawn(0, 1, _free_port()))

    assert len(losses0) == len(single) == 2
    np.testing.assert_allclose(losses0, losses1, rtol=0, atol=0)
    np.testing.assert_allclose(losses0, single, rtol=1e-5)
