"""Shared plumbing for the file-based e2e CLI drives (test_e2e_*.py)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def write_clip(path, seed, n_frames=12, fps=6, w=64, h=48):
    """A real encoded clip with per-video distinct, slowly-varying content."""
    import cv2
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    if not writer.isOpened():
        pytest.skip("cv2 VideoWriter mp4v unavailable")
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    for i in range(n_frames):
        writer.write(np.clip(base.astype(np.int32) + i * 5, 0, 255)
                     .astype(np.uint8))
    writer.release()


def run_cli(args, timeout=900):
    """Run a CLI as a user would, pinned to ONE CPU device: the data-path
    tests use tiny val splits that don't divide an 8-device mesh (mesh
    paths are covered by the synthetic drives and the config matrix)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = ""
    return subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)
