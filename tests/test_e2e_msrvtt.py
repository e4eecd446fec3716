"""End-to-end integration over the REAL file-based dataset path.

Every other e2e drive uses --datatype synthetic (in-memory arrays).  This
module exercises the full production data path the reference ships
(main.py → DATALOADER_DICT["msrvtt"] → cv2 decode → transforms → trainer):
MSR-VTT-format annotation files + actual encoded video files, through the
train CLI (decode → RandAugment → loader → train → mid-epoch eval → best
checkpoint → final test) and then the serving CLIs (index → free-text
search) on the trained checkpoint.

Runs as a subprocess drive — argument parsing, logging, checkpoint IO and
process exit codes are all under test, exactly as a user would run it.
"""

import csv
import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from e2e_common import run_cli as _run  # noqa: E402
from e2e_common import write_clip as _write_clip  # noqa: E402

N_TRAIN, N_TEST = 8, 4


@pytest.fixture(scope="module")
def msrvtt_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("msrvtt_e2e")
    videos = root / "videos"
    anno = root / "anns"
    videos.mkdir(), anno.mkdir()
    for i in range(N_TRAIN + N_TEST):
        _write_clip(videos / f"video{i}.mp4", seed=i)

    with open(anno / "MSRVTT_train.9k.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["video_id"])
        w.writeheader()
        for i in range(N_TRAIN):
            w.writerow({"video_id": f"video{i}"})
    sentences = []
    for i in range(N_TRAIN):
        sentences.append({"video_id": f"video{i}",
                          "caption": f"a person does activity {i}"})
        sentences.append({"video_id": f"video{i}",
                          "caption": f"someone performs action number {i}"})
    json.dump({"sentences": sentences}, open(anno / "MSRVTT_data.json", "w"))
    with open(anno / "MSRVTT_JSFUSION_test.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["video_id", "sentence"])
        w.writeheader()
        for i in range(N_TRAIN, N_TRAIN + N_TEST):
            w.writerow({"video_id": f"video{i}",
                        "sentence": f"a clip showing scene {i}"})
    return str(anno), str(videos), str(root)


@pytest.mark.slow
def test_train_cli_on_msrvtt_files(msrvtt_tree):
    anno, videos, root = msrvtt_tree
    out = os.path.join(root, "run")
    r = _run(["cli/train.py", "--datatype", "msrvtt",
              "--anno_path", anno, "--video_path", videos,
              "--tiny", "--epochs", "1",
              "--batch_size", "8", "--batch_size_val", "4",
              "--max_words", "12", "--max_frames", "4", "--mb_batch", "1",
              "--n_display", "1", "--num_neighbors", "3",
              "--workers", "2", "--output_dir", out])
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    assert os.path.exists(os.path.join(out, "best.npz"))
    assert os.path.exists(os.path.join(out, "state_epoch0.npz"))
    log = open(os.path.join(out, "log.txt")).read()
    assert "Final test on best checkpoint" in log
    # the 16 train items (8 videos × 2 captions) → 2 steps at batch 8
    assert "step 2/2" in log
    # eval ran on the 4-video JSFUSION-format split with finite metrics
    rows = [json.loads(l) for l in
            open(os.path.join(out, "metrics.jsonl"))]
    eval_rows = [x for x in rows if x.get("kind") == "eval"]
    assert eval_rows and all(
        np.isfinite(x["t2v"]["R1"]) for x in eval_rows), rows


@pytest.mark.slow
def test_training_is_deterministic(msrvtt_tree):
    """Two runs with identical arguments produce identical train losses —
    the loader threads, per-item RandAugment RNGs, and cv2 decode introduce
    no nondeterminism (the reference forces cudnn-deterministic for the
    same guarantee, setup.py:32-33).  File-based data on purpose: the
    augment path only runs for real videos."""
    anno, videos, root = msrvtt_tree
    rows = []
    for leg in ("det_a", "det_b"):
        out = os.path.join(root, leg)
        r = _run(["cli/train.py", "--datatype", "msrvtt",
                  "--anno_path", anno, "--video_path", videos,
                  "--tiny", "--epochs", "1",
                  "--batch_size", "8", "--batch_size_val", "4",
                  "--max_words", "12", "--max_frames", "4",
                  "--mb_batch", "1", "--n_display", "1",
                  "--num_neighbors", "3", "--workers", "2",
                  "--output_dir", out])
        assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
        parsed = [json.loads(l) for l in
                  open(os.path.join(out, "metrics.jsonl"))]
        rows.append([x for x in parsed if x.get("kind") == "train"])
    a, b = rows
    assert len(a) == len(b) and len(a) >= 2
    for ra, rb in zip(a, b):
        for k in ("loss", "centrality_loss", "neighbor_loss",
                  "uniform_loss", "kl_loss", "grad_norm"):
            assert ra[k] == rb[k], (k, ra, rb)


@pytest.mark.slow
def test_index_and_search_cli_on_trained_checkpoint(msrvtt_tree):
    anno, videos, root = msrvtt_tree
    ckpt = os.path.join(root, "run", "best.npz")
    if not os.path.exists(ckpt):
        pytest.skip("train CLI test did not run first")
    index = os.path.join(root, "corpus.npz")
    r = _run(["cli/index.py", "--datatype", "msrvtt",
              "--anno_path", anno, "--video_path", videos,
              "--tiny", "--checkpoint", ckpt,
              "--max_words", "12", "--max_frames", "4",
              "--batch_size", "4", "--workers", "2", "--out", index])
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    assert os.path.exists(index)

    r = _run(["cli/search.py", "--index", index, "--tiny",
              "--checkpoint", ckpt, "--max_words", "12",
              "--topk", "2", "--query", "a clip showing scene 9"])
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    assert "video" in r.stdout, r.stdout
