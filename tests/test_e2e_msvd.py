"""File-based e2e over the MSVD multi-sentence protocol.

tests/test_e2e_msrvtt.py covers the single-sentence production path; this
drives the OTHER eval protocol the reference ships (multi_sentence_per_video,
dataloader_msvd_retrieval.py:108-136): every caption of every test video is
a query row, videos are deduplicated by group (cut_off_points), and ranks
come from the 3-D multi-sentence metrics — through the train CLI on real
encoded clips, as a subprocess.
"""

import json
import os
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from e2e_common import run_cli, write_clip  # noqa: E402


def _write_clip(path, seed):
    write_clip(path, seed, n_frames=10, fps=5)


@pytest.fixture(scope="module")
def msvd_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("msvd_e2e")
    videos = root / "videos"
    anno = root / "anns"
    videos.mkdir(), anno.mkdir()

    train_vids = [f"train{i}" for i in range(6)]
    test_vids = ["testA", "testB", "testC"]
    for i, vid in enumerate(train_vids + test_vids):
        _write_clip(videos / f"{vid}.mp4", seed=i)

    (anno / "train_list.txt").write_text("\n".join(train_vids) + "\n")
    (anno / "val_list.txt").write_text("testA\n")
    (anno / "test_list.txt").write_text("\n".join(test_vids) + "\n")
    captions = {v: [["someone", "does", "thing", str(i)],
                    ["a", "person", "acts", str(i)]]
                for i, v in enumerate(train_vids)}
    # uneven caption counts per test video — the cut_off_points substance
    captions["testA"] = [["a", "red", "scene"], ["the", "red", "clip"]]
    captions["testB"] = [["a", "green", "scene"], ["the", "green", "clip"],
                         ["green", "pixels", "move"]]
    captions["testC"] = [["a", "blue", "scene"]]
    pickle.dump(captions, open(anno / "raw-captions.pkl", "wb"))
    return str(anno), str(videos), str(root)


@pytest.mark.slow
def test_train_cli_on_msvd_multi_sentence(msvd_tree):
    anno, videos, root = msvd_tree
    out = os.path.join(root, "run")
    r = run_cli(["cli/train.py", "--datatype", "msvd",
                 "--anno_path", anno, "--video_path", videos,
                 "--tiny", "--epochs", "1",
                 "--batch_size", "8", "--batch_size_val", "4",
                 "--max_words", "10", "--max_frames", "4", "--mb_batch", "1",
                 "--n_display", "1", "--num_neighbors", "3",
                 "--workers", "2", "--output_dir", out])
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    assert os.path.exists(os.path.join(out, "best.npz"))
    log = open(os.path.join(out, "log.txt")).read()
    assert "Final test on best checkpoint" in log
    # 12 train pairs (6 videos x 2 captions) at batch 8, drop_last -> 1 step
    assert "step 1/1" in log
    rows = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    eval_rows = [x for x in rows if x.get("kind") == "eval"]
    # multi-sentence protocol: 6 caption queries over 3 unique videos;
    # R@1 over 3 candidates is a multiple of 100/6 per direction
    assert eval_rows and all(
        np.isfinite(x["t2v"]["R1"]) for x in eval_rows), rows
