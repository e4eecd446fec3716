"""File-based e2e over the paragraph-mode datasets (DiDeMo, ActivityNet).

Completes the 4-dataset CLI integration matrix (msrvtt/msvd in their own
modules): descriptions concatenated into one paragraph per video
(dataloader_didemo_retrieval.py:100-130, dataloader_activitynet_retrieval.py
:188-218), real encoded clips, full train CLI as a subprocess.
"""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from e2e_common import run_cli, write_clip  # noqa: E402

N_TRAIN, N_TEST = 8, 4


def _write_clip(path, seed):
    write_clip(path, seed, n_frames=10, fps=5)


def _drive_train(datatype, anno, videos, out):
    r = run_cli(["cli/train.py", "--datatype", datatype,
                 "--anno_path", anno, "--video_path", videos,
                 "--tiny", "--epochs", "1",
                 "--batch_size", "8", "--batch_size_val", "4",
                 "--max_words", "12", "--max_frames", "4", "--mb_batch", "1",
                 "--n_display", "1", "--num_neighbors", "3",
                 "--workers", "2", "--output_dir", out])
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    log = open(os.path.join(out, "log.txt")).read()
    assert "Final test on best checkpoint" in log
    assert "step 1/1" in log       # 8 paragraphs at batch 8 -> one step
    rows = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    eval_rows = [x for x in rows if x.get("kind") == "eval"]
    assert eval_rows and all(
        np.isfinite(x["t2v"]["R1"]) for x in eval_rows), rows


@pytest.mark.slow
def test_train_cli_on_didemo_files(tmp_path):
    videos, anno = tmp_path / "videos", tmp_path / "anns"
    videos.mkdir(), anno.mkdir()
    train = [f"clip{i}" for i in range(N_TRAIN)]
    test = [f"tclip{i}" for i in range(N_TEST)]
    for i, vid in enumerate(train + test):
        _write_clip(videos / f"{vid}.mp4", seed=i)
    (anno / "train_list.txt").write_text("\n".join(train) + "\n")
    (anno / "test_list.txt").write_text("\n".join(test) + "\n")
    # two moment descriptions per video -> ONE concatenated paragraph
    json.dump([{"video": v, "description": f"moment {j} of {v}."}
               for v in train for j in range(2)],
              open(anno / "train_data.json", "w"))
    json.dump([{"video": v, "description": f"test moment {j} of {v}."}
               for v in test for j in range(2)],
              open(anno / "test_data.json", "w"))
    _drive_train("didemo", str(anno), str(videos), str(tmp_path / "run"))


@pytest.mark.slow
def test_train_cli_on_activitynet_files(tmp_path):
    videos, anno = tmp_path / "videos", tmp_path / "anns"
    videos.mkdir(), anno.mkdir()
    train = [f"v_tr{i}" for i in range(N_TRAIN)]
    test = [f"v_te{i}" for i in range(N_TEST)]
    for i, vid in enumerate(train + test):
        # mixed naming: stripped and v_-prefixed files both resolve
        name = vid[2:] if i % 2 == 0 else vid
        _write_clip(videos / f"{name}.mp4", seed=i)
    json.dump(train, open(anno / "train_ids.json", "w"))
    json.dump(test, open(anno / "val_ids.json", "w"))
    json.dump({v: {"duration": 9.5, "sentences":
                   [f"part one of {v}.", f"part two of {v}."]}
               for v in train}, open(anno / "train.json", "w"))
    json.dump({v: {"duration": 7.0, "sentences": [f"a scene in {v}."]}
               for v in test}, open(anno / "val_1.json", "w"))
    _drive_train("activitynet", str(anno), str(videos),
                 str(tmp_path / "run"))
