"""Annotation-parser tests for all four datasets against tiny synthetic
fixtures that mirror the real annotation formats (no videos needed — items
decode to zero frames with zero masks, which the pipeline treats as the
defensive fallback)."""

import csv
import json
import pickle

import numpy as np
import pytest

from neighborretr_tpu.data.registry import EVAL_SUBSET, build_dataset
from neighborretr_tpu.data.tokenizer import ClipTokenizer


@pytest.fixture(scope="module")
def tokenizer():
    return ClipTokenizer()


KW = dict(max_words=8, max_frames=2, resolution=8)


# ---------------------------------------------------------------------------
# MSR-VTT (dataloader_msrvtt_retrieval.py:70-148 formats)
# ---------------------------------------------------------------------------

@pytest.fixture
def msrvtt_dirs(tmp_path):
    anno = tmp_path / "anns"
    anno.mkdir()
    with open(anno / "MSRVTT_train.9k.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["video_id"])
        w.writeheader()
        for vid in ("video1", "video2"):
            w.writerow({"video_id": vid})
    json.dump({"sentences": [
        {"video_id": "video1", "caption": "a cat plays"},
        {"video_id": "video1", "caption": "a kitten jumps"},
        {"video_id": "video2", "caption": "a dog runs"},
        {"video_id": "video9", "caption": "not in train split"},
    ]}, open(anno / "MSRVTT_data.json", "w"))
    with open(anno / "MSRVTT_JSFUSION_test.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["video_id", "sentence"])
        w.writeheader()
        w.writerow({"video_id": "video3", "sentence": "a bird sings"})
        w.writerow({"video_id": "video4", "sentence": "a fish swims"})
    return str(anno), str(tmp_path / "videos")


def test_msrvtt_train_all_captions(msrvtt_dirs, tokenizer):
    anno, videos = msrvtt_dirs
    ds = build_dataset("msrvtt", "train", anno, videos, tokenizer, **KW)
    assert len(ds) == 3                     # all captions of train videos only
    assert not ds.multi_sentence_per_video
    item = ds.item(0)
    assert item["text_ids"].shape == (8,)
    assert item["video"].shape == (2, 8, 8, 3)
    assert float(item["video_mask"].sum()) == 0.0   # missing file → zero mask


def test_msrvtt_test_one_caption_per_video(msrvtt_dirs, tokenizer):
    anno, videos = msrvtt_dirs
    ds = build_dataset("msrvtt", "val", anno, videos, tokenizer, **KW)
    assert len(ds) == 2 and ds.video_num == 2


# ---------------------------------------------------------------------------
# MSVD (dataloader_msvd_retrieval.py:108-136: multi-sentence protocol)
# ---------------------------------------------------------------------------

@pytest.fixture
def msvd_dirs(tmp_path):
    anno = tmp_path / "anns"
    anno.mkdir()
    (anno / "test_list.txt").write_text("vidA\nvidB\n")
    pickle.dump({
        "vidA": [["a", "cat"], ["the", "cat", "sits"]],
        "vidB": [["a", "dog"]],
    }, open(anno / "raw-captions.pkl", "wb"))
    videos = tmp_path / "videos"
    videos.mkdir()
    (videos / "vidA.avi").write_bytes(b"x")
    (videos / "vidB.avi").write_bytes(b"x")
    return str(anno), str(videos)


def test_msvd_multi_sentence(msvd_dirs, tokenizer):
    anno, videos = msvd_dirs
    ds = build_dataset("msvd", "test", anno, videos, tokenizer, **KW)
    assert ds.multi_sentence_per_video
    assert ds.sentence_num == 3 and ds.video_num == 2
    # cut_off_points are exclusive end indices per video group
    assert ds.cut_off_points == [2, 3]
    assert ds.pairs[0][1] == "a cat"
    assert ds.video_paths["vidA"].endswith("vidA.avi")


# ---------------------------------------------------------------------------
# DiDeMo (dataloader_didemo_retrieval.py:100-130: paragraph per video)
# ---------------------------------------------------------------------------

@pytest.fixture
def didemo_dirs(tmp_path):
    anno = tmp_path / "anns"
    anno.mkdir()
    (anno / "test_list.txt").write_text("clip1\nclip2\n")
    json.dump([
        {"video": "clip1", "description": "first moment."},
        {"video": "clip1", "description": "second moment."},
        {"video": "clip2", "description": "only moment."},
        {"video": "clip9", "description": "not listed."},
    ], open(anno / "test_data.json", "w"))
    videos = tmp_path / "videos"
    videos.mkdir()
    (videos / "clip1.mp4").write_bytes(b"x")
    (videos / "clip2.mp4").write_bytes(b"x")
    return str(anno), str(videos)


def test_didemo_paragraph_and_span(didemo_dirs, tokenizer):
    anno, videos = didemo_dirs
    ds = build_dataset("didemo", "test", anno, videos, tokenizer, **KW)
    assert not ds.multi_sentence_per_video
    assert len(ds) == 2                      # one paragraph per video
    vid, caption, start, end = ds.pairs[0]
    assert caption == "first moment. second moment."
    assert (start, end) == (0, 31)           # forced [0, 31]s span


# ---------------------------------------------------------------------------
# ActivityNet (dataloader_activitynet_retrieval.py:156-218)
# ---------------------------------------------------------------------------

@pytest.fixture
def activitynet_dirs(tmp_path):
    anno = tmp_path / "anns"
    anno.mkdir()
    json.dump(["v_abc", "v_def", "v_missing"], open(anno / "val_ids.json", "w"))
    json.dump({
        "v_abc": {"duration": 12.3, "sentences": ["one.", "two."]},
        "v_def": {"duration": 5.0, "sentences": ["three."]},
    }, open(anno / "val_1.json", "w"))
    videos = tmp_path / "videos"
    videos.mkdir()
    (videos / "abc.mp4").write_bytes(b"x")
    (videos / "v_def.mp4").write_bytes(b"x")   # extension-keyed variant
    return str(anno), str(videos)


def test_activitynet_paragraph_duration(activitynet_dirs, tokenizer):
    anno, videos = activitynet_dirs
    ds = build_dataset("activitynet", "val", anno, videos, tokenizer, **KW)
    assert len(ds) == 2                       # missing data/video rows dropped
    vid, caption, start, end = ds.pairs[0]
    assert caption == "one. two."
    assert (start, end) == (0.0, 13.0)        # ceil(12.3)
    # pseudo-id fallback when the file keeps the v_ prefix
    assert ds.pairs[1][0] == "v_def"


def test_registry_eval_subsets():
    assert EVAL_SUBSET["msrvtt"] == "val"
    assert EVAL_SUBSET["msvd"] == "test"
    assert EVAL_SUBSET["didemo"] == "test"
    assert EVAL_SUBSET["activity"] == "val"


def test_unknown_datatype_raises(tokenizer, tmp_path):
    with pytest.raises(KeyError):
        build_dataset("nope", "train", str(tmp_path), str(tmp_path), tokenizer)


# ---------------------------------------------------------------------------
# Annotation↔file mismatch handling (build-time diagnostics, no mid-epoch
# crashes)
# ---------------------------------------------------------------------------

def test_msvd_missing_video_file_zero_fallback(msvd_dirs, tokenizer, caplog):
    """A listed MSVD video with no file must keep its slot (cut_off_points
    index the full list) and decode to zero frames after a build-time
    warning — not KeyError mid-epoch."""
    import logging
    import os
    anno, videos = msvd_dirs
    os.remove(os.path.join(videos, "vidB.avi"))
    with caplog.at_level(logging.WARNING, logger="neighborretr_tpu"):
        ds = build_dataset("msvd", "test", anno, videos, tokenizer, **KW)
    assert any("1/2" in r.message for r in caplog.records)
    assert ds.cut_off_points == [2, 3]          # protocol shape unchanged
    item = ds.item(2)                           # vidB's caption row
    assert float(item["video_mask"].sum()) == 0.0


def test_didemo_all_videos_missing_raises(didemo_dirs, tokenizer, tmp_path):
    anno, _ = didemo_dirs
    empty = tmp_path / "wrong_videos"
    empty.mkdir()
    with pytest.raises(ValueError, match="video"):
        build_dataset("didemo", "test", anno, str(empty), tokenizer, **KW)


def test_didemo_partial_missing_warns(didemo_dirs, tokenizer, caplog):
    import logging
    import os
    anno, videos = didemo_dirs
    os.remove(os.path.join(videos, "clip2.mp4"))
    with caplog.at_level(logging.WARNING, logger="neighborretr_tpu"):
        ds = build_dataset("didemo", "test", anno, videos, tokenizer, **KW)
    assert len(ds) == 1                          # clip2 dropped
    assert any("dropped" in r.message for r in caplog.records)


def test_synthetic_small_max_words():
    from neighborretr_tpu.data.datasets.synthetic import SyntheticDataset
    ds = SyntheticDataset(n=2, max_words=3, max_frames=2, resolution=8)
    item = ds.item(0)
    assert item["text_ids"].shape == (3,)
    assert 1 <= item["text_mask"].sum() <= 3
