"""Packed pre-decoded corpus tests (data/packed.py + cli/pack_dataset.py).

The packed path must be a pure CACHE of the decode path: a dataset reading
from a packed corpus yields byte-identical items to one decoding the same
videos — including under train-time RandAugment, whose (seed, epoch, index)
RNG contract is independent of where the frames came from."""

import csv
import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from neighborretr_tpu.data.datasets.base import RetrievalDataset
from neighborretr_tpu.data.packed import (PackedReader, PackedWriter,
                                          clip_key)
from neighborretr_tpu.data.tokenizer import ClipTokenizer


def _write_clip(path, n_frames=24, fps=12, w=64, h=48, seed=0):
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    if not writer.isOpened():
        pytest.skip("cv2 VideoWriter mp4v unavailable")
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 200, size=(h, w, 3), dtype=np.uint8)
    for i in range(n_frames):
        writer.write(np.clip(base.astype(np.int32) + 2 * i, 0, 255)
                     .astype(np.uint8))
    writer.release()


def test_writer_reader_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    w = PackedWriter(str(tmp_path), max_frames=3, resolution=8,
                     video_framerate=1, clips_per_shard=2)
    clips = {}
    for i in range(5):                       # 5 clips -> 3 shards at cps=2
        frames = rng.integers(0, 256, size=(3, 8, 8, 3), dtype=np.uint8)
        n_valid = 1 + i % 3
        frames[n_valid:] = 0
        key = clip_key(f"v{i}")
        clips[key] = (frames, n_valid)
        w.add(key, frames, n_valid)
    w.close()

    r = PackedReader(str(tmp_path))
    assert len(r) == 5
    assert len(r._shards_info) == 3
    for key, (frames, n_valid) in clips.items():
        got_f, got_m = r.get(key)
        np.testing.assert_array_equal(got_f, frames)
        assert got_m.sum() == n_valid
        assert got_m[:n_valid].all()
    assert r.get(clip_key("missing")) is None
    # returned frames are private copies, not the map's pages
    f1, _ = r.get(clip_key("v0"))
    f1[:] = 0
    f2, _ = r.get(clip_key("v0"))
    np.testing.assert_array_equal(f2, clips[clip_key("v0")][0])


def test_reader_rejects_mismatched_sampling(tmp_path):
    w = PackedWriter(str(tmp_path), max_frames=3, resolution=8,
                     video_framerate=1)
    w.add(clip_key("v0"), np.zeros((3, 8, 8, 3), np.uint8), 0)
    w.close()
    r = PackedReader(str(tmp_path))
    r.check_compatible(3, 8, 1)
    with pytest.raises(ValueError, match="repack"):
        r.check_compatible(4, 8, 1)


def test_writer_rejects_duplicates_and_bad_shapes(tmp_path):
    w = PackedWriter(str(tmp_path), max_frames=2, resolution=8,
                     video_framerate=1)
    w.add(clip_key("v0"), np.zeros((2, 8, 8, 3), np.uint8), 2)
    with pytest.raises(ValueError, match="duplicate"):
        w.add(clip_key("v0"), np.zeros((2, 8, 8, 3), np.uint8), 2)
    with pytest.raises(ValueError, match="uint8"):
        w.add(clip_key("v1"), np.zeros((2, 8, 8, 3), np.float32), 2)


def test_clip_key_windows_distinct():
    assert clip_key("v") != clip_key("v", 0.0, 5.0)
    assert clip_key("v", 0.0, 5.0) != clip_key("v", 0.0, 6.0)
    assert clip_key("v", 0, 5) == clip_key("v", 0.0, 5.0)


def _dataset(video_paths, packed_dir="", is_train=False, augment=None):
    pairs = [(vid, f"caption for {vid}", None, None)
             for vid in sorted(video_paths)]
    return RetrievalDataset(
        pairs, dict(video_paths), ClipTokenizer(), max_words=8, max_frames=4,
        resolution=32, video_framerate=2, is_train=is_train, augment=augment,
        seed=7, packed_dir=packed_dir)


@pytest.fixture
def two_clip_tree(tmp_path):
    videos = {}
    for i in range(2):
        p = tmp_path / f"vid{i}.mp4"
        _write_clip(p, seed=i)
        videos[f"vid{i}"] = str(p)
    return tmp_path, videos


def _pack(videos, out_dir, max_frames=4, resolution=32, framerate=2):
    from neighborretr_tpu.data.video import decode_video_frames
    w = PackedWriter(str(out_dir), max_frames, resolution, framerate)
    for vid, path in sorted(videos.items()):
        frames, mask = decode_video_frames(path, max_frames, resolution,
                                           framerate)
        w.add(clip_key(vid), frames, int(mask.sum()))
    w.close()


def test_packed_dataset_matches_decode(two_clip_tree, tmp_path):
    root, videos = two_clip_tree
    packed = tmp_path / "packed"
    _pack(videos, packed)

    plain = _dataset(videos)
    fast = _dataset(videos, packed_dir=str(packed))
    for i in range(len(plain.pairs)):
        a, b = plain.item(i), fast.item(i)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_packed_dataset_matches_decode_with_augment(two_clip_tree, tmp_path):
    root, videos = two_clip_tree
    packed = tmp_path / "packed"
    _pack(videos, packed)
    pol = "rand-m7-n2-mstd0.5-inc1"
    plain = _dataset(videos, is_train=True, augment=pol)
    fast = _dataset(videos, packed_dir=str(packed), is_train=True,
                    augment=pol)
    for epoch in (0, 1):
        plain.set_epoch(epoch)
        fast.set_epoch(epoch)
        for i in range(len(plain.pairs)):
            a, b = plain.item(i), fast.item(i)
            np.testing.assert_array_equal(a["video"], b["video"])
            np.testing.assert_array_equal(a["video_mask"], b["video_mask"])


def test_packed_dataset_works_without_video_files(two_clip_tree, tmp_path):
    """The training host needs only the packed corpus — raw .mp4s gone."""
    root, videos = two_clip_tree
    packed = tmp_path / "packed"
    _pack(videos, packed)
    ref = _dataset(videos).item(0)
    for p in videos.values():
        os.remove(p)
    got = _dataset(videos, packed_dir=str(packed)).item(0)
    np.testing.assert_array_equal(got["video"], ref["video"])
    assert got["video_mask"].sum() > 0


def test_pack_dataset_cli_msrvtt(tmp_path):
    """End-to-end: annotations + mp4s -> cli/pack_dataset.py -> packed reads
    byte-identical to decode through the real MSR-VTT builder."""
    from cli.pack_dataset import main as pack_main
    from neighborretr_tpu.data.registry import build_dataset

    anno = tmp_path / "anns"
    anno.mkdir()
    vids = tmp_path / "videos"
    vids.mkdir()
    names = ["video1", "video2"]
    for i, vid in enumerate(names):
        _write_clip(vids / f"{vid}.mp4", seed=10 + i)
    with open(anno / "MSRVTT_train.9k.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["video_id"])
        for vid in names:
            w.writerow([vid])
    json.dump({"sentences": [
        {"video_id": "video1", "caption": "a cat"},
        {"video_id": "video2", "caption": "a dog"},
    ]}, open(anno / "MSRVTT_data.json", "w"))
    with open(anno / "MSRVTT_JSFUSION_test.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["video_id", "sentence"])
        w.writerow(["video1", "a cat sits"])

    out = tmp_path / "packed"
    rc = pack_main(["--datatype", "msrvtt", "--anno_path", str(anno),
                    "--video_path", str(vids), "--output_dir", str(out),
                    "--max_frames", "4", "--resolution", "32",
                    "--video_framerate", "2", "--workers", "2"])
    assert rc == 0
    r = PackedReader(str(out))
    assert len(r) == 2                       # video1 dedup'd across subsets

    kw = dict(max_words=8, max_frames=4, resolution=32, video_framerate=2)
    tok = ClipTokenizer()
    plain = build_dataset("msrvtt", "train", str(anno), str(vids), tok, **kw)
    fast = build_dataset("msrvtt", "train", str(anno), str(vids), tok,
                         packed_dir=str(out), **kw)
    for i in range(len(plain.pairs)):
        a, b = plain.item(i), fast.item(i)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
