"""Tests for train-time video augmentation, frame order, and the LRU cache."""

import numpy as np
import pytest

from neighborretr_tpu.data.augment import (ClipLRUCache, RandAugment,
                                           create_random_augment,
                                           process_frame_order)


def _frames(f=4, r=32, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(f, r, r, 3), dtype=np.uint8)


class TestRandAugment:
    def test_config_parse(self):
        ra = RandAugment.from_config_str("rand-m7-n4-mstd0.5-inc1")
        assert ra.magnitude == 7 and ra.num_layers == 4
        assert ra.magnitude_std == 0.5

    def test_shapes_and_dtype(self):
        ra = create_random_augment(rng=np.random.default_rng(0))
        x = _frames()
        y = ra(x)
        assert y.shape == x.shape and y.dtype == np.uint8

    def test_temporal_consistency(self):
        """Identical frames must stay identical after augmentation — the same
        sampled ops apply to every frame of a clip (rawvideo_util.py:291)."""
        ra = create_random_augment(rng=np.random.default_rng(1))
        one = _frames(1)
        clip = np.repeat(one, 6, axis=0)
        out = ra(clip)
        for i in range(1, 6):
            np.testing.assert_array_equal(out[0], out[i])

    def test_stochastic_across_calls(self):
        ra = create_random_augment(rng=np.random.default_rng(2))
        x = _frames()
        outs = [ra(x) for _ in range(8)]
        assert any(not np.array_equal(outs[0], o) for o in outs[1:])

    def test_deterministic_given_rng(self):
        x = _frames()
        a = create_random_augment(rng=np.random.default_rng(3))(x)
        b = create_random_augment(rng=np.random.default_rng(3))(x)
        np.testing.assert_array_equal(a, b)


class TestFrameOrder:
    def test_normal(self):
        x = _frames()
        assert process_frame_order(x, 0) is x

    def test_reverse(self):
        x = _frames()
        np.testing.assert_array_equal(process_frame_order(x, 1), x[::-1])

    def test_random_is_permutation(self):
        x = _frames(8)
        y = process_frame_order(x, 2, np.random.default_rng(0))
        sx = sorted(x.sum(axis=(1, 2, 3)).tolist())
        sy = sorted(y.sum(axis=(1, 2, 3)).tolist())
        assert sx == sy

    def test_bad_order(self):
        with pytest.raises(ValueError):
            process_frame_order(_frames(), 3)


class TestClipLRUCache:
    def test_hit_miss_and_eviction(self):
        c = ClipLRUCache(capacity=2)
        assert c.get(("a",)) is None
        c.put(("a",), 1)
        c.put(("b",), 2)
        assert c.get(("a",)) == 1           # refresh "a"
        c.put(("c",), 3)                    # evicts LRU = "b"
        assert c.get(("b",)) is None
        assert c.get(("a",)) == 1 and c.get(("c",)) == 3
        assert c.hits == 3 and c.misses == 2

    def test_zero_capacity_noop(self):
        c = ClipLRUCache(capacity=0)
        c.put(("a",), 1)
        assert c.get(("a",)) is None and len(c) == 0


class TestDatasetAugmentWiring:
    def test_train_dataset_augments_eval_does_not(self, tmp_path):
        from neighborretr_tpu.data.datasets.base import RetrievalDataset
        from neighborretr_tpu.data.tokenizer import ClipTokenizer
        tok = ClipTokenizer()
        pairs = [("vid0", "a cat", None, None)]
        vp = {"vid0": str(tmp_path / "missing.mp4")}   # decode → zero frames
        train = RetrievalDataset(pairs, vp, tok, max_frames=2, resolution=8,
                                 is_train=True, seed=0)
        ev = RetrievalDataset(pairs, vp, tok, max_frames=2, resolution=8)
        assert train._augment is not None and ev._augment is None
        item = train.item(0)
        assert item["video"].shape == (2, 8, 8, 3)
        assert item["video"].dtype == np.uint8


def test_frame_order_keeps_real_frames_in_masked_prefix(tmp_path):
    """frame_order must permute only the VALID frames: padding stays at the
    tail and the prefix-contiguous mask stays aligned with real content."""
    from neighborretr_tpu.data.datasets.base import RetrievalDataset
    from neighborretr_tpu.data import datasets as _ds

    ds = RetrievalDataset(
        pairs=[("vidA", "a caption", None, None)],
        video_paths={"vidA": "/nonexistent.mp4"},
        tokenizer=None, max_words=8, max_frames=6, resolution=16,
        is_train=True, augment=None, frame_order=1)
    # bypass decode: 3 valid frames with distinct values, 3 zero pads
    frames = np.zeros((6, 16, 16, 3), np.uint8)
    for f in range(3):
        frames[f] = f + 1
    mask = np.array([1, 1, 1, 0, 0, 0], np.float32)
    ds._clip_cache.capacity = 4
    from neighborretr_tpu.data.datasets.base import _mtime
    key = ("/nonexistent.mp4", _mtime("/nonexistent.mp4"), 6, 16, 1,
           None, None)
    ds._clip_cache.put(key, (frames, mask))

    out = ds.video_item("vidA", rng=np.random.default_rng(0))
    v, m = out["video"], out["video_mask"]
    np.testing.assert_array_equal(m, mask)
    # reversed REAL frames in the masked prefix, zeros in the padding tail
    assert v[0, 0, 0, 0] == 3 and v[1, 0, 0, 0] == 2 and v[2, 0, 0, 0] == 1
    assert (v[3:] == 0).all()


def test_item_rng_deterministic_per_epoch():
    """Per-item RNGs derive from (seed, epoch, index): same epoch → identical
    augmentation (thread-safe by construction), new epoch → re-sampled."""
    from neighborretr_tpu.data.datasets.base import RetrievalDataset, _mtime

    def make():
        ds = RetrievalDataset(
            pairs=[("vidA", "words here", None, None)],
            video_paths={"vidA": "/nonexistent.mp4"},
            tokenizer=None, max_words=8, max_frames=4, resolution=16,
            is_train=True, augment="rand-m7-n4-mstd0.5-inc1", frame_order=2,
            cache_capacity=4, seed=5)
        frames = (np.arange(4 * 16 * 16 * 3) % 251).astype(np.uint8).reshape(
            4, 16, 16, 3)
        key = ("/nonexistent.mp4", _mtime("/nonexistent.mp4"), 4, 16, 1,
               None, None)
        ds._clip_cache.put(key, (frames, np.ones(4, np.float32)))
        ds._text_cache["words here"] = (np.zeros(8, np.int32),
                                        np.ones(8, np.float32))
        return ds

    a, b = make(), make()
    a.set_epoch(0), b.set_epoch(0)
    np.testing.assert_array_equal(a.item(0)["video"], b.item(0)["video"])
    v_epoch0 = a.item(0)["video"].copy()
    a.set_epoch(1)
    assert not np.array_equal(a.item(0)["video"], v_epoch0)


def test_posterize_increasing_direction():
    """inc1 semantics: higher magnitude → FEWER bits (stronger)."""
    from neighborretr_tpu.data.augment import _posterize_inc_level
    assert _posterize_inc_level(0.0)[0] == 4
    assert _posterize_inc_level(10.0)[0] == 1
    assert _posterize_inc_level(5.0)[0] < _posterize_inc_level(2.0)[0]


def test_config_str_rejects_unsupported_segments():
    from neighborretr_tpu.data.augment import RandAugment
    with pytest.raises(ValueError, match="inc0"):
        RandAugment.from_config_str("rand-m9-n2-inc0")
    r = RandAugment.from_config_str("rand-m9-n2-mstd0.5-p0.3-inc1")
    assert r.magnitude == 9 and r.num_layers == 2 and r.prob == 0.3
