"""BatchLoader semantics: shuffling, drop_last, pad_to_batch, prefetch."""

import numpy as np
import pytest

from neighborretr_tpu.data.loader import BatchLoader
from neighborretr_tpu.utils.logging import MetricLogger, SmoothedValue


class _ToyDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def item(self, i):
        return {"idx": np.int32(i), "x": np.full((3,), i, np.float32)}


def _collect(loader):
    return [b for b in loader]


def test_epoch_order_and_coverage():
    ds = _ToyDataset(10)
    loader = BatchLoader(ds, batch_size=4, shuffle=True, drop_last=False,
                         workers=2, seed=0, prefetch=0)
    loader.set_epoch(0)
    ids0 = np.concatenate([b["idx"] for b in _collect(loader)])
    assert sorted(ids0.tolist()) == list(range(10))   # full coverage
    ids0b = np.concatenate([b["idx"] for b in _collect(loader)])
    np.testing.assert_array_equal(ids0, ids0b)        # same epoch → same order
    loader.set_epoch(1)
    ids1 = np.concatenate([b["idx"] for b in _collect(loader)])
    assert ids0.tolist() != ids1.tolist()             # reshuffled next epoch


def test_drop_last():
    loader = BatchLoader(_ToyDataset(10), batch_size=4, drop_last=True,
                         workers=1, prefetch=0)
    batches = _collect(loader)
    assert len(loader) == 2 and len(batches) == 2
    assert all(b["idx"].shape[0] == 4 for b in batches)


def test_pad_to_batch_valid_flags():
    loader = BatchLoader(_ToyDataset(10), batch_size=4, drop_last=False,
                         workers=1, pad_to_batch=True, prefetch=0)
    batches = _collect(loader)
    assert len(batches) == 3
    last = batches[-1]
    assert last["idx"].shape[0] == 4                  # padded to static shape
    assert last["valid"].tolist() == [True, True, False, False]


def test_prefetch_yields_same_batches():
    ds = _ToyDataset(9)
    a = BatchLoader(ds, 4, shuffle=True, seed=3, workers=2, prefetch=0)
    b = BatchLoader(ds, 4, shuffle=True, seed=3, workers=2, prefetch=2)
    for x, y in zip(_collect(a), _collect(b)):
        np.testing.assert_array_equal(x["idx"], y["idx"])


def test_smoothed_value_and_metric_logger():
    v = SmoothedValue(window_size=3)
    for x in (1.0, 2.0, 3.0, 4.0):
        v.update(x)
    assert v.avg == 3.0                                # window mean of 2,3,4
    assert v.global_avg == 2.5
    m = MetricLogger()
    m.update(loss=1.0, acc=0.5)
    m.update(loss=3.0)
    assert m.loss.global_avg == 2.0
    assert "loss" in str(m)


def test_device_prefetch_order_keys_and_sharding():
    """prefetch_to_device preserves batch order, strips host-only keys, and
    places arrays batch-sharded over the mesh data axis."""
    import jax
    from neighborretr_tpu.data.device_prefetch import prefetch_to_device
    from neighborretr_tpu.parallel.mesh import make_mesh

    host_batches = [
        {"idx": np.arange(8) + 8 * i, "x": np.full((8, 3), i, np.float32),
         "valid": np.ones(8, np.bool_), "video_hash": np.zeros(8, np.int64)}
        for i in range(5)
    ]

    # no mesh: default-device placement
    out = list(prefetch_to_device(iter(host_batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert set(b) == {"idx", "x"}              # host-only keys dropped
        assert isinstance(b["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["idx"]), np.arange(8) + 8 * i)

    # mesh: data-axis sharded layout
    mesh = make_mesh(num_devices=4)
    out = list(prefetch_to_device(iter(host_batches), size=3, mesh=mesh))
    assert len(out) == 5
    for b in out:
        assert len(b["x"].sharding.device_set) == 4
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(b["idx"]) for b in out]),
        np.concatenate([hb["idx"] for hb in host_batches]))


def test_device_prefetch_empty_and_short_iterators():
    from neighborretr_tpu.data.device_prefetch import prefetch_to_device
    assert list(prefetch_to_device(iter([]), size=2)) == []
    one = [{"idx": np.arange(4)}]
    out = list(prefetch_to_device(iter(one), size=4))
    assert len(out) == 1


def test_early_termination_is_clean():
    """Breaking out of iteration (bounded bank fills, benches) must not crash
    the producer or leak 'cannot schedule new futures' errors."""
    import itertools
    ds = _ToyDataset(64)
    loader = BatchLoader(ds, 8, shuffle=False, workers=4, prefetch=2)
    got = list(itertools.islice(iter(loader), 2))
    assert len(got) == 2
    # a subsequent full iteration over the same loader still works
    assert len(_collect(loader)) == 8


def test_prefetch_propagates_dataset_errors():
    """A decode/dataset error mid-epoch must raise in the consumer, not end
    iteration early (a swallowed error = silently truncated epoch/eval)."""
    class Bad:
        multi_sentence_per_video = False

        def __len__(self):
            return 16

        def item(self, i):
            if i == 9:
                raise RuntimeError("corrupt video file")
            return {"x": np.zeros(2, np.float32), "idx": np.int32(i)}

    loader = BatchLoader(Bad(), 4, shuffle=False, drop_last=False,
                         workers=2, prefetch=2)
    with pytest.raises(RuntimeError, match="corrupt video"):
        list(iter(loader))


def test_process_workers_match_thread_workers():
    """worker_mode='process' (forked workers, the reference's DataLoader
    num_workers model) must produce byte-identical batches to the thread
    pool: items are pure functions of (dataset state, index), the fork
    happens at epoch start, and only indices cross the IPC boundary."""
    ds = _ToyDataset(10)
    t = BatchLoader(ds, 4, shuffle=True, seed=5, workers=2, prefetch=0,
                    pad_to_batch=True)
    p = BatchLoader(ds, 4, shuffle=True, seed=5, workers=2, prefetch=2,
                    pad_to_batch=True, worker_mode="process")
    t.set_epoch(1)
    p.set_epoch(1)
    tb, pb = _collect(t), _collect(p)
    assert len(tb) == len(pb) == 3
    for x, y in zip(tb, pb):
        for k in x:
            np.testing.assert_array_equal(x[k], y[k])


def test_process_workers_propagate_errors():
    class Bad:
        def __len__(self):
            return 8

        def item(self, i):
            if i == 5:
                raise RuntimeError("corrupt video file")
            return {"x": np.zeros(2, np.float32), "idx": np.int32(i)}

    loader = BatchLoader(Bad(), 4, shuffle=False, drop_last=False,
                         workers=2, prefetch=2, worker_mode="process")
    with pytest.raises(RuntimeError, match="corrupt video file"):
        _collect(loader)


def test_invalid_worker_mode_rejected():
    with pytest.raises(ValueError, match="worker_mode"):
        BatchLoader(_ToyDataset(4), 2, worker_mode="greenlet")


def test_process_workers_with_real_video_decode(tmp_path):
    """cv2 decode inside forked workers (the riskiest fork interaction:
    inherited cv2/ffmpeg thread state) must produce the same batches as the
    thread pool on a real encoded clip."""
    cv2 = pytest.importorskip("cv2")
    path = tmp_path / "clip.mp4"
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                        12, (64, 48))
    if not w.isOpened():
        pytest.skip("cv2 VideoWriter mp4v unavailable")
    for i in range(24):
        w.write(np.full((48, 64, 3), i * 10 % 256, np.uint8))
    w.release()

    from neighborretr_tpu.data.datasets.base import RetrievalDataset
    from neighborretr_tpu.data.tokenizer import ClipTokenizer
    tok = ClipTokenizer()
    pairs = [("v0", f"caption number {i}", None, None) for i in range(4)]
    paths = {"v0": str(path)}

    def build():
        return RetrievalDataset(pairs, paths, tok, is_train=False,
                                max_words=8, max_frames=4, resolution=32)

    t = BatchLoader(build(), 2, shuffle=False, workers=2, prefetch=0)
    p = BatchLoader(build(), 2, shuffle=False, workers=2, prefetch=2,
                    worker_mode="process")
    tb, pb = _collect(t), _collect(p)
    assert len(tb) == len(pb) == 2
    for x, y in zip(tb, pb):
        for k in x:
            np.testing.assert_array_equal(x[k], y[k])
    assert tb[0]["video"].std() > 0       # real decoded pixels, not fallback


def test_process_workers_with_native_augment(tmp_path):
    """Native (C++) augment kernels under forked workers: the ctypes CDLL is
    inherited through fork; batches must be byte-identical to the thread
    pool AND to the PIL backend (per-item epoch-seeded RNGs make the
    sampled policy deterministic; the kernels are byte-exact)."""
    cv2 = pytest.importorskip("cv2")
    from neighborretr_tpu.data import native
    if not native.available():
        pytest.skip(f"native backend unavailable: {native.load_error()}")
    path = tmp_path / "clip.mp4"
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                        12, (64, 48))
    if not w.isOpened():
        pytest.skip("cv2 VideoWriter mp4v unavailable")
    rng = np.random.default_rng(0)
    for _ in range(24):
        w.write(rng.integers(0, 256, (48, 64, 3), dtype=np.uint8))
    w.release()

    from neighborretr_tpu.data.datasets.base import RetrievalDataset
    from neighborretr_tpu.data.tokenizer import ClipTokenizer
    tok = ClipTokenizer()
    pairs = [("v0", f"caption number {i}", None, None) for i in range(4)]
    paths = {"v0": str(path)}

    def build(backend):
        return RetrievalDataset(pairs, paths, tok, is_train=True,
                                augment_backend=backend, seed=3,
                                max_words=8, max_frames=4, resolution=32)

    def batches(loader):
        loader.set_epoch(1)
        return _collect(loader)

    t = batches(BatchLoader(build("native"), 2, shuffle=False, workers=2,
                            prefetch=0))
    p = batches(BatchLoader(build("native"), 2, shuffle=False, workers=2,
                            prefetch=2, worker_mode="process"))
    pil = batches(BatchLoader(build("pil"), 2, shuffle=False, workers=2,
                              prefetch=0))
    assert len(t) == len(p) == len(pil) == 2
    for x, y, z in zip(t, p, pil):
        for k in x:
            np.testing.assert_array_equal(x[k], y[k])
            np.testing.assert_array_equal(x[k], z[k])
    assert t[0]["video"].std() > 0
