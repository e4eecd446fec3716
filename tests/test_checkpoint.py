"""Checkpoint round-trips: params-only (best.npz) and full TrainState resume —
the beyond-reference capability (the reference saves state_dicts only and
cannot resume mid-run, main.py:161-187)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neighborretr_tpu.core import checkpoint as ckpt
from neighborretr_tpu.core.config import Config, LossConfig, ModelConfig, TrainConfig
from neighborretr_tpu.models import neighborretr as model
from neighborretr_tpu.train import memory_bank as mb
from neighborretr_tpu.train.step import create_train_state, train_step

from test_model import make_batch

B, W, F = 8, 8, 4


@pytest.fixture(scope="module")
def cfg():
    return Config(model=ModelConfig.tiny(max_words=W, max_frames=F),
                  loss=LossConfig(num_neighbors=3),
                  train=TrainConfig(batch_size=B, mb_batch=1))


def _trees_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_params_roundtrip(cfg, tmp_path):
    params = model.init_params(jax.random.PRNGKey(0), cfg.model)
    path = str(tmp_path / "best.npz")
    ckpt.save_params(path, params)
    like = model.init_params(jax.random.PRNGKey(1), cfg.model)  # different
    loaded = ckpt.load_params(path, like)
    _trees_equal(params, loaded)


def test_params_shape_mismatch_raises(cfg, tmp_path):
    params = model.init_params(jax.random.PRNGKey(0), cfg.model)
    path = str(tmp_path / "best.npz")
    ckpt.save_params(path, params)
    other_clip = dataclasses.replace(cfg.model.clip, vocab_size=256)
    other = model.init_params(
        jax.random.PRNGKey(0),
        dataclasses.replace(cfg.model, clip=other_clip))
    with pytest.raises((ValueError, KeyError)):
        ckpt.load_params(path, other)


def test_full_train_state_resume(cfg, tmp_path, rng):
    """Save after one step, resume, take a second step on both copies —
    the resumed run must be bit-identical (optimizer moments + schedule step
    + memory bank all restored)."""
    params = model.init_params(jax.random.PRNGKey(0), cfg.model)
    bank = mb.create(cfg.train.memory_bank_capacity, W, F,
                     cfg.model.clip.embed_dim)
    batch = make_batch(rng, cfg, batch=B)
    state = create_train_state(params, bank)

    state, _ = train_step(state, batch, jax.random.PRNGKey(1), cfg, 10)

    path = str(tmp_path / "state.npz")
    ckpt.save_train_state(path, jax.device_get(state))

    # continue the original
    cont, m_cont = train_step(state, batch, jax.random.PRNGKey(2), cfg, 10)

    # resume from disk and take the same second step
    like = create_train_state(model.init_params(jax.random.PRNGKey(9),
                                                cfg.model),
                              mb.create(cfg.train.memory_bank_capacity, W, F,
                                        cfg.model.clip.embed_dim))
    resumed = ckpt.load_train_state(path, like)
    assert int(resumed.step) == 1 and int(resumed.opt.step) == 1
    res, m_res = train_step(resumed, batch, jax.random.PRNGKey(2), cfg, 10)

    np.testing.assert_allclose(float(m_cont["loss"]), float(m_res["loss"]),
                               rtol=1e-6)
    _trees_equal(cont.params, res.params)
    _trees_equal(tuple(cont.bank), tuple(res.bank))


def test_old_flat_qkv_layout_migrates(cfg, tmp_path):
    """Checkpoints saved before the [D, 3, D] in_proj relayout stored the
    flat [.., D, 3D] / [.., 3D] packed layout.  The migration is a pure
    reshape (element order unchanged), so load_params must reshape-migrate
    these leaves instead of dropping (strict=False) or rejecting (strict)
    them."""
    params = model.init_params(jax.random.PRNGKey(0), cfg.model)
    flat = ckpt.flatten_tree(params)
    n_flattened = 0
    for k in list(flat):
        if k.endswith("in_proj//w"):
            a = flat[k]                       # [.., D, 3, D]
            flat[k] = a.reshape(*a.shape[:-3], a.shape[-3], -1)
            n_flattened += 1
        elif k.endswith("in_proj//b"):
            a = flat[k]                       # [.., 3, D]
            flat[k] = a.reshape(*a.shape[:-2], -1)
            n_flattened += 1
    assert n_flattened > 0
    path = str(tmp_path / "old_layout.npz")
    np.savez(path, **flat)

    like = model.init_params(jax.random.PRNGKey(1), cfg.model)
    loaded = ckpt.load_params(path, like)     # strict: reshape, don't raise
    _trees_equal(params, loaded)

    _, report = ckpt.load_params(path, like, strict=False)
    assert len(report["reshaped"]) == n_flattened
    assert not report["missing"] and not report["mismatched"]


def test_load_params_accepts_train_state_file(cfg, tmp_path, rng):
    """--checkpoint state_epochN.npz works everywhere best.npz does: the
    params subtree is extracted from the train-state layout."""
    params = model.init_params(jax.random.PRNGKey(0), cfg.model)
    bank = mb.create(cfg.train.memory_bank_capacity, W, F,
                     cfg.model.clip.embed_dim)
    batch = make_batch(rng, cfg, batch=B)
    state, _ = train_step(create_train_state(params, bank), batch,
                          jax.random.PRNGKey(1), cfg, 10)
    path = str(tmp_path / "state_epoch0.npz")
    ckpt.save_train_state(path, jax.device_get(state))

    like = model.init_params(jax.random.PRNGKey(1), cfg.model)
    loaded = ckpt.load_params(path, like)
    _trees_equal(jax.device_get(state.params), loaded)


def test_partial_load_strict_false(cfg, tmp_path):
    """strict=False warm start (reference --init_model, main.py:60-66):
    missing / shape-mismatched leaves keep init values, extra keys are
    ignored, and the diff report names each."""
    params = model.init_params(jax.random.PRNGKey(0), cfg.model)
    flat = ckpt.flatten_tree(params)

    missing_key = "text_weight_fc//fc1//w"
    mismatch_key = "video_weight_fc//fc1//b"
    del flat[missing_key]
    flat[mismatch_key] = np.zeros((3,), np.float32)    # wrong shape
    flat["not_a_leaf//extra"] = np.ones((2,), np.float32)
    path = str(tmp_path / "partial.npz")
    np.savez(path, **flat)

    like = model.init_params(jax.random.PRNGKey(1), cfg.model)
    loaded, report = ckpt.load_params(path, like, strict=False)

    assert report["missing"] == [missing_key]
    assert report["mismatched"] and mismatch_key in report["mismatched"][0]
    assert report["unexpected"] == ["not_a_leaf//extra"]
    # present leaves come from the checkpoint...
    np.testing.assert_array_equal(
        np.asarray(loaded["text_weight_fc"]["fc2"]["w"]),
        np.asarray(params["text_weight_fc"]["fc2"]["w"]))
    # ...missing/mismatched leaves keep the like-tree's init values
    np.testing.assert_array_equal(
        np.asarray(loaded["text_weight_fc"]["fc1"]["w"]),
        np.asarray(like["text_weight_fc"]["fc1"]["w"]))
    np.testing.assert_array_equal(
        np.asarray(loaded["video_weight_fc"]["fc1"]["b"]),
        np.asarray(like["video_weight_fc"]["fc1"]["b"]))
    # strict mode still refuses
    with pytest.raises(KeyError):
        ckpt.load_params(path, like)


def test_atomic_save_leaves_no_partial_file(tmp_path, monkeypatch):
    """A crash mid-write must never corrupt the existing checkpoint: the
    write goes to a temp file, promoted by rename only on success."""
    path = str(tmp_path / "best.npz")
    ckpt.save_params(path, {"a": np.arange(4.0)})
    before = open(path, "rb").read()

    real_savez = np.savez

    def exploding_savez(f, **kw):
        real_savez(f, **kw)  # temp file fully written...
        raise OSError("disk died mid-save")  # ...then the failure

    monkeypatch.setattr(np, "savez", exploding_savez)
    with pytest.raises(OSError):
        ckpt.save_params(path, {"a": np.arange(8.0)})
    # original survives untouched; no .tmp debris
    assert open(path, "rb").read() == before
    assert sorted(p.name for p in tmp_path.iterdir()) == ["best.npz"]


def test_async_writer_orders_waits_and_raises(tmp_path):
    w = ckpt.AsyncWriter()
    order = []
    w.submit(lambda: order.append(1))
    w.submit(lambda: order.append(2))
    path = str(tmp_path / "x.npz")
    w.submit(lambda: ckpt.save_params(path, {"a": np.ones(3)}))
    w.wait()
    assert order == [1, 2] and np.load(path)["a"].shape == (3,)

    def boom():
        raise RuntimeError("write failed")

    w.submit(boom)
    # later writes still happen — a transient failure must not silently
    # drop every subsequent checkpoint
    w.submit(lambda: order.append(3))
    with pytest.raises(RuntimeError, match="write failed"):
        w.wait()
    assert order == [1, 2, 3]
    # the writer keeps going after the error is surfaced
    w.submit(lambda: order.append(4))
    w.wait()
    assert order == [1, 2, 3, 4]
    w.close()


def test_latest_resumable_picks_highest_step(tmp_path):
    """--resume auto resolution: highest saved step wins; a stale
    state_preempt.npz loses to a later epoch save; tie prefers preempt;
    unreadable files are skipped; empty dir → None."""
    d = str(tmp_path)
    assert ckpt.latest_resumable(d) is None

    def fake(name, step):
        np.savez(tmp_path / name, step=np.asarray(step, np.int64))

    fake("state_epoch0.npz", 10)
    assert ckpt.latest_resumable(d).endswith("state_epoch0.npz")
    fake("state_preempt.npz", 15)
    assert ckpt.latest_resumable(d).endswith("state_preempt.npz")
    fake("state_epoch1.npz", 20)
    assert ckpt.latest_resumable(d).endswith("state_epoch1.npz")
    fake("state_preempt.npz", 20)  # tie → preempt (saved at/after epoch file)
    assert ckpt.latest_resumable(d).endswith("state_preempt.npz")
    (tmp_path / "state_epoch2.npz").write_bytes(b"not an npz")  # truncated
    assert ckpt.latest_resumable(d).endswith("state_preempt.npz")


def test_resolve_resume_auto_multihost_encoding(tmp_path, monkeypatch):
    """The (kind, epoch) broadcast protocol: process 0 encodes what
    latest_resumable found; every process reconstructs the same path from
    its own output_dir.  Simulated single-process (the real 2-controller
    run is tests/test_multiprocess.py)."""
    import jax.experimental.multihost_utils as mhu

    d = str(tmp_path)
    monkeypatch.setattr(jax, "process_count", lambda: 2)

    # non-zero process: reconstructs purely from the broadcast decision
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    cases = [((0, 0), None),
             ((1, 3), str(tmp_path / "state_epoch3.npz")),
             ((2, 0), str(tmp_path / "state_preempt.npz"))]
    for enc, want in cases:
        monkeypatch.setattr(mhu, "broadcast_one_to_all",
                            lambda x, _e=enc: np.asarray(_e, np.int64))
        assert ckpt.resolve_resume_auto(d) == want

    # process 0: encodes its scan result into the broadcast payload
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    sent = []
    monkeypatch.setattr(mhu, "broadcast_one_to_all",
                        lambda x: sent.append(np.asarray(x)) or sent[-1])
    assert ckpt.resolve_resume_auto(d) is None          # empty dir → (0, 0)
    np.savez(tmp_path / "state_epoch7.npz", step=np.asarray(5, np.int64))
    assert ckpt.resolve_resume_auto(d).endswith("state_epoch7.npz")
    np.savez(tmp_path / "state_preempt.npz", step=np.asarray(9, np.int64))
    assert ckpt.resolve_resume_auto(d).endswith("state_preempt.npz")
    assert [tuple(int(v) for v in e) for e in sent] == \
        [(0, 0), (1, 7), (2, 0)]


def test_sharded_state_roundtrip_single_process(cfg, tmp_path, rng):
    """Collective-free sharded save → latest_resumable picks the manifest →
    sharded load → continued step bit-identical to the uninterrupted one.
    Single-process: every leaf takes the 'full' path; the multi-shard
    reassembly path is unit-tested below and exercised for real by the
    2x4-device FSDP leg in tests/test_multiprocess.py."""
    params = model.init_params(jax.random.PRNGKey(0), cfg.model)
    bank = mb.create(cfg.train.memory_bank_capacity, W, F,
                     cfg.model.clip.embed_dim)
    batch = make_batch(rng, cfg, batch=B)
    state, _ = train_step(create_train_state(params, bank), batch,
                          jax.random.PRNGKey(1), cfg, 10)

    shard = ckpt.save_sharded_train_state(str(tmp_path), state)
    assert shard.endswith("state_preempt.shard0.npz")
    manifest = str(tmp_path / ("state_preempt" + ckpt.MANIFEST_SUFFIX))
    assert ckpt.latest_resumable(str(tmp_path)) == manifest

    like = create_train_state(
        model.init_params(jax.random.PRNGKey(9), cfg.model),
        mb.create(cfg.train.memory_bank_capacity, W, F,
                  cfg.model.clip.embed_dim))
    resumed = ckpt.load_sharded_train_state(manifest, like)
    assert int(resumed.step) == 1

    cont, m_cont = train_step(state, batch, jax.random.PRNGKey(2), cfg, 10)
    res, m_res = train_step(resumed, batch, jax.random.PRNGKey(2), cfg, 10)
    np.testing.assert_allclose(float(m_cont["loss"]), float(m_res["loss"]),
                               rtol=1e-6)
    _trees_equal(cont.params, res.params)
    _trees_equal(tuple(cont.bank), tuple(res.bank))


def test_read_sharded_set_reassembles_and_rejects(tmp_path):
    """The reassembly core: shards from two 'processes' tile a global array
    back together; incomplete sets, skewed steps, and coverage gaps are all
    rejected (a skewed preemption must not resume)."""
    import json as _json

    d = tmp_path
    key = "params//w"
    full = np.arange(24, dtype=np.float32).reshape(6, 4)

    def write(name, rows, step, pcount=2, extra=None):
        payload = {
            f"shape//{key}": np.asarray(full.shape, np.int64),
            "step": np.asarray(step, np.int64),
            "opt_step": np.asarray(step, np.int64),
            "process_count": np.asarray(pcount, np.int64),
        }
        for j, (a, b) in enumerate(rows):
            payload[f"shdata//{key}@{j}"] = full[a:b]
            payload[f"shidx//{key}@{j}"] = np.asarray(
                [[a, b], [0, 4]], np.int64)
        payload.update(extra or {})
        np.savez(d / name, **payload)

    mpath = str(d / ("state_preempt" + ckpt.MANIFEST_SUFFIX))
    with open(mpath, "w") as f:
        _json.dump({"tag": "state_preempt", "step": 7, "process_count": 2}, f)

    # each process holds two of the four row-blocks
    write("state_preempt.shard0.npz", [(0, 2), (4, 6)], step=7)
    write("state_preempt.shard1.npz", [(2, 3), (3, 4)], step=7)
    step, flat = ckpt._read_sharded_set(mpath)
    assert step == 7
    np.testing.assert_array_equal(flat[key], full)

    # missing shard file → rejected
    os.rename(d / "state_preempt.shard1.npz", d / "hold.npz")
    assert ckpt._read_sharded_set(mpath) is None
    os.rename(d / "hold.npz", d / "state_preempt.shard1.npz")

    # skewed steps (one process preempted a step later) → rejected
    write("state_preempt.shard1.npz", [(2, 3), (3, 4)], step=8)
    assert ckpt._read_sharded_set(mpath) is None

    # coverage gap (a shard never written) → rejected
    write("state_preempt.shard1.npz", [(2, 3)], step=7)
    assert ckpt._read_sharded_set(mpath) is None

    with pytest.raises(ValueError, match="incomplete or "):
        ckpt.load_sharded_train_state(mpath, None)


def test_resolve_resume_auto_sharded_kind(tmp_path, monkeypatch):
    """kind=3 broadcast: every process reconstructs the manifest path."""
    import jax.experimental.multihost_utils as mhu

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    monkeypatch.setattr(mhu, "broadcast_one_to_all",
                        lambda x: np.asarray((3, 0), np.int64))
    want = str(tmp_path / ("state_preempt" + ckpt.MANIFEST_SUFFIX))
    assert ckpt.resolve_resume_auto(str(tmp_path)) == want


def test_forced_sharded_reassembly_is_bitwise(cfg, tmp_path, rng):
    """Bit-level isolation of the shard-extraction + reassembly path: FSDP
    state on the virtual 8-device mesh, saved with force_sharded=True (so
    the sharded leaves go through per-shard bounds extraction instead of
    the fully-addressable 'full' path), must reload BITWISE.  This pins
    the reassembly machinery as exact — the rounding-level drift the
    multi-host integration test documents (test_multiprocess.py::
    _state_files_equal) therefore originates in the post-resume COMPUTE of
    a fresh process pair, not in the checkpoint roundtrip."""
    import jax.numpy as jnp

    from neighborretr_tpu.parallel import mesh as pmesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh (tests/conftest.py)")
    mesh = pmesh.make_mesh(num_devices=8)
    params = pmesh.place_params(
        model.init_params(jax.random.PRNGKey(0), cfg.model), mesh, fsdp=True)
    bank = mb.create(cfg.train.memory_bank_capacity, W, F,
                     cfg.model.clip.embed_dim)
    bank = mb.MemoryBank(*pmesh.replicate_tree(tuple(bank), mesh))
    batch = pmesh.shard_batch(
        {k: np.asarray(v) for k, v in make_batch(rng, cfg, batch=B).items()},
        mesh)
    cfgf = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, fsdp=True))
    state, _ = train_step(create_train_state(params, bank), batch,
                          jax.random.PRNGKey(1), cfgf, 10, mesh=mesh)
    # at least one leaf must actually be sharded or the test is vacuous
    assert any(isinstance(x, jax.Array) and not x.sharding.is_fully_replicated
               for x in jax.tree_util.tree_leaves(state.params))

    ckpt.save_sharded_train_state(str(tmp_path), state, force_sharded=True)
    with np.load(tmp_path / "state_preempt.shard0.npz") as d:
        assert any(k.startswith("shdata") for k in d.files), \
            "force_sharded did not route any leaf through the shard path"

    like = create_train_state(
        model.init_params(jax.random.PRNGKey(9), cfg.model),
        mb.create(cfg.train.memory_bank_capacity, W, F,
                  cfg.model.clip.embed_dim))
    resumed = ckpt.load_sharded_train_state(
        str(tmp_path / ("state_preempt" + ckpt.MANIFEST_SUFFIX)), like)

    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(jax.device_get(state))[0],
            jax.tree_util.tree_flatten_with_path(resumed)[0]):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=ckpt.path_key(pa))


def test_multiprocess_routes_owner_local_leaves_through_shards(
        cfg, tmp_path, rng, monkeypatch):
    """Round-5 advisor fix: under jax.process_count() > 1, a leaf that is
    fully addressable on its owning process but NOT replicated (e.g.
    pipeline-stage params local to one host) must go through the per-shard
    branch — the 'full' fast path is written by process 0 only, so routing
    such a leaf there means NOBODY writes it and the whole set is rejected
    at read time.  Simulated here by monkeypatching process_count to 2 on
    the single-process 8-device mesh: FSDP-sharded leaves are fully
    addressable locally yet must still produce shdata keys."""
    from neighborretr_tpu.parallel import mesh as pmesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh (tests/conftest.py)")
    mesh = pmesh.make_mesh(num_devices=8)
    params = pmesh.place_params(
        model.init_params(jax.random.PRNGKey(0), cfg.model), mesh, fsdp=True)
    bank = mb.create(cfg.train.memory_bank_capacity, W, F,
                     cfg.model.clip.embed_dim)
    bank = mb.MemoryBank(*pmesh.replicate_tree(tuple(bank), mesh))
    state = create_train_state(params, bank)

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    # process 0 leg
    ckpt.save_sharded_train_state(str(tmp_path), state)
    with np.load(tmp_path / "state_preempt.shard0.npz") as d:
        keys0 = set(d.files)
    assert any(k.startswith("shdata") for k in keys0), (
        "multi-process save must route non-replicated leaves through the "
        "shard branch even when they are locally fully addressable")
    # the other process's leg: same state, pidx=1 — no 'full' keys at all
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    ckpt.save_sharded_train_state(str(tmp_path), state)
    with np.load(tmp_path / "state_preempt.shard1.npz") as d:
        keys1 = set(d.files)
    assert not any(k.startswith("full") for k in keys1)
    assert any(k.startswith("shdata") for k in keys1)


def test_sharded_set_ignores_stale_higher_index_shards(tmp_path):
    """Topology-change hygiene: shard files with index >= the manifest's
    process_count (leftovers from an earlier save with more processes) must
    not poison a fresh complete set, and a fresh save must delete them."""
    import json as _json

    d = tmp_path
    key = "params//w"
    full = np.arange(24, dtype=np.float32).reshape(6, 4)

    def write(name, rows, step, pcount=2):
        payload = {
            f"shape//{key}": np.asarray(full.shape, np.int64),
            "step": np.asarray(step, np.int64),
            "opt_step": np.asarray(step, np.int64),
            "process_count": np.asarray(pcount, np.int64),
        }
        for j, (a, b) in enumerate(rows):
            payload[f"shdata//{key}@{j}"] = full[a:b]
            payload[f"shidx//{key}@{j}"] = np.asarray(
                [[a, b], [0, 4]], np.int64)
        np.savez(d / name, **payload)

    mpath = str(d / ("state_preempt" + ckpt.MANIFEST_SUFFIX))
    with open(mpath, "w") as f:
        _json.dump({"tag": "state_preempt", "step": 7, "process_count": 2}, f)
    write("state_preempt.shard0.npz", [(0, 3)], step=7)
    write("state_preempt.shard1.npz", [(3, 6)], step=7)
    # stale leftovers from an earlier 4-process save, one step behind
    write("state_preempt.shard2.npz", [(0, 6)], step=6, pcount=4)
    write("state_preempt.shard3.npz", [], step=6, pcount=4)

    got = ckpt._read_sharded_set(mpath)
    assert got is not None, "stale shard{>=pcount} files poisoned the set"
    step, flat = got
    assert step == 7
    np.testing.assert_array_equal(flat[key], full)

    # validate-only mode agrees without materializing any data
    step2, none = ckpt._read_sharded_set(mpath, materialize=False)
    assert step2 == 7 and none is None


def test_validate_only_rejects_what_materialize_rejects(tmp_path):
    """materialize=False must reject incomplete/skewed/gapped sets exactly
    like the materializing read — it is what --resume auto resolution uses,
    so a false positive there would send resume into a ValueError instead
    of falling back to the older epoch checkpoint."""
    import json as _json

    d = tmp_path
    key = "params//w"
    full = np.arange(24, dtype=np.float32).reshape(6, 4)

    def write(name, rows, step, pcount=2):
        payload = {
            f"shape//{key}": np.asarray(full.shape, np.int64),
            "step": np.asarray(step, np.int64),
            "opt_step": np.asarray(step, np.int64),
            "process_count": np.asarray(pcount, np.int64),
        }
        for j, (a, b) in enumerate(rows):
            payload[f"shdata//{key}@{j}"] = full[a:b]
            payload[f"shidx//{key}@{j}"] = np.asarray(
                [[a, b], [0, 4]], np.int64)
        np.savez(d / name, **payload)

    mpath = str(d / ("state_preempt" + ckpt.MANIFEST_SUFFIX))
    with open(mpath, "w") as f:
        _json.dump({"tag": "state_preempt", "step": 7, "process_count": 2}, f)

    write("state_preempt.shard0.npz", [(0, 3)], step=7)   # shard1 missing
    assert ckpt._read_sharded_set(mpath, materialize=False) is None
    write("state_preempt.shard1.npz", [(3, 6)], step=8)   # skewed step
    assert ckpt._read_sharded_set(mpath, materialize=False) is None
    write("state_preempt.shard1.npz", [(3, 5)], step=7)   # coverage gap
    assert ckpt._read_sharded_set(mpath, materialize=False) is None
    write("state_preempt.shard1.npz", [(3, 6)], step=7)   # now complete
    assert ckpt._read_sharded_set(mpath, materialize=False) == (7, None)


def test_save_cleans_stale_shards(cfg, tmp_path, rng):
    """A fresh single-process save must delete shard files left by an
    earlier save with a larger process count (index >= current pcount)."""
    params = model.init_params(jax.random.PRNGKey(0), cfg.model)
    bank = mb.create(cfg.train.memory_bank_capacity, W, F,
                     cfg.model.clip.embed_dim)
    state = create_train_state(params, bank)
    stale = tmp_path / "state_preempt.shard3.npz"
    np.savez(stale, step=np.asarray(0), process_count=np.asarray(4))
    ckpt.save_sharded_train_state(str(tmp_path), state)
    assert not stale.exists(), "stale shard3.npz not cleaned up"
    assert (tmp_path / "state_preempt.shard0.npz").exists()
