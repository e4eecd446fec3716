"""Evaluation harness tests on synthetic data (tiny model, CPU)."""

import jax
import numpy as np
import pytest

from neighborretr_tpu.core.config import Config, LossConfig, ModelConfig, TrainConfig
from neighborretr_tpu.data.datasets.synthetic import SyntheticDataset
from neighborretr_tpu.data.loader import BatchLoader
from neighborretr_tpu.models import neighborretr as model
from neighborretr_tpu.train.evaluate import (evaluate, extract_features,
                                             reshape_multi_sentence,
                                             similarity_matrix)

W, F, RES = 8, 4, 32
N = 20


@pytest.fixture(scope="module")
def cfg():
    return Config(model=ModelConfig.tiny(max_words=W, max_frames=F),
                  loss=LossConfig(num_neighbors=3),
                  train=TrainConfig(batch_size=8, batch_size_val=8))


@pytest.fixture(scope="module")
def params(cfg):
    return model.init_params(jax.random.PRNGKey(0), cfg.model)


@pytest.fixture(scope="module")
def dataset(cfg):
    return SyntheticDataset(n=N, max_words=W, max_frames=F, resolution=RES,
                            vocab_size=cfg.model.clip.vocab_size)


def test_extract_features_order_and_trim(cfg, params, dataset):
    loader = BatchLoader(dataset, 8, shuffle=False, drop_last=False,
                         workers=2, pad_to_batch=True)
    tf, tm, vf, vm = extract_features(params, cfg, loader)
    # padded tail rows trimmed, order restored
    assert tf.shape[0] == N
    assert vf.shape[0] == N
    assert tm.shape == (N, W) and vm.shape == (N, F)


def test_similarity_matrix_blocked_equals_direct(cfg, params, dataset):
    """Force the row-blocked einsum path (max_logits_bytes=0 + pallas off)
    against the single-call path — the 2 GB default threshold only trips on
    production-size evals, so without forcing, block=7 vs block=N would
    compare two identical full-path calls and the pad/slice/trim loop
    would ship untested."""
    import dataclasses as dc
    loader = BatchLoader(dataset, 8, shuffle=False, drop_last=False,
                         workers=2, pad_to_batch=True)
    tf, tm, vf, vm = extract_features(params, cfg, loader)
    xla_cfg = dc.replace(cfg, model=dc.replace(cfg.model, use_pallas=False))
    sim_one_block = similarity_matrix(params, xla_cfg, tf, tm, vf, vm)
    sim_small_blocks = similarity_matrix(params, xla_cfg, tf, tm, vf, vm,
                                         block=7, max_logits_bytes=0)
    np.testing.assert_allclose(sim_small_blocks, sim_one_block, atol=1e-4)
    assert sim_small_blocks.shape == (N, N)
    # and the pallas path agrees with the XLA paths
    sim_pallas = similarity_matrix(params, cfg, tf, tm, vf, vm)
    np.testing.assert_allclose(sim_pallas, sim_one_block, atol=1e-3)


def test_evaluate_single_sentence(cfg, params, dataset):
    loader = BatchLoader(dataset, 8, shuffle=False, drop_last=False,
                         workers=2, pad_to_batch=True)
    t2v, v2t = evaluate(params, cfg, loader, dataset=dataset)
    for m in (t2v, v2t):
        assert set(m) >= {"R1", "R5", "R10", "R50", "MR", "MeanR"}
        assert 0 <= m["R1"] <= 100


def test_evaluate_multi_sentence(cfg, params):
    class MultiSyn(SyntheticDataset):
        multi_sentence_per_video = True

    ds = MultiSyn(n=N, max_words=W, max_frames=F, resolution=RES,
                  vocab_size=cfg.model.clip.vocab_size)
    # caption groups: videos own 2,3,... captions; cumulative exclusive ends
    ds.cut_off_points = [2, 5, 9, 14, 20]
    loader = BatchLoader(ds, 8, shuffle=False, drop_last=False,
                         workers=2, pad_to_batch=True)
    t2v, v2t = evaluate(params, cfg, loader, dataset=ds)
    assert 0 <= t2v["R1"] <= 100
    assert 0 <= v2t["R1"] <= 100


def test_reshape_multi_sentence_padding():
    sim = np.arange(12, dtype=np.float64).reshape(6, 2)
    out = reshape_multi_sentence(sim, [2, 3, 6])
    assert out.shape == (3, 3, 2)
    np.testing.assert_allclose(out[0, :2], sim[:2])
    assert np.all(np.isinf(out[0, 2]))
    np.testing.assert_allclose(out[1, 0], sim[2])
    assert np.all(np.isinf(out[1, 1:]))
    np.testing.assert_allclose(out[2], sim[3:6])


def test_evaluate_mesh_matches_single_device(cfg, params, dataset):
    """Data-parallel eval over the 8-device mesh reproduces single-device
    metrics exactly (same features, same ranking)."""
    from neighborretr_tpu.parallel import mesh as pmesh
    loader = BatchLoader(dataset, 8, shuffle=False, drop_last=False,
                         workers=2, pad_to_batch=True)
    t2v_1, v2t_1 = evaluate(params, cfg, loader, dataset=dataset)

    mesh = pmesh.make_mesh()
    params_r = pmesh.replicate_tree(params, mesh)
    t2v_m, v2t_m = evaluate(params_r, cfg, loader, dataset=dataset, mesh=mesh)
    for a, b in ((t2v_1, t2v_m), (v2t_1, v2t_m)):
        for k in ("R1", "R5", "R10", "MR", "MeanR"):
            assert abs(a[k] - b[k]) < 1e-6, k


def test_device_ranking_matches_host_paths():
    """On-device ranking (metrics.device_*) reproduces the reference-exact
    host numpy path on continuous (tie-free) similarities, both protocols."""
    import jax.numpy as jnp
    from neighborretr_tpu.train import metrics as M
    from neighborretr_tpu.train.evaluate import reshape_multi_sentence_device

    rng = np.random.default_rng(0)
    sim = rng.normal(size=(20, 9)).astype(np.float32)
    cut_offs = [2, 5, 9, 11, 12, 15, 17, 18, 20]

    # single-sentence
    sq = rng.normal(size=(15, 15)).astype(np.float32)
    host = M.compute_metrics(sq)
    dev = M.metrics_from_ranks(np.asarray(M.device_ranks(jnp.asarray(sq))))
    for k in ("R1", "R5", "R10", "R50", "MR", "MeanR"):
        assert dev[k] == pytest.approx(host[k]), k

    # multi-sentence reshape parity
    sim3d_host = reshape_multi_sentence(sim, cut_offs)
    sim3d_dev = reshape_multi_sentence_device(jnp.asarray(sim), cut_offs)
    np.testing.assert_array_equal(np.asarray(sim3d_dev), sim3d_host)

    # multi-sentence t2v
    host_t2v = M.tensor_text_to_video_metrics(sim3d_host)
    ranks, valid = M.device_multi_sentence_ranks(sim3d_dev)
    dev_t2v = M.metrics_from_ranks(np.asarray(ranks)[np.asarray(valid)])
    for k in ("R1", "R5", "R10", "R50", "MedianR", "MeanR"):
        assert dev_t2v[k] == pytest.approx(host_t2v[k]), k

    # multi-sentence v2t
    host_v2t = M.compute_metrics(M.tensor_video_to_text_sim(sim3d_host))
    dev_v2t = M.metrics_from_ranks(
        np.asarray(M.device_video_to_text_ranks(sim3d_dev)))
    for k in ("R1", "R5", "R10", "R50", "MR", "MeanR"):
        assert dev_v2t[k] == pytest.approx(host_v2t[k]), k


def test_video_keep_dedup_matches_full_encode(cfg, params, dataset):
    """extract_features(video_keep=...) encodes only the kept rows' videos
    and reproduces the full-encode path's features for those rows."""
    keep = np.array([1, 4, 8, 13, 19])
    loader = BatchLoader(dataset, 8, shuffle=False, drop_last=False,
                         workers=2, pad_to_batch=True)
    tf_full, tm_full, vf_full, vm_full = extract_features(
        params, cfg, loader)
    tf_keep, tm_keep, vf_keep, vm_keep = extract_features(
        params, cfg, loader, video_keep=keep)

    np.testing.assert_allclose(np.asarray(tf_keep), np.asarray(tf_full),
                               atol=1e-5)
    np.testing.assert_array_equal(tm_keep, tm_full)
    assert vf_keep.shape[0] == len(keep)
    np.testing.assert_allclose(np.asarray(vf_keep),
                               np.asarray(vf_full)[keep], atol=1e-5)
    np.testing.assert_array_equal(vm_keep, vm_full[keep])
