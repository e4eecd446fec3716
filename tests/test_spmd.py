"""Explicit shard_map SPMD losses vs the single-device reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neighborretr_tpu.core.config import Config, LossConfig, ModelConfig, TrainConfig
from neighborretr_tpu.models import neighborretr as model
from neighborretr_tpu.parallel import mesh as pmesh
from neighborretr_tpu.parallel.spmd import compute_losses_spmd
from neighborretr_tpu.train import memory_bank as mb
from neighborretr_tpu.train.step import compute_losses, fill_bank_step

from test_model import make_batch

B, W, F = 16, 8, 4


@pytest.fixture(scope="module")
def cfg():
    return Config(model=ModelConfig.tiny(max_words=W, max_frames=F),
                  loss=LossConfig(num_neighbors=3),
                  train=TrainConfig(batch_size=B, mb_batch=1))


@pytest.mark.smoke
def test_spmd_losses_match_single_device(cfg, rng):
    mesh = pmesh.make_mesh()
    params = model.init_params(jax.random.PRNGKey(0), cfg.model)
    batch = make_batch(rng, cfg, batch=B)
    bank = mb.create(cfg.train.memory_bank_capacity, W, F,
                     cfg.model.clip.embed_dim)
    bank = fill_bank_step(params, bank, batch, cfg, 0)
    key = jax.random.PRNGKey(3)

    loss_ref, aux_ref = compute_losses(params, cfg, batch, bank, key)

    sharded_batch = pmesh.shard_batch(batch, mesh)
    params_r = pmesh.replicate_tree(params, mesh)
    bank_r = mb.MemoryBank(*pmesh.replicate_tree(tuple(bank), mesh))
    fn = jax.jit(lambda p, b, bk: compute_losses_spmd(p, cfg, b, bk, key,
                                                      mesh))
    loss_spmd, aux_spmd = fn(params_r, sharded_batch, bank_r)

    np.testing.assert_allclose(float(loss_ref), float(loss_spmd), rtol=2e-4)
    for k in ("centrality_loss", "uniform_loss", "neighbor_loss", "kl_loss"):
        np.testing.assert_allclose(float(aux_ref[k]), float(aux_spmd[k]),
                                   rtol=2e-3, atol=1e-5)


@pytest.mark.smoke
def test_spmd_gradients_match_single_device(cfg, rng):
    mesh = pmesh.make_mesh()
    params = model.init_params(jax.random.PRNGKey(0), cfg.model)
    batch = make_batch(rng, cfg, batch=B)
    bank = mb.create(cfg.train.memory_bank_capacity, W, F,
                     cfg.model.clip.embed_dim)
    bank = fill_bank_step(params, bank, batch, cfg, 0)
    key = jax.random.PRNGKey(3)

    g_ref = jax.grad(lambda p: compute_losses(p, cfg, batch, bank, key)[0])(
        params)

    sharded_batch = pmesh.shard_batch(batch, mesh)
    params_r = pmesh.replicate_tree(params, mesh)
    bank_r = mb.MemoryBank(*pmesh.replicate_tree(tuple(bank), mesh))
    g_spmd = jax.jit(jax.grad(
        lambda p: compute_losses_spmd(p, cfg, sharded_batch, bank_r, key,
                                      mesh)[0]))(params_r)

    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_spmd = jax.tree.leaves(g_spmd)
    for (path, a), b in zip(flat_ref, flat_spmd):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=2e-5,
            err_msg=jax.tree_util.keystr(path))


def test_explicit_spmd_rejects_multi_axis_mesh(cfg, rng):
    """shard_mapping P('data') over one axis of a hybrid (replica, data)
    mesh would re-encode the batch per replica group and psum param
    cotangents over the whole mesh (gradients x replica factor) — reject
    with a clear error instead."""
    mesh = pmesh.make_hybrid_mesh((2, 4))
    params = model.init_params(jax.random.PRNGKey(0), cfg.model)
    batch = make_batch(rng, cfg, batch=B)
    bank = mb.create(cfg.train.memory_bank_capacity, W, F,
                     cfg.model.clip.embed_dim)
    with pytest.raises(ValueError, match="1-D"):
        compute_losses_spmd(params, cfg, batch, bank,
                            jax.random.PRNGKey(3), mesh)


def test_explicit_spmd_rejects_wrong_axis_name(cfg):
    import pytest
    mesh = pmesh.make_mesh()
    with pytest.raises(ValueError, match="data_axis"):
        compute_losses_spmd(None, cfg, {}, None, None, mesh, axis="batch")
