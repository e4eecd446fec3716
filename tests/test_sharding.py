"""Multi-device tests on the virtual 8-device CPU mesh: the SPMD train step
must produce the same numbers as the single-device program."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neighborretr_tpu.core.config import Config, LossConfig, ModelConfig, TrainConfig
from neighborretr_tpu.models import neighborretr as model
from neighborretr_tpu.parallel import mesh as pmesh
from neighborretr_tpu.train import memory_bank as mb
from neighborretr_tpu.train.step import (compute_losses, create_train_state,
                                         fill_bank_step, train_step)

from test_model import make_batch

B, W, F = 16, 8, 4


@pytest.fixture(scope="module")
def cfg():
    return Config(model=ModelConfig.tiny(max_words=W, max_frames=F),
                  loss=LossConfig(num_neighbors=3),
                  train=TrainConfig(batch_size=B, mb_batch=1))


@pytest.fixture(scope="module")
def params(cfg):
    return model.init_params(jax.random.PRNGKey(0), cfg.model)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_loss_matches_replicated(cfg, params, rng):
    mesh = pmesh.make_mesh()
    batch = make_batch(rng, cfg, batch=B)
    bank = mb.create(cfg.train.memory_bank_capacity, W, F,
                     cfg.model.clip.embed_dim)
    bank = fill_bank_step(params, bank, batch, cfg, 0)

    key = jax.random.PRNGKey(3)
    loss_single, aux_single = compute_losses(params, cfg, batch, bank, key)

    # shard the batch over the data axis; replicate params + bank
    sharded_batch = pmesh.shard_batch(batch, mesh)
    params_r = pmesh.replicate_tree(params, mesh)
    bank_r = mb.MemoryBank(*pmesh.replicate_tree(tuple(bank), mesh))
    loss_sharded, aux_sharded = jax.jit(
        compute_losses, static_argnames=("cfg",))(
        params_r, cfg, sharded_batch, bank_r, key)

    np.testing.assert_allclose(float(loss_single), float(loss_sharded),
                               rtol=2e-4)
    for k in ("centrality_loss", "uniform_loss", "neighbor_loss", "kl_loss"):
        np.testing.assert_allclose(float(aux_single[k]),
                                   float(aux_sharded[k]), rtol=2e-3, atol=1e-5)


def test_sharded_train_step_runs_and_updates(cfg, params, rng):
    mesh = pmesh.make_mesh()
    batch = make_batch(rng, cfg, batch=B)
    bank = mb.create(cfg.train.memory_bank_capacity, W, F,
                     cfg.model.clip.embed_dim)

    params_r = pmesh.replicate_tree(jax.tree.map(jnp.copy, params), mesh)
    bank_r = mb.MemoryBank(*pmesh.replicate_tree(tuple(bank), mesh))
    sharded_batch = pmesh.shard_batch(batch, mesh)

    state = create_train_state(params_r, bank_r)
    state = state._replace(bank=fill_bank_step(
        state.params, state.bank, sharded_batch, cfg, 0))

    for i in range(2):
        state, metrics = train_step(state, sharded_batch,
                                    jax.random.PRNGKey(i), cfg, t_total=50)
        assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 2


def test_tensor_parallel_matches_replicated(cfg, params, rng):
    """2-D (data, model) mesh — Megatron-style TP via pure sharding
    placement (parallel/mesh.py tp_param_shardings): tower weight matrices
    shard over `model`, batch shards over `data` only, and the loss (plus a
    full train step) must reproduce the single-device numbers."""
    mesh = pmesh.make_tp_mesh((2, 4))
    assert mesh.devices.shape == (2, 4)
    batch = make_batch(rng, cfg, batch=B)
    bank = mb.create(cfg.train.memory_bank_capacity, W, F,
                     cfg.model.clip.embed_dim)
    bank = fill_bank_step(params, bank, batch, cfg, 0)

    key = jax.random.PRNGKey(3)
    loss_single, aux_single = compute_losses(params, cfg, batch, bank, key)

    sharded_batch = pmesh.shard_batch(batch, mesh)
    # batch replicates over `model`: its shards live on all 8 devices but
    # only `data` (=2) distinct row blocks exist
    assert len(sharded_batch["video"].sharding.device_set) == 8
    params_tp = pmesh.shard_params_tp(jax.tree.map(jnp.copy, params), mesh)
    in_w = params_tp["clip"]["visual"]["transformer"]["attn"]["in_proj"]["w"]
    assert in_w.sharding.spec[-1] == "model"       # columns actually sharded
    bank_r = mb.MemoryBank(*pmesh.replicate_tree(tuple(bank), mesh))

    loss_tp, aux_tp = jax.jit(compute_losses, static_argnames=("cfg",))(
        params_tp, cfg, sharded_batch, bank_r, key)
    np.testing.assert_allclose(float(loss_single), float(loss_tp), rtol=2e-4)
    for k in ("centrality_loss", "uniform_loss", "neighbor_loss", "kl_loss"):
        np.testing.assert_allclose(float(aux_single[k]), float(aux_tp[k]),
                                   rtol=2e-3, atol=1e-5)

    # a full train step keeps the TP layout on the updated params
    state = create_train_state(params_tp, bank_r)
    state, metrics = train_step(state, sharded_batch, jax.random.PRNGKey(0),
                                cfg, t_total=50)
    assert np.isfinite(float(metrics["loss"]))
    out_w = state.params["clip"]["visual"]["transformer"]["attn"]["in_proj"]["w"]
    assert out_w.sharding.spec[-1] == "model"


def test_hybrid_mesh_loss_matches_replicated(cfg, params, rng):
    """2-D (replica, data) mesh — the multi-slice DP layout: batch sharded
    over both axes must reproduce the single-device loss."""
    mesh = pmesh.make_hybrid_mesh((2, 4))
    assert mesh.devices.shape == (2, 4)
    batch = make_batch(rng, cfg, batch=B)
    bank = mb.create(cfg.train.memory_bank_capacity, W, F,
                     cfg.model.clip.embed_dim)
    bank = fill_bank_step(params, bank, batch, cfg, 0)

    key = jax.random.PRNGKey(3)
    loss_single, _ = compute_losses(params, cfg, batch, bank, key)

    sharded_batch = pmesh.shard_batch(batch, mesh)
    assert len(sharded_batch["video"].sharding.device_set) == 8
    params_r = pmesh.replicate_tree(params, mesh)
    bank_r = mb.MemoryBank(*pmesh.replicate_tree(tuple(bank), mesh))
    loss_sharded, _ = jax.jit(compute_losses, static_argnames=("cfg",))(
        params_r, cfg, sharded_batch, bank_r, key)
    np.testing.assert_allclose(float(loss_single), float(loss_sharded),
                               rtol=2e-4)


def test_tp_param_sharding_rules(params):
    """tp_param_shardings: Megatron rules on the real parameter tree —
    qkv/c_fc shard their LAST axis, out/c_proj their second-to-last,
    everything else replicates."""
    from jax.sharding import PartitionSpec as P

    mesh = pmesh.make_tp_mesh((2, 4))
    shardings = pmesh.tp_param_shardings(params, mesh)

    blk = shardings["clip"]["visual"]["transformer"]
    assert blk["attn"]["in_proj"]["w"].spec == P(None, None, None, "model")
    assert blk["attn"]["in_proj"]["b"].spec == P(None, None, "model")
    assert blk["attn"]["out_proj"]["w"].spec == P(None, "model", None)
    assert blk["attn"]["out_proj"]["b"].spec == P()
    assert blk["mlp"]["c_fc"]["w"].spec == P(None, None, "model")
    assert blk["mlp"]["c_fc"]["b"].spec == P(None, "model")
    assert blk["mlp"]["c_proj"]["w"].spec == P(None, "model", None)
    assert blk["mlp"]["c_proj"]["b"].spec == P()
    assert blk["ln_1"]["scale"].spec == P()
    # non-tower leaves replicate
    assert shardings["clip"]["logit_scale"].spec == P()
    assert shardings["text_weight_fc"]["fc1"]["w"].spec == P()
    assert shardings["text_merge"]["block0"]["kv"]["w"].spec == P()


def test_micro_batches_on_tp_mesh_matches_replicated(cfg, params, rng):
    """--micro_batches composes with tensor parallelism: the [B] → [n, B/n]
    reshape under a data×model mesh (batch sharded over `data` only) must
    produce the same loss as the monolithic replicated encode."""
    import dataclasses

    batch = make_batch(rng, cfg, batch=B)
    bank = mb.create(cfg.train.memory_bank_capacity, W, F,
                     cfg.model.clip.embed_dim)
    bank = fill_bank_step(params, bank, batch, cfg, 0)
    key = jax.random.PRNGKey(5)
    loss_single, _ = compute_losses(params, cfg, batch, bank, key)

    mesh = pmesh.make_tp_mesh((2, 4))
    cfg_mb = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, micro_batches=4))
    tparams = pmesh.shard_params_tp(params, mesh)
    tbank = mb.MemoryBank(*pmesh.replicate_tree(tuple(bank), mesh))
    tbatch = pmesh.shard_batch(batch, mesh)
    loss_tp, _ = jax.jit(compute_losses, static_argnames=("cfg",))(
        tparams, cfg_mb, tbatch, tbank, key)
    np.testing.assert_allclose(float(loss_tp), float(loss_single), rtol=2e-4)


def test_fsdp_matches_replicated_and_stays_sharded(cfg, params, rng):
    """FSDP (ZeRO-3 placement): identical loss to the replicated run, and
    the donated train step keeps params AND Adam moments sharded — the
    memory win survives the step (XLA propagates the input shardings)."""
    import dataclasses
    mesh = pmesh.make_mesh()
    cfg_f = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, fsdp=True))
    batch = make_batch(rng, cfg, batch=B)
    batch_host = jax.device_get(batch)
    bank = mb.create(cfg.train.memory_bank_capacity, W, F,
                     cfg.model.clip.embed_dim)
    key = jax.random.PRNGKey(9)

    bank_r = fill_bank_step(params, bank, batch, cfg, 0)
    state_r = create_train_state(jax.device_get(params), bank_r)
    _, m_ref = train_step(state_r, batch, key, cfg, t_total=10)

    placed = pmesh.place_params(jax.device_get(params), mesh, fsdp=True)
    # the big 2-D leaves really shard over data
    tok = placed["clip"]["text"]["token_embedding"]
    assert not tok.sharding.is_fully_replicated
    bank2 = mb.create(cfg.train.memory_bank_capacity, W, F,
                      cfg.model.clip.embed_dim)
    bank_f = mb.MemoryBank(*pmesh.replicate_tree(tuple(bank2), mesh))
    batch_f = pmesh.shard_batch(batch_host, mesh)
    bank_f = fill_bank_step(placed, bank_f, batch_f, cfg_f, 0)
    state_f = create_train_state(placed, bank_f)
    state_f, m_fsdp = train_step(state_f, batch_f, key, cfg_f, t_total=10,
                                 mesh=mesh)

    np.testing.assert_allclose(float(m_ref["loss"]), float(m_fsdp["loss"]),
                               rtol=2e-4)
    # sharding survives the donated update for params and both moments
    for tree in (state_f.params, state_f.opt.m, state_f.opt.v):
        leaf = tree["clip"]["text"]["token_embedding"]
        assert not leaf.sharding.is_fully_replicated, (
            "FSDP sharding lost through train_step")
