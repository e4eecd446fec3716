"""GPipe pipeline parallelism (parallel/pipeline.py) vs the plain path.

The pipeline must be semantically invisible: identical tower outputs and
gradients (modulo fp reordering) to layers.transformer_apply, and an
identical training loss to the data-parallel mesh.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neighborretr_tpu.core.config import (Config, DataConfig, LossConfig,
                                          ModelConfig, TrainConfig, validate)
from neighborretr_tpu.models import layers as L
from neighborretr_tpu.models import neighborretr as model
from neighborretr_tpu.parallel import mesh as pmesh
from neighborretr_tpu.parallel import pipeline as pp
from neighborretr_tpu.train import memory_bank as mb
from neighborretr_tpu.train.step import (create_train_state, fill_bank_step,
                                         train_step)

from test_model import make_batch

D, HEADS, LAYERS = 32, 4, 4
B, W, F = 16, 8, 4


@pytest.fixture(scope="module")
def tower():
    return L.transformer_init(jax.random.PRNGKey(0), D, LAYERS)


def _ctx(data, stage, microbatches):
    mesh = pp.make_pp_mesh((data, stage))
    return pp.PipelineContext(mesh=mesh, stages=stage,
                              microbatches=microbatches)


def _x(rows, length=6, seed=1):
    return jax.random.normal(jax.random.PRNGKey(seed), (rows, length, D),
                             jnp.float32)


@pytest.mark.parametrize("data,stage,m", [(2, 4, 4), (4, 2, 2), (1, 2, 8)])
def test_forward_matches_plain(tower, data, stage, m):
    ctx = _ctx(data, stage, m)
    x = _x(rows=16)
    ref = L.transformer_apply(tower, x, HEADS)
    out = pp.pipeline_transformer_apply(tower, x, HEADS, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_per_sample_bias(tower):
    """Per-sample key-padding bias travels with its microbatch."""
    ctx = _ctx(2, 2, 4)
    x = _x(rows=16)
    mask = (jax.random.uniform(jax.random.PRNGKey(2), (16, 6)) > 0.3)
    bias = jnp.where(mask[:, None, None, :], 0.0, -1e6).astype(jnp.float32)
    ref = L.transformer_apply(tower, x, HEADS, attn_bias=bias)
    out = pp.pipeline_transformer_apply(tower, x, HEADS, ctx, attn_bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_constant_bias(tower):
    """A [1,1,L,L] causal bias replicates to every stage."""
    ctx = _ctx(2, 2, 4)
    x = _x(rows=16)
    bias = L.causal_bias(6)
    ref = L.transformer_apply(tower, x, HEADS, attn_bias=bias)
    out = pp.pipeline_transformer_apply(tower, x, HEADS, ctx, attn_bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_plain(tower):
    """AD transposes the pipeline (ppermute ring reverses); grads match."""
    ctx = _ctx(2, 2, 4)
    x = _x(rows=16)

    def loss_plain(p):
        return jnp.sum(jnp.square(L.transformer_apply(p, x, HEADS)))

    def loss_pp(p):
        return jnp.sum(jnp.square(
            pp.pipeline_transformer_apply(p, x, HEADS, ctx)))

    g_ref = jax.grad(loss_plain)(tower)
    g_pp = jax.jit(jax.grad(loss_pp))(tower)
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g_pp),
                            jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=str(path))


def test_context_routing_and_fallback(tower):
    """transformer_apply consults the active context; towers whose depth
    doesn't divide the stage count silently run the plain path."""
    ctx = _ctx(2, 2, 4)
    x = _x(rows=16)
    ref = L.transformer_apply(tower, x, HEADS)
    with pp.activated(ctx):
        routed = L.transformer_apply(tower, x, HEADS)
        # 3 layers don't divide into 2 stages → plain path, same answer
        odd = L.slice_layers(tower, 3)
        fallback = L.transformer_apply(odd, x, HEADS)
    np.testing.assert_allclose(np.asarray(routed), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(fallback),
        np.asarray(L.transformer_apply(odd, x, HEADS)), rtol=0, atol=0)
    assert pp.current() is None


def test_row_divisibility_raises(tower):
    ctx = _ctx(2, 2, 3)   # 16 rows % (2 data × 3 microbatches) != 0
    with pytest.raises(ValueError, match="divide"):
        pp.pipeline_transformer_apply(tower, _x(rows=16), HEADS, ctx)


def test_train_step_loss_matches_data_parallel(rng):
    """Full training step on the (data, stage) mesh == plain DP mesh."""
    cfg = Config(model=ModelConfig.tiny(max_words=W, max_frames=F),
                 loss=LossConfig(num_neighbors=3),
                 train=TrainConfig(batch_size=B, mb_batch=1))
    params = model.init_params(jax.random.PRNGKey(0), cfg.model)
    params_host = jax.device_get(params)   # train_step donates its state
    batch = make_batch(rng, cfg, batch=B)
    batch_host = jax.device_get(batch)
    bank = mb.create(cfg.train.memory_bank_capacity, W, F,
                     cfg.model.clip.embed_dim)
    key = jax.random.PRNGKey(7)

    # reference: single-device (GSPMD DP degenerate case)
    bank_ref = fill_bank_step(params, bank, batch, cfg, 0)
    state_ref = create_train_state(params, bank_ref)
    _, m_ref = train_step(state_ref, batch, key, cfg, t_total=10)

    # pipeline: 2 stages × 4 data shards, 4 microbatches (the tiny towers
    # are 2 layers deep → 1 layer/stage; temporal tower 2 layers)
    cfg_pp = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, pipeline_parallel=2, pipeline_microbatches=4))
    mesh = pp.make_pp_mesh((4, 2))
    params_p = pmesh.place_params(params_host, mesh)
    bank2 = mb.create(cfg.train.memory_bank_capacity, W, F,
                      cfg.model.clip.embed_dim)   # first bank was donated
    bank_p = mb.MemoryBank(*pmesh.replicate_tree(tuple(bank2), mesh))
    batch_p = pmesh.shard_batch(batch_host, mesh)
    bank_p = fill_bank_step(params_p, bank_p, batch_p, cfg_pp, 0)
    state_p = create_train_state(params_p, bank_p)
    _, m_pp = train_step(state_p, batch_p, key, cfg_pp, t_total=10, mesh=mesh)

    np.testing.assert_allclose(float(m_ref["loss"]), float(m_pp["loss"]),
                               rtol=2e-4)
    for k in ("centrality_loss", "uniform_loss", "neighbor_loss", "kl_loss"):
        np.testing.assert_allclose(float(m_ref[k]), float(m_pp[k]),
                                   rtol=2e-3, atol=1e-5)


def test_pp_tp_forward_and_grad(tower):
    """Pipeline × tensor parallelism on a 3-D data×stage×model mesh: the
    `model` axis stays AUTO inside the pipeline's shard_map (GSPMD
    Megatron-partitions each stage's einsums) — outputs and grads match
    the plain path."""
    mesh = pp.make_pp_tp_mesh((2, 2, 2))
    ctx = pp.PipelineContext(mesh=mesh, stages=2, microbatches=4)
    placed = pp.shard_params_pp_tp(tower, mesh)
    x = _x(rows=16)
    ref = L.transformer_apply(tower, x, HEADS)
    out = jax.jit(lambda p, xx: pp.pipeline_transformer_apply(
        p, xx, HEADS, ctx))(placed, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss_pp(p):
        return jnp.sum(jnp.square(
            pp.pipeline_transformer_apply(p, x, HEADS, ctx)))

    def loss_plain(p):
        return jnp.sum(jnp.square(L.transformer_apply(p, x, HEADS)))

    g_pp = jax.jit(jax.grad(loss_pp))(placed)
    g_ref = jax.grad(loss_plain)(tower)
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g_pp),
                            jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=str(path))


def test_pp_tp_train_step_loss_matches(rng):
    """Full training step on the 3-D mesh == single-device step."""
    cfg = Config(model=ModelConfig.tiny(max_words=W, max_frames=F),
                 loss=LossConfig(num_neighbors=3),
                 train=TrainConfig(batch_size=B, mb_batch=1))
    params = model.init_params(jax.random.PRNGKey(0), cfg.model)
    params_host = jax.device_get(params)
    batch = make_batch(rng, cfg, batch=B)
    batch_host = jax.device_get(batch)
    bank = mb.create(cfg.train.memory_bank_capacity, W, F,
                     cfg.model.clip.embed_dim)
    key = jax.random.PRNGKey(7)

    bank_ref = fill_bank_step(params, bank, batch, cfg, 0)
    state_ref = create_train_state(params, bank_ref)
    _, m_ref = train_step(state_ref, batch, key, cfg, t_total=10)

    cfg_pp = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, pipeline_parallel=2, pipeline_microbatches=4))
    mesh = pp.make_pp_tp_mesh((2, 2, 2))
    params_p = pmesh.place_params(params_host, mesh)
    bank2 = mb.create(cfg.train.memory_bank_capacity, W, F,
                      cfg.model.clip.embed_dim)
    bank_p = mb.MemoryBank(*pmesh.replicate_tree(tuple(bank2), mesh))
    batch_p = pmesh.shard_batch(batch_host, mesh)
    bank_p = fill_bank_step(params_p, bank_p, batch_p, cfg_pp, 0)
    state_p = create_train_state(params_p, bank_p)
    _, m_pp = train_step(state_p, batch_p, key, cfg_pp, t_total=10, mesh=mesh)

    np.testing.assert_allclose(float(m_ref["loss"]), float(m_pp["loss"]),
                               rtol=2e-4)


def test_validate_rejects_bad_combos():
    data = DataConfig(max_words=W, max_frames=F)
    cfg = Config(model=ModelConfig.tiny(max_words=W, max_frames=F), data=data,
                 train=TrainConfig(batch_size=B, mb_batch=1,
                                   pipeline_parallel=2, explicit_spmd=True))
    with pytest.raises(ValueError, match="explicit_spmd"):
        validate(cfg, 2)
    cfg = Config(model=ModelConfig.tiny(max_words=W, max_frames=F), data=data,
                 train=TrainConfig(batch_size=B, mb_batch=1,
                                   pipeline_parallel=2, micro_batches=2))
    with pytest.raises(ValueError, match="micro_batches"):
        validate(cfg, 2)
    cfg = Config(model=ModelConfig.tiny(max_words=W, max_frames=F), data=data,
                 train=TrainConfig(batch_size=B, mb_batch=1,
                                   pipeline_parallel=2,
                                   pipeline_microbatches=3))
    with pytest.raises(ValueError, match="pipeline_microbatches"):
        validate(cfg, 2)
    import dataclasses as dc
    tiny = ModelConfig.tiny(max_words=W, max_frames=F)
    cfg = Config(model=dc.replace(tiny, video_chunk_frames=8), data=data,
                 train=TrainConfig(batch_size=B, mb_batch=1,
                                   pipeline_parallel=2))
    with pytest.raises(ValueError, match="video_chunk_frames"):
        validate(cfg, 2)


def test_pipeline_honors_remat_policy(tower):
    """--remat_policy carries into the pipelined towers (review fix): the
    'attn' save-policy path runs and matches the plain tower."""
    mesh = pp.make_pp_mesh((4, 2))
    ctx = pp.PipelineContext(mesh=mesh, stages=2, microbatches=2)
    placed = pp.shard_params_pp(tower, mesh)
    x = _x(rows=16)
    ref = L.transformer_apply(tower, x, HEADS)

    def run(p, xx):
        return pp.pipeline_transformer_apply(p, xx, HEADS, ctx,
                                             remat=True, remat_policy="attn")

    out = jax.jit(run)(placed, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    g = jax.jit(jax.grad(lambda p: jnp.sum(jnp.square(run(p, x)))))(placed)
    g_ref = jax.grad(lambda p: jnp.sum(jnp.square(
        L.transformer_apply(p, x, HEADS))))(tower)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_stage_mismatch_raises(tower):
    mesh = pp.make_pp_mesh((2, 4))
    ctx = pp.PipelineContext(mesh=mesh, stages=2, microbatches=2)
    with pytest.raises(ValueError, match="stages=2"):
        pp.pipeline_transformer_apply(tower, _x(B), n_head=HEADS, ctx=ctx)
