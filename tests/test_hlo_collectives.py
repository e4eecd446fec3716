"""Compiled-HLO audits of the parallelism claims on the 8-device mesh.

The equality tests (test_sharding/test_pipeline/test_spmd) prove the sharded
programs compute the right numbers; these prove they do it with the
COMMUNICATION STRUCTURE the design claims (PARITY.md):

* DP backward: gradients of replicated params against data-sharded
  activations lower to all-reduce (the DDP-allreduce analogue the reference
  gets from torch, optimizer.py:78-84).
* TP tower forward: ZERO all-gather / all-to-all — the [D, 3, D] qkv layout
  keeps activation resharding out of the program; communication is only the
  Megatron partial-sum all-reduces (out_proj / c_proj rows).
* FSDP gradient step: parameters all-gather just in time and gradients
  reduce-scatter (ZeRO-3) — the placement buys sharded memory, not silent
  replication.
* Pipeline: the stage ring lowers to collective-permute (lax.ppermute).
"""

import re

import jax
import jax.numpy as jnp
import pytest

from neighborretr_tpu.models import layers as L
from neighborretr_tpu.parallel import mesh as pmesh
from neighborretr_tpu.parallel import pipeline as pp
from jax.sharding import NamedSharding, PartitionSpec as P

D, HEADS, LAYERS = 32, 4, 4
ROWS = 16


@pytest.fixture(scope="module")
def tower():
    return L.transformer_init(jax.random.PRNGKey(0), D, LAYERS)


def _x():
    return jax.random.normal(jax.random.PRNGKey(1), (ROWS, 6, D),
                             jnp.float32)


def _hlo(fn, *args, **jit_kw):
    return jax.jit(fn, **jit_kw).lower(*args).compile().as_text()


def _count(hlo: str, op: str) -> int:
    # substring count: also catches the async `-start`/`-done` forms, and
    # for the ==0 assertions over-matching is the safe direction
    return len(re.findall(rf"\b{op}", hlo))


def test_dp_backward_allreduces_grads(tower):
    mesh = pmesh.make_mesh()
    placed = pmesh.replicate_tree(tower, mesh)
    x = jax.device_put(_x(), NamedSharding(mesh, P("data")))

    def loss(p, xx):
        return jnp.sum(jnp.square(L.transformer_apply(p, xx, HEADS)))

    hlo = _hlo(jax.grad(loss), placed, x,
               out_shardings=jax.tree.map(
                   lambda _: NamedSharding(mesh, P()), tower))
    assert _count(hlo, "all-reduce") >= 1, "DP grads must all-reduce"


def test_tp_tower_has_no_activation_regathers(tower):
    """PARITY claim: the head-aligned [D,3,D] qkv layout means the TP tower
    HLO contains ZERO all-gather / all-to-all — only Megatron psums."""
    mesh = pmesh.make_tp_mesh((2, 4))
    placed = pmesh.shard_params_tp(tower, mesh)
    x = jax.device_put(_x(), NamedSharding(mesh, P("data")))

    hlo = _hlo(lambda p, xx: L.transformer_apply(p, xx, HEADS), placed, x,
               out_shardings=NamedSharding(mesh, P("data")))
    assert _count(hlo, "all-gather") == 0, "TP tower re-gathered activations"
    assert _count(hlo, "all-to-all") == 0
    assert _count(hlo, "all-reduce") >= 1, "Megatron psums missing"


def test_fsdp_gathers_params_and_reduce_scatters_grads(tower):
    mesh = pmesh.make_mesh()
    host = jax.device_get(tower)
    placed = pmesh.place_params(host, mesh, fsdp=True)
    shardings = pmesh.fsdp_param_shardings(host, mesh)
    x = jax.device_put(_x(), NamedSharding(mesh, P("data")))

    def loss(p, xx):
        return jnp.sum(jnp.square(L.transformer_apply(p, xx, HEADS)))

    hlo = _hlo(jax.grad(loss), placed, x, out_shardings=shardings)
    assert _count(hlo, "all-gather") >= 1, (
        "ZeRO-3 forward must gather the sharded weights just in time")
    # the gradient scatter: TPU XLA emits a fused reduce-scatter; CPU XLA
    # lowers the same semantics as all-reduce + dynamic-slice (grads are
    # pinned to the sharded out_shardings either way)
    assert (_count(hlo, "reduce-scatter") >= 1
            or (_count(hlo, "all-reduce") >= 1
                and _count(hlo, "dynamic-slice") >= 1)), (
        "ZeRO-3 backward must produce sharded gradient reductions")


def test_pipeline_uses_collective_permute(tower):
    mesh = pp.make_pp_mesh((4, 2))
    ctx = pp.PipelineContext(mesh=mesh, stages=2, microbatches=4)
    placed = pp.shard_params_pp(tower, mesh)

    hlo = _hlo(lambda p, xx: pp.pipeline_transformer_apply(
        p, xx, HEADS, ctx), placed, _x())
    assert _count(hlo, "collective-permute") >= 1, (
        "GPipe ring must lower to collective-permute")


def test_pp_tp_composition_has_both_collectives(tower):
    mesh = pp.make_pp_tp_mesh((2, 2, 2))
    ctx = pp.PipelineContext(mesh=mesh, stages=2, microbatches=4)
    placed = pp.shard_params_pp_tp(tower, mesh)

    hlo = _hlo(lambda p, xx: pp.pipeline_transformer_apply(
        p, xx, HEADS, ctx), placed, _x())
    assert _count(hlo, "collective-permute") >= 1
    assert _count(hlo, "all-reduce") >= 1, (
        "Megatron psums should appear inside each pipeline stage")
    assert _count(hlo, "all-to-all") == 0


def test_sharded_serving_query_program_has_no_collectives():
    """Corpus-sharded serving (Searcher(mesh=...)): each device scores its
    own corpus rows against replicated queries — the similarity program
    must contain ZERO collectives (in particular no corpus-sized
    all-gather, which would silently defeat the memory scaling the mode
    exists for).  The [Q, N] result leaves the program sharded; only the
    separate top-k / host fetch assembles it."""
    import json

    import numpy as np

    from neighborretr_tpu import serving
    from neighborretr_tpu.core.config import Config, ModelConfig
    from neighborretr_tpu.data.text import encode_caption
    from neighborretr_tpu.models import neighborretr as model
    from neighborretr_tpu.train.evaluate import (_encode_text_batch,
                                                 _sim_block)

    W, F, N = 8, 4, 1600
    cfg = Config(model=ModelConfig.tiny(max_words=W, max_frames=F))
    params = model.init_params(jax.random.PRNGKey(0), cfg.model)
    rng = np.random.default_rng(0)
    index = {
        "video_ids": np.asarray([f"v{i}" for i in range(N)]),
        "v_feat": rng.normal(
            size=(N, F, cfg.model.clip.embed_dim)).astype(np.float16),
        "v_mask": np.ones((N, F), np.float32),
        "meta": np.frombuffer(json.dumps(
            serving._config_meta(cfg, params)).encode(), dtype=np.uint8),
    }

    class Tok:
        def tokenize(self, t):
            return t.split()

        def convert_tokens_to_ids(self, toks):
            return [1 + (hash(t) % 500) for t in toks]

    mesh = pmesh.make_mesh(num_devices=8)
    s = serving.Searcher(params, cfg, index, Tok(), query_batch=4, mesh=mesh)

    enc = [encode_caption(Tok(), "a b c", W) for _ in range(4)]
    ids = jax.device_put(np.stack([e[0] for e in enc]), s._replicate)
    tm = jax.device_put(np.stack([e[1] for e in enc]).astype(np.float32),
                        s._replicate)
    tf = _encode_text_batch(s._params_sim, s._cfg_sim, ids, tm)
    hlo = _sim_block.lower(s._params_sim, s._cfg_sim, tf, s._v_feat,
                           tm, s._v_mask).compile().as_text()
    for op in ("all-gather", "all-reduce", "all-to-all",
               "collective-permute", "reduce-scatter"):
        assert _count(hlo, op) == 0, f"sharded query program emitted {op}"
