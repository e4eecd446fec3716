"""End-to-end model tests on a tiny config (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neighborretr_tpu.core.config import Config, LossConfig, ModelConfig, TrainConfig
from neighborretr_tpu.models import neighborretr as model
from neighborretr_tpu.train import bertadam
from neighborretr_tpu.train import memory_bank as mb
from neighborretr_tpu.train.step import (compute_losses, create_train_state,
                                         fill_bank_step, train_step)

B, W, F = 8, 8, 4


@pytest.fixture(scope="module")
def tiny_cfg():
    mcfg = ModelConfig.tiny(max_words=W, max_frames=F)
    return Config(
        model=mcfg,
        loss=LossConfig(num_neighbors=3),
        train=TrainConfig(batch_size=B, mb_batch=2, epochs=1),
    )


@pytest.fixture(scope="module")
def tiny_params(tiny_cfg):
    return model.init_params(jax.random.PRNGKey(0), tiny_cfg.model)


def make_batch(rng, cfg, batch=B):
    res = cfg.model.clip.image_resolution
    vocab = cfg.model.clip.vocab_size
    text_ids = rng.integers(1, vocab - 1, size=(batch, W)).astype(np.int32)
    text_mask = np.zeros((batch, W), np.float32)
    for i in range(batch):
        n = rng.integers(3, W + 1)
        text_mask[i, :n] = 1
        text_ids[i, n - 1] = vocab - 1   # EoT = max id
        text_ids[i, n:] = 0
    video = rng.normal(size=(batch, F, res, res, 3)).astype(np.float32)
    video_mask = np.ones((batch, F), np.float32)
    return {
        "text_ids": jnp.array(text_ids),
        "text_mask": jnp.array(text_mask),
        "video": jnp.array(video),
        "video_mask": jnp.array(video_mask),
        "idx": jnp.arange(batch, dtype=jnp.int32),
    }


def test_feature_shapes(tiny_cfg, tiny_params, rng):
    batch = make_batch(rng, tiny_cfg)
    tf, vf = model.get_text_video_feat(
        tiny_params, tiny_cfg.model, batch["text_ids"], batch["text_mask"],
        batch["video"], batch["video_mask"])
    E = tiny_cfg.model.clip.embed_dim
    assert tf.shape == (B, W, E)
    assert vf.shape == (B, F, E)
    assert np.all(np.isfinite(np.asarray(tf)))
    assert np.all(np.isfinite(np.asarray(vf)))


def test_similarity_levels(tiny_cfg, tiny_params, rng):
    batch = make_batch(rng, tiny_cfg)
    tf, vf = model.get_text_video_feat(
        tiny_params, tiny_cfg.model, batch["text_ids"], batch["text_mask"],
        batch["video"], batch["video_mask"])
    s, st = model.get_similarity_logits(
        tiny_params, tf, vf, batch["text_mask"], batch["video_mask"])
    assert s.shape == (B, B)
    np.testing.assert_allclose(np.asarray(st), np.asarray(s).T)

    g_t, g_v = model.merge_global_features(
        tiny_params, tiny_cfg.model, tf, vf, batch["text_mask"],
        batch["video_mask"], jax.random.PRNGKey(1))
    assert g_t.shape == (B, 1, tiny_cfg.model.clip.embed_dim)
    assert g_v.shape == (B, 1, tiny_cfg.model.clip.embed_dim)
    sg = model.global_level(tiny_params, g_t, g_v)
    assert sg.shape == (B, B)
    assert np.all(np.isfinite(np.asarray(sg)))


def test_temporal_seeded_from_clip(tiny_cfg, tiny_params):
    np.testing.assert_allclose(
        np.asarray(tiny_params["temporal"]["frame_position_embeddings"]),
        np.asarray(tiny_params["clip"]["text"]["positional_embedding"]))
    text_tf = tiny_params["clip"]["text"]["transformer"]
    temp_tf = tiny_params["temporal"]["transformer"]
    sub = jax.tree.map(lambda a: a[:tiny_cfg.model.temporal_layers], text_tf)
    for a, b in zip(jax.tree.leaves(sub), jax.tree.leaves(temp_tf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_compute_losses_finite(tiny_cfg, tiny_params, rng):
    batch = make_batch(rng, tiny_cfg)
    cap = tiny_cfg.train.memory_bank_capacity
    bank = mb.create(cap, W, F, tiny_cfg.model.clip.embed_dim)
    bank = fill_bank_step(tiny_params, bank, batch, tiny_cfg, 0)
    bank = fill_bank_step(tiny_params, bank, make_batch(rng, tiny_cfg),
                          tiny_cfg, B)

    total, aux = compute_losses(tiny_params, tiny_cfg, batch, bank,
                                jax.random.PRNGKey(2))
    for k in ("centrality_loss", "uniform_loss", "neighbor_loss", "kl_loss"):
        assert np.isfinite(float(aux[k])), k
    assert np.isfinite(float(total))


def test_train_step_updates_and_bank_fifo(tiny_cfg, tiny_params, rng):
    cap = tiny_cfg.train.memory_bank_capacity
    bank = mb.create(cap, W, F, tiny_cfg.model.clip.embed_dim)
    fill0 = make_batch(rng, tiny_cfg)
    bank = fill_bank_step(tiny_params, bank, fill0, tiny_cfg, 0)
    bank = fill_bank_step(tiny_params, bank, make_batch(rng, tiny_cfg),
                          tiny_cfg, B)

    # private param copy: train_step donates its state, which would consume
    # the module-scoped fixture's buffers
    state = create_train_state(jax.tree.map(jnp.copy, tiny_params), bank)
    batch = make_batch(rng, tiny_cfg)
    old_w = np.asarray(state.params["text_weight_fc"]["fc1"]["w"]).copy()
    old_patch = np.asarray(state.params["clip"]["visual"]["patch_embed"]).copy()

    losses = []
    for i in range(3):
        key = jax.random.PRNGKey(i)
        state, metrics = train_step(state, batch, key, tiny_cfg, t_total=100)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])

    # params moved (except frozen patch embed)
    new_w = np.asarray(state.params["text_weight_fc"]["fc1"]["w"])
    assert np.abs(new_w - old_w).sum() > 0
    np.testing.assert_allclose(
        np.asarray(state.params["clip"]["visual"]["patch_embed"]), old_patch)

    # bank FIFO: the freshest batch sits at the front
    np.testing.assert_array_equal(np.asarray(state.bank.ind[:B]),
                                  np.asarray(batch["idx"]))
    assert int(state.step) == 3

    # logit scale clamped
    assert float(metrics["logit_scale"]) <= 100.0 + 1e-3


def test_loss_decreases_on_repeated_batch(tiny_cfg, tiny_params, rng):
    """Overfit sanity: repeated same batch → total loss should drop."""
    cap = tiny_cfg.train.memory_bank_capacity
    bank = mb.create(cap, W, F, tiny_cfg.model.clip.embed_dim)
    batch = make_batch(rng, tiny_cfg)
    bank = fill_bank_step(tiny_params, bank, batch, tiny_cfg, 0)
    bank = fill_bank_step(tiny_params, bank, batch, tiny_cfg, B)

    # higher lr + immediate warmup exit for the tiny overfit test
    from neighborretr_tpu.core.config import OptimizerConfig
    cfg = Config(model=tiny_cfg.model,
                 loss=tiny_cfg.loss,
                 optim=OptimizerConfig(lr=5e-3, coef_lr=1.0,
                                       warmup_proportion=0.05),
                 train=tiny_cfg.train)
    state = create_train_state(jax.tree.map(jnp.copy, tiny_params), bank)
    losses = []
    for i in range(8):
        state, metrics = train_step(state, batch, jax.random.PRNGKey(7),
                                    cfg, t_total=200)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[1], losses


def test_multi_token_global_configs(rng):
    """64-word/64-frame-style configs merge to MULTIPLE global tokens
    (64→11→3 text, 64→16→6 video); the general global level + centrality
    averaging must produce finite losses.  (The reference itself crashes
    here — see losses/hubness.py::centrality_weights.)"""
    import dataclasses
    from neighborretr_tpu.core.config import Config, LossConfig, TrainConfig
    from neighborretr_tpu.train import memory_bank as mb
    from neighborretr_tpu.train.step import compute_losses, fill_bank_step

    mcfg = dataclasses.replace(
        ModelConfig.tiny(max_words=12, max_frames=6),
        text_merge_ratios=(0.5, 0.5),      # 12→6→3 global text tokens
        video_merge_ratios=(0.5, 0.5))     # 6→3→2 global video tokens
    assert mcfg.text_merge_sizes[1] > 1 and mcfg.video_merge_sizes[1] > 1
    cfg = Config(model=mcfg, loss=LossConfig(num_neighbors=3),
                 train=TrainConfig(batch_size=8, mb_batch=1))

    params = model.init_params(jax.random.PRNGKey(0), mcfg)
    batch = make_batch(rng, cfg, batch=8)
    bank = mb.create(cfg.train.memory_bank_capacity, mcfg.max_words,
                     mcfg.max_frames, mcfg.clip.embed_dim)
    bank = fill_bank_step(params, bank, batch, cfg, 0)

    total, aux = compute_losses(params, cfg, batch, bank,
                                jax.random.PRNGKey(2))
    assert np.isfinite(float(total))
    for k in ("centrality_loss", "uniform_loss", "neighbor_loss", "kl_loss"):
        assert np.isfinite(float(aux[k])), k

    # gradients flow through the general global path (incl. the *_fc1 nets,
    # which are no-ops only in the single-token case)
    g = jax.grad(lambda p: compute_losses(p, cfg, batch, bank,
                                          jax.random.PRNGKey(2))[0])(params)
    fc1_grad = float(sum(jnp.sum(jnp.abs(x))
                         for x in jax.tree.leaves(g["text_weight_fc1"])))
    assert np.isfinite(fc1_grad) and fc1_grad > 0


def test_video_chunk_frames_matches_unchunked(rng):
    """Frame-chunked video encoding (config.video_chunk_frames: sequential
    jax.checkpoint'd chunks) is numerically identical to the one-shot path,
    forward and gradient."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    cfg = ModelConfig.tiny(max_words=8, max_frames=4)
    cfg_chunked = dataclasses.replace(cfg, video_chunk_frames=8)
    params = model.init_params(jax.random.PRNGKey(0), cfg)
    B, F, R = 6, 4, cfg.clip.image_resolution
    video = jnp.asarray(rng.normal(size=(B, F, R, R, 3)).astype(np.float32))
    mask = jnp.ones((B, F), jnp.float32)

    out_plain = model.get_video_feat(params, cfg, video, mask)
    out_chunk = model.get_video_feat(params, cfg_chunked, video, mask)
    np.testing.assert_allclose(np.asarray(out_chunk), np.asarray(out_plain),
                               atol=1e-5)

    def loss(cfg_):
        def f(p):
            return jnp.sum(model.get_video_feat(p, cfg_, video, mask) ** 2)
        return f

    g_plain = jax.grad(loss(cfg))(params)
    g_chunk = jax.grad(loss(cfg_chunked))(params)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_chunk)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-4)


def test_use_pallas_off_honored_at_long_token_shapes(monkeypatch, rng):
    """use_pallas=False routes long-token (T·V ≥ 2k) similarity to the
    chunked XLA path — an explicit "off" must not be overridden by the
    single-chip TPU predicate (review finding, round 2)."""
    from neighborretr_tpu.ops import pallas_similarity_blocked as blocked

    D = 16
    A, B_, T, V = 4, 4, 32, 64          # T*V = 2048 → long-token branch
    t_feat = jnp.asarray(rng.normal(size=(A, T, D)).astype(np.float32))
    v_feat = jnp.asarray(rng.normal(size=(B_, V, D)).astype(np.float32))
    t_mask = jnp.ones((A, T), jnp.float32)
    v_mask = jnp.ones((B_, V), jnp.float32)
    params = {
        "text_weight_fc": {
            "fc1": {"w": jnp.eye(D, dtype=jnp.float32),
                    "b": jnp.zeros((D,), jnp.float32)},
            "fc2": {"w": jnp.asarray(
                rng.normal(size=(D, 1)).astype(np.float32)),
                "b": jnp.zeros((1,), jnp.float32)},
        },
    }
    params["video_weight_fc"] = params["text_weight_fc"]

    calls = []
    real = blocked.pallas_interaction_similarity_blocked

    def spy(*args, **kwargs):
        calls.append(1)
        kwargs["interpret"] = True      # CPU test host
        return real(*args, **kwargs)

    monkeypatch.setattr(blocked, "pallas_interaction_similarity_blocked", spy)

    s_off = model.local_similarity(params, t_feat, v_feat, t_mask, v_mask,
                                   use_pallas=False)
    assert not calls, "use_pallas=False must not reach the blocked kernel"
    s_on = model.local_similarity(params, t_feat, v_feat, t_mask, v_mask,
                                  use_pallas=True)
    assert calls, "use_pallas=True must route to the blocked kernel"
    np.testing.assert_allclose(np.asarray(s_on), np.asarray(s_off),
                               rtol=1e-4, atol=1e-4)


def test_micro_batches_exact_gradients(tiny_cfg, tiny_params, rng):
    """GradCache-equivalent microbatched encoding (train/step.py::
    _microbatched_features): loss AND parameter gradients identical to the
    monolithic encode — contrastive losses cannot use naive grad
    accumulation, so exactness is the whole point."""
    import dataclasses

    batch = make_batch(rng, tiny_cfg)
    bank = mb.create(tiny_cfg.train.memory_bank_capacity, W, F,
                     tiny_cfg.model.clip.embed_dim)
    bank = fill_bank_step(tiny_params, bank, batch, tiny_cfg, 0)
    key = jax.random.PRNGKey(3)

    def run(n):
        cfg = dataclasses.replace(
            tiny_cfg, train=dataclasses.replace(tiny_cfg.train,
                                                micro_batches=n))
        grads, aux = jax.grad(compute_losses, has_aux=True)(
            tiny_params, cfg, batch, bank, key)
        return float(aux["loss"]), grads

    loss1, g1 = run(1)
    for n in (2, 4):
        loss_n, g_n = run(n)
        assert loss_n == pytest.approx(loss1, rel=1e-5), n
        flat1 = jax.tree.leaves(g1)
        flatn = jax.tree.leaves(g_n)
        for a, b in zip(flat1, flatn):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=2e-6)


def test_micro_batches_validation():
    import dataclasses

    from neighborretr_tpu.core.config import validate
    cfg = Config(model=ModelConfig.tiny(max_words=W, max_frames=F),
                 train=TrainConfig(batch_size=8, micro_batches=3))
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, max_words=W, max_frames=F))
    with pytest.raises(ValueError, match="micro_batches"):
        validate(cfg, num_devices=1)


def test_temporal_layers_validation():
    """--num_hidden_layers must fit the text tower it is seeded from
    (modeling.py:199-220 seeds the temporal tower from the first N text
    resblocks).  Enforced at ModelConfig CONSTRUCTION so every entry point
    (train/eval/index/search/serve/export, API users) is covered — an
    oversized depth would otherwise silently truncate in the seeding
    slice, running a different model than requested."""
    import dataclasses

    base = ModelConfig.tiny(max_words=W, max_frames=F)
    # tiny text tower has 2 layers: 2 is fine, 3 and 0 are not
    assert base.temporal_layers == 2
    for bad in (0, base.clip.transformer_layers + 1):
        with pytest.raises(ValueError, match="temporal_layers"):
            dataclasses.replace(base, temporal_layers=bad)
    # the tiny factory clamps a user-passed depth to its 2-layer text tower
    assert ModelConfig.tiny(max_words=W, max_frames=F,
                            temporal_layers=4).temporal_layers == 2
    assert ModelConfig.tiny(max_words=W, max_frames=F,
                            temporal_layers=1).temporal_layers == 1


def test_video_chunk_frames_pads_non_divisible(rng):
    """A chunk that doesn't divide B*F pads the frame axis UP (pad rows
    dropped) — rounding DOWN to a divisor could serialize into B*F
    single-frame calls when B*F is prime."""
    import dataclasses

    cfg = ModelConfig.tiny(max_words=8, max_frames=2)
    cfg_chunked = dataclasses.replace(cfg, video_chunk_frames=4)
    params = model.init_params(jax.random.PRNGKey(0), cfg)
    B, F, R = 7, 2, cfg.clip.image_resolution   # B*F = 14, pads to 16
    video = jnp.asarray(rng.normal(size=(B, F, R, R, 3)).astype(np.float32))
    mask = jnp.ones((B, F), jnp.float32)

    out_plain = model.get_video_feat(params, cfg, video, mask)
    out_chunk = model.get_video_feat(params, cfg_chunked, video, mask)
    np.testing.assert_allclose(np.asarray(out_chunk), np.asarray(out_plain),
                               atol=1e-5)
