"""BertAdam golden-trace tests vs hand-computed updates
(reference math: optimization.py:142-210 + trainer.py:104)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from neighborretr_tpu.core.config import OptimizerConfig
from neighborretr_tpu.train import bertadam as BA


def _np_schedule(x, warmup):
    return x / warmup if x < warmup else 0.5 * (1 + np.cos(np.pi * x))


def _oracle_step(p, g, m, v, step, cfg, t_total, lr_scale=1.0, decay=True,
                 global_coef=1.0):
    """One reference BertAdam step on a single tensor."""
    g = g * global_coef
    pn = np.sqrt((g ** 2).sum())
    g = g * min(cfg.max_grad_norm / (pn + 1e-6), 1.0)
    m = cfg.b1 * m + (1 - cfg.b1) * g
    v = cfg.b2 * v + (1 - cfg.b2) * g * g
    upd = m / (np.sqrt(v) + cfg.eps)
    if decay:
        upd = upd + cfg.weight_decay * p
    lr = cfg.lr * lr_scale * _np_schedule(step / t_total, cfg.warmup_proportion)
    return p - lr * upd, m, v


def test_first_step_zero_lr():
    """Reference quirk: schedule evaluated at completed-steps=0 → lr 0, but
    moments update."""
    cfg = OptimizerConfig()
    params = {"x": {"w": jnp.ones((3,))}}
    grads = {"x": {"w": jnp.full((3,), 0.1)}}
    state = BA.bert_adam_init(params)
    new_p, new_s = BA.bert_adam_update(grads, state, params, cfg, t_total=100)
    np.testing.assert_allclose(new_p["x"]["w"], params["x"]["w"])
    assert float(jnp.abs(new_s.m["x"]["w"]).sum()) > 0
    assert int(new_s.step) == 1


def test_trace_matches_oracle(rng):
    cfg = OptimizerConfig(lr=0.01, warmup_proportion=0.1, weight_decay=0.1)
    t_total = 20
    w0 = rng.normal(size=(4,)).astype(np.float32)
    params = {"w": jnp.array(w0)}
    state = BA.bert_adam_init(params)

    p_np, m_np, v_np = w0.copy(), np.zeros(4, np.float32), np.zeros(4, np.float32)
    for step in range(5):
        g = rng.normal(size=(4,)).astype(np.float32)
        new_p, state = BA.bert_adam_update({"w": jnp.array(g)}, state, params,
                                           cfg, t_total)
        params = new_p
        # single tensor → global clip == per-param clip applied twice
        gn = np.sqrt((g ** 2).sum())
        g1 = g * min(cfg.max_grad_norm / (gn + 1e-6), 1.0)
        p_np, m_np, v_np = _oracle_step(p_np, g1, m_np, v_np, step, cfg, t_total)
        np.testing.assert_allclose(np.asarray(params["w"]), p_np, rtol=2e-5,
                                   atol=1e-7)


def test_no_decay_and_clip_branch_lr(rng):
    cfg = OptimizerConfig(lr=0.01, coef_lr=0.1, weight_decay=0.5,
                          warmup_proportion=0.1)
    t_total = 10
    params = {
        "clip": {"text": {"ln_final": {"scale": jnp.ones((2,)),
                                       "bias": jnp.zeros((2,))},
                          "proj": {"w": jnp.ones((2,))}}},
        "head": {"w": jnp.ones((2,)), "b": jnp.zeros((2,))},
    }
    grads = jax.tree.map(lambda p: jnp.full_like(p, 0.01), params)
    state = BA.bert_adam_init(params)
    # run two steps so the second has nonzero lr
    p1, state = BA.bert_adam_update(grads, state, params, cfg, t_total)
    p2, state = BA.bert_adam_update(grads, state, p1, cfg, t_total)

    # LN params: no decay → only Adam term; head w: decay; clip params move
    # 10× slower than non-clip (coef_lr)
    dw_clip = float(jnp.abs(p2["clip"]["text"]["proj"]["w"] - 1.0).sum())
    dw_head = float(jnp.abs(p2["head"]["w"] - 1.0).sum())
    assert dw_clip < dw_head
    # bias of head: no decay
    db_head = float(jnp.abs(p2["head"]["b"]).sum())
    assert db_head < dw_head


def test_frozen_patch_embed_never_moves(rng):
    cfg = OptimizerConfig()
    params = {"clip": {"visual": {"patch_embed": jnp.ones((4,)),
                                  "proj": jnp.ones((4,))}}}
    grads = jax.tree.map(lambda p: jnp.full_like(p, 1.0), params)
    state = BA.bert_adam_init(params)
    for _ in range(3):
        params, state = BA.bert_adam_update(grads, state, params, cfg, 10)
    np.testing.assert_allclose(np.asarray(params["clip"]["visual"]["patch_embed"]),
                               np.ones(4))
    assert float(jnp.abs(params["clip"]["visual"]["proj"] - 1.0).sum()) > 0


def test_schedule_shapes():
    w = 0.1
    xs = np.linspace(0, 1, 101)
    cos_vals = [float(BA.warmup_cosine(jnp.asarray(x), w)) for x in xs]
    np.testing.assert_allclose(cos_vals[0], 0.0)
    assert abs(cos_vals[10] - 1.0) < 0.06          # peak after warmup
    np.testing.assert_allclose(cos_vals[100], 0.0, atol=1e-6)
    lin = [float(BA.warmup_linear(jnp.asarray(x), w)) for x in xs]
    np.testing.assert_allclose(lin[100], 0.0, atol=1e-6)


def test_bf16_moments_storage_and_accuracy(rng):
    """moments_dtype='bfloat16': state stored in bf16, update math in fp32 —
    trajectory stays close to the fp32-state run."""
    cfg32 = OptimizerConfig(lr=0.01, warmup_proportion=0.1, weight_decay=0.1)
    cfg16 = dataclasses.replace(cfg32, moments_dtype="bfloat16")
    w0 = rng.normal(size=(16,)).astype(np.float32)
    p32 = {"w": jnp.array(w0)}
    p16 = {"w": jnp.array(w0)}
    s32 = BA.bert_adam_init(p32)
    s16 = BA.bert_adam_init(p16, moments_dtype="bfloat16")
    assert s16.m["w"].dtype == jnp.bfloat16 and s16.v["w"].dtype == jnp.bfloat16

    for step in range(8):
        g = {"w": jnp.array(rng.normal(size=(16,)).astype(np.float32))}
        p32, s32 = BA.bert_adam_update(g, s32, p32, cfg32, 20)
        p16, s16 = BA.bert_adam_update(g, s16, p16, cfg16, 20)
        assert s16.m["w"].dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(p16["w"]), np.asarray(p32["w"]),
                               rtol=0.02, atol=2e-4)


def test_bf16_moments_checkpoint_roundtrip(tmp_path, rng):
    """bf16 moments survive the npz save/load (stored as fp32 exactly,
    cast back to bf16 on load)."""
    from neighborretr_tpu.core import checkpoint as ckpt
    from neighborretr_tpu.train.memory_bank import MemoryBank
    from neighborretr_tpu.train.step import TrainState

    params = {"w": jnp.array(rng.normal(size=(4,)).astype(np.float32))}
    opt = BA.bert_adam_init(params, moments_dtype="bfloat16")
    opt = BA.BertAdamState(
        step=opt.step,
        m={"w": jnp.array([0.5, -1.25, 3.0, 0.0078125], jnp.bfloat16)},
        v={"w": jnp.array([1.0, 2.0, 0.125, 4.0], jnp.bfloat16)})
    bank = MemoryBank(ind=jnp.zeros((2,), jnp.int32),
                      feat_t=jnp.zeros((2, 3, 4)), feat_v=jnp.zeros((2, 2, 4)),
                      mask_t=jnp.ones((2, 3)), mask_v=jnp.ones((2, 2)))
    state = TrainState(params=params, opt=opt, bank=bank,
                       step=jnp.zeros((), jnp.int32))
    path = str(tmp_path / "state.npz")
    ckpt.save_train_state(path, state)
    loaded = ckpt.load_train_state(path, state)
    assert np.asarray(loaded.opt.m["w"]).dtype.name == "bfloat16"
    np.testing.assert_array_equal(
        np.asarray(loaded.opt.m["w"]).astype(np.float32),
        np.asarray(opt.m["w"]).astype(np.float32))


def test_max_grad_norm_nonpositive_disables_both_clip_stages():
    """max_grad_norm <= 0 means 'clipping off' (the stage-2 guard's
    convention, mirroring optimization.py:181) — an unguarded stage 1 used
    to compute coef = min(0/norm, 1) = 0 and silently zero every gradient."""
    params = {"w": jnp.asarray([[10.0, -20.0]]), "b": jnp.asarray([5.0])}
    grads = {"w": jnp.asarray([[300.0, 400.0]]), "b": jnp.asarray([1200.0])}
    base = OptimizerConfig(lr=1e-2, coef_lr=1.0, weight_decay=0.0,
                           warmup_proportion=0.1, schedule="warmup_constant")

    def step_delta(cfg):
        state = BA.bert_adam_init(params)
        state = BA.BertAdamState(step=jnp.asarray(10, jnp.int32),
                                 m=state.m, v=state.v)
        new_p, _ = BA.bert_adam_update(grads, state, params, cfg, t_total=20)
        return jax.tree.map(lambda a, b: np.asarray(b - a), params, new_p)

    clipped = step_delta(dataclasses.replace(base, max_grad_norm=1.0))
    unclipped = step_delta(dataclasses.replace(base, max_grad_norm=0.0))
    for k in params:
        # params must MOVE with clipping off (the bug zeroed the update)
        assert np.abs(unclipped[k]).min() > 0
        # and the huge unclipped gradients drive a step at least as large
        assert np.all(np.abs(unclipped[k]) >= np.abs(clipped[k]) - 1e-12)


def test_host_moments_rejected_on_cpu_backend():
    """The CPU backend can't round-trip pinned_host buffers through donated
    steps (jaxlib aborts on the memory-kind mismatch at the second call) —
    place_moments must refuse with a clear error instead.  The numerics
    identity + placement itself run on the real chip
    (scripts/host_moments_check.py, recorded in PARITY)."""
    import pytest
    if BA.host_offload_supported():
        pytest.skip("accelerator backend: host offload is supported here")
    params = {"x": {"w": jnp.ones((3,))}}
    with pytest.raises(ValueError, match="TPU/GPU"):
        BA.place_moments(BA.bert_adam_init(params), "host")


def test_host_moments_placement_trajectory_identical(rng):
    """moments_placement='host' streams m/v through pinned host memory but
    must not change a single bit of the update math — multi-step trajectory
    pinned equal to the device-resident run.  Skipped on the CPU suite
    (backend can't host-offload); scripts/host_moments_check.py runs this
    same check on the real chip (PARITY records the result)."""
    import pytest
    if not BA.host_offload_supported():
        pytest.skip("CPU backend cannot host-offload (see "
                    "test_host_moments_rejected_on_cpu_backend)")
    cfg_dev = OptimizerConfig()
    cfg_host = dataclasses.replace(cfg_dev, moments_placement="host")
    params = {"clip": {"w": jnp.asarray(rng.normal(size=(4, 4)), jnp.float32)},
              "head": {"b": jnp.asarray(rng.normal(size=(4,)), jnp.float32)}}
    s_dev = BA.bert_adam_init(params)
    s_host = BA.place_moments(BA.bert_adam_init(params), "host")
    p_dev, p_host = params, params
    for i in range(3):
        grads = jax.tree.map(
            lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32),
            params)
        p_dev, s_dev = BA.bert_adam_update(grads, s_dev, p_dev, cfg_dev, 10)
        p_host, s_host = BA.bert_adam_update(grads, s_host, p_host, cfg_host,
                                             10)
    for a, b in zip(jax.tree.leaves(p_dev), jax.tree.leaves(p_host)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(s_dev.m), jax.tree.leaves(s_host.m)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_host_moments_in_jitted_train_step():
    """The full donated train_step runs with host placement and matches the
    device-placement loss/params (integration over train/step.py's threading
    of mesh + cfg.optim).  Accelerator-only, like the trajectory test."""
    import pytest
    if not BA.host_offload_supported():
        pytest.skip("CPU backend cannot host-offload")
    from neighborretr_tpu.core.config import (Config, DataConfig, LossConfig,
                                              ModelConfig, TrainConfig)
    from neighborretr_tpu.data.datasets.synthetic import SyntheticDataset
    from neighborretr_tpu.models import neighborretr as model
    from neighborretr_tpu.train import memory_bank as mb
    from neighborretr_tpu.train.step import create_train_state, train_step

    def cfg_with(placement):
        return Config(
            model=ModelConfig.tiny(max_words=8, max_frames=4),
            loss=LossConfig(num_neighbors=3),
            optim=OptimizerConfig(moments_placement=placement),
            data=DataConfig(max_words=8, max_frames=4),
            train=TrainConfig(epochs=1, batch_size=8, mb_batch=1, seed=0))

    ds = SyntheticDataset(n=8, max_words=8, max_frames=4, resolution=32,
                          vocab_size=512, seed=3)
    items = [ds.item(i) for i in range(8)]
    batch = {k: jnp.asarray(np.stack([it[k] for it in items]))
             for k in items[0]}
    key = jax.random.PRNGKey(0)

    losses = {}
    steps = {}
    for placement in ("device", "host"):
        cfg = cfg_with(placement)
        params = model.init_params(jax.random.PRNGKey(1), cfg.model)
        bank = mb.create(cfg.train.memory_bank_capacity, 8, 4,
                         cfg.model.clip.embed_dim)
        state = create_train_state(params, bank, moments_placement=placement)
        state, metrics = train_step(state, batch, key, cfg, 10)
        state, metrics = train_step(state, batch, key, cfg, 10)
        losses[placement] = float(metrics["loss"])
        steps[placement] = int(state.step)
    assert steps == {"device": 2, "host": 2}
    assert np.isfinite(losses["device"])
    assert losses["device"] == losses["host"]


def test_validate_rejects_host_moments_with_fsdp():
    import pytest

    from neighborretr_tpu.core.config import (Config, DataConfig, LossConfig,
                                              ModelConfig, TrainConfig,
                                              validate)
    cfg = Config(
        model=ModelConfig.tiny(max_words=8, max_frames=4),
        loss=LossConfig(num_neighbors=3),
        optim=OptimizerConfig(moments_placement="host"),
        data=DataConfig(max_words=8, max_frames=4),
        train=TrainConfig(batch_size=8, fsdp=True))
    with pytest.raises(ValueError):
        validate(cfg, 1)
    cfg = dataclasses.replace(cfg, train=TrainConfig(batch_size=8))
    validate(cfg, 1)


def test_validate_rejects_bad_bank_placement():
    import pytest

    from neighborretr_tpu.core.config import (Config, DataConfig, LossConfig,
                                              ModelConfig, TrainConfig,
                                              validate)
    cfg = Config(
        model=ModelConfig.tiny(max_words=8, max_frames=4),
        loss=LossConfig(num_neighbors=3),
        optim=OptimizerConfig(),
        data=DataConfig(max_words=8, max_frames=4),
        train=TrainConfig(batch_size=8, bank_placement="hbm2"))
    with pytest.raises(ValueError):
        validate(cfg, 1)
    validate(dataclasses.replace(
        cfg, train=TrainConfig(batch_size=8, bank_placement="host")), 1)

    # the CPU backend refuses the actual placement with a clear error
    from neighborretr_tpu.train import bertadam as BA2
    from neighborretr_tpu.train import memory_bank as mb
    bank = mb.create(4, 8, 4, 16)
    if BA2.host_offload_supported():
        out = mb.place_bank(bank, "host")
        assert out.feat_t.shape == bank.feat_t.shape
    else:
        with pytest.raises(ValueError, match="TPU/GPU"):
            mb.place_bank(bank, "host")
    # 'device' placement is a no-op everywhere
    assert mb.place_bank(bank, "device") is bank
