"""run_training integration: epoch loop, mid-epoch eval, checkpoints, resume.

Covers train/loop.py end to end on a tiny model + synthetic data (CPU),
including the async device-prefetch path the loop feeds batches through.
"""

import os

import numpy as np
import pytest

from neighborretr_tpu.core.config import (Config, DataConfig, LossConfig,
                                          ModelConfig, OptimizerConfig,
                                          TrainConfig)
from neighborretr_tpu.data.datasets.synthetic import SyntheticDataset
from neighborretr_tpu.train.loop import run_training

W, F, RES = 8, 4, 32
N = 16


def _cfg(output_dir: str, resume: str = None) -> Config:
    return Config(
        model=ModelConfig.tiny(max_words=W, max_frames=F),
        loss=LossConfig(num_neighbors=3),
        optim=OptimizerConfig(),
        data=DataConfig(max_words=W, max_frames=F, workers=2),
        train=TrainConfig(epochs=1, batch_size=8, batch_size_val=8,
                          mb_batch=1, n_display=1, output_dir=output_dir,
                          resume_checkpoint=resume, mid_epoch_eval=True,
                          seed=0),
    )


@pytest.fixture(scope="module")
def datasets():
    train = SyntheticDataset(n=N, max_words=W, max_frames=F, resolution=RES,
                             vocab_size=512)
    test = SyntheticDataset(n=N, max_words=W, max_frames=F, resolution=RES,
                            vocab_size=512, seed=1)
    return train, test


def test_run_training_end_to_end(tmp_path, datasets):
    train_ds, test_ds = datasets
    out = str(tmp_path / "run")
    os.makedirs(out, exist_ok=True)
    state, tracker = run_training(_cfg(out), train_ds, test_ds)

    assert int(state.step) == 2                      # 16 items / batch 8
    assert np.isfinite(tracker.best_mean_r1)
    assert os.path.exists(os.path.join(out, "best.npz"))
    assert os.path.exists(os.path.join(out, "state_epoch0.npz"))

    # machine-readable metrics log: valid JSON lines of both kinds
    import json
    with open(os.path.join(out, "metrics.jsonl")) as f:
        rows = [json.loads(ln) for ln in f]
    kinds = {r["kind"] for r in rows}
    assert kinds == {"train", "eval"}, kinds
    train_rows = [r for r in rows if r["kind"] == "train"]
    assert all(np.isfinite(r["loss"]) for r in train_rows)
    # loader-starvation meter (the reference's data-time meter analogue)
    assert all(r["data_wait_s"] >= 0 for r in train_rows)
    eval_rows = [r for r in rows if r["kind"] == "eval"]
    assert all("R1" in r["t2v"] and "R1" in r["v2t"] for r in eval_rows)

    # mid-run resume: a fresh run pointed at the saved TrainState continues
    # from the recorded step instead of re-training epoch 0
    resumed, _ = run_training(
        _cfg(out, resume=os.path.join(out, "state_epoch0.npz")),
        train_ds, test_ds)
    assert int(resumed.step) == 2                    # epoch already complete


def test_preemption_sigterm_saves_resumable_state(tmp_path, datasets,
                                                  monkeypatch):
    """SIGTERM mid-epoch (TPU preemption) → clean exit with a resumable
    state_preempt.npz; resuming completes the run (train/loop.py::
    PreemptionGuard)."""
    import signal

    from neighborretr_tpu.train import loop as loop_mod

    train_ds, test_ds = datasets
    real_step = loop_mod.train_step
    calls = {"n": 0}

    def stepper(*a, **k):
        out = real_step(*a, **k)
        calls["n"] += 1
        if calls["n"] == 1:        # deliver the signal right after step 1
            signal.raise_signal(signal.SIGTERM)
        return out

    monkeypatch.setattr(loop_mod, "train_step", stepper)
    out = str(tmp_path / "preempt")
    os.makedirs(out, exist_ok=True)
    state, _ = run_training(_cfg(out), train_ds, test_ds)
    assert int(state.step) == 1                      # stopped after step 1
    ppath = os.path.join(out, "state_preempt.npz")
    assert os.path.exists(ppath)
    # the guard restored the previous SIGTERM disposition
    assert signal.getsignal(signal.SIGTERM) is signal.SIG_DFL

    # EXACT mid-epoch resume: the interrupted epoch continues from batch 1
    # (the seeded plan is fast-forwarded, the checkpointed bank is kept) —
    # 1 consumed + 1 remaining = 2 total steps, as if never interrupted
    monkeypatch.setattr(loop_mod, "train_step", real_step)
    resumed, _ = run_training(_cfg(out, resume=ppath), train_ds, test_ds)
    assert int(resumed.step) == 2


@pytest.mark.smoke
def test_mid_epoch_resume_is_exact(tmp_path, datasets, monkeypatch):
    """A preempted-and-resumed run produces the SAME trajectory as an
    uninterrupted one: same remaining batches (fast-forwarded seeded plan),
    same step RNG keys (folded from global_step), same bank (kept from the
    checkpoint), same schedule position (state.step)."""
    import json
    import signal

    import jax

    from neighborretr_tpu.train import loop as loop_mod

    train_ds, test_ds = datasets

    def losses(out):
        with open(os.path.join(out, "metrics.jsonl")) as f:
            rows = [json.loads(ln) for ln in f]
        return {r["step"]: r["loss"] for r in rows if r["kind"] == "train"}

    # uninterrupted reference run (2 steps)
    ref_out = str(tmp_path / "ref")
    os.makedirs(ref_out, exist_ok=True)
    ref_state, _ = run_training(_cfg(ref_out), train_ds, test_ds)
    assert int(ref_state.step) == 2

    # interrupted at step 1, then resumed
    real_step = loop_mod.train_step
    calls = {"n": 0}

    def stepper(*a, **k):
        out = real_step(*a, **k)
        calls["n"] += 1
        if calls["n"] == 1:
            signal.raise_signal(signal.SIGTERM)
        return out

    monkeypatch.setattr(loop_mod, "train_step", stepper)
    out = str(tmp_path / "interrupted")
    os.makedirs(out, exist_ok=True)
    run_training(_cfg(out), train_ds, test_ds)
    monkeypatch.setattr(loop_mod, "train_step", real_step)
    resumed, _ = run_training(
        _cfg(out, resume=os.path.join(out, "state_preempt.npz")),
        train_ds, test_ds)
    assert int(resumed.step) == 2

    # identical post-resume loss (the interrupted run exits before logging
    # step 1 — the guard check precedes the metrics write — so its jsonl
    # holds only the resumed step-2 row) and identical final parameters
    ref_l, got_l = losses(ref_out), losses(out)
    assert set(ref_l) == {1, 2} and 2 in got_l
    np.testing.assert_allclose(got_l[2], ref_l[2], rtol=0, atol=1e-6)
    for a, b in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(resumed.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)


def test_epoch_boundary_preempt_resume_is_exact(tmp_path, datasets,
                                                monkeypatch):
    """SIGTERM right after an epoch's FINAL step (before the epoch-end bank
    clear): the resumed run must still match the uninterrupted one.  Uses
    mb_batch > len(bank_loader) so the bank fill covers less than capacity —
    a stale (uncleared) tail from the checkpoint would diverge epoch 1."""
    import dataclasses
    import json
    import signal

    import jax

    from neighborretr_tpu.train import loop as loop_mod

    train_ds, test_ds = datasets

    def cfg2(out, resume=None):
        c = _cfg(out, resume)
        return dataclasses.replace(
            c, train=dataclasses.replace(c.train, epochs=2, mb_batch=3))

    ref_out = str(tmp_path / "ref")
    os.makedirs(ref_out, exist_ok=True)
    ref_state, _ = run_training(cfg2(ref_out), train_ds, test_ds)
    assert int(ref_state.step) == 4                  # 2 epochs x 2 steps

    real_step = loop_mod.train_step
    calls = {"n": 0}

    def stepper(*a, **k):
        out = real_step(*a, **k)
        calls["n"] += 1
        if calls["n"] == 2:        # epoch 0's final step
            signal.raise_signal(signal.SIGTERM)
        return out

    monkeypatch.setattr(loop_mod, "train_step", stepper)
    out = str(tmp_path / "boundary")
    os.makedirs(out, exist_ok=True)
    state, _ = run_training(cfg2(out), train_ds, test_ds)
    assert int(state.step) == 2
    monkeypatch.setattr(loop_mod, "train_step", real_step)
    resumed, _ = run_training(
        cfg2(out, resume=os.path.join(out, "state_preempt.npz")),
        train_ds, test_ds)
    assert int(resumed.step) == 4

    with open(os.path.join(out, "metrics.jsonl")) as f:
        got = {r["step"]: r["loss"] for r in map(json.loads, f)
               if r["kind"] == "train"}
    with open(os.path.join(ref_out, "metrics.jsonl")) as f:
        ref = {r["step"]: r["loss"] for r in map(json.loads, f)
               if r["kind"] == "train"}
    for s in (3, 4):               # epoch 1 ran on identical state
        np.testing.assert_allclose(got[s], ref[s], rtol=0, atol=1e-6)
    for a, b in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(resumed.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)


@pytest.mark.slow
def test_mid_epoch_resume_exact_under_fsdp(tmp_path, datasets, monkeypatch):
    """Exact resume composes with parameter sharding: FSDP run preempted
    mid-epoch, resumed (placement re-applied from the host checkpoint),
    final params equal the uninterrupted FSDP run's."""
    import dataclasses
    import signal

    import jax

    from neighborretr_tpu.parallel import mesh as pmesh
    from neighborretr_tpu.train import loop as loop_mod

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    train_ds, test_ds = datasets

    def cfg_fsdp(out, resume=None):
        c = _cfg(out, resume)
        return dataclasses.replace(
            c, train=dataclasses.replace(c.train, fsdp=True))

    mesh = pmesh.make_mesh()
    ref_out = str(tmp_path / "ref")
    os.makedirs(ref_out, exist_ok=True)
    ref_state, _ = run_training(cfg_fsdp(ref_out), train_ds, test_ds,
                                mesh=mesh)
    assert int(ref_state.step) == 2

    real_step = loop_mod.train_step
    calls = {"n": 0}

    def stepper(*a, **k):
        out = real_step(*a, **k)
        calls["n"] += 1
        if calls["n"] == 1:
            signal.raise_signal(signal.SIGTERM)
        return out

    monkeypatch.setattr(loop_mod, "train_step", stepper)
    out = str(tmp_path / "interrupted")
    os.makedirs(out, exist_ok=True)
    run_training(cfg_fsdp(out), train_ds, test_ds, mesh=mesh)
    monkeypatch.setattr(loop_mod, "train_step", real_step)
    resumed, _ = run_training(
        cfg_fsdp(out, resume=os.path.join(out, "state_preempt.npz")),
        train_ds, test_ds, mesh=mesh)
    assert int(resumed.step) == 2
    for a, b in zip(jax.tree.leaves(pmesh.fetch_to_host(ref_state).params),
                    jax.tree.leaves(pmesh.fetch_to_host(resumed).params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)


def test_bfloat16_bank_trains_close_to_fp32(tmp_path):
    """--bank_dtype bfloat16: the bank is no_grad state re-filled every step
    (modeling.py:222-249), so bf16 storage must train finitely and land
    within bf16 rounding of the fp32-bank loss, with the dtype preserved
    through fill, FIFO, and the donated step."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from neighborretr_tpu.data.datasets.synthetic import make_synthetic_batch
    from neighborretr_tpu.models import neighborretr as model
    from neighborretr_tpu.train import memory_bank as mb
    from neighborretr_tpu.train.step import (create_train_state,
                                             fill_bank_step, train_step)

    cfg = Config(model=ModelConfig.tiny(max_words=8, max_frames=4),
                 loss=LossConfig(num_neighbors=3),
                 train=TrainConfig(batch_size=8, mb_batch=1))
    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(cfg.model, 8, 0,
                                  variable_lengths=True).items()}

    losses = {}
    for dtype in ("float32", "bfloat16"):
        # fresh params per run: train_step donates its state (the first
        # run's buffers are deleted)
        params = model.init_params(jax.random.PRNGKey(0), cfg.model)
        c = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, bank_dtype=dtype))
        bank = mb.create(c.train.memory_bank_capacity, 8, 4,
                         c.model.clip.embed_dim, feat_dtype=dtype)
        assert str(bank.feat_t.dtype) == dtype
        bank = fill_bank_step(params, bank, batch, c, 0)
        assert str(bank.feat_t.dtype) == dtype      # fill casts to storage
        state, metrics = train_step(create_train_state(params, bank), batch,
                                    jax.random.PRNGKey(1), c, 10)
        assert str(state.bank.feat_t.dtype) == dtype  # FIFO preserves it
        losses[dtype] = float(metrics["loss"])
        assert np.isfinite(losses[dtype])
    # bf16 feature rounding perturbs the bank-similarity losses only mildly
    np.testing.assert_allclose(losses["bfloat16"], losses["float32"],
                               rtol=2e-2)
