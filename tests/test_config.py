"""Config serialization/validation + logging-utility regressions."""

import dataclasses

import pytest

from neighborretr_tpu.core.config import (Config, DataConfig, ModelConfig,
                                          TrainConfig, validate)


def test_json_round_trip_is_identity_and_hashable():
    """from_json(to_json(cfg)) == cfg, including tuple-typed fields in every
    section (profile_steps) — Config is a jit static argument, so a list
    surviving the round trip would make it unhashable and kill the first
    train_step of a reloaded run."""
    cfg = Config(model=ModelConfig.tiny(max_words=8, max_frames=4),
                 train=TrainConfig(profile_steps=(10, 15), batch_size=16))
    back = Config.from_json(cfg.to_json())
    assert back == cfg
    assert isinstance(back.train.profile_steps, tuple)
    hash(back)                      # static-arg requirement


def test_validate_rejects_negative_pipeline_microbatches():
    cfg = Config(model=ModelConfig.tiny(max_words=8, max_frames=4),
                 data=DataConfig(max_words=8, max_frames=4),
                 train=TrainConfig(batch_size=128, pipeline_parallel=4,
                                   pipeline_microbatches=-8))
    with pytest.raises(ValueError, match="pipeline_microbatches"):
        validate(cfg, num_devices=2)


def test_data_config_has_no_shadow_resolution():
    """Frames decode at model.clip.image_resolution — DataConfig must not
    carry a second, silently-ignored copy."""
    assert "image_resolution" not in {
        f.name for f in dataclasses.fields(DataConfig)}


def test_smoothed_median_matches_torch_lower_middle():
    """Even-window median = the LOWER of the two central elements
    (torch.median semantics; reference metric_logger.py:34-37)."""
    torch = pytest.importorskip("torch")
    from neighborretr_tpu.utils.logging import SmoothedValue
    v = SmoothedValue(window_size=4)
    for x in (4.0, 1.0, 2.0, 3.0):
        v.update(x)
    assert v.median == float(torch.median(torch.tensor([4.0, 1.0, 2.0, 3.0])))


def test_jsonl_writer_creates_directory(tmp_path):
    from neighborretr_tpu.utils.logging import JsonlMetricsWriter
    out = tmp_path / "fresh" / "run"        # does not exist yet
    w = JsonlMetricsWriter(str(out))
    w.write(kind="train", loss=1.0)
    assert (out / "metrics.jsonl").exists()


def test_tiny_not_implied_by_explicit_random_clip():
    """--clip_checkpoint random is an explicit full-size request: the
    synthetic-data tiny inference must apply only when the flag was fully
    omitted (cli/common.resolve_clip_checkpoint + tiny_requested)."""
    import sys
    from types import SimpleNamespace
    sys.path.insert(0, ".")
    from cli.common import resolve_clip_checkpoint, tiny_requested

    def args(**kw):
        base = dict(tiny=False, datatype="synthetic", clip_checkpoint=None,
                    base_encoder="ViT-B/32", max_words=8, max_frames=4)
        base.update(kw)
        return SimpleNamespace(**base)

    a = args(clip_checkpoint="random")
    resolve_clip_checkpoint(a, weights_already_supplied=False)
    assert a.clip_checkpoint is None
    assert not tiny_requested(a)              # full model, random init

    b = args()                                # flag omitted entirely
    resolve_clip_checkpoint(b, weights_already_supplied=False)
    assert tiny_requested(b)                  # smoke run → tiny implied

    c = args(tiny=True, clip_checkpoint="random")
    resolve_clip_checkpoint(c, weights_already_supplied=False)
    assert tiny_requested(c)                  # explicit --tiny always wins


def test_backbone_menu_resolves_all_names():
    """Every advertised --base_encoder name constructs a consistent config,
    and each has a published-checkpoint zoo entry (models/fetch.py)."""
    from neighborretr_tpu.core.config import ClipConfig
    from neighborretr_tpu.models.fetch import CLIP_CHECKPOINT_URLS

    for name in ClipConfig.backbone_names():
        cfg = ClipConfig.from_name(name)
        assert cfg.image_resolution % cfg.vision_patch_size == 0, name
        assert cfg.vision_width % 64 == 0 and cfg.transformer_width % 64 == 0
        assert name in CLIP_CHECKPOINT_URLS, name

    c336 = ClipConfig.from_name("ViT-L/14@336px")
    assert c336.grid_size == 24 and c336.image_resolution == 336
    assert c336.embed_dim == ClipConfig.vit_l_14().embed_dim

    import pytest
    with pytest.raises(ValueError, match="unknown base encoder"):
        ClipConfig.from_name("RN50")
