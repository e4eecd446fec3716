"""Native (C++) augmentation kernels: byte-exact parity vs the PIL path.

The native backend (neighborretr_tpu/data/native) re-implements every
RandAugment op as a single-pass C++ kernel over whole uint8 clips; this suite
asserts BYTE EXACTNESS against the PIL/numpy implementations in
data/augment.py (probed Pillow semantics: L-conversion rounding, float32
blend truncation, SMOOTH filter +0.5 floor with copied borders, double-
precision two-stage bilinear lerp in the affine path), plus policy-level
equivalence and cache-buffer safety.

Reference counterpart: dataloaders/rand_augment.py via the redesigned
data/augment.py (bit-parity with timm itself is not a spec requirement,
SURVEY §7 — parity HERE is between our two backends).
"""

import numpy as np
import pytest

from neighborretr_tpu.data import augment as A
from neighborretr_tpu.data import native

if not native.available():  # pragma: no cover - environment without g++
    pytest.skip(f"native backend unavailable: {native.load_error()}",
                allow_module_level=True)


def _clips():
    rng = np.random.default_rng(0)
    clips = [rng.integers(0, 256, (3, 64, 80, 3), dtype=np.uint8),
             rng.integers(0, 256, (2, 224, 224, 3), dtype=np.uint8)]
    # low-entropy clip: flat regions stress the histogram ops' step==0 /
    # single-bin paths and saturating blends
    flat = np.full((2, 96, 96, 3), 7, np.uint8)
    flat[:, 20:60, 30:90] = 200
    clips.append(flat)
    # extreme values
    clips.append(np.zeros((1, 33, 47, 3), np.uint8))
    clips.append(np.full((1, 33, 47, 3), 255, np.uint8))
    return clips


def _pil_apply(fn, clip, *args):
    out = np.empty_like(clip)
    for i in range(clip.shape[0]):
        out[i] = fn(clip[i], *args)
    return out


CASES = [
    ("AutoContrast", A._auto_contrast, native.auto_contrast, ()),
    ("Equalize", A._equalize, native.equalize, ()),
    ("Invert", A._invert, native.invert, ()),
    ("Posterize1", A._posterize, native.posterize, (1,)),
    ("Posterize4", A._posterize, native.posterize, (4,)),
    ("Solarize", A._solarize, native.solarize, (77,)),
    ("Solarize0", A._solarize, native.solarize, (0,)),
    ("SolarizeAdd", A._solarize_add, native.solarize_add, (110,)),
    ("Color+", A._color, native.color, (1.9,)),
    ("Color-", A._color, native.color, (0.1,)),
    ("Contrast+", A._contrast, native.contrast, (1.63,)),
    ("Contrast-", A._contrast, native.contrast, (0.37,)),
    ("Brightness+", A._brightness, native.brightness, (1.63,)),
    ("Brightness-", A._brightness, native.brightness, (0.37,)),
    ("Sharpness+", A._sharpness, native.sharpness, (1.9,)),
    ("Sharpness-", A._sharpness, native.sharpness, (0.1,)),
    ("ShearX", A._shear_x, native.shear_x, (0.3,)),
    ("ShearX-", A._shear_x, native.shear_x, (-0.3,)),
    ("ShearY", A._shear_y, native.shear_y, (0.21,)),
    ("TranslateX", A._translate_x, native.translate_x, (0.45,)),
    ("TranslateX-", A._translate_x, native.translate_x, (-0.31,)),
    ("TranslateY", A._translate_y, native.translate_y, (0.45,)),
    ("Rotate+", A._rotate, native.rotate, (30.0,)),
    ("Rotate-", A._rotate, native.rotate, (-13.5,)),
    ("Rotate~0", A._rotate, native.rotate, (0.7,)),
]


@pytest.mark.parametrize("name,pil_fn,nat_fn,args",
                         CASES, ids=[c[0] for c in CASES])
def test_op_byte_exact_vs_pil(name, pil_fn, nat_fn, args):
    for clip in _clips():
        ref = _pil_apply(pil_fn, clip, *args)
        got = nat_fn(clip.copy(), *args)
        assert got.dtype == np.uint8 and got.shape == clip.shape
        np.testing.assert_array_equal(ref, got, err_msg=name)


def test_policy_byte_identical_across_backends():
    """Same rng stream -> same sampled ops -> byte-identical clips."""
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (4, 96, 112, 3), dtype=np.uint8)
    ra_pil = A.create_random_augment(rng=None, backend="pil")
    ra_nat = A.create_random_augment(rng=None, backend="native")
    assert ra_nat.backend == "native" and ra_nat._native is not None
    for seed in range(24):
        out_p = ra_pil(frames, rng=np.random.default_rng(seed))
        out_n = ra_nat(frames, rng=np.random.default_rng(seed))
        np.testing.assert_array_equal(out_p, out_n, err_msg=f"seed {seed}")


def test_call_never_mutates_input():
    """The decode-cache buffer is shared: RandAugment must copy before the
    in-place native kernels touch it."""
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    orig = frames.copy()
    ra = A.create_random_augment(backend="native")
    for seed in range(8):
        ra(frames, rng=np.random.default_rng(seed))
    np.testing.assert_array_equal(frames, orig)


def test_auto_backend_resolves_native_here():
    ra = A.create_random_augment(backend="auto")
    assert ra.backend == "native"


def test_single_frame_promotion():
    rng = np.random.default_rng(7)
    frame = rng.integers(0, 256, (32, 40, 3), dtype=np.uint8)
    out = native.rotate(frame, 12.0)
    assert out.shape == (1, 32, 40, 3)
    ref = A._rotate(frame, 12.0)
    np.testing.assert_array_equal(out[0], ref)


def test_unknown_backend_rejected():
    with pytest.raises(ValueError):
        A.RandAugment(backend="cuda")


def test_dataset_plumbs_backend():
    """RetrievalDataset(augment_backend=...) reaches the RandAugment."""
    from neighborretr_tpu.data.datasets.base import RetrievalDataset
    from neighborretr_tpu.data.tokenizer import ClipTokenizer

    ds = RetrievalDataset([("v0", "a cat", None, None)], {"v0": "/nonexistent"},
                          ClipTokenizer(), is_train=True,
                          augment_backend="native")
    assert ds._augment.backend == "native"


@pytest.mark.parametrize("shape", [(1, 1, 1, 3), (2, 2, 3, 3), (1, 5, 2, 3),
                                   (3, 17, 31, 3)])
def test_degenerate_shapes_byte_exact(shape):
    """Tiny/odd frames: bilinear clamps everywhere, histograms have single
    bins, the SMOOTH interior is empty — every backend edge case at once."""
    rng = np.random.default_rng(11)
    clip = rng.integers(0, 256, shape, dtype=np.uint8)
    for name, pil_fn, nat_fn, args in CASES:
        ref = _pil_apply(pil_fn, clip, *args)
        got = nat_fn(clip.copy(), *args)
        np.testing.assert_array_equal(ref, got,
                                      err_msg=f"{name} @ {shape}")


def test_auto_falls_back_to_pil_when_native_unavailable(monkeypatch):
    monkeypatch.setattr(native, "available", lambda: False)
    ra = A.create_random_augment(backend="auto")
    assert ra.backend == "pil" and ra._native is None
    # explicit 'native' surfaces the loader diagnostic instead
    monkeypatch.setattr(native, "load_error", lambda: "no g++")
    with pytest.raises(RuntimeError, match="no g\\+\\+"):
        A.create_random_augment(backend="native")
