"""Video ingest tests against a real encoded clip (cv2.VideoWriter)."""

import numpy as np
import pytest

from neighborretr_tpu.data.video import (decode_video_frames,
                                         generate_frame_indices,
                                         normalize_frames, resize_center_crop,
                                         uniform_subsample)

cv2 = pytest.importorskip("cv2")


def _write_clip(path, n_frames=24, fps=12, w=64, h=48):
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    if not writer.isOpened():
        pytest.skip("cv2 VideoWriter mp4v unavailable")
    for i in range(n_frames):
        frame = np.full((h, w, 3), i * 10 % 256, np.uint8)
        frame[:, : w // 2] = (i * 10 + 100) % 256   # asymmetric content
        writer.write(frame)
    writer.release()


def test_decode_real_clip(tmp_path):
    path = tmp_path / "clip.mp4"
    _write_clip(path)
    frames, mask = decode_video_frames(str(path), max_frames=4, resolution=32,
                                       video_framerate=1)
    assert frames.shape == (4, 32, 32, 3) and frames.dtype == np.uint8
    # 2 seconds of video at 1 fps sampling → ≥2 valid frames
    assert mask.sum() >= 2
    valid = frames[mask.astype(bool)]
    assert valid.std() > 0          # actual pixel content, not zeros


def test_decode_missing_file_zero_fallback(tmp_path):
    frames, mask = decode_video_frames(str(tmp_path / "nope.mp4"),
                                       max_frames=3, resolution=16)
    assert frames.sum() == 0 and mask.sum() == 0


def test_frame_indices_per_second():
    # 30 fps, 90 frames, 1 fps sampling over [0, 2] → one index per second
    idx = generate_frame_indices(fps=30, total_frames=90, sample_fp=1,
                                 start_sec=0, end_sec=2)
    assert idx == [0, 30, 60]


def test_uniform_subsample_linspace():
    sel = uniform_subsample(10, 4)
    assert list(sel) == [0, 3, 6, 9]
    assert list(uniform_subsample(3, 4)) == [0, 1, 2]


def test_resize_center_crop_shapes():
    img = np.zeros((48, 64, 3), np.uint8)
    out = resize_center_crop(img, 32)
    assert out.shape == (32, 32, 3)


def test_normalize_frames_range():
    import jax.numpy as jnp
    x = np.random.default_rng(0).integers(0, 256, (2, 8, 8, 3), np.uint8)
    y = np.asarray(normalize_frames(jnp.asarray(x)))
    assert y.shape == x.shape and abs(y).max() < 3.0
