"""Tests for the offline compression CLI (job enumeration; ffmpeg gated)."""

import os
import shutil

import pytest

from cli.compress_video import compress, prepare_input_output_pairs


def test_enumerate_mirrors_layout(tmp_path):
    (tmp_path / "in" / "sub").mkdir(parents=True)
    (tmp_path / "in" / "a.mp4").write_bytes(b"x")
    (tmp_path / "in" / "sub" / "b.avi").write_bytes(b"x")
    (tmp_path / "in" / "notes.txt").write_bytes(b"x")     # non-video: skipped
    pairs = prepare_input_output_pairs(str(tmp_path / "in"),
                                       str(tmp_path / "out"))
    dsts = sorted(d for _, d in pairs)
    assert dsts == [str(tmp_path / "out" / "a.mp4"),
                    str(tmp_path / "out" / "sub" / "b.avi")]


def test_existing_output_skipped(tmp_path):
    src = tmp_path / "a.mp4"
    dst = tmp_path / "out" / "a.mp4"
    src.write_bytes(b"x")
    dst.parent.mkdir()
    dst.write_bytes(b"already done")
    assert compress((str(src), str(dst), 3, 224)).startswith("skip")


@pytest.mark.skipif(shutil.which("ffmpeg") is None, reason="ffmpeg not on PATH")
def test_ffmpeg_reencode(tmp_path):
    import numpy as np
    try:
        import cv2
    except ImportError:
        pytest.skip("cv2 unavailable")
    src = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 12, (64, 48))
    for i in range(24):
        w.write(np.full((48, 64, 3), i * 10, np.uint8))
    w.release()
    dst = str(tmp_path / "out" / "clip.mp4")
    msg = compress((src, dst, 3, 32))
    assert msg.startswith("ok"), msg
    cap = cv2.VideoCapture(dst)
    assert int(round(cap.get(cv2.CAP_PROP_FPS))) == 3
    assert min(cap.get(cv2.CAP_PROP_FRAME_WIDTH),
               cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) == 32
