"""Dataset protocol and shared item assembly.

A dataset is a plain Python object exposing:
  * ``__len__`` — number of (caption, video) pairs,
  * ``item(i)`` — a dict of fixed-shape numpy arrays:
        text_ids   [W]  int32
        text_mask  [W]  float32
        video      [F, R, R, 3] uint8      (device normalizes)
        video_mask [F]  float32
        idx        ()   int32
        video_hash ()   int64
  * ``multi_sentence_per_video`` (bool) and, when True, ``cut_off_points`` /
    ``video_num`` / ``sentence_num`` for the multi-sentence eval protocol
    (dataloader_msvd_retrieval.py:108-136 semantics).

`video_hash` mirrors the reference's hash(video_id.replace("video","")) tag
(dataloader_retrieval.py:343) — a stable per-video int id here.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..text import encode_caption
from ..tokenizer import ClipTokenizer
from ..video import decode_video_frames


def stable_video_hash(video_id: str) -> np.int64:
    """Deterministic 63-bit id from the video id string (process-stable,
    unlike Python's randomized hash())."""
    h = np.int64(1125899906842597)  # large prime
    for ch in str(video_id):
        h = np.int64((np.uint64(h) * np.uint64(31) + np.uint64(ord(ch)))
                     & np.uint64(0x7FFFFFFFFFFFFFFF))
    return h


class RetrievalDataset:
    """Caption-video pair dataset over parsed annotations."""

    def __init__(
        self,
        pairs: List[Tuple[str, str, Optional[float], Optional[float]]],
        video_paths: Dict[str, str],
        tokenizer: ClipTokenizer,
        max_words: int = 24,
        max_frames: int = 12,
        resolution: int = 224,
        video_framerate: int = 1,
        multi_sentence_per_video: bool = False,
        cut_off_points: Optional[List[int]] = None,
        video_ids_in_order: Optional[List[str]] = None,
    ):
        self.pairs = pairs                  # (video_id, caption, start, end)
        self.video_paths = video_paths
        self.tokenizer = tokenizer
        self.max_words = max_words
        self.max_frames = max_frames
        self.resolution = resolution
        self.video_framerate = video_framerate
        self.multi_sentence_per_video = multi_sentence_per_video
        self.cut_off_points = cut_off_points or []
        self.video_ids_in_order = video_ids_in_order or []
        self._text_cache: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}

    def __len__(self) -> int:
        return len(self.pairs)

    @property
    def sentence_num(self) -> int:
        return len(self.pairs)

    @property
    def video_num(self) -> int:
        return len(self.cut_off_points) if self.multi_sentence_per_video else len(self.pairs)

    def text_item(self, i: int) -> Dict[str, np.ndarray]:
        _, caption, _, _ = self.pairs[i]
        if caption not in self._text_cache:
            self._text_cache[caption] = encode_caption(
                self.tokenizer, caption, self.max_words)
        ids, mask = self._text_cache[caption]
        return {"text_ids": ids, "text_mask": mask}

    def video_item(self, video_id: str, start=None, end=None) -> Dict[str, np.ndarray]:
        path = self.video_paths[video_id]
        frames, mask = decode_video_frames(
            path, self.max_frames, self.resolution,
            self.video_framerate, start, end)
        return {"video": frames, "video_mask": mask}

    def item(self, i: int) -> Dict[str, np.ndarray]:
        video_id, _, start, end = self.pairs[i]
        out = self.text_item(i)
        out.update(self.video_item(video_id, start, end))
        out["idx"] = np.int32(i)
        out["video_hash"] = stable_video_hash(video_id.replace("video", ""))
        return out
