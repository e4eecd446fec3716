"""MSVD annotation parsing (dataloader_msvd_retrieval.py:78-150).

{train,val,test}_list.txt + raw-captions.pkl (video_id → list of word lists);
all captions per video with cut_off_points for the multi-sentence eval
protocol.  Video files are discovered by walking the features directory.
"""

from __future__ import annotations

import os
import pickle

from ..tokenizer import ClipTokenizer
from .base import RetrievalDataset


def build_msvd(subset: str, anno_path: str, video_path: str,
               tokenizer: ClipTokenizer, **kw) -> RetrievalDataset:
    list_file = os.path.join(anno_path, f"{subset}_list.txt")
    with open(list_file) as fp:
        video_ids = [line.strip() for line in fp if line.strip()]

    with open(os.path.join(anno_path, "raw-captions.pkl"), "rb") as f:
        captions = pickle.load(f)

    video_paths = {}
    id_set = set(video_ids)
    for root, _, files in os.walk(video_path):
        for name in files:
            vid = ".".join(name.split(".")[:-1])
            if vid in id_set:
                video_paths[vid] = os.path.join(root, name)

    pairs = []
    cut_off_points = []
    for vid in video_ids:
        for cap in captions[vid]:
            pairs.append((vid, " ".join(cap), None, None))
        cut_off_points.append(len(pairs))

    return RetrievalDataset(
        pairs, video_paths, tokenizer,
        multi_sentence_per_video=True,
        cut_off_points=cut_off_points,
        video_ids_in_order=video_ids,
        **kw)
