"""ActivityNet Captions annotation parsing
(dataloader_activitynet_retrieval.py:156-250).

{train,val_1}.json keyed by pseudo id ("v_" + video_id) with duration +
sentences; ids from train_ids.json / val_ids.json.  All sentences of a video
join into one paragraph over span [0, ceil(duration)]; one paragraph per
video → standard single-sentence eval.
"""

from __future__ import annotations

import json
import math
import os

from ..tokenizer import ClipTokenizer
from .base import RetrievalDataset


def build_activitynet(subset: str, anno_path: str, video_path: str,
                      tokenizer: ClipTokenizer, **kw) -> RetrievalDataset:
    if subset == "train":
        ids_file, data_file = "train_ids.json", "train.json"
    else:
        ids_file, data_file = "val_ids.json", "val_1.json"

    with open(os.path.join(anno_path, ids_file)) as f:
        pseudo_ids = json.load(f)

    with open(os.path.join(anno_path, data_file)) as f:
        data = json.load(f)

    pairs = []
    video_paths = {}
    for root, _, files in os.walk(video_path):
        for name in files:
            vid = ".".join(name.split(".")[:-1])
            video_paths[vid] = os.path.join(root, name)

    for pid in pseudo_ids:
        if pid not in data:
            continue
        v = data[pid]
        vid = pid[2:]  # strip "v_"
        path_key = vid if vid in video_paths else (pid if pid in video_paths else None)
        if path_key is None:
            continue
        end = int(math.ceil(float(v["duration"])))
        pairs.append((path_key, " ".join(v["sentences"]), 0.0, float(end)))

    return RetrievalDataset(pairs, video_paths, tokenizer,
                            multi_sentence_per_video=False, **kw)
