"""AOT deployment bundles (neighborretr_tpu/deploy.py): the exported query
program must reproduce the serving path's scores exactly, load without any
framework code, and survive the int8-index variant."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

from neighborretr_tpu import deploy, serving
from neighborretr_tpu.core.config import (Config, LossConfig, ModelConfig,
                                          TrainConfig)
from neighborretr_tpu.data.datasets.synthetic import SyntheticDataset
from neighborretr_tpu.data.loader import BatchLoader
from neighborretr_tpu.data.text import encode_caption
from neighborretr_tpu.models import neighborretr as model

W, F, N = 8, 4, 24
QB, K = 4, 3


class _StubTokenizer:
    def tokenize(self, text):
        return text.split()

    def convert_tokens_to_ids(self, tokens):
        ids = []
        for t in tokens:
            if t == "<|startoftext|>":
                ids.append(1)
            elif t == "<|endoftext|>":
                ids.append(2)
            else:
                ids.append(3 + (hash(t) % 500))
        return ids


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cfg = Config(model=ModelConfig.tiny(max_words=W, max_frames=F),
                 loss=LossConfig(num_neighbors=3),
                 train=TrainConfig(batch_size=8, batch_size_val=8))
    ds = SyntheticDataset(n=N, seed=3, max_words=W, max_frames=F,
                          resolution=cfg.model.clip.image_resolution,
                          vocab_size=cfg.model.clip.vocab_size)
    params = model.init_params(jax.random.PRNGKey(0), cfg.model)
    loader = BatchLoader(ds, 8, shuffle=False, drop_last=False, workers=0,
                         pad_to_batch=True)
    index = serving.build_video_index(params, cfg, loader, dataset=ds)
    bundle_dir = str(tmp_path_factory.mktemp("bundle"))
    deploy.save_bundle(bundle_dir, params, cfg, index, query_batch=QB,
                       topk=K, platforms=("cpu",))
    return cfg, params, index, bundle_dir


def _tokenize(queries, max_words):
    tok = _StubTokenizer()
    enc = [encode_caption(tok, q, max_words) for q in queries]
    ids = np.stack([e[0] for e in enc]).astype(np.int32)
    mask = np.stack([e[1] for e in enc]).astype(np.float32)
    return ids, mask


QUERIES = ["a dog runs", "cooking pasta", "street at night"]


def test_bundle_layout(setup):
    _, _, _, bundle_dir = setup
    for name in ("query_program.bin", "params.npz", "index.npz", "meta.json"):
        assert os.path.exists(os.path.join(bundle_dir, name)), name
    with open(os.path.join(bundle_dir, "meta.json")) as f:
        meta = json.load(f)
    assert meta["query_batch"] == QB and meta["topk"] == K
    assert meta["n_videos"] == N
    assert meta["platforms"] == ["cpu"]
    assert meta["param_dtypes"]  # non-empty manifest


def test_bundle_matches_searcher(setup):
    """The exported program's (values, indices) == the live Searcher's
    ranking on the same queries (the Searcher itself is eval-faithful,
    tests/test_serving.py)."""
    cfg, params, index, bundle_dir = setup
    bundle = deploy.load_bundle(bundle_dir)
    ids, mask = _tokenize(QUERIES, cfg.model.max_words)
    vals, idx = bundle.search_tokens(ids, mask)
    assert vals.shape == (len(QUERIES), K)

    searcher = serving.Searcher(params, cfg, index, _StubTokenizer(),
                                query_batch=QB)
    hits = searcher.search(QUERIES, topk=K)
    for q in range(len(QUERIES)):
        want_ids = [vid for vid, _ in hits[q]]
        got_ids = [bundle.video_ids[j] for j in idx[q]]
        assert got_ids == want_ids, (q, got_ids, want_ids)
        np.testing.assert_allclose(vals[q], [s for _, s in hits[q]],
                                   rtol=0, atol=1e-5)


def test_bundle_runs_without_framework_code(setup):
    """A subprocess that may import ONLY jax + numpy (the neighborretr_tpu
    package is poisoned via a meta-path blocker) deserializes the program
    and reproduces the in-process scores."""
    cfg, _, _, bundle_dir = setup
    ids, mask = _tokenize(QUERIES, cfg.model.max_words)
    bundle = deploy.load_bundle(bundle_dir)
    want_vals, want_idx = bundle.search_tokens(ids, mask)

    np.save(os.path.join(bundle_dir, "q_ids.npy"), ids)
    np.save(os.path.join(bundle_dir, "q_mask.npy"), mask)
    script = r"""
import json, os, sys

class _Block:
    def find_spec(self, name, path=None, target=None):
        if name.split(".")[0] == "neighborretr_tpu":
            raise ImportError("framework import attempted from bundle loader")
        return None
sys.meta_path.insert(0, _Block())

import numpy as np
import jax, jax.numpy as jnp
from jax import export as jexport

d = sys.argv[1]
meta = json.load(open(os.path.join(d, "meta.json")))
exported = jexport.deserialize(open(os.path.join(d, "query_program.bin"), "rb").read())
with np.load(os.path.join(d, "params.npz"), allow_pickle=False) as z:
    flat = {k: z[k] for k in z.files}
leaves = [jnp.asarray(flat[k]).astype(meta["param_dtypes"][k]) for k in sorted(flat)]
with np.load(os.path.join(d, "index.npz"), allow_pickle=False) as z:
    index = {k: z[k] for k in z.files}
v_feat = index["v_feat"].astype(np.float32)
if "v_scale" in index:
    v_feat = v_feat * index["v_scale"].astype(np.float32)[..., None]
ids = np.load(os.path.join(d, "q_ids.npy"))
mask = np.load(os.path.join(d, "q_mask.npy"))
pad = meta["query_batch"] - ids.shape[0]
ids = np.pad(ids, ((0, pad), (0, 0)))
mask = np.pad(mask, ((0, pad), (0, 0)))
vals, idx = exported.call(leaves, jnp.asarray(ids), jnp.asarray(mask),
                          jnp.asarray(v_feat),
                          jnp.asarray(index["v_mask"].astype(np.float32)))
np.save(os.path.join(d, "out_vals.npy"), np.asarray(vals))
np.save(os.path.join(d, "out_idx.npy"), np.asarray(idx))
print("BARE_JAX_OK")
"""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    proc = subprocess.run([sys.executable, "-c", script, bundle_dir],
                          env=env, capture_output=True, text=True,
                          timeout=600)
    assert proc.returncode == 0, proc.stderr
    assert "BARE_JAX_OK" in proc.stdout
    got_vals = np.load(os.path.join(bundle_dir, "out_vals.npy"))
    got_idx = np.load(os.path.join(bundle_dir, "out_idx.npy"))
    q = len(QUERIES)
    np.testing.assert_array_equal(got_idx[:q], want_idx)
    np.testing.assert_allclose(got_vals[:q], want_vals, rtol=0, atol=1e-6)


def test_int8_bundle(setup, tmp_path):
    """int8-index bundles dequantize at load and rank like the live path."""
    cfg, params, index, _ = setup
    q_index = dict(index)
    q_index["v_feat"], q_index["v_scale"] = serving.quantize_features(
        index["v_feat"].astype(np.float32))
    bundle_dir = str(tmp_path / "bundle8")
    deploy.save_bundle(bundle_dir, params, cfg, q_index, query_batch=QB,
                       topk=K, platforms=("cpu",))
    bundle = deploy.load_bundle(bundle_dir)
    ids, mask = _tokenize(QUERIES, cfg.model.max_words)
    vals, idx = bundle.search_tokens(ids, mask)

    searcher = serving.Searcher(params, cfg, q_index, _StubTokenizer(),
                                query_batch=QB)
    hits = searcher.search(QUERIES, topk=K)
    for q in range(len(QUERIES)):
        assert [bundle.video_ids[j] for j in idx[q]] == \
            [vid for vid, _ in hits[q]]


def test_export_validates_topk(setup):
    cfg, params, index, _ = setup
    with pytest.raises(ValueError, match="topk"):
        deploy.export_query_program(params, cfg, n_videos=N,
                                    query_batch=QB, topk=N + 1)


def test_query_overflow_rejected(setup):
    _, _, _, bundle_dir = setup
    bundle = deploy.load_bundle(bundle_dir)
    ids = np.zeros((QB + 1, W), np.int32)
    mask = np.ones((QB + 1, W), np.float32)
    with pytest.raises(ValueError, match="query_batch"):
        bundle.search_tokens(ids, mask)
