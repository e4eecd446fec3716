"""CLIP checkpoint fetch-and-cache (models/fetch.py).

Reference counterpart: module_clip.py:22-81 (_download).  Exercised fully
offline via file:// URLs whose penultimate path component carries the
expected sha256, matching OpenAI's publication convention.
"""

import hashlib
import os

import pytest

from neighborretr_tpu.models import fetch


def _publish(tmp_path, payload: bytes, sha: str = None, name="Tiny.pt"):
    sha = sha or hashlib.sha256(payload).hexdigest()
    d = tmp_path / "zoo" / sha
    d.mkdir(parents=True, exist_ok=True)
    f = d / name
    f.write_bytes(payload)
    return f.as_uri()


def test_fetch_caches_and_verifies(tmp_path):
    payload = os.urandom(4096)
    url = _publish(tmp_path, payload)
    cache = str(tmp_path / "cache")

    got = fetch.ensure_clip_checkpoint("ViT-B/32", cache_dir=cache, url=url,
                                       progress=False)
    assert open(got, "rb").read() == payload
    assert os.path.dirname(got) == cache

    # second call is a pure cache hit: no network touched
    import urllib.request

    def boom(*a, **k):  # pragma: no cover - would fail the test
        raise AssertionError("network touched on cache hit")

    orig = urllib.request.urlopen
    urllib.request.urlopen = boom
    try:
        again = fetch.ensure_clip_checkpoint("ViT-B/32", cache_dir=cache,
                                             url=url, progress=False)
    finally:
        urllib.request.urlopen = orig
    assert again == got


def test_fetch_refetches_corrupt_cache_entry(tmp_path):
    payload = os.urandom(4096)
    url = _publish(tmp_path, payload)
    cache = str(tmp_path / "cache")
    got = fetch.ensure_clip_checkpoint("ViT-B/32", cache_dir=cache, url=url,
                                       progress=False)
    with open(got, "wb") as f:
        f.write(b"corrupted")
    again = fetch.ensure_clip_checkpoint("ViT-B/32", cache_dir=cache,
                                         url=url, progress=False)
    assert open(again, "rb").read() == payload


def test_fetch_rejects_sha_mismatch_and_leaves_no_debris(tmp_path):
    payload = os.urandom(4096)
    wrong = hashlib.sha256(b"something else").hexdigest()
    url = _publish(tmp_path, payload, sha=wrong)
    cache = str(tmp_path / "cache")
    with pytest.raises(RuntimeError, match="sha256 mismatch"):
        fetch.ensure_clip_checkpoint("ViT-B/32", cache_dir=cache, url=url,
                                     progress=False)
    assert os.listdir(cache) == []  # no target, no .part leftovers


def test_unknown_backbone_lists_available():
    with pytest.raises(ValueError, match="ViT-B/32"):
        fetch.ensure_clip_checkpoint("RN50x64")


def test_zoo_urls_carry_sha_component():
    for name, url in fetch.CLIP_CHECKPOINT_URLS.items():
        sha = url.rstrip("/").split("/")[-2]
        assert len(sha) == 64 and int(sha, 16) >= 0, (name, url)


def test_cache_hit_skips_rehash(tmp_path, monkeypatch):
    """Steady-state startups must not re-hash the GB-scale file: the
    sidecar marker memoizes the verified digest keyed on (size, mtime)."""
    payload = os.urandom(4096)
    url = _publish(tmp_path, payload)
    cache = str(tmp_path / "cache")
    fetch.ensure_clip_checkpoint("ViT-B/32", cache_dir=cache, url=url,
                                 progress=False)

    def no_hash(path):  # pragma: no cover - would fail the test
        raise AssertionError("re-hashed a marker-verified cache entry")

    monkeypatch.setattr(fetch, "_sha256_file", no_hash)
    fetch.ensure_clip_checkpoint("ViT-B/32", cache_dir=cache, url=url,
                                 progress=False)


class _Args:
    def __init__(self, **kw):
        self.clip_checkpoint = None
        self.datatype = "msrvtt"
        self.tiny = False
        self.base_encoder = "ViT-B/32"
        self.__dict__.update(kw)


def test_resolve_clip_checkpoint_paths(monkeypatch, tmp_path):
    """Shared CLI resolution (cli/common.py): 'random' opts out; supplied
    weights suppress the fetch (offline resume works); synthetic/tiny skip;
    otherwise the published checkpoint is fetched."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from cli.common import resolve_clip_checkpoint

    a = _Args(clip_checkpoint="random")
    resolve_clip_checkpoint(a, weights_already_supplied=False)
    assert a.clip_checkpoint is None

    fetched = []
    monkeypatch.setattr(fetch, "ensure_clip_checkpoint",
                        lambda name, **kw: fetched.append(name) or "/x.pt")

    # a resume/trained checkpoint supplies the weights: no fetch (offline ok)
    a = _Args()
    resolve_clip_checkpoint(a, weights_already_supplied=True)
    assert a.clip_checkpoint is None and fetched == []

    for quiet in (_Args(datatype="synthetic"), _Args(tiny=True)):
        resolve_clip_checkpoint(quiet, weights_already_supplied=False)
        assert quiet.clip_checkpoint is None and fetched == []

    a = _Args()
    resolve_clip_checkpoint(a, weights_already_supplied=False)
    assert a.clip_checkpoint == "/x.pt" and fetched == ["ViT-B/32"]

    # an explicit path is always respected
    a = _Args(clip_checkpoint="mine.pt")
    resolve_clip_checkpoint(a, weights_already_supplied=False)
    assert a.clip_checkpoint == "mine.pt" and fetched == ["ViT-B/32"]
