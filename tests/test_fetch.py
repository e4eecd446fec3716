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
