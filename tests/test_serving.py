"""Serving path: video index build (dedup, layout, round-trip) and free-text
search returning eval-faithful similarities (within the fp16 rounding of the
stored video features)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neighborretr_tpu import serving
from neighborretr_tpu.core.config import Config, LossConfig, ModelConfig, TrainConfig
from neighborretr_tpu.data.loader import BatchLoader
from neighborretr_tpu.data.datasets.synthetic import SyntheticDataset
from neighborretr_tpu.models import neighborretr as model
from neighborretr_tpu.train.evaluate import similarity_matrix

W, F, N = 8, 4, 24


class _StubTokenizer:
    """Whitespace tokenizer onto the tiny vocab (real BPE ids overflow the
    512-entry tiny embedding; the text pipeline contract is identical)."""

    def tokenize(self, text):
        return text.split()

    def convert_tokens_to_ids(self, tokens):
        import zlib
        ids = []
        for t in tokens:
            if t == "<|startoftext|>":
                ids.append(1)
            elif t == "<|endoftext|>":
                ids.append(2)
            else:
                # crc32, not hash(): the per-process hash salt made
                # near-tie ranking assertions flaky across runs
                ids.append(3 + (zlib.crc32(t.encode()) % 500))
        return ids


@pytest.fixture(scope="module")
def setup():
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
    return cfg, ds, params, index


def test_index_layout_and_roundtrip(setup, tmp_path):
    cfg, ds, params, index = setup
    E = cfg.model.clip.embed_dim
    assert index["v_feat"].shape == (N, F, E)
    assert index["v_feat"].dtype == np.float16
    assert index["v_mask"].shape == (N, F)
    assert len(index["video_ids"]) == N
    assert len(set(map(str, index["video_ids"]))) == N

    path = str(tmp_path / "index.npz")
    serving.save_index(path, index)
    loaded = serving.load_index(path)
    np.testing.assert_array_equal(loaded["v_feat"], index["v_feat"])
    assert list(map(str, loaded["video_ids"])) == \
        list(map(str, index["video_ids"]))


def test_index_dedupes_repeated_videos(setup):
    cfg, ds, params, _ = setup

    class Repeated:
        """Every video appears 3 times (multi-sentence-style repetition)."""
        multi_sentence_per_video = False

        def __len__(self):
            return 3 * 8

        def item(self, i):
            it = ds.item(i % 8)
            it = dict(it)
            it["idx"] = np.int32(i)
            return it

    loader = BatchLoader(Repeated(), 8, shuffle=False, drop_last=False,
                         workers=0, pad_to_batch=True)
    index = serving.build_video_index(params, cfg, loader)
    assert len(index["video_ids"]) == 8
    assert index["v_feat"].shape[0] == 8


def test_search_scores_match_eval_similarity(setup):
    cfg, ds, params, index = setup
    queries = ["a cat plays piano", "someone rides a bike downhill"]
    tok = _StubTokenizer()
    results = serving.search(params, cfg, index, tok, queries, topk=4)
    assert len(results) == 2 and all(len(r) == 4 for r in results)

    # the same queries scored directly through the eval similarity path
    t_feat, t_mask = serving.encode_queries(params, cfg, tok, queries)
    sim = similarity_matrix(params, cfg, np.asarray(t_feat), t_mask,
                            np.asarray(index["v_feat"], np.float32),
                            np.asarray(index["v_mask"], np.float32))
    id_to_col = {str(v): j for j, v in enumerate(index["video_ids"])}
    for q, hits in enumerate(results):
        scores = [s for _, s in hits]
        assert scores == sorted(scores, reverse=True)
        want = np.sort(sim[q])[::-1][:4]
        np.testing.assert_allclose(scores, want, rtol=1e-5)
        for vid, s in hits:
            np.testing.assert_allclose(s, sim[q, id_to_col[vid]], rtol=1e-5)


def test_search_rejects_mismatched_index_config(setup):
    cfg, ds, params, index = setup
    import dataclasses as dc
    other = dc.replace(cfg, model=dc.replace(
        cfg.model, clip=dc.replace(cfg.model.clip, image_resolution=64)))
    with pytest.raises(ValueError, match="different model config"):
        serving.search(model.init_params(jax.random.PRNGKey(1), other.model),
                       other, index, _StubTokenizer(), ["q"], topk=1)


def test_search_rejects_wrong_checkpoint_weights(setup):
    """Same architecture, different trained weights → the fingerprint in the
    index meta rejects the query instead of returning silently wrong scores."""
    cfg, ds, params, index = setup
    other_params = model.init_params(jax.random.PRNGKey(9), cfg.model)
    with pytest.raises(ValueError, match="DIFFERENT CHECKPOINT"):
        serving.search(other_params, cfg, index, _StubTokenizer(), ["q"],
                       topk=1)


def test_meta_required(setup):
    cfg, ds, params, index = setup
    stripped = {k: v for k, v in index.items() if k != "meta"}
    with pytest.raises(ValueError, match="no 'meta'"):
        serving.check_meta(stripped, cfg)


def test_empty_corpus_raises(setup):
    cfg, ds, params, _ = setup

    class Empty:
        multi_sentence_per_video = False

        def __len__(self):
            return 0

        def item(self, i):                      # pragma: no cover
            raise IndexError(i)

    loader = BatchLoader(Empty(), 8, shuffle=False, drop_last=False,
                         workers=0, pad_to_batch=True)
    with pytest.raises(ValueError, match="no valid videos"):
        serving.build_video_index(params, cfg, loader)


def test_save_index_appends_npz_extension(setup, tmp_path):
    cfg, ds, params, index = setup
    bare = str(tmp_path / "myindex")
    written = serving.save_index(bare, index)
    assert written == bare + ".npz"
    import os
    assert os.path.exists(written)
    loaded = serving.load_index(written)
    np.testing.assert_array_equal(loaded["v_feat"], index["v_feat"])


def test_int8_index_matches_fp16_ranking(setup):
    """int8 index (quarter size): same top-k ids as the fp16 index, scores
    within quantization tolerance; quantize/dequant round-trip is tight."""
    cfg, ds, params, index = setup
    loader = BatchLoader(ds, 8, shuffle=False, drop_last=False, workers=0,
                         pad_to_batch=True)
    q8 = serving.build_video_index(params, cfg, loader, dataset=ds,
                                   feature_dtype="int8")
    assert q8["v_feat"].dtype == np.int8
    assert q8["v_scale"].shape == q8["v_mask"].shape
    assert q8["v_feat"].nbytes == index["v_feat"].nbytes // 2  # fp16 → int8

    deq = np.asarray(serving.index_video_features(q8))
    full = np.asarray(index["v_feat"], np.float32)
    scale = np.abs(full).max(axis=-1).clip(1e-8)
    err = np.abs(deq - full).max(axis=-1) / scale
    assert err.max() < 1.0 / 127            # within one quantization step

    # full similarity rows agree within quantization tolerance.  (Exact
    # top-k ID equality would be flaky here: random-init weights give
    # near-tied scores, and the stub tokenizer's salted hash() varies the
    # queries per process — ties can legitimately flip under int8.)
    tok = _StubTokenizer()
    queries = ["a cat plays piano", "someone rides a bike downhill"]
    t_feat, t_mask = serving.encode_queries(params, cfg, tok, queries)
    from neighborretr_tpu.train.evaluate import similarity_matrix_device
    sims = []
    for idx in (index, q8):
        sims.append(np.asarray(similarity_matrix_device(
            params, cfg, t_feat, t_mask,
            serving.index_video_features(idx),
            jnp.asarray(idx["v_mask"], jnp.float32))))
    tol = 0.02 * np.abs(sims[0]).max()
    np.testing.assert_allclose(sims[1], sims[0], atol=tol)

    r8 = serving.search(params, cfg, q8, tok, queries, topk=3)
    assert len(r8) == 2 and all(len(r) == 3 for r in r8)
    for hits in r8:
        scores = [s for _, s in hits]
        assert scores == sorted(scores, reverse=True)


def test_build_index_rejects_unknown_dtype(setup):
    cfg, ds, params, _ = setup
    loader = BatchLoader(ds, 8, shuffle=False, drop_last=False, workers=0,
                         pad_to_batch=True)
    with pytest.raises(ValueError, match="feature_dtype"):
        serving.build_video_index(params, cfg, loader, dataset=ds,
                                  feature_dtype="int4")


def test_searcher_matches_one_shot_search_with_padding(setup):
    """The daemon path (Searcher, padded query buckets) returns exactly the
    one-shot search results — padding rows must never leak into results."""
    cfg, ds, params, index = setup
    tok = _StubTokenizer()
    queries = ["a cat plays piano", "someone rides a bike downhill",
               "city at night"]
    want = serving.search(params, cfg, index, tok, queries, topk=4)

    searcher = serving.Searcher(params, cfg, index, tok, query_batch=8)
    assert len(searcher) == N
    got = searcher.search(queries, topk=4)   # 3 queries pad to a bucket of 8
    assert got == want

    sims = searcher.similarities(queries)
    assert sims.shape == (3, N)
    assert searcher.similarities([]).shape == (0, N)
    with pytest.raises(ValueError, match="query_batch"):
        serving.Searcher(params, cfg, index, tok, query_batch=0)


def test_http_server_round_trip(setup):
    """cli/serve.py end-to-end on an ephemeral port: healthz, GET and POST
    search against the live Searcher, malformed requests get JSON errors."""
    import http.client
    import json
    import threading

    from cli.serve import make_server

    cfg, ds, params, index = setup
    tok = _StubTokenizer()
    searcher = serving.Searcher(params, cfg, index, tok, query_batch=4)
    queries = ["a cat plays piano", "someone rides a bike downhill"]
    want = searcher.search(queries, topk=3)

    server = make_server(searcher, "127.0.0.1", 0, default_topk=3)
    host, port = server.server_address
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        def request(method, path, body=None):
            conn = http.client.HTTPConnection(host, port, timeout=30)
            headers = {"Content-Type": "application/json"} if body else {}
            conn.request(method, path,
                         json.dumps(body) if body else None, headers)
            resp = conn.getresponse()
            out = resp.status, json.loads(resp.read().decode())
            conn.close()
            return out

        status, health = request("GET", "/healthz")
        assert status == 200 and health["videos"] == N

        status, got = request("POST", "/search",
                              {"queries": queries, "topk": 3})
        assert status == 200
        assert got["results"] == [
            [{"video_id": vid, "score": pytest.approx(score)}
             for vid, score in hits] for hits in want]

        from urllib.parse import quote
        status, got1 = request(
            "GET", f"/search?q={quote(queries[0])}&topk=3")
        assert status == 200
        assert [h["video_id"] for h in got1["results"][0]] == \
            [vid for vid, _ in want[0]]

        assert request("POST", "/search", {"queries": []})[0] == 400
        assert request("POST", "/search", {"queries": "not-a-list"})[0] == 400
        assert request("POST", "/search",
                       {"queries": ["x"], "topk": "NaN"})[0] == 400
        assert request("GET", "/search")[0] == 400        # missing q=
        assert request("GET", "/nope")[0] == 404
        big = ["q"] * 257
        assert request("POST", "/search", {"queries": big})[0] == 413
    finally:
        server.shutdown()
        server.server_close()
        thread.join(timeout=10)


def test_searcher_sharded_corpus_matches_single_device(setup):
    """--num_devices corpus sharding: identical results to the replicated
    Searcher, including when N doesn't divide the device count (pad rows
    are copies of video 0 and must be ranked out via the -inf column
    mask)."""
    from neighborretr_tpu.parallel import mesh as pmesh

    cfg, ds, params, index = setup
    tok = _StubTokenizer()
    # 21 videos over 8 devices → pads to 24 with 3 copies of row 0
    small = {"video_ids": index["video_ids"][:21],
             "v_feat": index["v_feat"][:21],
             "v_mask": index["v_mask"][:21],
             "meta": index["meta"]}
    queries = ["a cat plays piano", "someone rides a bike downhill"]

    plain = serving.Searcher(params, cfg, small, tok, query_batch=4)
    mesh = pmesh.make_mesh(num_devices=8)
    sharded = serving.Searcher(params, cfg, small, tok, query_batch=4,
                               mesh=mesh)
    assert len(sharded) == 21

    want = plain.search(queries, topk=21)       # every video, ranked
    got = sharded.search(queries, topk=21)
    for w_hits, g_hits in zip(want, got):
        # the 3 pad copies of video 0 never appear, every real video does
        assert len(g_hits) == 21
        assert {v for v, _ in g_hits} == {v for v, _ in w_hits}
        # atol: sharded reductions reorder float sums, so scores carry a
        # few-ulp absolute wobble the rtol can't cover near zero (and
        # near-tied ranks may legitimately swap) — compare per video id
        # and the sorted score vectors instead of exact id order
        np.testing.assert_allclose([s for _, s in g_hits],
                                   [s for _, s in w_hits],
                                   rtol=2e-5, atol=1e-7)
        w_scores, g_scores = dict(w_hits), dict(g_hits)
        for vid in w_scores:
            np.testing.assert_allclose(g_scores[vid], w_scores[vid],
                                       rtol=2e-5, atol=1e-7)

    np.testing.assert_allclose(sharded.similarities(queries),
                               plain.similarities(queries),
                               rtol=2e-5, atol=1e-7)


def test_http_server_keepalive_resync_after_early_errors(setup):
    """Early-exit replies (404 on a wrong POST path, bad Content-Length)
    must not desynchronize an HTTP/1.1 keep-alive connection: the unread
    body is drained (or the connection closed) so a follow-up request on
    the SAME connection still works."""
    import http.client
    import json
    import socket
    import threading

    from cli.serve import make_server

    cfg, ds, params, index = setup
    searcher = serving.Searcher(params, cfg, index, _StubTokenizer(),
                                query_batch=4)
    server = make_server(searcher, "127.0.0.1", 0, default_topk=2)
    host, port = server.server_address
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        # one keep-alive connection: POST-with-body to a wrong path (404,
        # body must be drained), then a valid search on the same socket
        conn = http.client.HTTPConnection(host, port, timeout=30)
        body = json.dumps({"queries": ["resync probe"], "topk": 1})
        conn.request("POST", "/nope", body,
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 404
        resp.read()
        conn.request("POST", "/search", body,
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        assert len(json.loads(resp.read().decode())["results"]) == 1
        conn.close()

        # malformed Content-Length: clean JSON 400 (not a dropped
        # connection with a server-side traceback)
        raw = socket.create_connection((host, port), timeout=30)
        raw.sendall(b"POST /search HTTP/1.1\r\nHost: x\r\n"
                    b"Content-Length: abc\r\n\r\n")
        chunks = []
        while True:  # server sets Connection: close — read to EOF
            got = raw.recv(65536)
            if not got:
                break
            chunks.append(got)
        reply = b"".join(chunks).decode()
        assert "400" in reply.split("\r\n")[0]
        assert "invalid Content-Length" in reply
        raw.close()
    finally:
        server.shutdown()
        server.server_close()
        thread.join(timeout=10)


class _CountingSearcher:
    """Fake Searcher: per-query deterministic hits + device-call counter."""

    def __init__(self, query_batch=4):
        self.query_batch = query_batch
        self.calls = []          # list of (n_queries, topk)
        import threading
        self._gate = threading.Event()
        self._gate.set()

    def search(self, queries, topk=5):
        self._gate.wait()
        self.calls.append((len(queries), topk))
        return [[(f"vid_{q}_{r}", float(len(q) + r)) for r in range(topk)]
                for q in queries]


def test_batching_dispatcher_routes_and_slices():
    """Concurrent submits coalesce into fewer device calls; every caller
    gets exactly its own queries' hits at its own topk."""
    import threading

    s = _CountingSearcher()
    s._gate.clear()                       # hold the device until all queued
    d = serving.BatchingDispatcher(s, max_wait_ms=200.0)
    try:
        results = {}

        def worker(i):
            results[i] = d.submit([f"q{i}a", f"q{i}b"], topk=2 + (i % 3))

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        # let every request enqueue, then release the device
        import time
        time.sleep(0.3)
        s._gate.set()
        for t in threads:
            t.join(timeout=30)
        assert len(results) == 6
        for i in range(6):
            want_k = 2 + (i % 3)
            got = results[i]
            assert len(got) == 2
            for q, hits in zip([f"q{i}a", f"q{i}b"], got):
                assert len(hits) == want_k
                assert hits == [(f"vid_{q}_{r}", float(len(q) + r))
                                for r in range(want_k)]
        # the first submit may dispatch alone (it can enter before the gate
        # clears the queue), but the rest must have merged
        assert len(s.calls) < 6
        # padded up to compile buckets, never below the real query count
        assert sum(n for n, _ in s.calls) >= 12
        # merged calls run at the max topk of their batch
        assert all(k <= 4 for _, k in s.calls)
        assert d.requests == 6 and d.batches == len(s.calls)
    finally:
        d.close()


def test_batching_dispatcher_propagates_errors():
    class Boom:
        query_batch = 4

        def search(self, queries, topk=5):
            raise RuntimeError("device fell over")

    d = serving.BatchingDispatcher(Boom(), max_wait_ms=1.0)
    try:
        with pytest.raises(RuntimeError, match="device fell over"):
            d.submit(["q"], topk=1)
    finally:
        d.close()


def test_batching_dispatcher_respects_max_batch():
    s = _CountingSearcher()
    d = serving.BatchingDispatcher(s, max_batch=3, max_wait_ms=50.0)
    try:
        # one oversized request still goes through (alone)
        out = d.submit(["a", "b", "c", "d"], topk=1)
        assert len(out) == 4
        assert s.calls[-1][0] == 4
    finally:
        d.close()


def test_http_server_with_dynamic_batching_matches_sequential(setup):
    """Socket-level: concurrent single-query requests through the batching
    dispatcher return exactly what sequential searches return."""
    import http.client
    import json
    import threading

    from cli.serve import make_server

    cfg, ds, params, index = setup
    tok = _StubTokenizer()
    searcher = serving.Searcher(params, cfg, index, tok, query_batch=4)
    queries = [f"synthetic caption number {i}" for i in range(8)]
    want = searcher.search(queries, topk=3)

    dispatcher = serving.BatchingDispatcher(searcher, max_wait_ms=25.0)
    server = make_server(searcher, "127.0.0.1", 0, default_topk=3,
                         dispatcher=dispatcher)
    host, port = server.server_address
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        got = [None] * len(queries)

        def one(i):
            conn = http.client.HTTPConnection(host, port, timeout=60)
            conn.request("POST", "/search",
                         json.dumps({"queries": [queries[i]], "topk": 3}),
                         {"Content-Type": "application/json"})
            resp = conn.getresponse()
            got[i] = (resp.status, json.loads(resp.read().decode()))
            conn.close()

        threads = [threading.Thread(target=one, args=(i,))
                   for i in range(len(queries))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for i, (status, payload) in enumerate(got):
            assert status == 200, payload
            assert payload["results"] == [
                [{"video_id": vid, "score": pytest.approx(score)}
                 for vid, score in want[i]]]
        assert dispatcher.requests == len(queries)
        assert dispatcher.batches <= dispatcher.requests
    finally:
        server.shutdown()
        server.server_close()
        dispatcher.close()


def test_batching_dispatcher_rounds_to_buckets():
    """Merged batches pad to power-of-two multiples of query_batch (few
    compiled programs) and padded rows never leak into results."""
    s = _CountingSearcher(query_batch=4)
    d = serving.BatchingDispatcher(s, max_batch=32, max_wait_ms=0.0)
    try:
        assert d.buckets == [4, 8, 16, 32]
        out = d.submit(["alpha", "beta", "gamma", "delta", "epsilon"], topk=2)
        assert len(out) == 5                      # 5 queries -> bucket 8
        assert s.calls[-1][0] == 8
        assert out[0][0][0] == "vid_alpha_0"
    finally:
        d.close()


def test_build_index_over_mesh_matches_single_device(setup):
    """Data-parallel corpus encoding over the 8-device CPU mesh produces
    the single-device index (same ids, features, masks)."""
    from neighborretr_tpu.parallel import mesh as pmesh

    cfg, ds, params, index = setup
    mesh = pmesh.make_mesh()
    if mesh.devices.size < 2:
        pytest.skip("needs a multi-device mesh")
    loader = BatchLoader(ds, 8, shuffle=False, drop_last=False, workers=0,
                         pad_to_batch=True)
    sharded = serving.build_video_index(params, cfg, loader, dataset=ds,
                                        mesh=mesh)
    assert list(sharded["video_ids"]) == list(index["video_ids"])
    np.testing.assert_allclose(sharded["v_feat"].astype(np.float32),
                               index["v_feat"].astype(np.float32),
                               atol=2e-3)
    np.testing.assert_array_equal(sharded["v_mask"], index["v_mask"])


def test_append_index_merges_and_dedupes(setup):
    """Incremental build: skip_ids leaves out existing videos; append_index
    merges to exactly the full-build index; a Searcher over the merged
    index matches one over the full build."""
    cfg, ds, params, full = setup
    have = [str(v) for v in full["video_ids"]]
    first_ids, rest_ids = set(have[:5]), set(have[5:])

    loader = BatchLoader(ds, 8, shuffle=False, drop_last=False, workers=0,
                         pad_to_batch=True)
    part = serving.build_video_index(params, cfg, loader, dataset=ds,
                                     skip_ids=rest_ids)
    assert list(part["video_ids"]) == have[:5]

    loader = BatchLoader(ds, 8, shuffle=False, drop_last=False, workers=0,
                         pad_to_batch=True)
    new = serving.build_video_index(params, cfg, loader, dataset=ds,
                                    skip_ids=first_ids)
    merged = serving.append_index(part, new)
    assert list(merged["video_ids"]) == have
    np.testing.assert_array_equal(merged["v_feat"], full["v_feat"])

    # idempotent: appending the same rows again is a no-op
    again = serving.append_index(merged, new)
    assert again is merged

    tok = _StubTokenizer()
    queries = ["a dog on a beach", "someone cooking"]
    want = serving.Searcher(params, cfg, full, tok, query_batch=2).search(
        queries, topk=3)
    got = serving.Searcher(params, cfg, merged, tok, query_batch=2).search(
        queries, topk=3)
    assert got == want


def test_append_index_rejects_mismatches(setup):
    cfg, ds, params, full = setup
    other = dict(full)
    other["meta"] = np.frombuffer(b'{"different": true}', dtype=np.uint8)
    with pytest.raises(ValueError, match="meta mismatch"):
        serving.append_index(full, other)
    quant = dict(full)
    quant["v_feat"], quant["v_scale"] = serving.quantize_features(
        full["v_feat"])
    with pytest.raises(ValueError, match="feature_dtype"):
        serving.append_index(full, quant)


def test_batching_dispatcher_carries_overflow_to_next_batch():
    """A dequeued request that would push the merge past max_batch starts
    the NEXT batch instead of over-merging (order preserved)."""
    import threading

    s = _CountingSearcher(query_batch=4)
    s._gate.clear()
    d = serving.BatchingDispatcher(s, max_batch=4, max_wait_ms=200.0)
    try:
        results = {}

        def worker(i):
            results[i] = d.submit([f"q{i}x", f"q{i}y", f"q{i}z"], topk=1)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        import time
        time.sleep(0.3)
        s._gate.set()
        for t in threads:
            t.join(timeout=30)
        assert len(results) == 3
        # 3-query requests cannot pair under max_batch=4: one per call,
        # padded to the 4-bucket
        assert [n for n, _ in s.calls] == [4, 4, 4]
    finally:
        d.close()


def test_batching_dispatcher_submit_after_close_raises():
    s = _CountingSearcher()
    d = serving.BatchingDispatcher(s, max_wait_ms=1.0)
    d.close()
    with pytest.raises(RuntimeError, match="closed"):
        d.submit(["q"], topk=1)


def test_http_reload_swaps_index_live(setup, tmp_path):
    """POST /reload: the daemon picks up an --append-grown index without a
    restart; a reload that fails (wrong-checkpoint index) keeps the old
    corpus serving and returns 409."""
    import http.client
    import json
    import threading

    from cli.serve import make_server

    cfg, ds, params, full = setup
    tok = _StubTokenizer()
    have = [str(v) for v in full["video_ids"]]
    half_ids = set(have[:len(have) // 2])

    loader = BatchLoader(ds, 8, shuffle=False, drop_last=False, workers=0,
                         pad_to_batch=True)
    half = serving.build_video_index(params, cfg, loader, dataset=ds,
                                     skip_ids=set(have) - half_ids)
    path = str(tmp_path / "live.npz")
    serving.save_index(path, half)

    current = {"path": path}

    def reload_fn():
        idx = serving.load_index(current["path"])
        return serving.Searcher(params, cfg, idx, tok, query_batch=4)

    searcher = serving.Searcher(params, cfg, serving.load_index(path), tok,
                                query_batch=4)
    dispatcher = serving.BatchingDispatcher(searcher, max_wait_ms=1.0)
    server = make_server(searcher, "127.0.0.1", 0, default_topk=3,
                         dispatcher=dispatcher, reload_fn=reload_fn)
    host, port = server.server_address
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def request(method, p, body=None):
        conn = http.client.HTTPConnection(host, port, timeout=60)
        conn.request(method, p, json.dumps(body) if body else None,
                     {"Content-Type": "application/json"} if body else {})
        resp = conn.getresponse()
        out = resp.status, json.loads(resp.read().decode())
        conn.close()
        return out

    try:
        status, health = request("GET", "/healthz")
        assert status == 200 and health["videos"] == len(half_ids)

        # grow the on-disk index (the --append flow) and reload
        serving.save_index(path, full)
        status, out = request("POST", "/reload")
        assert status == 200 and out["videos"] == len(have)
        status, health = request("GET", "/healthz")
        assert health["videos"] == len(have)
        # searches now rank over the full corpus (through the dispatcher)
        status, out = request("POST", "/search",
                              {"queries": ["some caption"], "topk": len(have)})
        assert status == 200
        got_ids = {h["video_id"] for h in out["results"][0]}
        assert got_ids == set(have)

        # a wrong-checkpoint index on disk: reload fails, old corpus serves
        import jax
        from neighborretr_tpu.models import neighborretr as model
        other = model.init_params(jax.random.PRNGKey(9), cfg.model)
        bad = dict(full)
        bad["meta"] = np.frombuffer(json.dumps(
            serving._config_meta(cfg, other)).encode(), dtype=np.uint8)
        serving.save_index(path, bad)
        status, out = request("POST", "/reload")
        assert status == 409 and "reload failed" in out["error"]
        status, health = request("GET", "/healthz")
        assert health["videos"] == len(have)     # old searcher intact
    finally:
        server.shutdown()
        server.server_close()
        dispatcher.close()


def test_staged_device_put_matches_monolithic():
    """Row-slabbed H2D (the live-reload path) reproduces the array exactly,
    including non-divisible row counts (overlap tail) and tiny inputs."""
    rng = np.random.default_rng(0)
    for n, rows in ((37, 8), (16, 16), (5, 64), (24, 7), (3, 0)):
        a = rng.normal(size=(n, 4, 6)).astype(np.float16)
        out = np.asarray(serving.staged_device_put(a, rows))
        np.testing.assert_array_equal(out, a)


def test_searcher_staged_upload_scores_identical(setup):
    """Searcher(staged_upload_rows=...) must serve byte-identical
    similarities to the monolithic-upload Searcher, fp16 and int8 indexes
    alike (the reload path swaps in a staged instance)."""
    cfg, ds, params, index = setup
    tok = _StubTokenizer()
    q8 = dict(index)
    q8["v_feat"], q8["v_scale"] = serving.quantize_features(
        np.asarray(index["v_feat"], np.float32))
    for idx in (index, q8):
        base = serving.Searcher(params, cfg, idx, tok, query_batch=4)
        staged = serving.Searcher(params, cfg, idx, tok, query_batch=4,
                                  staged_upload_rows=3)
        queries = ["a dog clip", "another caption"]
        np.testing.assert_array_equal(base.similarities(queries),
                                      staged.similarities(queries))
