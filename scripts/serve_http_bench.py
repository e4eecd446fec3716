"""End-to-end HTTP serving throughput on the real chip: the full daemon
path (socket → JSON → BPE tokenize → text tower → corpus scoring → top-k →
JSON) against a 10k-video index, vs the raw Searcher call.

Complements scripts/serve_bench.py, which times ONLY the device scoring
stage (no tokenizer, no text encode, no HTTP).
"""
import json
import sys
import threading
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))
from neighborretr_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

from neighborretr_tpu import serving  # noqa: E402
from neighborretr_tpu.core.config import Config, ModelConfig  # noqa: E402
from neighborretr_tpu.data.tokenizer import ClipTokenizer  # noqa: E402
from neighborretr_tpu.models import neighborretr as model  # noqa: E402
from cli.serve import make_server  # noqa: E402

N_VIDEOS, Q, REPS = 10_000, 64, 10
WORDS = ("man woman dog cat car street beach kitchen playing running "
         "cooking singing jumping red blue small large fast slow night").split()


def main():
    print("device:", jax.devices()[0], flush=True)
    cfg = Config(model=ModelConfig())
    params = model.init_params(jax.random.PRNGKey(0), cfg.model)
    rng = np.random.default_rng(0)
    F, E = cfg.model.max_frames, cfg.model.clip.embed_dim

    index = {
        "video_ids": np.asarray([f"video{i}" for i in range(N_VIDEOS)]),
        "v_feat": rng.normal(size=(N_VIDEOS, F, E)).astype(np.float16),
        "v_mask": np.ones((N_VIDEOS, F), np.float32),
        "meta": np.frombuffer(json.dumps(
            serving._config_meta(cfg, params)).encode(), dtype=np.uint8),
    }
    queries = [" ".join(rng.choice(WORDS, size=8)) for _ in range(Q)]

    searcher = serving.Searcher(params, cfg, index, ClipTokenizer(),
                                query_batch=Q)
    searcher.warmup()
    searcher.search(queries, topk=5)             # pay the Q-bucket compile

    tic = time.perf_counter()
    for _ in range(REPS):
        searcher.search(queries, topk=5)
    direct = (time.perf_counter() - tic) / REPS
    print(f"direct Searcher.search: {Q} queries in {direct * 1e3:.1f} ms "
          f"({Q / direct:.0f} queries/s)", flush=True)

    server = make_server(searcher, "127.0.0.1", 0, default_topk=5)
    host, port = server.server_address
    threading.Thread(target=server.serve_forever, daemon=True).start()
    import http.client
    body = json.dumps({"queries": queries, "topk": 5})

    def post():
        conn = http.client.HTTPConnection(host, port, timeout=120)
        conn.request("POST", "/search", body,
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        out = json.loads(resp.read().decode())
        conn.close()
        assert resp.status == 200 and len(out["results"]) == Q

    post()                                        # warm connection path
    tic = time.perf_counter()
    for _ in range(REPS):
        post()
    http_t = (time.perf_counter() - tic) / REPS
    print(f"HTTP POST /search:      {Q} queries in {http_t * 1e3:.1f} ms "
          f"({Q / http_t:.0f} queries/s; +{(http_t - direct) * 1e3:.1f} ms "
          f"HTTP/JSON overhead)", flush=True)
    server.shutdown()
    server.server_close()

    # --- many concurrent SINGLE-query clients: lock-serialized vs dynamic
    # batching across the batch-window sweep — an SLO needs TAILS, so each
    # request's end-to-end latency is recorded and p50/p95/p99 reported ---
    def run_concurrent(dispatcher, tag, reps=3):
        server = make_server(searcher, "127.0.0.1", 0, default_topk=5,
                             dispatcher=dispatcher)
        host, port = server.server_address
        threading.Thread(target=server.serve_forever, daemon=True).start()

        failures = []
        lat_ms = []
        lat_lock = threading.Lock()

        def one(i, record=True):
            try:
                t0 = time.perf_counter()
                conn = http.client.HTTPConnection(host, port, timeout=300)
                conn.request("POST", "/search",
                             json.dumps({"queries": [queries[i % Q]],
                                         "topk": 5}),
                             {"Content-Type": "application/json"})
                resp = conn.getresponse()
                resp.read()
                conn.close()
                assert resp.status == 200
                if record:
                    with lat_lock:
                        lat_ms.append((time.perf_counter() - t0) * 1e3)
            except Exception as exc:  # count, don't silently shorten the run
                failures.append(f"{type(exc).__name__}: {exc}")

        one(0, record=False)                      # warm
        n_clients = Q
        tic = time.perf_counter()
        for _ in range(reps):                     # reps×Q samples for p99
            threads = [threading.Thread(target=one, args=(i,))
                       for i in range(n_clients)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
        dt = (time.perf_counter() - tic) / reps
        extra = (f"; {dispatcher.batches} device calls for "
                 f"{dispatcher.requests} requests" if dispatcher else "")
        fail = f"; {len(failures)} FAILED ({failures[0]})" if failures else ""
        p50, p95, p99 = np.percentile(lat_ms, [50, 95, 99])
        print(f"{tag}: {n_clients} concurrent 1-query clients  "
              f"{n_clients / dt:6.0f} q/s  p50 {p50:6.1f}  p95 {p95:6.1f}  "
              f"p99 {p99:6.1f} ms{extra}{fail}", flush=True)
        server.shutdown()
        server.server_close()
        if dispatcher is not None:
            dispatcher.close()
        return n_clients / dt, p50, p95, p99

    # SLO protocol (VERDICT r3 #7): the lock-serialized run is the same-day
    # CONTROL; every configuration is also reported as a ratio to it so the
    # table stays comparable across sessions whose absolute tunnel speed
    # differs (round-2 vs round-3 swung 3x).
    ctrl_qs, ctrl_p50, ctrl_p95, ctrl_p99 = run_concurrent(
        None, "lock-serialized ")
    rows = []
    for window in (0.0, 1.0, 2.0, 5.0, 10.0):
        qs, p50, p95, p99 = run_concurrent(
            serving.BatchingDispatcher(searcher, max_wait_ms=window),
            f"batch window {window:4.1f}ms")
        rows.append((window, qs, p99))
    print("\n# control-normalized (x lock-serialized): "
          + "  ".join(f"w{w:g}ms {qs / ctrl_qs:.1f}x q/s, "
                      f"p99 {p99 / ctrl_p99:.3f}x" for w, qs, p99 in rows),
          flush=True)

    # --- concurrent RELOAD under load: p99 of a burst that spans a live
    # POST /reload of the full 10k index (the hot-swap tail cost as a
    # number, not a claim) ---
    import os
    import tempfile
    idx_path = os.path.join(tempfile.mkdtemp(), "reload_index.npz")
    np.savez(idx_path, **index)

    # RELOAD_STAGE_ROWS env: 0 = monolithic corpus device_put, N = slabbed
    # staged upload (see serving.staged_device_put) — the A/B knob for the
    # reload-under-load leg
    stage_rows = int(os.environ.get("RELOAD_STAGE_ROWS", "512"))

    def reload_fn():
        # mirrors cli/serve.py: fresh Searcher from disk, compiles pre-paid
        # BEFORE the swap so requests never stall behind program builds
        fresh = serving.Searcher(params, cfg, serving.load_index(idx_path),
                                 ClipTokenizer(), query_batch=Q,
                                 staged_upload_rows=stage_rows)
        fresh.warmup()
        fresh.search(["warmup"], topk=5)
        return fresh

    disp = serving.BatchingDispatcher(searcher, max_wait_ms=2.0)
    server = make_server(searcher, "127.0.0.1", 0, default_topk=5,
                         dispatcher=disp, reload_fn=reload_fn)
    host, port = server.server_address
    threading.Thread(target=server.serve_forever, daemon=True).start()
    lat_ms, failures = [], []
    lat_lock = threading.Lock()

    def one(i):
        try:
            t0 = time.perf_counter()
            conn = http.client.HTTPConnection(host, port, timeout=300)
            conn.request("POST", "/search",
                         json.dumps({"queries": [queries[i % Q]],
                                     "topk": 5}),
                         {"Content-Type": "application/json"})
            resp = conn.getresponse()
            resp.read()
            conn.close()
            assert resp.status == 200
            with lat_lock:
                lat_ms.append((time.perf_counter() - t0) * 1e3)
        except Exception as exc:
            failures.append(f"{type(exc).__name__}: {exc}")

    def reload_once():
        conn = http.client.HTTPConnection(host, port, timeout=600)
        conn.request("POST", "/reload", "{}",
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        resp.read()
        conn.close()
        return resp.status

    one(0)                                       # warm
    lat_ms.clear()
    tic = time.perf_counter()
    reload_status = [None]
    threads = [threading.Thread(target=one, args=(i,)) for i in range(2 * Q)]
    rel = threading.Thread(
        target=lambda: reload_status.__setitem__(0, reload_once()))
    for t in threads[:Q]:
        t.start()
    rel.start()                                  # reload mid-burst
    for t in threads[Q:]:
        t.start()
    for t in threads:
        t.join()
    rel.join()
    dt = time.perf_counter() - tic
    p50, p95, p99 = np.percentile(lat_ms, [50, 95, 99])
    fail = f"; {len(failures)} FAILED ({failures[0]})" if failures else ""
    print(f"reload-under-load: {2 * Q} clients + live /reload "
          f"(status {reload_status[0]}) in {dt:.2f}s  "
          f"{2 * Q / dt:6.0f} q/s  p50 {p50:6.1f}  p95 {p95:6.1f}  "
          f"p99 {p99:6.1f} ms  (x{p99 / ctrl_p99:.3f} control p99){fail}",
          flush=True)
    server.shutdown()
    server.server_close()
    disp.close()


if __name__ == "__main__":
    main()
