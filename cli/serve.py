"""HTTP retrieval service over a precomputed video index (cli/index.py).

    python -m cli.serve --index msrvtt_index.npz \
        --checkpoint outputs/msrvtt/best.npz --port 8080

The daemon form of cli/search.py: model weights and the corpus features
stay resident on device, the query path is compiled once at startup
(serving.Searcher), and every request reuses it — no per-process JAX
init, no per-query index upload.  The reference ships no deployment path
at all (SURVEY §2).

JSON API (stdlib http.server, threaded):
  GET  /healthz                     → {"status":"ok","videos":N,...}
  GET  /search?q=<text>[&topk=K]    → single-query convenience
  POST /search  {"queries": ["..."], "topk": K}
Response: {"results": [[{"video_id": id, "score": s}, ...], ...]}
Errors are JSON with HTTP 400/404/413.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# cheap import (pure dataclasses): single source for the backbone menu
from neighborretr_tpu.core.config import ClipConfig as _ClipConfig
_BACKBONE_CHOICES = _ClipConfig.backbone_names()

MAX_QUERIES_PER_REQUEST = 256
MAX_BODY_BYTES = 1 << 20  # 1 MiB of JSON is already ~4k captions


def make_handler(searcher, default_topk: int = 5, logger=None,
                 dispatcher=None, reload_fn=None):
    """Handler class closed over a serving.Searcher.

    Without a dispatcher, requests serialize through one lock: device
    dispatch is thread-safe, but serializing keeps host-side result memory
    bounded and gives each request the full chip instead of interleaving
    compiled programs.  With a `serving.BatchingDispatcher`, concurrent
    requests coalesce into one device call instead (same results — scores
    are per-query independent).

    reload_fn (optional): builds a FRESH Searcher from the current on-disk
    index; POST /reload swaps it in live (the hot-reload leg of
    `cli/index.py --append` — corpus growth without a daemon restart).
    A failed reload (e.g. the index was rebuilt with a different
    checkpoint) keeps the old searcher serving and returns the error."""
    lock = threading.Lock()
    reload_lock = threading.Lock()   # serializes reloads; never blocks search
    state = {"searcher": searcher}

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _error(self, code: int, message: str) -> None:
            self._reply(code, {"error": message})

        def _run_search(self, queries, topk) -> None:
            if not isinstance(queries, list) or not queries or \
                    not all(isinstance(q, str) for q in queries):
                return self._error(400, "queries must be a non-empty "
                                        "list of strings")
            if len(queries) > MAX_QUERIES_PER_REQUEST:
                return self._error(413, f"at most {MAX_QUERIES_PER_REQUEST} "
                                        "queries per request")
            try:
                topk = int(topk)
            except (TypeError, ValueError):
                return self._error(400, "topk must be an integer")
            if topk < 1:
                return self._error(400, "topk must be >= 1")
            if dispatcher is not None:
                results = dispatcher.submit(queries, topk)
            else:
                with lock:
                    results = state["searcher"].search(queries, topk=topk)
            self._reply(200, {"results": [
                [{"video_id": vid, "score": score} for vid, score in hits]
                for hits in results]})

        def do_GET(self):  # noqa: N802 (http.server contract)
            url = urlparse(self.path)
            if url.path == "/healthz":
                s = state["searcher"]
                return self._reply(200, {
                    "status": "ok", "videos": len(s),
                    "query_batch": s.query_batch})
            if url.path == "/search":
                q = parse_qs(url.query)
                queries = q.get("q")
                topk = q.get("topk", [default_topk])[-1]
                if not queries:
                    return self._error(400, "missing q= query parameter")
                return self._run_search(queries, topk)
            self._error(404, f"unknown path {url.path!r}; use /healthz "
                             "or /search")

        def _drain(self, length: int) -> None:
            """Consume an unread request body so a keep-alive connection
            stays in sync after an early-exit reply."""
            while length > 0:
                chunk = self.rfile.read(min(length, 1 << 16))
                if not chunk:
                    break
                length -= len(chunk)

        def do_POST(self):  # noqa: N802
            try:
                length = int(self.headers.get("Content-Length") or 0)
            except ValueError:
                self.close_connection = True    # cannot locate the body end
                return self._error(400, "invalid Content-Length header")
            if length < 0:
                self.close_connection = True
                return self._error(400, "invalid Content-Length header")
            path = urlparse(self.path).path
            if path == "/reload":
                if length > MAX_BODY_BYTES:   # /reload takes no body; a huge
                    self.close_connection = True   # one is the same DoS the
                    return self._error(413, "request body too large")  # /search cap refuses
                self._drain(length)
                if reload_fn is None:
                    return self._error(404, "reload not configured")
                try:
                    # build + warm the fresh Searcher OUTSIDE the request
                    # lock (index load + compiles can take tens of seconds;
                    # searches keep flowing on the old corpus meanwhile);
                    # only the swap itself takes the lock
                    with reload_lock:
                        fresh = reload_fn()
                        with lock:
                            state["searcher"] = fresh
                            if dispatcher is not None:
                                dispatcher.searcher = fresh
                except Exception as exc:
                    # the old searcher keeps serving
                    return self._error(409, f"reload failed: {exc}")
                return self._reply(200, {"status": "reloaded",
                                         "videos": len(state["searcher"])})
            if path != "/search":
                self._drain(length)
                return self._error(404, "POST /search or /reload only")
            if length > MAX_BODY_BYTES:
                # draining an arbitrarily large body is a DoS vector;
                # close instead of resyncing
                self.close_connection = True
                return self._error(413, "request body too large")
            try:
                body = json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError as e:
                return self._error(400, f"invalid JSON: {e}")
            if not isinstance(body, dict):
                return self._error(400, "body must be a JSON object")
            self._run_search(body.get("queries"),
                             body.get("topk", default_topk))

        def log_message(self, fmt, *args):
            if logger is not None:
                logger.info("%s %s", self.address_string(), fmt % args)

    return Handler


class _Server(ThreadingHTTPServer):
    # the stdlib default listen backlog (5) resets connections under a
    # concurrent-client burst — exactly the pattern dynamic batching serves
    request_queue_size = 128


def make_server(searcher, host: str = "127.0.0.1", port: int = 0,
                default_topk: int = 5, logger=None,
                dispatcher=None, reload_fn=None) -> ThreadingHTTPServer:
    """Bound-but-not-serving HTTP server (tests drive it on port 0)."""
    return _Server(
        (host, port),
        make_handler(searcher, default_topk, logger, dispatcher=dispatcher,
                     reload_fn=reload_fn))


def main():
    p = argparse.ArgumentParser(description="Video retrieval HTTP service")
    p.add_argument("--index", required=True, help="index .npz from cli/index.py")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--topk", type=int, default=5, help="default result count")
    p.add_argument("--query_batch", type=int, default=8,
                   help="compile bucket: request batches pad up to a "
                        "multiple of this (one compiled program per bucket)")
    p.add_argument("--batch_window_ms", type=float, default=2.0,
                   help="dynamic batching: coalesce concurrent requests "
                        "arriving within this window into one device call "
                        "(identical results; a lone request pays at most "
                        "the window). 0 disables")
    p.add_argument("--max_merged_queries", type=int, default=None,
                   help="cap on the merged query count per device call "
                        "(default: 8x query_batch, min 64)")
    p.add_argument("--num_devices", type=int, default=1,
                   help="shard the corpus features over this many devices "
                        "(row-sharded mesh; for indexes that outgrow one "
                        "chip's HBM). 1 = single device")
    p.add_argument("--tiny", action="store_true",
                   help="tiny towers (index built from a --tiny run)")
    p.add_argument("--base_encoder", default="ViT-B/32",
                   choices=list(_BACKBONE_CHOICES))
    p.add_argument("--checkpoint", default=None,
                   help="best.npz / state_epochN.npz / reference best.pth")
    p.add_argument("--clip_checkpoint", default=None)
    p.add_argument("--max_words", type=int, default=24)
    p.add_argument("--num_hidden_layers", type=int, default=4,
                   help="temporal transformer depth (must match the "
                        "checkpoint; args_parser.py:137)")
    p.add_argument("--reload_stage_rows", type=int, default=512,
                   help="POST /reload uploads the fresh corpus in row slabs "
                        "of this size so in-flight searches interleave with "
                        "the transfer instead of queueing behind one "
                        "monolithic H2D (0 = single put)")
    args = p.parse_args()

    from neighborretr_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from neighborretr_tpu import serving
    from neighborretr_tpu.data.tokenizer import ClipTokenizer
    from neighborretr_tpu.utils.logging import setup_logger

    from cli.common import load_query_model

    logger = setup_logger()
    index = serving.load_index(args.index)
    cfg, params = load_query_model(args, index, logger)

    mesh = None
    if args.num_devices > 1:
        from neighborretr_tpu.parallel import mesh as pmesh
        mesh = pmesh.make_mesh(num_devices=args.num_devices)
        logger.info("Sharding the corpus over %d devices", args.num_devices)
    searcher = serving.Searcher(params, cfg, index, ClipTokenizer(),
                                query_batch=args.query_batch, mesh=mesh)
    logger.info("Index: %d videos; compiling the query path ...",
                len(searcher))
    searcher.warmup()
    dispatcher = None
    if args.batch_window_ms > 0:
        dispatcher = serving.BatchingDispatcher(
            searcher, max_batch=args.max_merged_queries,
            max_wait_ms=args.batch_window_ms)
        logger.info("Dynamic batching: window %.1f ms, up to %d merged "
                    "queries per device call", args.batch_window_ms,
                    dispatcher.max_batch)
        # pre-pay the merged-bucket compiles so the first burst doesn't
        # stall behind program builds (each bucket is a distinct program)
        for b in dispatcher.buckets:
            searcher.search(["warmup"] * b, topk=args.topk)
    def reload_fn():
        """POST /reload: re-read --index from disk (e.g. after cli/index.py
        --append grew it) and swap a fresh Searcher in live.  check_meta
        inside the Searcher rejects an index rebuilt with different
        weights/config — the old corpus keeps serving on failure."""
        fresh_index = serving.load_index(args.index)
        fresh = serving.Searcher(params, cfg, fresh_index, ClipTokenizer(),
                                 query_batch=args.query_batch, mesh=mesh,
                                 staged_upload_rows=args.reload_stage_rows)
        fresh.warmup()      # pay compiles before the swap, not on a request
        if dispatcher is not None:
            # a changed corpus size recompiles per merged bucket too —
            # pre-pay those like startup does, or the first post-reload
            # burst stalls behind program builds
            for b in dispatcher.buckets:
                fresh.search(["warmup"] * b, topk=args.topk)
        logger.info("Reloaded index: %d videos", len(fresh))
        return fresh

    server = make_server(searcher, args.host, args.port,
                         default_topk=args.topk, logger=logger,
                         dispatcher=dispatcher, reload_fn=reload_fn)
    logger.info("Serving on http://%s:%d (GET /healthz, GET|POST /search, "
                "POST /reload)", *server.server_address)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        logger.info("Shutting down")
    finally:
        server.server_close()
        if dispatcher is not None:
            dispatcher.close()


if __name__ == "__main__":
    main()
