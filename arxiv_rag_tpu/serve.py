"""HTTP query service — the production serving surface.

SURVEY §7 layer 6 ("a thin query API"). stdlib-only (http.server) by
design: zero new dependencies, one process, the TPU engine underneath.
Endpoints:

- ``POST /search``  body: {"queries": [str], "k": int?,
  "categories": [str]?, "hybrid_alpha": float?} → {"results": [[hit]]}
- ``GET /healthz``  → {"status": "ok", "rows": N, "dim": D, ...}
- ``GET /metrics``  → the METRICS counters/timers snapshot

Search requests serialize through a lock: the engine's device state is
single-stream and the TPU executes one program at a time anyway —
batching belongs in the client's ``queries`` list (32-query batches are
the benchmarked sweet spot), not in server-side fan-out.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from arxiv_rag_tpu.logging_utils import METRICS, get_logger

log = get_logger("serve")


def make_handler(engine, index_stats: dict):
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # route through our logger
            log.debug("http: " + fmt, *args)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok", **index_stats})
            elif self.path == "/metrics":
                self._reply(200, METRICS.snapshot())
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/search":
                self._reply(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                queries = req.get("queries") or []
                if not isinstance(queries, list) or not all(
                    isinstance(q, str) for q in queries
                ):
                    raise ValueError("queries must be a list of strings")
                if not queries:
                    self._reply(200, {"results": []})
                    return
                k = int(req.get("k", 10))
                categories = req.get("categories")
                alpha = req.get("hybrid_alpha")
                with lock:
                    results = engine.search(
                        queries, k=k, categories=categories, hybrid_alpha=alpha
                    )
                self._reply(
                    200,
                    {
                        "results": [
                            [
                                {
                                    "score": h.score,
                                    "row": h.row,
                                    "chunk_id": h.chunk_id,
                                    "paper_id": h.paper_id,
                                    "category": h.category,
                                    "section": h.section,
                                    "page": h.page,
                                    "text": h.text[:1000],
                                    **({"dense_score": h.extras["dense_score"]}
                                       if "dense_score" in h.extras else {}),
                                }
                                for h in hits
                            ]
                            for hits in results
                        ]
                    },
                )
            except (ValueError, KeyError, json.JSONDecodeError) as exc:
                self._reply(400, {"error": str(exc)})
            except Exception as exc:  # noqa: BLE001 — serving must not die
                log.error("search failed: %s", exc)
                self._reply(500, {"error": f"{type(exc).__name__}: {exc}"})

    return Handler


def serve(engine, host: str = "127.0.0.1", port: int = 8080, index_stats: dict | None = None):
    """Blocking serve loop. Returns the server object when used with
    ``serve_in_thread`` for tests."""
    stats = index_stats or {}
    httpd = ThreadingHTTPServer((host, port), make_handler(engine, stats))
    log.info("serving on http://%s:%d", host, port)
    return httpd


def serve_in_thread(engine, host: str = "127.0.0.1", port: int = 0, index_stats: dict | None = None):
    """Start in a daemon thread (tests / embedding into other apps).
    Returns (server, thread); server.server_address has the bound port."""
    httpd = serve(engine, host, port, index_stats)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    return httpd, thread
