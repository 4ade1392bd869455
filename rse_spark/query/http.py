"""HTTP search endpoint over the serving tier (R9 parity).

GSE registers ``GET /search`` returning a JSON result page
(reference crawler/src/api/main.go:207-240, CompletePage main.go:34-46)
with 400 on a missing/empty query (main.go:210-214). Same surface here,
stdlib ``ThreadingHTTPServer`` wrapping DirectSearcher (query/serve.py:
pyarrow + numpy over the index segment files — ~25ms p50, no Spark job
per request). Serving-tier position: one stateless replica per process
over shared segment storage; scale out horizontally behind any LB.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from rse_spark.query.serve import DirectSearcher


def _make_handler(searcher: DirectSearcher):
    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:  # noqa: N802 — http.server API
            u = urlparse(self.path)
            if u.path != "/search":
                self._json(404, {"error": "not found"})
                return
            qs = parse_qs(u.query)
            q = (qs.get("q") or [""])[0]
            if not q.strip():
                # GSE: empty query -> http.Error 400 (main.go:210-214)
                self._json(400, {"error": "missing query parameter q"})
                return
            try:
                k = int((qs.get("k") or ["10"])[0])
                mode = (qs.get("mode") or ["or"])[0]
                if mode not in ("or", "and"):
                    raise ValueError(mode)
            except ValueError:
                self._json(400, {"error": "bad k/mode parameter"})
                return
            hits = searcher.search(q, k=k, mode=mode)
            self._json(
                200,
                {
                    "query": q,
                    "k": k,
                    "mode": mode,
                    "n_results": len(hits),
                    "results": [
                        {
                            "doc_id": int(d),
                            "score": round(float(s), 6),
                            "n_terms_matched": int(m),
                        }
                        for d, s, m in hits
                    ],
                },
            )

        def log_message(self, *args) -> None:  # quiet test output
            pass

    return Handler


class SearchServer:
    """Lifecycle wrapper: start()/stop() around ThreadingHTTPServer."""

    def __init__(self, index_root: str, analyzer: str = "code",
                 host: str = "127.0.0.1", port: int = 0):
        self.searcher = DirectSearcher(index_root, analyzer=analyzer)
        self.httpd = ThreadingHTTPServer(
            (host, port), _make_handler(self.searcher)
        )
        self._thread: threading.Thread | None = None

    @property
    def address(self) -> str:
        host, port = self.httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "SearchServer":
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)
