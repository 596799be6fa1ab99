"""HTTP request-serving front end (SURVEY §3.3, reference
src/runtime/functions/source/request_source.rs:33-67 — an axum server that
turns POST JSON into a request batch, routes it through the request-mode
dataflow, and answers from the paired request sink).

Spark-first restatement: a stdlib ``http.server`` wrapper over
``FeatureService``. Each POST body is one request batch; the handler runs
the point-in-time lookup DataFrame job and returns the feature rows as
JSON. No new dependencies; the server runs on a daemon thread so tests and
notebooks can start/stop it inline.

POST /features
  {"requests": [{"request_id": 1, "<key>": ..., "<ts>": "ISO-8601 or epoch-ms"}, ...]}
→ 200 {"features": [{"request_id": 1, ...aggregates...}, ...]}

Latency: one Spark job per batch (the reference likewise pays one dataflow
traversal per request batch; its request_timeout_ms maps to the HTTP
client's timeout). Sub-ms single-row serving is out of scope (SURVEY §2.10)
— point-in-time correctness is the contract, asserted equal to
``point_in_time_lookup`` in tests/test_serving_http.py.
"""

from __future__ import annotations

import json
import threading
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from volga_spark.operators.request import FeatureService


def _parse_ts(v):
    """Accept ISO-8601 strings or epoch millis; return naive-UTC datetime
    (matches the parquet timestamp columns, which are timezone-less)."""
    if isinstance(v, (int, float)):
        return datetime.fromtimestamp(v / 1000.0, tz=timezone.utc).replace(tzinfo=None)
    dt = datetime.fromisoformat(str(v))
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def _jsonable(v):
    if isinstance(v, datetime):
        return v.isoformat()
    return v


class FeatureServer:
    """Serve a FeatureService over HTTP on localhost:port (0 = ephemeral)."""

    def __init__(self, spark, service: FeatureService, port: int = 0):
        self.spark = spark
        self.service = service
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test runs
                pass

            def do_POST(self) -> None:
                if self.path.rstrip("/") != "/features":
                    self.send_error(404)
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    body = json.loads(self.rfile.read(n) or b"{}")
                    reqs = body["requests"]
                    # point-in-time services take (keys, ts); latest-value
                    # services (OnlineStore) declare their own request
                    # columns without a timestamp
                    cols = getattr(outer.service, "request_columns", None) or [
                        "request_id",
                        *outer.service.key_cols,
                        outer.service.ts_col,
                    ]
                    ts_col = getattr(outer.service, "ts_col", None)
                    points = [
                        tuple(
                            _parse_ts(r[c]) if c == ts_col and c in r else r[c]
                            for c in cols
                        )
                        for r in reqs
                    ]
                    rows = outer.service.get_features(outer.spark, points)
                    payload = json.dumps(
                        {"features": [{k: _jsonable(v) for k, v in r.items()} for r in rows]}
                    ).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(payload)))
                    self.end_headers()
                    self.wfile.write(payload)
                except (KeyError, ValueError, json.JSONDecodeError) as ex:
                    msg = json.dumps({"error": str(ex)}).encode()
                    self.send_response(400)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(msg)))
                    self.end_headers()
                    self.wfile.write(msg)

        self._httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self) -> "FeatureServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)

    def __enter__(self) -> "FeatureServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
