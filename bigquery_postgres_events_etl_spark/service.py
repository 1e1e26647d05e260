"""Status/trigger HTTP service — mirror of the reference's Flask
control plane (flask_server.py:233-274) with zero extra dependencies
(stdlib wsgiref; the reference's Flask isn't guaranteed here).

Endpoints (same paths/shapes):
- GET /         service descriptor
- GET /health   {"status": "healthy", "timestamp": ...}
- GET /status   last run record + current watermark (raw µs + ISO)
- POST /trigger synchronous run; 409 if one is in flight (ST5 — the
  runner holds a real lock, fixing the reference's racy flag)
"""

from __future__ import annotations

import datetime
import json
import threading
from wsgiref.simple_server import make_server

from .sources.watermark import read_watermark_us


class EtlService:
    def __init__(self, spark, source_dir: str, state_path: str, target_path: str):
        self.spark = spark
        self.source_dir = source_dir
        self.state_path = state_path
        self.target_path = target_path
        self.last_result: dict | None = None
        self._lock = threading.Lock()

    # -- handlers ------------------------------------------------------
    def descriptor(self) -> dict:
        return {
            "service": "bq-pg-events-etl-spark",
            "endpoints": ["/", "/health", "/status", "/trigger"],
        }

    def health(self) -> dict:
        return {
            "status": "healthy",
            "timestamp": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        }

    def status(self) -> dict:
        wm = read_watermark_us(self.state_path)
        return {
            "last_result": self.last_result,
            "last_timestamp": wm,
            "last_timestamp_iso": datetime.datetime.fromtimestamp(
                wm / 1_000_000, datetime.timezone.utc
            ).isoformat(),
        }

    def trigger(self) -> tuple[int, dict]:
        from .streaming.incremental import run_incremental_etl

        if not self._lock.acquire(blocking=False):
            return 409, {"status": "already_running"}
        try:
            self.last_result = run_incremental_etl(
                self.spark, self.source_dir, self.state_path, self.target_path
            )
            return 200, {"status": "triggered", "result": self.last_result}
        finally:
            self._lock.release()

    # -- WSGI ----------------------------------------------------------
    def wsgi_app(self, environ, start_response):
        path = environ.get("PATH_INFO", "/")
        method = environ.get("REQUEST_METHOD", "GET")
        if path == "/" and method == "GET":
            code, body = 200, self.descriptor()
        elif path == "/health" and method == "GET":
            code, body = 200, self.health()
        elif path == "/status" and method == "GET":
            code, body = 200, self.status()
        elif path == "/trigger" and method == "POST":
            code, body = self.trigger()
        else:
            code, body = 404, {"error": "not found"}
        payload = json.dumps(body).encode()
        start_response(
            f"{code} {'OK' if code == 200 else 'ERROR'}",
            [("Content-Type", "application/json"), ("Content-Length", str(len(payload)))],
        )
        return [payload]

    def serve(self, port: int = 8080):  # pragma: no cover — manual entry
        with make_server("", port, self.wsgi_app) as httpd:
            httpd.serve_forever()
