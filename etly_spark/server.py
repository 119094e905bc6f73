"""Management HTTP API (reference C2: server.go:54-110) on stdlib http.

Routes (same paths, JSON responses):
    GET  /etly/status          overall status + recent tasks
    GET  /etly/tasks?status=S  filter by status
    GET  /etly/tasks/{ids}     comma-separated task ids
    GET  /etly/tasklist/?limit=N   (limit is a COUNT — the reference's
                               end-index quirk, service.go:147-152, is
                               deliberately not reproduced)
    GET  /etly/errors          tasks that errored
    GET  /etly/info/{name}     transfer's meta ledger, re-read from storage
    GET  /etly/rollup/{name}   current incremental-rollup aggregate (Spark
                               extension — Transfer.Rollup state as rows)
    GET  /etly/version
    POST /etly/transferOnce    {"Async": bool, "Transfers": [spec, ...]}

    POST /etly/transfer        {"TaskID": s, "SourceURL": s, "Transfer": spec}
                               — the reference's per-object worker RPC
                               (transfer_object_service.go:15-33). Spark's
                               cluster manager owns distribution (SURVEY
                               P4), so this is not a scatter target here;
                               it transfers ONE object through the full
                               chain (counts only, no meta write) — the
                               API-surface superset + on-demand reprocess.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from etly_spark.config import Transfer, transfer_from_dict
from etly_spark.service import Service, VERSION


def make_handler(service: Service):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        # ------------------------------------------------------------ #

        def _json(self, obj, code: int = 200) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:  # noqa: N802
            url = urlparse(self.path)
            path = url.path.rstrip("/")
            q = parse_qs(url.query)
            try:
                if path == "/etly/status":
                    return self._json(service.status())
                if path == "/etly/version":
                    return self._json({"version": VERSION})
                if path == "/etly/errors":
                    return self._json({"tasks": service.errors()})
                if path == "/etly/tasklist":
                    limit = int(q.get("limit", ["0"])[0])
                    return self._json(
                        {"tasks": [t.to_dict() for t in service.registry.tasks(limit=limit)]}
                    )
                if path == "/etly/tasks":
                    status = q.get("status", [None])[0]
                    return self._json(
                        {"tasks": [t.to_dict() for t in service.registry.tasks(status=status)]}
                    )
                m = re.match(r"^/etly/tasks/(.+)$", path)
                if m:
                    ids = m.group(1).split(",")
                    return self._json({"tasks": [t.to_dict() for t in service.registry.get(ids)]})
                m = re.match(r"^/etly/info/(.+)$", path)
                if m:
                    return self._json(service.info(m.group(1)))
                m = re.match(r"^/etly/rollup/(.+)$", path)
                if m:
                    return self._json(service.rollup(m.group(1)))
                return self._json({"error": "not found"}, 404)
            except KeyError as e:
                return self._json({"error": str(e)}, 404)
            except Exception as e:
                return self._json({"error": str(e)}, 500)

        def do_POST(self) -> None:  # noqa: N802
            path = urlparse(self.path).path.rstrip("/")
            try:
                n = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(n) or b"{}")
                if path == "/etly/transferOnce":
                    transfers: list[Transfer] | None = None
                    if payload.get("Transfers"):
                        transfers = [transfer_from_dict(d) for d in payload["Transfers"]]
                    tasks = service.transfer_once(
                        transfers, async_=bool(payload.get("Async"))
                    )
                    return self._json(
                        {"status": "ok", "tasks": [t.to_dict() for t in tasks]}
                    )
                if path == "/etly/transfer":
                    # worker RPC (server.go:91-96): one object, full chain
                    t = transfer_from_dict(payload.get("Transfer") or {})
                    resp = service.engine.run_object(t, payload.get("SourceURL", ""))
                    return self._json(
                        {
                            "ProcessedTransfers": [
                                {
                                    "RecordProcessed": resp["RecordProcessed"],
                                    "RecordSkipped": resp["RecordSkipped"],
                                    "RecordErrors": resp["RecordErrors"],
                                    "Error": resp["Error"],
                                }
                            ],
                            "RecordProcessed": resp["RecordProcessed"],
                            "RecordSkipped": resp["RecordSkipped"],
                            "Error": resp["Error"],
                        }
                    )
                return self._json({"error": "not found"}, 404)
            except Exception as e:
                return self._json({"error": str(e), "status": "error"}, 500)

    return Handler


class Server:
    """server.go:20-48 equivalent: HTTP mux + scheduler lifecycle."""

    def __init__(self, service: Service, port: int = 0, host: str = "127.0.0.1"):
        self.service = service
        self._httpd = ThreadingHTTPServer((host, port), make_handler(service))
        self.port = self._httpd.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self, scheduler: bool = True) -> None:
        if scheduler:
            self.service.start()
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="etly-http", daemon=True
        )
        self._thread.start()

    def stop(self) -> None:
        self.service.stop()
        self._httpd.shutdown()
        if self._thread:
            self._thread.join(timeout=5)
