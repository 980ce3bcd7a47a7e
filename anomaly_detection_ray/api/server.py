"""REST service for the validation engine — the reference API's endpoint
surface (/root/reference/api/src/component/router.py:35-223) re-expressed
over the Ray Data engine with the standard library only (FastAPI is not
installable in this environment; ``http.server.ThreadingHTTPServer``
carries the same routes).

Endpoint parity (same paths, same payload shapes, same status codes):
- GET    /configuration/{config_name}      -> config JSON
- GET    /available_configs                -> [{"name", "filename"}]
- POST   /detectors/create                 -> {"detector": {...}} (inactive)
- GET    /detectors                        -> [detector, ...]
- GET    /detectors/{id}                   -> detector
- GET    /detectors/{id}/parameters        -> anomaly_detection_conf
- POST   /detectors/{id}/detect_anomaly?timestamp=..&ftr_vector=..  -> 0|1
- PUT    /detectors/{id}/{status}          -> detector (active|inactive)
- PUT    /detectors/{id}                   -> detector (name/description)
- DELETE /detectors/{id}                   -> detector
- DELETE /detectors                        -> {"status": "OK"}
Engine extension (no reference equivalent — the distributed data plane):
- POST   /detectors/{id}/detect_file       {"data_path"} -> verdict counts

Errors use the reference's envelope (exceptions.py:create_exception_handlers):
``{"error": {"message", "status_code", "timestamp", "path", "traceback"}}``.

The service is a CONTROL plane: detector CRUD is sqlite-backed
(store.DetectorStore) and scoring delegates to the same
pipelines/config.run_reference_config chain the CLI runs, so an engine
user gets identical verdicts through HTTP, CLI, or library calls.
"""

from __future__ import annotations

import datetime
import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from . import scoring
from .store import ApiError, DetectorStore, available_configs, \
    detector_parameters, load_config

_DETECTOR_KEYS = ("id", "name", "description", "created_at", "updated_at",
                  "status", "config_name", "config")


def _public(det: dict) -> dict:
    return {k: det.get(k) for k in _DETECTOR_KEYS}


class _Handler(BaseHTTPRequestHandler):
    # injected by make_server via subclassing
    store: DetectorStore = None
    base_dir: str | None = None

    # ---- plumbing -------------------------------------------------------
    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _send(self, status: int, payload) -> None:
        body = json.dumps(payload).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _error(self, status: int, message: str) -> None:
        self._send(status, {"error": {
            "message": message,
            "status_code": status,
            "timestamp": datetime.datetime.now(
                datetime.timezone.utc).isoformat(),
            "path": self.path,
            "traceback": None,
        }})

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        if n == 0:
            return {}
        try:
            return json.loads(self.rfile.read(n))
        except json.JSONDecodeError:
            raise ApiError(400, "request body contains invalid JSON")

    def _route(self, method: str) -> None:
        u = urlparse(self.path)
        parts = [p for p in u.path.split("/") if p]
        q = parse_qs(u.query)
        try:
            self._dispatch(method, parts, q)
        except ApiError as e:
            self._error(e.status, e.message)
        except Exception as e:  # exceptions.py general handler -> 500
            self._error(500, str(e))

    # ---- routes ---------------------------------------------------------
    def _dispatch(self, method: str, parts: list[str], q: dict) -> None:
        st = self.store
        if method == "GET" and len(parts) == 2 \
                and parts[0] == "configuration":
            return self._send(200, load_config(st.config_dir, parts[1]))
        if method == "GET" and parts == ["available_configs"]:
            return self._send(200, available_configs(st.config_dir))
        if parts and parts[0] == "detectors":
            return self._detectors(method, parts[1:], q)
        raise ApiError(404, f"Route not found: {method} {self.path}")

    def _detectors(self, method: str, rest: list[str], q: dict) -> None:
        st = self.store
        if method == "POST" and rest == ["create"]:
            det = st.create(self._body())
            return self._send(200, {"detector": _public(det)})
        if method == "GET" and not rest:
            return self._send(200, [_public(d) for d in st.list()])
        if method == "DELETE" and not rest:
            st.delete_all()
            return self._send(200, {"status": "OK"})
        if not rest or not re.fullmatch(r"-?\d+", rest[0]):
            raise ApiError(404, f"Route not found: {method} {self.path}")
        did = int(rest[0])
        tail = rest[1:]
        if method == "GET" and not tail:
            return self._send(200, _public(st.get(did)))
        if method == "GET" and tail == ["parameters"]:
            return self._send(200, detector_parameters(st, did))
        if method == "DELETE" and not tail:
            return self._send(200, _public(st.delete(did)))
        if method == "PUT" and not tail:
            body = self._body()
            det = st.update(did, name=body.get("name"),
                            description=body.get("description"))
            return self._send(200, _public(det))
        if method == "PUT" and len(tail) == 1:
            return self._send(200, _public(st.set_status(did, tail[0])))
        if method == "POST" and tail == ["detect_anomaly"]:
            return self._detect(did, q)
        if method == "POST" and tail == ["detect_file"]:
            det = st.get(did)
            if det["status"] != "active":
                raise ApiError(
                    400, f"Anomaly detector {did} is not active.")
            body = self._body()
            if not body.get("data_path"):
                raise ApiError(400, "data_path is required")
            summary = scoring.detect_anomaly_file(
                st.config_of(did), body["data_path"],
                base_dir=self.base_dir)
            return self._send(200, summary)
        raise ApiError(404, f"Route not found: {method} {self.path}")

    def _detect(self, did: int, q: dict) -> None:
        det = self.store.get(did)
        if det["status"] != "active":
            raise ApiError(400, f"Anomaly detector {did} is not active.")
        if "timestamp" not in q or "ftr_vector" not in q:
            raise ApiError(400, "timestamp and ftr_vector are required")
        try:
            ts = float(q["timestamp"][0])
            # the reference takes a single float; accept a comma list too
            vec = [float(v) for part in q["ftr_vector"]
                   for v in part.split(",")]
        except ValueError:
            raise ApiError(400, "timestamp/ftr_vector must be numeric")
        pred = scoring.detect_anomaly_record(
            self.store.config_of(did), ts, vec, base_dir=self.base_dir)
        self._send(200, pred)

    # ---- verbs ----------------------------------------------------------
    def do_GET(self):
        self._route("GET")

    def do_POST(self):
        self._route("POST")

    def do_PUT(self):
        self._route("PUT")

    def do_DELETE(self):
        self._route("DELETE")


def make_server(store: DetectorStore, host: str = "127.0.0.1",
                port: int = 0,
                base_dir: str | None = None) -> ThreadingHTTPServer:
    """Build the HTTP server (port 0 = ephemeral; read
    ``server.server_address`` for the bound port). Caller owns serving:
    ``serve_forever()`` inline or on a thread (see start_background)."""
    handler = type("Handler", (_Handler,),
                   {"store": store, "base_dir": base_dir})
    return ThreadingHTTPServer((host, port), handler)


def start_background(store: DetectorStore, host: str = "127.0.0.1",
                     port: int = 0, base_dir: str | None = None):
    """Start the service on a daemon thread; returns (server, thread).
    ``server.shutdown()`` stops it."""
    srv = make_server(store, host, port, base_dir=base_dir)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, t
