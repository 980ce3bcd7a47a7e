"""Detector store + config-directory helpers for the REST service.

Mirrors the reference API's persistence behavior
(/root/reference/api/src/component/service.py:27-224, models.py): an
``AnomalyDetector`` table (id, name, description, created_at, updated_at,
status, config_name, config) and a configuration directory of JSON files.
The reference uses SQLAlchemy over a served database; here the store is
stdlib ``sqlite3`` (same relational semantics, no external dependency —
the service is a single-node control plane; the DATA plane is the Ray
pipelines it fronts).

Behavior parity pinned by tests/test_api.py:
- ``create`` loads an existing config by name OR accepts an inline
  ``{"anomaly_detection_alg", "anomaly_detection_conf"}`` pair, persists
  it as ``detector_{name}.json`` in the config dir, and starts the
  detector ``inactive`` (service.py:88-127).
- ``delete`` removes the detector row AND its persisted config file
  (router.py "delete ... and its associated config file").
- ``available_configs`` lists ``*.json`` filenames with the reference's
  upper-cased enum-name convention (service.py:40-69).
"""

from __future__ import annotations

import datetime
import json
import os
import sqlite3
import threading
from typing import Any


class ApiError(Exception):
    """HTTP-mappable service error — status codes follow the reference's
    exception classes (api/src/component/exceptions.py: 404 not-found,
    400 bad-request/config/not-active, 500 internal/processing)."""

    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status
        self.message = message


def _now() -> str:
    return datetime.datetime.now(datetime.timezone.utc).isoformat()


def load_config(config_dir: str, name: str) -> dict:
    """Load a JSON config by filename from the config dir (service.py
    load_config: missing file -> 404, bad JSON -> 400)."""
    path = os.path.join(config_dir, name)
    if not os.path.isfile(path):
        raise ApiError(404, f"Config file with id {name} not found.")
    try:
        with open(path) as f:
            return json.load(f)
    except json.JSONDecodeError:
        raise ApiError(400, f"Config '{name}': contains invalid JSON.")


def available_configs(config_dir: str) -> list[dict]:
    """List config filenames as ``[{"name": ENUM_NAME, "filename": f}]``
    (service.py create_available_configs_enum + format_enum_members)."""
    if not os.path.isdir(config_dir):
        raise ApiError(500, f"Config directory not found: {config_dir}")
    files = sorted(f for f in os.listdir(config_dir)
                   if f.endswith(".json")
                   and os.path.isfile(os.path.join(config_dir, f)))
    if not files:
        raise ApiError(500, "No configuration files found in CONFIG_DIR.")
    out = []
    for f in files:
        name = os.path.splitext(f)[0].upper().replace(" ", "_")
        if not name.isidentifier():
            raise ApiError(500, f"Invalid config name '{name}' for Enum")
        out.append({"name": name, "filename": f})
    return out


_SCHEMA = """
CREATE TABLE IF NOT EXISTS detectors (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    name TEXT NOT NULL,
    description TEXT,
    created_at TEXT NOT NULL,
    updated_at TEXT NOT NULL,
    status TEXT NOT NULL,
    config_name TEXT,
    config TEXT
)
"""

_COLS = ("id", "name", "description", "created_at", "updated_at",
         "status", "config_name", "config")


class DetectorStore:
    """sqlite3-backed detector registry (thread-safe: the HTTP server is
    threading; one connection guarded by a lock keeps writes serialized,
    which is plenty for a control-plane table)."""

    def __init__(self, db_path: str, config_dir: str):
        self.config_dir = config_dir
        os.makedirs(config_dir, exist_ok=True)
        os.makedirs(os.path.dirname(os.path.abspath(db_path)), exist_ok=True)
        self._lock = threading.RLock()  # create() reads back under the lock
        self._con = sqlite3.connect(db_path, check_same_thread=False)
        with self._lock:
            self._con.execute(_SCHEMA)
            self._con.commit()

    def close(self) -> None:
        self._con.close()

    @staticmethod
    def _row(r) -> dict:
        return dict(zip(_COLS, r))

    def create(self, request: dict) -> dict:
        """service.py:88-127 — inline config wins over config_name;
        persists detector_{name}.json; status starts 'inactive'."""
        name = request.get("name")
        if not name:
            raise ApiError(400, "detector 'name' is required")
        cfg_data = request.get("config_data") or {}
        if ("anomaly_detection_alg" in cfg_data
                and "anomaly_detection_conf" in cfg_data):
            config = {
                "anomaly_detection_alg": cfg_data["anomaly_detection_alg"],
                "anomaly_detection_conf": cfg_data["anomaly_detection_conf"],
            }
        elif request.get("config_name"):
            config = load_config(self.config_dir, request["config_name"])
        else:
            raise ApiError(
                400, "config_name or anomaly_detection_alg + "
                     "anomaly_detection_conf must be provided")
        config_name = f"detector_{name}.json"
        with open(os.path.join(self.config_dir, config_name), "w",
                  encoding="utf-8") as f:
            json.dump(config, f, ensure_ascii=False, indent=2)
        now = _now()
        with self._lock:
            cur = self._con.execute(
                "INSERT INTO detectors (name, description, created_at, "
                "updated_at, status, config_name, config) "
                "VALUES (?, ?, ?, ?, 'inactive', ?, ?)",
                (name, request.get("description"), now, now,
                 config_name, json.dumps(config)))
            self._con.commit()
            return self.get(cur.lastrowid)

    def get(self, detector_id: int) -> dict:
        # reads take the lock too: correctness only needs sqlite's
        # serialized mode (threadsafety 3), but guarding keeps the store
        # safe on builds compiled at lower levels
        with self._lock:
            r = self._con.execute(
                "SELECT * FROM detectors WHERE id = ?", (detector_id,)
            ).fetchone()
        if r is None:
            raise ApiError(
                404, f"Anomaly detector with ID {detector_id} not found.")
        return self._row(r)

    def list(self) -> list[dict]:
        """Empty table -> 404. Deliberate deviation: the reference's
        router.get_detectors raises DetectorNotFoundException for an empty
        table but its own blanket ``except Exception`` rewraps it as a 500
        (router.py:134-141 — the not-found never reaches the client);
        this store returns the plainly intended 404 instead."""
        with self._lock:
            rows = self._con.execute(
                "SELECT * FROM detectors ORDER BY id").fetchall()
        if not rows:
            raise ApiError(404, "Anomaly detector not found.")
        return [self._row(r) for r in rows]

    def set_status(self, detector_id: int, status: str) -> dict:
        """Stricter than the reference (service.py:211-224 accepts any
        string): only the two states the detect endpoints interpret."""
        if status not in ("active", "inactive"):
            raise ApiError(400, f"Invalid status '{status}'.")
        self.get(detector_id)
        with self._lock:
            self._con.execute(
                "UPDATE detectors SET status = ?, updated_at = ? "
                "WHERE id = ?", (status, _now(), detector_id))
            self._con.commit()
        return self.get(detector_id)

    def update(self, detector_id: int, name: str | None = None,
               description: str | None = None) -> dict:
        self.get(detector_id)
        with self._lock:
            if name is not None:
                self._con.execute(
                    "UPDATE detectors SET name = ?, updated_at = ? "
                    "WHERE id = ?", (name, _now(), detector_id))
            if description is not None:
                self._con.execute(
                    "UPDATE detectors SET description = ?, updated_at = ? "
                    "WHERE id = ?", (description, _now(), detector_id))
            self._con.commit()
        return self.get(detector_id)

    def delete(self, detector_id: int) -> dict:
        det = self.get(detector_id)
        with self._lock:
            self._con.execute("DELETE FROM detectors WHERE id = ?",
                              (detector_id,))
            self._con.commit()
        if det.get("config_name"):
            p = os.path.join(self.config_dir, det["config_name"])
            if os.path.isfile(p):
                os.remove(p)
        return det

    def delete_all(self) -> int:
        dets = self.list()  # raises 404 when empty, like the reference
        for d in dets:
            self.delete(d["id"])
        return len(dets)

    def config_of(self, detector_id: int) -> dict:
        det = self.get(detector_id)
        if not det.get("config"):
            raise ApiError(400,
                           f"Config '{detector_id}': Detector config is "
                           "empty.")
        try:
            config = json.loads(det["config"])
        except json.JSONDecodeError as e:
            raise ApiError(400, f"Config '{detector_id}' Invalid JSON in "
                                f"detector config: {e}")
        return config


def detector_parameters(store: DetectorStore, detector_id: int) -> Any:
    """router.py get_detector_parameters: the config's
    anomaly_detection_conf section, 400 when missing."""
    config = store.config_of(detector_id)
    if "anomaly_detection_conf" not in config:
        raise ApiError(400, f"Config '{detector_id}': Missing "
                            "'anomaly_detection_conf' section.")
    return config["anomaly_detection_conf"]
