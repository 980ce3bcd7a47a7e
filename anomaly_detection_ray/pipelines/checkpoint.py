"""Per-partition checkpoint manifest — the batch meaning of "resumable from
checkpoint with per-partition lineage + metrics" (BASELINE.json north_rule).

Layout under ``out_dir``:
    violations/partition_id=<p>/*.parquet   (idempotent, partition-named)
    _manifest.json                          {partition_id: entry}

An entry records lineage (input path, config hash, row count), metrics
(violation counts per check, clips/sec share) and the partition verdict.
``resume`` = read the manifest, skip completed partitions at the READ
(predicate pushdown on partition_id), run the rest, merge manifests.
The reference's analogue is its config-rewrite crash-resume
(consumer.py:88-104, isolation_forest.py:196-208) — per-partition manifests
are the distributed replacement.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile


def config_hash(cfg: dict) -> str:
    return hashlib.sha256(json.dumps(cfg, sort_keys=True, default=str).encode()).hexdigest()[:16]


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest.json")


def load_manifest(out_dir: str) -> dict:
    p = manifest_path(out_dir)
    if not os.path.exists(p):
        return {"partitions": {}, "config_hash": None}
    with open(p) as f:
        return json.load(f)


def save_manifest(out_dir: str, manifest: dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    # atomic write: tmp + rename
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".manifest.tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, manifest_path(out_dir))


def completed_partitions(manifest: dict, cfg_hash: str) -> set[int]:
    """Partitions already validated under the SAME config."""
    if manifest.get("config_hash") != cfg_hash:
        return set()
    return {int(p) for p, e in manifest["partitions"].items() if e.get("done")}
