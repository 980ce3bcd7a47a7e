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


def begin_partitioned_run(out_dir: str, cfg_hash: str, P: int,
                          resume: bool, data_subdir: str):
    """Shared resume bootstrap for partitioned prep pipelines
    (audio_prep/text_prep): load the manifest, compute done/todo under the
    CURRENT config, and — on a config change or non-resume run — purge
    stale manifest entries AND stale ``data_subdir/partition_id=*`` dirs
    (a P=8 run's partitions 4..7 must not survive into a P=4 run's output
    or a later resume would double-count them). Clears the todo partitions'
    dirs so re-runs are idempotent. Returns (manifest, done, todo)."""
    import shutil

    manifest = (load_manifest(out_dir) if resume
                else {"partitions": {}, "config_hash": None})
    if manifest.get("config_hash") != cfg_hash:
        manifest = {"partitions": {}, "config_hash": None}
        shutil.rmtree(os.path.join(out_dir, data_subdir), ignore_errors=True)
    done = completed_partitions(manifest, cfg_hash)
    todo = [p for p in range(P) if p not in done]
    d_root = os.path.join(out_dir, data_subdir)
    os.makedirs(d_root, exist_ok=True)
    for p in todo:
        shutil.rmtree(os.path.join(d_root, f"partition_id={p}"),
                      ignore_errors=True)
    return manifest, done, todo


def finish_partitioned_run(out_dir: str, manifest: dict, cfg_hash: str,
                           metrics, todo: list[int], metric_keys: list[str],
                           input_path: str) -> None:
    """Mark EVERY todo partition done — including partitions that received
    zero input rows (absent from the metrics actor), which would otherwise
    be re-run forever — and persist the manifest atomically."""
    by_pid = {int(r["partition_id"]): r for _, r in metrics.iterrows()} \
        if len(metrics) else {}
    for pid in todo:
        r = by_pid.get(pid)
        manifest["partitions"][str(pid)] = {
            "done": True,
            "metrics": {k: (int(r[k]) if r is not None else 0)
                        for k in metric_keys},
            "lineage": {"input": str(input_path), "config_hash": cfg_hash},
        }
    manifest["config_hash"] = cfg_hash
    save_manifest(out_dir, manifest)
