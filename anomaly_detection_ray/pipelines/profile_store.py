"""Incremental per-file column-stats store — profiling that is MAINTAINED,
not recomputed.

At 100 TB you cannot answer "what does this table look like now" by
rescanning the corpus: stats must update incrementally as files land.
``update_profile_store`` fingerprints every parquet file under the input
directory by (relative path, byte size, parquet row count — footer
metadata only, no data read) and profiles ONLY files the store hasn't
seen with that fingerprint: one Ray pass over just the new/changed
files, tagged per source file via ``read_parquet(include_paths=True)``.
Per-file mergeable partials (the same (n, nulls, Welford, str-min/max)
rows the one-shot profiler emits — stages/stats.profile_partial_frame)
persist as one tiny parquet per file; deleted or changed files simply
drop/replace their partial. ``merged_profile`` folds whatever partials
are live into the exact ``profile_table`` output (bit-equal to a full
rescan — pinned in tests/test_profile_store.py).

Crash safety follows the checkpoint idiom: partial parquets are written
first, then the manifest commits via atomic ``os.replace``; a crash
between them leaves orphan partials that the next update overwrites
(content-keyed file names), never a manifest pointing at missing data.
Reference lineage: the reference recomputes scorer state per run
(/root/reference/src/anomaly_detection.py consumer loop); this store is
the resumable, distributed replacement for its whole-corpus statistics.
"""

from __future__ import annotations

import hashlib
import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from ..stages.stats import (merge_profile_partials, numeric_profile_cols,
                            profile_partial_frame)

_MANIFEST = "_profile_manifest.json"


def _fingerprint(path: str) -> dict:
    md = pq.read_metadata(path)
    return {"size": os.path.getsize(path), "rows": md.num_rows}


def _partial_name(rel: str) -> str:
    return hashlib.md5(rel.encode()).hexdigest()[:16] + ".parquet"


def _load_manifest(store_dir: str) -> dict:
    p = os.path.join(store_dir, _MANIFEST)
    if not os.path.exists(p):
        return {"files": {}}
    with open(p) as f:
        return json.load(f)


def _save_manifest(store_dir: str, manifest: dict) -> None:
    p = os.path.join(store_dir, _MANIFEST)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, p)


def update_profile_store(input_dir: str, store_dir: str,
                         columns: list[str] | None = None) -> dict:
    """Bring the store up to date with ``input_dir``. Returns
    {"n_files", "n_profiled", "n_reused", "n_dropped"} — the increment
    contract tests pin is n_profiled == number of new/changed files."""
    os.makedirs(os.path.join(store_dir, "partials"), exist_ok=True)
    manifest = _load_manifest(store_dir)
    seen = manifest["files"]

    files = sorted(
        os.path.relpath(os.path.join(r, fn), input_dir)
        for r, _, fns in os.walk(input_dir) for fn in fns
        if fn.endswith(".parquet"))
    live = {}
    todo = []
    for rel in files:
        fp = _fingerprint(os.path.join(input_dir, rel))
        prev = seen.get(rel)
        if prev and prev["size"] == fp["size"] and prev["rows"] == fp["rows"]:
            live[rel] = prev
        else:
            todo.append(rel)
            live[rel] = {**fp, "partial": _partial_name(rel)}
    dropped = [rel for rel in seen if rel not in live]

    if todo:
        paths = [os.path.join(input_dir, rel) for rel in todo]
        ds = rd.read_parquet(paths, columns=columns, include_paths=True)
        schema = ds.schema()
        cols = [c for c in schema.names if c != "path"]
        types = dict(zip(schema.names, schema.types))
        numeric = numeric_profile_cols(types, cols)

        def partial(t: pa.Table) -> pd.DataFrame:
            import numpy as np
            out = []
            arr = np.asarray(t.column("path").to_pylist(), dtype=object)
            body = t.drop_columns(["path"])
            # split the batch into contiguous same-file runs so every
            # partial row is attributable to ONE file (multiple runs of
            # the same file just yield extra mergeable rows)
            bounds = np.flatnonzero(np.r_[True, arr[1:] != arr[:-1]])
            for i, s in enumerate(bounds):
                e = bounds[i + 1] if i + 1 < len(bounds) else len(arr)
                f = profile_partial_frame(body.slice(s, e - s), cols,
                                          numeric)
                f.insert(0, "src", arr[s])
                out.append(f)
            return pd.concat(out, ignore_index=True)

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        abs_to_rel = {os.path.abspath(os.path.join(input_dir, rel)): rel
                      for rel in todo}
        parts["rel"] = parts["src"].map(
            lambda p: abs_to_rel.get(os.path.abspath(p), p))
        for rel, g in parts.groupby("rel"):
            out_p = os.path.join(store_dir, "partials", _partial_name(rel))
            pq.write_table(pa.Table.from_pandas(
                g.drop(columns=["src", "rel"]), preserve_index=False), out_p)
        # column metadata for the merge (stable across files)
        manifest["columns"] = cols
        manifest["types"] = {c: str(types[c]) for c in cols}

    for rel in dropped:
        p = os.path.join(store_dir, "partials",
                         seen[rel].get("partial", _partial_name(rel)))
        if os.path.exists(p):
            os.remove(p)
    manifest["files"] = live
    _save_manifest(store_dir, manifest)
    return {"n_files": len(live), "n_profiled": len(todo),
            "n_reused": len(live) - len(todo), "n_dropped": len(dropped)}


def merged_profile(store_dir: str, round_to: int = 4) -> pd.DataFrame:
    """Fold all live per-file partials into the profile_table output —
    NO scan of the input data."""
    manifest = _load_manifest(store_dir)
    cols = manifest.get("columns", [])
    frames = []
    for rel, meta in manifest["files"].items():
        p = os.path.join(store_dir, "partials",
                         meta.get("partial", _partial_name(rel)))
        frames.append(pq.read_table(p).to_pandas())
    if not frames:
        return pd.DataFrame()
    parts = pd.concat(frames, ignore_index=True)
    # rebuild arrow types from their stored string names for dtype labels
    types = {c: _type_from_str(manifest["types"][c]) for c in cols}
    numeric = numeric_profile_cols(types, cols)
    return merge_profile_partials(parts, cols, types, numeric, round_to)


def _type_from_str(name: str) -> pa.DataType:
    simple = {"int8": pa.int8(), "int16": pa.int16(), "int32": pa.int32(),
              "int64": pa.int64(), "uint8": pa.uint8(),
              "uint16": pa.uint16(), "uint32": pa.uint32(),
              "uint64": pa.uint64(), "halffloat": pa.float16(),
              "float": pa.float32(),
              "double": pa.float64(), "string": pa.string(),
              "large_string": pa.large_string(), "bool": pa.bool_(),
              "binary": pa.binary()}
    if name in simple:
        return simple[name]
    if name.startswith("timestamp"):
        return pa.timestamp("us")
    return pa.string()  # label-only fallback (numeric set stays correct)
