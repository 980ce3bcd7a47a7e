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

import numpy as np
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


def _plan_update(input_dir: str, seen: dict) -> tuple:
    """(live, todo, dropped): fingerprint every parquet under input_dir
    (footer metadata only) and classify against the store manifest."""
    files = sorted(
        os.path.relpath(os.path.join(r, fn), input_dir)
        for r, _, fns in os.walk(input_dir) for fn in fns
        if fn.endswith(".parquet"))
    live, todo = {}, []
    for rel in files:
        fp = _fingerprint(os.path.join(input_dir, rel))
        prev = seen.get(rel)
        if prev and prev["size"] == fp["size"] and prev["rows"] == fp["rows"]:
            live[rel] = prev
        else:
            todo.append(rel)
            live[rel] = {**fp, "partial": _partial_name(rel)}
    dropped = [rel for rel in seen if rel not in live]
    return live, todo, dropped


def _run_split(t: pa.Table):
    """Yield (path, slice) for contiguous same-file runs of a tagged
    batch (read_parquet(include_paths=True))."""
    import numpy as np
    arr = np.asarray(t.column("path").to_pylist(), dtype=object)
    body = t.drop_columns(["path"])
    bounds = np.flatnonzero(np.r_[True, arr[1:] != arr[:-1]])
    for i, s in enumerate(bounds):
        e = bounds[i + 1] if i + 1 < len(bounds) else len(arr)
        yield arr[s], body.slice(s, e - s)


def update_profile_store(input_dir: str, store_dir: str,
                         columns: list[str] | None = None) -> dict:
    """Bring the store up to date with ``input_dir``. Returns
    {"n_files", "n_profiled", "n_reused", "n_dropped"} — the increment
    contract tests pin is n_profiled == number of new/changed files."""
    os.makedirs(os.path.join(store_dir, "partials"), exist_ok=True)
    manifest = _load_manifest(store_dir)
    seen = manifest["files"]
    live, todo, dropped = _plan_update(input_dir, seen)

    if todo:
        paths = [os.path.join(input_dir, rel) for rel in todo]
        ds = rd.read_parquet(paths, columns=columns, include_paths=True)
        schema = ds.schema()
        cols = [c for c in schema.names if c != "path"]
        types = dict(zip(schema.names, schema.types))
        numeric = numeric_profile_cols(types, cols)

        def partial(t: pa.Table) -> pd.DataFrame:
            # contiguous same-file runs: every partial row is
            # attributable to ONE file (repeat runs of a file just yield
            # extra mergeable rows)
            out = []
            for p, sl in _run_split(t):
                f = profile_partial_frame(sl, cols, numeric)
                f.insert(0, "src", p)
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


# ------------------------------------------------- incremental expectations

def update_expectation_store(input_dir: str, store_dir: str,
                             suite: list[dict],
                             columns: list[str] | None = None) -> dict:
    """Incrementally-maintained ROW-LOCAL expectation verdicts: per-file
    (check, n_rows, violations) partials under the same (path, size,
    rows) fingerprint manifest as the profile store, so a suite over a
    growing table re-validates ONLY new/changed files. Row-local kinds
    only (not_null/in_range/in_set/regex/str_len_between/col_compare/
    referential) — table-level kinds (unique, non_decreasing, freshness)
    need cross-file state and are rejected with guidance. Changing the
    suite invalidates the whole store (suite-hash contract, same idea as
    ValidateConfig's config hash)."""
    from ..stages.expectations import _ROW_LOCAL, _check_key, _compile_mask
    bad = [s["check"] for s in suite
           if s["check"] not in _ROW_LOCAL
           and not (s["check"] == "unique" and s.get("approx"))]
    if bad:
        raise ValueError(
            f"incremental expectations are row-local (plus approx unique) "
            f"only; {bad!r} need cross-file state — run them via "
            "run_expectations instead")
    uniq_specs = [s for s in suite
                  if s["check"] == "unique" and s.get("approx")]
    row_specs = [s for s in suite if s["check"] in _ROW_LOCAL]

    os.makedirs(os.path.join(store_dir, "exp_partials"), exist_ok=True)
    manifest = _load_manifest(store_dir)
    suite_hash = hashlib.md5(
        json.dumps(suite, sort_keys=True, default=str).encode()
    ).hexdigest()[:12]
    if manifest.get("suite_hash") not in (None, suite_hash):
        manifest = {"files": {}}          # suite changed: full rebuild
    live, todo, dropped = _plan_update(input_dir, manifest.get("files", {}))

    if todo:
        keys = [_check_key(s) for s in row_specs]
        compiled = [_compile_mask(s) for s in row_specs]
        uniq_cfg = [(_check_key(s), s["column"], int(s.get("hll_p", 14)))
                    for s in uniq_specs]
        need = sorted({s["column"] for s in suite}
                      | {s["other"] for s in suite
                         if s["check"] == "col_compare"})
        paths = [os.path.join(input_dir, rel) for rel in todo]
        ds = rd.read_parquet(paths, columns=(columns or need),
                             include_paths=True)

        def partial(t: pa.Table) -> pd.DataFrame:
            import pyarrow.compute as _pc
            from ..functions.sketches import HyperLogLog
            rows = []
            for p, sl in _run_split(t):
                for k, mask in zip(keys, compiled):
                    rows.append((p, k, len(sl), int(mask(sl).sum()), None))
                for k, col, hp in uniq_cfg:
                    # mirror run_expectations' approx path: NULLs are
                    # excluded from both n and the register stream
                    valid = sl[col].drop_null()
                    h = pd.util.hash_pandas_object(
                        valid.to_pandas(), index=False).to_numpy(np.uint64)
                    hll = HyperLogLog(hp)
                    hll.add_hashes(h)
                    rows.append((p, k, len(valid), 0,
                                 hll.registers.tobytes()))
            return pd.DataFrame(rows,
                                columns=["src", "key", "n", "v", "reg"])

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        abs_to_rel = {os.path.abspath(os.path.join(input_dir, rel)): rel
                      for rel in todo}
        parts["rel"] = parts["src"].map(
            lambda p: abs_to_rel.get(os.path.abspath(p), p))
        for rel, g in parts.groupby("rel"):
            agg = (g[g["reg"].isna()]
                   .groupby("key", as_index=False)[["n", "v"]].sum())
            agg["reg"] = None
            urows = []
            for k, gu in g[g["reg"].notna()].groupby("key"):
                regs = None
                for blob in gu["reg"]:
                    r = np.frombuffer(blob, dtype=np.uint8)
                    regs = r.copy() if regs is None else np.maximum(regs, r)
                urows.append({"key": k, "n": int(gu["n"].sum()), "v": 0,
                              "reg": regs.tobytes()})
            if urows:
                agg = pd.concat([agg, pd.DataFrame(urows)],
                                ignore_index=True)
            pq.write_table(pa.Table.from_pandas(agg, preserve_index=False),
                           os.path.join(store_dir, "exp_partials",
                                        _partial_name(rel)))

    for rel in dropped:
        p = os.path.join(store_dir, "exp_partials", _partial_name(rel))
        if os.path.exists(p):
            os.remove(p)
    manifest["files"] = live
    manifest["suite_hash"] = suite_hash
    manifest["suite"] = suite
    _save_manifest(store_dir, manifest)
    return {"n_files": len(live), "n_validated": len(todo),
            "n_reused": len(live) - len(todo), "n_dropped": len(dropped)}


def merged_expectations(store_dir: str) -> pd.DataFrame:
    """Fold live per-file verdict partials into the run_expectations
    summary shape (check_name, column_name, n_rows, violations, passed)
    — no scan of the input data."""
    from ..stages.expectations import _check_key, _col_label
    manifest = _load_manifest(store_dir)
    suite = manifest.get("suite", [])
    frames = []
    for rel in manifest["files"]:
        p = os.path.join(store_dir, "exp_partials", _partial_name(rel))
        frames.append(pq.read_table(p).to_pandas())
    allp = (pd.concat(frames, ignore_index=True) if frames
            else pd.DataFrame({"key": [], "n": [], "v": [], "reg": []}))
    if "reg" not in allp.columns:          # pre-unique stores
        allp["reg"] = None
    rowp = allp[allp["reg"].isna()]
    agg = (rowp.groupby("key", as_index=False)[["n", "v"]].sum()
           if len(rowp) else pd.DataFrame({"key": [], "n": [], "v": []}))
    by_key = {r.key: r for r in agg.itertuples()}
    uniq = {}
    for k, gu in allp[allp["reg"].notna()].groupby("key"):
        regs = None
        for blob in gu["reg"]:
            r = np.frombuffer(blob, dtype=np.uint8)
            regs = r.copy() if regs is None else np.maximum(regs, r)
        uniq[k] = (int(gu["n"].sum()), regs)
    records = []
    for spec in suite:
        key = _check_key(spec)
        if spec["check"] == "unique":
            from ..functions.sketches import HyperLogLog
            n, regs = uniq.get(key, (0, None))
            if regs is None:
                v = 0
            else:
                hll = HyperLogLog(int(spec.get("hll_p", 14)))
                hll.registers = regs
                v = max(0, int(round(n - hll.estimate())))
        else:
            r = by_key.get(key)
            n = int(r.n) if r is not None else 0
            v = int(r.v) if r is not None else 0
        frac_ok = 1.0 if n == 0 else 1.0 - v / n
        records.append({"check_name": spec["check"],
                        "column_name": _col_label(spec),
                        "n_rows": n, "violations": v,
                        "passed": frac_ok >= spec.get("mostly", 1.0)})
    out = pd.DataFrame.from_records(
        records, columns=["check_name", "column_name", "n_rows",
                          "violations", "passed"])
    return (out.sort_values(["check_name", "column_name"])
            .reset_index(drop=True))
