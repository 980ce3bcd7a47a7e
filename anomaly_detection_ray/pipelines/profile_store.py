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
    if len(arr) == 0:
        return
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


def _premerge_profile_rows(df: pd.DataFrame) -> pd.DataFrame:
    """Associatively reduce profile-partial rows to ONE row per column
    (same schema in and out) — the per-Ray-block combiner for the
    many-file merge regime."""
    from ..functions.sketches import WelfordPartial
    out = []
    for c, g in df.groupby("column_name", sort=False):
        acc = WelfordPartial()
        for r in g.itertuples(index=False):
            acc = acc.merge(WelfordPartial(int(r.wn), float(r.wmean),
                                           float(r.wM2), float(r.wmin),
                                           float(r.wmax)))
        lo, hi = g["smin"].dropna(), g["smax"].dropna()
        out.append((c, int(g["n"].sum()), int(g["nulls"].sum()),
                    acc.n, acc.mean, acc.M2, acc.min, acc.max,
                    lo.min() if len(lo) else None,
                    hi.max() if len(hi) else None))
    return pd.DataFrame(out, columns=[
        "column_name", "n", "nulls", "wn", "wmean", "wM2",
        "wmin", "wmax", "smin", "smax"])


def merged_profile(store_dir: str, round_to: int = 4,
                   fold_files: int = 8192) -> pd.DataFrame:
    """Fold all live per-file partials into the profile_table output —
    NO scan of the input data. Two-regime like every merge here: below
    ``fold_files`` live files the driver reads the partials sequentially;
    above, they stream through a Ray read with per-block pre-merge, so
    the driver folds O(blocks x cols) rows instead of doing O(files)
    reads (the store targets ~100k-file tables)."""
    manifest = _load_manifest(store_dir)
    cols = manifest.get("columns", [])
    paths = [os.path.join(store_dir, "partials",
                          meta.get("partial", _partial_name(rel)))
             for rel, meta in manifest["files"].items()]
    if not paths:
        return pd.DataFrame()
    if len(paths) <= fold_files:
        parts = pd.concat([pq.read_table(p).to_pandas() for p in paths],
                          ignore_index=True)
    else:
        parts = (rd.read_parquet(paths)
                 .map_batches(lambda t: _premerge_profile_rows(t.to_pandas()),
                              batch_format="pyarrow")
                 .to_pandas())
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
#
# Per-file verdict/state partials under the same (path, size, rows)
# fingerprint manifest as the profile store, so a suite over a growing
# table re-validates ONLY new/changed files. Supported kinds and their
# per-file state:
#
# - row-local (not_null/in_range/.../col_compare/referential):
#   (n, violations) counters — sum at merge.
# - unique approx: HLL registers — max at merge (the 10^12-key path).
# - unique exact: native-dtype (value, count) tables — groupby-sum at
#   merge (two-regime: Ray fold past a row threshold, so the driver
#   never holds O(distinct); approx is still the 10^12-key path).
# - freshness: per-group max-event-time — max at merge; `as_of` /
#   `max_lag_s` are MERGE-TIME params, so a scheduler tick with a new
#   as_of revalidates zero files.
# - non_decreasing (single order_by column): per-group
#   (n, within-file descents, order-range, first/last value). When
#   per-group order ranges are disjoint across files (the append-only
#   time-ordered case) the merge is exact from partials: sum within-file
#   descents + compare boundary values in range order. When a group's
#   file ranges interleave (or tie), that group alone is recomputed
#   exactly by re-reading just its files — O(affected rows), never a
#   corpus rescan.
#
# Graded kinds and dtype stay with run_expectations (rejected with
# guidance). The store hash covers only PARTIAL-DEFINING fields:
# changing `mostly`/`as_of`/`max_lag_s` never rebuilds.

_MERGE_TIME_KEYS = {"mostly", "as_of", "max_lag_s"}
# bump when the partial-file layout changes: rides the suite hash, so a
# store written by an older layout rebuilds instead of being mis-read
_STORE_VERSION = 2


def _partial_sig(spec: dict) -> str:
    """JSON of the partial-defining fields of a check spec (merge-time
    params stripped) — the store key for the spec's per-file state."""
    return json.dumps({k: v for k, v in spec.items()
                       if k not in _MERGE_TIME_KEYS},
                      sort_keys=True, default=str)


def _sig_key(spec: dict) -> str:
    return hashlib.md5(_partial_sig(spec).encode()).hexdigest()[:12]


def _side_name(rel: str, spec: dict, fam: str) -> str:
    base = _partial_name(rel)[:-len(".parquet")]
    return f"{base}.{_sig_key(spec)}.{fam}.parquet"


def _single_order_by(spec: dict) -> str:
    ob = spec["order_by"]
    if isinstance(ob, str):
        return ob
    if isinstance(ob, (list, tuple)) and len(ob) == 1:
        return ob[0]
    raise ValueError(
        "incremental non_decreasing needs a single order_by column "
        f"(got {ob!r}) — multi-column tie-breaking needs a full-order "
        "rescan; run it via run_expectations instead")


def _nd_group_stats(df: pd.DataFrame, col: str, ob: str) -> tuple | None:
    """(n, descents, ob_min, ob_max, first_v, last_v) of one group's rows
    sorted by ob, restricted to non-null `col` (run_expectations
    per_group semantics, sliced per file)."""
    s = df.sort_values(ob, kind="stable")
    keep = s[col].notna().to_numpy()
    if not keep.any():
        return None
    x = s[col].to_numpy()[keep]
    v = 0
    if len(x) > 1:
        d = np.diff(x)
        v = int((d < np.zeros(1, dtype=d.dtype)[0]).sum())
    obv = s[ob].to_numpy()[keep]
    return len(x), v, obv[0], obv[-1], x[0], x[-1]


def update_expectation_store(input_dir: str, store_dir: str,
                             suite: list[dict],
                             columns: list[str] | None = None) -> dict:
    """Bring the per-file expectation store up to date with ``input_dir``
    (see the section comment above for kinds and state shapes). ONE
    fused, column-pruned read per new/changed file — a Dataset of paths
    fans out one task per file; each task computes every check's state
    and writes the side parquets itself, so only acks return to the
    driver (never O(rows)/O(distinct) partials). Changing
    partial-defining suite fields rebuilds the store (suite-hash
    contract, same idea as ValidateConfig's config hash); merge-time
    fields (`mostly`, `as_of`, `max_lag_s`) just update the manifest."""
    import shutil

    from ..stages.expectations import _ROW_LOCAL

    supported = _ROW_LOCAL | {"unique", "freshness", "non_decreasing"}
    bad = [s["check"] for s in suite if s["check"] not in supported]
    if bad:
        raise ValueError(
            f"incremental expectations support row-local kinds plus "
            f"unique/freshness/non_decreasing; {bad!r} need schema or "
            "graded evaluation — run them via run_expectations instead")
    # state is per-_sig_key: two specs differing only in merge-time fields
    # (mostly/as_of/max_lag_s) share one state row, so fan out each sig
    # ONCE — appending it per variant would double-count n/v in the merge
    # (merged_expectations looks up by sig, one row serves all variants)
    def _dedup_sig(specs: list[dict]) -> list[dict]:
        seen: dict[str, dict] = {}
        for s in specs:
            seen.setdefault(_sig_key(s), s)
        return list(seen.values())

    row_specs = _dedup_sig([s for s in suite if s["check"] in _ROW_LOCAL])
    uniq_approx = _dedup_sig([s for s in suite
                              if s["check"] == "unique" and s.get("approx")])
    uniq_exact = _dedup_sig([s for s in suite
                             if s["check"] == "unique"
                             and not s.get("approx")])
    fresh_specs = _dedup_sig([s for s in suite
                              if s["check"] == "freshness"])
    nd_specs = _dedup_sig([s for s in suite
                           if s["check"] == "non_decreasing"])
    for s in fresh_specs:
        for k in ("as_of", "max_lag_s"):
            if k not in s:
                raise ValueError(f"freshness requires explicit {k!r}")
    for s in nd_specs:
        _single_order_by(s)   # validate early (single-column contract)

    part_dir = os.path.join(store_dir, "exp_partials")
    os.makedirs(part_dir, exist_ok=True)
    manifest = _load_manifest(store_dir)
    # set-dedupe: adding a merge-time-only variant adds no new state, so
    # it must not change the hash (identical to sorted(...) otherwise)
    suite_hash = hashlib.md5(json.dumps(
        [_STORE_VERSION, sorted({_partial_sig(s) for s in suite})]
    ).encode()).hexdigest()[:12]
    if manifest.get("suite_hash") not in (None, suite_hash):
        manifest = {"files": {}}          # suite changed: full rebuild
        shutil.rmtree(part_dir)           # drop stale per-sig side files
        os.makedirs(part_dir)
    live, todo, dropped = _plan_update(input_dir, manifest.get("files", {}))

    # ONE directory listing bucketed by the 16-char hash prefix — per-rel
    # listdir would make a full rebuild O(todo x store-files)
    by_base: dict[str, list[str]] = {}
    for fn in os.listdir(part_dir):
        by_base.setdefault(fn[:16], []).append(fn)

    def _drop_partials(rel: str) -> None:
        base = _partial_name(rel)[:-len(".parquet")]
        for fn in by_base.pop(base, []):
            os.remove(os.path.join(part_dir, fn))

    if todo:
        # stale partials first: a re-validated file whose new version
        # lost a check's rows must not keep the old state
        for rel in todo:
            _drop_partials(rel)
        _validate_files(input_dir, part_dir, todo, row_specs, uniq_approx,
                        uniq_exact, fresh_specs, nd_specs, columns)

    for rel in dropped:
        _drop_partials(rel)
    manifest["files"] = live
    manifest["suite_hash"] = suite_hash
    manifest["suite"] = suite
    manifest["input_dir"] = os.path.abspath(input_dir)
    _save_manifest(store_dir, manifest)
    return {"n_files": len(live), "n_validated": len(todo),
            "n_reused": len(live) - len(todo), "n_dropped": len(dropped)}


def _validate_files(input_dir, part_dir, todo, row_specs, uniq_approx,
                    uniq_exact, fresh_specs, nd_specs, columns) -> None:
    """ONE fused, column-pruned read per new/changed file: a Dataset of
    file paths fans out one task per file; each task computes every
    check's per-file state — row-local counters + approx-unique HLL
    registers (``<base>.parquet``), freshness per-group max event time
    as exact int64 epoch-us (``<base>.fr.parquet`` — never nullable, so
    it round-trips without the float64 precision loss a null-padded
    int64 column suffers), exact-unique native-dtype value counts
    (``<base>.<sig>.vc.parquet``), and per-group non_decreasing stats
    (``<base>.<sig>.nd.parquet``) — and writes the side parquets itself.
    Only acks return to the driver: never O(rows) or O(distinct)
    partials (the exact-unique state of a near-unique column is
    file-sized and goes straight from the task to the store). The store
    directory must be visible to workers (same contract as every
    parquet sink here)."""
    from ..stages.expectations import _compile_mask, _compile_when

    keys = [_sig_key(s) for s in row_specs]
    compiled = [_compile_mask(s) for s in row_specs]
    whens = [_compile_when(s) for s in row_specs]
    uniq_cfg = [(_sig_key(s), s["column"], int(s.get("hll_p", 14)))
                for s in uniq_approx]
    fresh_cfg = [(_sig_key(s), s["column"], s.get("by"))
                 for s in fresh_specs]
    vc_cfg = [(s, s["column"]) for s in uniq_exact]
    nd_cfg = [(s, s["column"], s["by"], _single_order_by(s))
              for s in nd_specs]
    need = columns or sorted(
        {s["column"] for s in [*row_specs, *uniq_approx, *uniq_exact,
                               *fresh_specs, *nd_specs]}
        | {s["other"] for s in row_specs if s["check"] == "col_compare"}
        | {s["when"]["column"] for s in row_specs if s.get("when")}
        | {s["by"] for s in [*fresh_specs, *nd_specs]
           if s.get("by") is not None}
        | {_single_order_by(s) for s in nd_specs})

    def per_file(batch: pd.DataFrame) -> pd.DataFrame:
        from ..functions.sketches import HyperLogLog
        for rel in batch["rel"]:
            t = pq.read_table(os.path.join(input_dir, rel), columns=need)
            base = _partial_name(rel)[:-len(".parquet")]

            main = {"key": [], "n": [], "v": [], "reg": []}
            for k, mask, when in zip(keys, compiled, whens):
                bad = mask(t)
                if when is not None:
                    # conditional check: scope rows are the denominator
                    # AND the only violation candidates (run_expectations
                    # semantics — per-sig n makes the merge exact)
                    scope = when(t)
                    n_k, bad = int(scope.sum()), bad & scope
                else:
                    n_k = len(t)
                main["key"].append(k)
                main["n"].append(n_k)
                main["v"].append(int(bad.sum()))
                main["reg"].append(None)
            for k, col, hp in uniq_cfg:
                # mirror run_expectations' approx path: NULLs are
                # excluded from both n and the register stream
                valid = t[col].drop_null()
                h = pd.util.hash_pandas_object(
                    valid.to_pandas(), index=False).to_numpy(np.uint64)
                hll = HyperLogLog(hp)
                hll.add_hashes(h)
                main["key"].append(k)
                main["n"].append(len(valid))
                main["v"].append(0)
                main["reg"].append(hll.registers.tobytes())
            if main["key"]:
                pq.write_table(
                    pa.table({"key": pa.array(main["key"], pa.string()),
                              "n": pa.array(main["n"], pa.int64()),
                              "v": pa.array(main["v"], pa.int64()),
                              "reg": pa.array(main["reg"], pa.binary())}),
                    os.path.join(part_dir, f"{base}.parquet"))

            fr = {"key": [], "g": [], "mt": []}
            for k, col, by in fresh_cfg:
                # mirror run_expectations' fresh_partial exactly
                df = t.select(sorted({col} | ({by} if by is not None
                                              else set()))).to_pandas()
                ts = df[col].astype("datetime64[us]").astype(np.int64)
                g = (pd.Series([""] * len(df)) if by is None
                     else df[by].astype(str))
                t2 = pd.DataFrame({"_g": g.to_numpy(), "mt": ts})
                t2 = t2[df[col].notna().to_numpy()]
                for gv, mt in t2.groupby("_g")["mt"].max().items():
                    fr["key"].append(k)
                    fr["g"].append(gv)
                    fr["mt"].append(int(mt))
            if fr["key"]:
                pq.write_table(
                    pa.table({"key": pa.array(fr["key"], pa.string()),
                              "g": pa.array(fr["g"], pa.string()),
                              "mt": pa.array(fr["mt"], pa.int64())}),
                    os.path.join(part_dir, f"{base}.fr.parquet"))

            for spec, col in vc_cfg:
                # native-dtype (value, count): no lossy casts, no hash
                # collisions
                s = t[col].to_pandas()
                vc = s.groupby(s, dropna=True).size()
                if len(vc):
                    pq.write_table(
                        pa.Table.from_pandas(
                            pd.DataFrame({"val": vc.index.to_numpy(),
                                          "cnt": vc.to_numpy()}),
                            preserve_index=False),
                        os.path.join(part_dir,
                                     _side_name(rel, spec, "vc")))

            for spec, col, by, ob in nd_cfg:
                df = t.select(sorted({col, by, ob})).to_pandas()
                frames = []
                for gv, gd in df.groupby(by, dropna=False, sort=False):
                    st = _nd_group_stats(gd, col, ob)
                    if st is None:
                        continue
                    n, v, ob_min, ob_max, first_v, last_v = st
                    frames.append(pd.DataFrame(
                        {by: [gv], "n": [n], "v": [v],
                         "ob_min": [ob_min], "ob_max": [ob_max],
                         "first_v": [first_v], "last_v": [last_v]}))
                if frames:
                    pq.write_table(
                        pa.Table.from_pandas(
                            pd.concat(frames, ignore_index=True),
                            preserve_index=False),
                        os.path.join(part_dir,
                                     _side_name(rel, spec, "nd")))
        return batch[["rel"]]

    (rd.from_items([{"rel": rel} for rel in todo])
     .map_batches(per_file, batch_size=1, batch_format="pandas")
     .materialize())


def _merge_main_rows(t: pa.Table) -> pd.DataFrame:
    """Associatively merge (key, n, v, reg) partial rows: counters sum,
    HLL registers elementwise-max — applied per Ray block in the
    many-file regime and once more for the final driver fold."""
    df = t.to_pandas()
    plain = df[df["reg"].isna()]
    agg = (plain.groupby("key", as_index=False)[["n", "v"]].sum()
           if len(plain) else pd.DataFrame({"key": [], "n": [], "v": []}))
    agg["reg"] = None
    rows = []
    for k, gu in df[df["reg"].notna()].groupby("key"):
        regs = None
        for blob in gu["reg"]:
            r = np.frombuffer(blob, dtype=np.uint8)
            regs = r.copy() if regs is None else np.maximum(regs, r)
        rows.append({"key": k, "n": int(gu["n"].sum()), "v": 0,
                     "reg": regs.tobytes()})
    if rows:
        agg = pd.concat([agg, pd.DataFrame(rows)], ignore_index=True)
    return agg[["key", "n", "v", "reg"]]


def merged_expectations(store_dir: str,
                        fold_rows: int = 500_000) -> pd.DataFrame:
    """Fold live per-file state into the run_expectations summary shape
    (check_name, column_name, n_rows, violations, passed). No scan of
    the input data — except non_decreasing groups whose per-file order
    ranges interleave, which re-read exactly their own files.

    Every fold here is two-regime (the engine's standard shape): below
    ``fold_rows`` total stored partial rows (footer metadata decides —
    main counter/register files switch at ``fold_rows/64`` files) the
    driver folds in pandas; above, the partials stream through Ray —
    per-block pre-merge for counters/HLL registers, groupby folds for
    unique/freshness/non_decreasing — so only per-key/scalar aggregates
    reach the driver, never O(files)/O(distinct)/O(groups) raw state."""
    from ..functions.sketches import HyperLogLog
    from ..stages.expectations import _ROW_LOCAL, _col_label

    manifest = _load_manifest(store_dir)
    suite = manifest.get("suite", [])
    part_dir = os.path.join(store_dir, "exp_partials")
    rels = list(manifest["files"])
    main_paths, fr_paths = [], []
    for rel in rels:
        base = _partial_name(rel)[:-len(".parquet")]
        p = os.path.join(part_dir, f"{base}.parquet")
        if os.path.exists(p):
            main_paths.append(p)
        fp = os.path.join(part_dir, f"{base}.fr.parquet")
        if os.path.exists(fp):
            fr_paths.append(fp)
    if len(main_paths) <= max(1, fold_rows // 64):
        frames = [pq.read_table(p).to_pandas() for p in main_paths]
        allp = (pd.concat(frames, ignore_index=True) if frames
                else pd.DataFrame({"key": [], "n": [], "v": [],
                                   "reg": []}))
    else:
        # many-file regime: read the per-file counter/register rows in
        # parallel and pre-merge per block — the driver folds one row
        # per (key, block), not one per (key, file)
        allp = (rd.read_parquet(main_paths)
                .map_batches(_merge_main_rows, batch_format="pyarrow")
                .to_pandas())
        allp = _merge_main_rows(pa.Table.from_pandas(
            allp, preserve_index=False))
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
    small_fr = (fr_paths and sum(pq.read_metadata(p).num_rows
                                 for p in fr_paths) <= fold_rows)
    freshp = (pd.concat([pq.read_table(p).to_pandas() for p in fr_paths],
                        ignore_index=True) if small_fr
              else pd.DataFrame({"key": [], "g": [],
                                 "mt": pd.Series([], dtype=np.int64)}))

    # family order mirrors run_expectations so ties under the final
    # stable sort land identically
    records = []
    for spec in [s for s in suite if s["check"] == "freshness"]:
        key = _sig_key(spec)
        as_of = pd.Timestamp(spec["as_of"], unit=(
            "s" if isinstance(spec["as_of"], (int, float)) else None))
        cutoff = as_of.value // 1000 - int(float(spec["max_lag_s"]) * 1e6)
        if fr_paths and not small_fr:
            # high-group-cardinality regime: Ray groupby-max; only the
            # group count and the stale count leave the cluster
            import pyarrow.compute as _pc
            from ray.data.aggregate import Max
            folded_ds = (rd.read_parquet(fr_paths)
                         .map_batches(lambda t, k=key: t.filter(
                             _pc.equal(t["key"], k)),
                             batch_format="pyarrow")
                         .groupby("g").aggregate(Max("mt", alias_name="mt"))
                         .materialize())
            n = int(folded_ds.count())
            v = (int(folded_ds.map_batches(
                lambda t, c=cutoff: pd.DataFrame(
                    {"v": [int((t["mt"].to_numpy() < c).sum())]}),
                batch_format="pyarrow").sum("v")) if n else 0)
        else:
            g = freshp[freshp["key"] == key]
            folded = (g.groupby("g")["mt"].max()
                      if len(g) else pd.Series([], dtype=np.int64))
            n = int(len(folded))
            v = int((folded < cutoff).sum()) if n else 0
        records.append((spec, spec["column"] if spec.get("by") is None
                        else f"{spec['column']} by {spec['by']}", n, v))
    for spec in [s for s in suite if s["check"] == "non_decreasing"]:
        n, v = _merge_nd(manifest, part_dir, rels, spec, fold_rows)
        records.append((spec, spec["column"], n, v))
    for spec in [s for s in suite if s["check"] in _ROW_LOCAL]:
        r = by_key.get(_sig_key(spec))
        records.append((spec, _col_label(spec),
                        int(r.n) if r is not None else 0,
                        int(r.v) if r is not None else 0))
    for spec in [s for s in suite if s["check"] == "unique"]:
        if spec.get("approx"):
            n, regs = uniq.get(_sig_key(spec), (0, None))
            if regs is None:
                v = 0
            else:
                hll = HyperLogLog(int(spec.get("hll_p", 14)))
                hll.registers = regs
                v = max(0, int(round(n - hll.estimate())))
        else:
            paths = [os.path.join(part_dir, _side_name(rel, spec, "vc"))
                     for rel in rels]
            paths = [p for p in paths if os.path.exists(p)]
            if not paths:
                n, v = 0, 0
            elif sum(pq.read_metadata(p).num_rows
                     for p in paths) <= fold_rows:
                counts = (pd.concat([pq.read_table(p).to_pandas()
                                     for p in paths], ignore_index=True)
                          .groupby("val", dropna=True)["cnt"].sum())
                n = int(counts.sum())
                v = int((counts - 1).clip(lower=0).sum())
            else:
                # high-cardinality regime: violations = n − distinct, so
                # only scalar aggregates leave the cluster
                ds = rd.read_parquet(paths)
                n = int(ds.sum("cnt"))
                v = n - int(ds.groupby("val").count().count())
        records.append((spec, spec["column"], n, v))

    out_rows = []
    for spec, label, n, v in records:
        frac_ok = 1.0 if n == 0 else 1.0 - v / n
        out_rows.append({"check_name": spec["check"], "column_name": label,
                         "n_rows": n, "violations": v,
                         "passed": frac_ok >= spec.get("mostly", 1.0)})
    out = pd.DataFrame.from_records(
        out_rows, columns=["check_name", "column_name", "n_rows",
                           "violations", "passed"])
    return (out.sort_values(["check_name", "column_name"])
            .reset_index(drop=True))


def _nd_fold_group(g: pd.DataFrame) -> tuple:
    """(n, v, needs_recompute) for one group's per-file partial rows.
    Exact when per-file order ranges are disjoint: sum within-file
    descents + boundary comparisons in range order; interleaved/tied
    ranges defer to an exact recompute."""
    g = g.sort_values("ob_min", kind="stable")
    # null order_by values make ob_min/ob_max NaN/NaT: every >= compare
    # is False, which would silently treat the files as disjoint — defer
    # to the exact recompute instead (boundary order is undefined)
    if g["ob_min"].isna().any() or g["ob_max"].isna().any():
        return 0, 0, True
    if len(g) > 1 and (g["ob_max"].to_numpy()[:-1]
                       >= g["ob_min"].to_numpy()[1:]).any():
        return 0, 0, True
    n = int(g["n"].sum())
    v = int(g["v"].sum())
    if len(g) > 1:
        last = g["last_v"].to_numpy()[:-1]
        first = g["first_v"].to_numpy()[1:]
        v += int((last > first).sum())
    return n, v, False


def _nd_recompute(input_dir: str, rel_list: list, gval, col: str,
                  by: str, ob: str) -> tuple:
    """Exact (n, v) for ONE group by re-reading just its own files —
    O(affected rows), never a corpus rescan."""
    chunks = []
    for rel in rel_list:
        t = pq.read_table(os.path.join(input_dir, rel),
                          columns=sorted({col, by, ob})).to_pandas()
        chunks.append(t[t[by] == gval] if pd.notna(gval)
                      else t[t[by].isna()])
    st = _nd_group_stats(pd.concat(chunks, ignore_index=True), col, ob)
    return (st[0], st[1]) if st is not None else (0, 0)


def _nd_recompute_fanout(input_dir: str, jobs: list, col: str, by: str,
                         ob: str) -> tuple:
    """Run the interleaved-group exact recomputes as parallel Ray tasks
    (one per group; each reads only its own files) and sum the results —
    the driver never reads input files itself. Serial fallback without a
    Ray session (pure-pandas unit tests)."""
    import ray as _ray
    if not jobs:
        return 0, 0
    if _ray.is_initialized():
        task = _ray.remote(num_cpus=1)(_nd_recompute)
        results = _ray.get([task.remote(input_dir, rels, gval, col, by, ob)
                            for gval, rels in jobs])
    else:
        results = [_nd_recompute(input_dir, rels, gval, col, by, ob)
                   for gval, rels in jobs]
    return (int(sum(n for n, _ in results)),
            int(sum(v for _, v in results)))


def _merge_nd(manifest: dict, part_dir: str, rels: list, spec: dict,
              fold_rows: int = 500_000) -> tuple:
    """Fold one non_decreasing check's per-(file, group) partials — see
    _nd_fold_group. Two-regime like every other merge here: below
    ``fold_rows`` partial rows the driver folds in pandas; above, the
    partials stream through a Ray groupby(by).map_groups and only the
    scalar sums plus the (rare) interleaved groups' file lists come back
    to the driver for exact recompute."""
    col, by, ob = spec["column"], spec["by"], _single_order_by(spec)
    paths, path_rel = [], {}
    for rel in rels:
        p = os.path.join(part_dir, _side_name(rel, spec, "nd"))
        if os.path.exists(p):
            paths.append(p)
            path_rel[os.path.abspath(p)] = rel
    if not paths:
        return 0, 0
    n_total, v_total = 0, 0
    if sum(pq.read_metadata(p).num_rows for p in paths) <= fold_rows:
        frames = []
        for p in paths:
            f = pq.read_table(p).to_pandas()
            f["_rel"] = path_rel[os.path.abspath(p)]
            frames.append(f)
        parts = pd.concat(frames, ignore_index=True)
        jobs = []
        for gval, g in parts.groupby(by, dropna=False, sort=False):
            n, v, rec = _nd_fold_group(g)
            if rec:
                jobs.append((gval, list(g["_rel"])))
                continue
            n_total += n
            v_total += v
        rn, rv = _nd_recompute_fanout(manifest["input_dir"], jobs,
                                      col, by, ob)
        return n_total + rn, v_total + rv

    nd_ds = rd.read_parquet(paths, include_paths=True)
    nd_ds = nd_ds.map_batches(lambda t: t, batch_format="pyarrow")

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.rename(columns={"path": "_path"})
        n, v, rec = _nd_fold_group(g)
        return pd.DataFrame({
            "n": [n], "v": [v], "gkey": [g[by].iloc[0]],
            "rels": ["\n".join(sorted(set(g["_path"]))) if rec else ""]})

    folded = (nd_ds.groupby(by)
              .map_groups(per_group, batch_format="pandas").materialize())
    n_total = int(folded.sum("n"))
    v_total = int(folded.sum("v"))
    over = folded.map_batches(
        lambda df: df[df["rels"] != ""][["gkey", "rels"]],
        batch_format="pandas").to_pandas()
    jobs = [(r.gkey, [path_rel[os.path.abspath(p)]
                      for p in r.rels.split("\n")])
            for r in over.itertuples()]
    rn, rv = _nd_recompute_fanout(manifest["input_dir"], jobs, col, by, ob)
    return n_total + rn, v_total + rv
