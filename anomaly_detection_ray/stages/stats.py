"""Dataset-level and grouped statistics via partial aggregation.

Pattern (ray_guide "Aggregation at scale"): every batch emits ONE tiny
partial row per key — Welford (n, mean, M2, min, max) tuples, serialized
t-digests, HLL registers — and a second, small ``groupby`` (or driver fold,
when the partial count is O(#batches)) merges them. No full-row shuffle ever
happens; the only data movement is the partials.

Skew: grouped stats key on ``codec`` which is deliberately hot (70%
pcm_s16le, FIXTURES.md §B). Partials are emitted per (codec, salt) with
salt = hash(clip_id) % n_salts, merged in two levels: groupby((codec, salt))
then a tiny groupby(codec) — so no single reducer sees the hot key's full
row stream (SURVEY.md §4 "skew").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.sketches import HyperLogLog, TDigest, WelfordPartial

WELFORD_FIELDS = ["n", "mean", "M2", "min", "max"]


def _col_f64(t: pa.Table, col: str) -> np.ndarray:
    return pc.cast(t[col], pa.float64()).to_numpy(zero_copy_only=False)


def welford_partial_batch(t: pa.Table, value_col: str,
                          key_col: str | None = None,
                          n_salts: int = 0,
                          salt_col: str | None = None) -> pa.Table:
    """Per-batch Welford partials: one output row per key (× salt)."""
    vals = _col_f64(t, value_col)
    if key_col is None:
        p = WelfordPartial.from_values(vals)
        return pa.table({
            "key": pa.array([""], type=pa.string()),
            "salt": pa.array([0], type=pa.int32()),
            "n": [float(p.n)], "mean": [p.mean], "M2": [p.M2],
            "min": [p.min], "max": [p.max],
        })
    # fill BEFORE the cast: astype(str) would stringify nulls to 'nan'/
    # 'None' first, colliding with genuine 'nan' string keys instead of
    # landing in the intended empty-string bucket
    keys = t[key_col].to_pandas().fillna("").astype(str)
    if n_salts > 1:
        sc = salt_col if salt_col is not None and salt_col in t.column_names else None
        if sc is None:
            sc = "clip_id" if "clip_id" in t.column_names else t.column_names[0]
        salt = (pd.util.hash_pandas_object(
            t[sc].to_pandas(), index=False).to_numpy() % n_salts).astype(np.int32)
    else:
        salt = np.zeros(len(keys), dtype=np.int32)
    df = pd.DataFrame({"key": keys, "salt": salt, "v": vals})
    rows = {"key": [], "salt": [], "n": [], "mean": [], "M2": [], "min": [], "max": []}
    for (k, s), grp in df.groupby(["key", "salt"], sort=False):
        p = WelfordPartial.from_values(grp["v"].to_numpy())
        rows["key"].append(k)
        rows["salt"].append(s)
        rows["n"].append(float(p.n))
        rows["mean"].append(p.mean)
        rows["M2"].append(p.M2)
        rows["min"].append(p.min)
        rows["max"].append(p.max)
    return pa.table({"key": pa.array(rows["key"], type=pa.string()),
                     "salt": pa.array(rows["salt"], type=pa.int32()),
                     **{f: pa.array(rows[f], type=pa.float64()) for f in WELFORD_FIELDS}})


def _merge_partial_group(g: pd.DataFrame) -> pd.DataFrame:
    acc = WelfordPartial()
    for _, r in g.iterrows():
        acc = acc.merge(WelfordPartial(int(r["n"]), r["mean"], r["M2"], r["min"], r["max"]))
    return pd.DataFrame({
        "key": [g["key"].iloc[0]], "salt": [int(g["salt"].iloc[0])],
        "n": [float(acc.n)], "mean": [acc.mean],
        "M2": [acc.M2], "min": [acc.min], "max": [acc.max],
    })


def grouped_welford(ds, value_col: str, key_col: str | None,
                    n_salts: int = 8, salt_col: str | None = None,
                    as_dataset: bool = False):
    """Full two-level salted merge over a Dataset (Chan parallel-merge
    form), one row per key with n/mean/std/min/max. Both merge levels are
    distributed groupbys; ``as_dataset=True`` returns the per-key table
    as a Dataset so billion-key stats never land on the driver (feeds
    stats_apply's join regime), else a pandas frame sorted by key."""
    partials = ds.map_batches(
        lambda t: welford_partial_batch(t, value_col, key_col, n_salts, salt_col),
        batch_format="pyarrow")
    level1 = partials.groupby(["key", "salt"]).map_groups(
        _merge_partial_group, batch_format="pandas")

    def merge_salts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("salt")  # deterministic merge association
        acc = WelfordPartial()
        for _, r in g.iterrows():
            acc = acc.merge(WelfordPartial(int(r["n"]), r["mean"],
                                           r["M2"], r["min"], r["max"]))
        return pd.DataFrame([{"key": g["key"].iloc[0], "n": acc.n,
                              "mean": acc.mean, "std": acc.std,
                              "std_sample": acc.std_sample,
                              "min": acc.min, "max": acc.max}])

    if as_dataset:
        # scale regime: the salt merge is itself a distributed groupby —
        # one row per key never lands on the driver
        return level1.groupby("key").map_groups(merge_salts,
                                                batch_format="pandas")
    # small regime: collect the <= keys x salts partials and fold on the
    # driver (the second groupby shuffle costs ~0.3 s fixed at gate scale
    # for nothing when the result is driver-bound anyway); same
    # deterministic salt-order association as merge_salts
    small = level1.to_pandas()
    out = [merge_salts(g) for _, g in small.groupby("key", sort=True)]
    if not out:
        return pd.DataFrame(columns=["key", "n", "mean", "std",
                                     "std_sample", "min", "max"])
    return pd.concat(out, ignore_index=True)


def global_welford(ds, value_col: str) -> WelfordPartial:
    """Dataset-level Welford: one partial row per batch, folded on the driver
    (#batches rows — no shuffle at all)."""
    partials = ds.map_batches(
        lambda t: welford_partial_batch(t, value_col), batch_format="pyarrow")
    acc = WelfordPartial()
    for b in partials.iter_batches(batch_format="pandas", batch_size=4096):
        for _, r in b.iterrows():
            acc = acc.merge(WelfordPartial(int(r["n"]), r["mean"], r["M2"], r["min"], r["max"]))
    return acc


def tdigest_column(ds, value_col: str, delta: int = 200) -> TDigest:
    """Mergeable t-digest of one column: one serialized digest per batch,
    merged on the driver."""
    def batch_digest(t: pa.Table) -> pa.Table:
        td = TDigest(delta)
        td.add_values(_col_f64(t, value_col))
        return pa.table({"sketch": pa.array([td.to_bytes()], type=pa.binary())})

    acc = TDigest(delta)
    for b in ds.map_batches(batch_digest, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=4096):
        for s in b["sketch"].to_pylist():
            acc = acc.merge(TDigest.from_bytes(s))
    return acc


def hll_column(ds, key_col: str, p: int = 14) -> HyperLogLog:
    """HLL distinct-count of a string column: per-batch registers, driver merge."""
    def batch_hll(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(t[key_col].to_pandas(), index=False).to_numpy()
        hll = HyperLogLog(p)
        hll.add_hashes(h.astype(np.uint64))
        return pa.table({"registers": pa.array([hll.registers.tobytes()], type=pa.binary())})

    acc = HyperLogLog(p)
    for b in ds.map_batches(batch_hll, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=4096):
        for r in b["registers"].to_pylist():
            other = HyperLogLog(p)
            other.registers = np.frombuffer(r, dtype=np.uint8).copy()
            acc = acc.merge(other)
    return acc


def profile_table(ds, columns: list[str] | None = None,
                  round_to: int = 4) -> pd.DataFrame:
    """Single-pass column profiler (the engine's ``describe``): one
    ``map_batches`` pass emits per-batch per-column partials — Welford
    (n, mean, M2, min, max) for numeric columns, null counts and
    lexicographic min/max for strings — merged on the driver
    (#cols × #batches tiny rows, the documented small-partials fold).

    Returns one row per column, deterministic order:
    (column_name, dtype, n_rows, n_null, n_valid, min, max, mean, std) —
    numeric min/max/mean/std are float64 (std population, matching the
    engine's Welford); string columns carry min/max as strings in
    ``min_str``/``max_str`` and NaN numerics. Float NaNs count as invalid
    (like nulls) for the numeric stats — stated so the SQL oracle can
    mirror it exactly."""
    s = ds.schema()
    types = dict(zip(s.names, s.types))
    cols = columns or list(s.names)
    numeric = numeric_profile_cols(types, cols)

    def partial(t: pa.Table) -> pd.DataFrame:
        return profile_partial_frame(t, cols, numeric)

    parts = (ds.select_columns(cols)
             .map_batches(partial, batch_format="pyarrow").to_pandas())
    return merge_profile_partials(parts, cols, types, numeric, round_to)


def numeric_profile_cols(types: dict, cols: list[str]) -> set[str]:
    return {c for c in cols
            if isinstance(types[c], pa.DataType)
            and (pa.types.is_integer(types[c])
                 or pa.types.is_floating(types[c]))}


def profile_partial_frame(t: pa.Table, cols: list[str],
                          numeric: set[str]) -> pd.DataFrame:
    """One mergeable profile-partial row per column for one Arrow batch —
    shared by the one-shot profiler above and the incremental
    per-file profile store (pipelines/profile_store)."""
    rows = []
    for c in cols:
        arr = t[c]
        n = len(arr)
        nulls = arr.null_count
        if c in numeric:
            x = pc.cast(arr.drop_null(), pa.float64()).to_numpy(
                zero_copy_only=False)
            x = x[~np.isnan(x)]
            w = WelfordPartial.from_values(x)
            rows.append((c, n, nulls, w.n, w.mean, w.M2,
                         w.min, w.max, None, None))
        else:
            v = arr.drop_null()
            if len(v):
                mm = pc.min_max(v).as_py()
                lo, hi = str(mm["min"]), str(mm["max"])
            else:
                lo = hi = None
            rows.append((c, n, nulls, 0, 0.0, 0.0,
                         np.inf, -np.inf, lo, hi))
    return pd.DataFrame(rows, columns=[
        "column_name", "n", "nulls", "wn", "wmean", "wM2",
        "wmin", "wmax", "smin", "smax"])


def merge_profile_partials(parts: pd.DataFrame, cols: list[str],
                           types: dict, numeric: set[str],
                           round_to: int = 4) -> pd.DataFrame:
    out = []
    for c in cols:
        g = parts[parts["column_name"] == c]
        n_rows = int(g["n"].sum())
        n_null = int(g["nulls"].sum())
        if c in numeric:
            acc = WelfordPartial()
            for r in g.itertuples(index=False):
                acc = acc.merge(WelfordPartial(int(r.wn), float(r.wmean),
                                               float(r.wM2), float(r.wmin),
                                               float(r.wmax)))
            has = acc.n > 0
            out.append((c, str(types[c]), n_rows, n_null, acc.n,
                        round(acc.min, round_to) if has else np.nan,
                        round(acc.max, round_to) if has else np.nan,
                        round(acc.mean, round_to) if has else np.nan,
                        round(acc.std, round_to) if has else np.nan,
                        None, None))
        else:
            lo = g["smin"].dropna()
            hi = g["smax"].dropna()
            out.append((c, str(types[c]), n_rows, n_null, n_rows - n_null,
                        np.nan, np.nan, np.nan, np.nan,
                        lo.min() if len(lo) else None,
                        hi.max() if len(hi) else None))
    df = pd.DataFrame(out, columns=[
        "column_name", "dtype", "n_rows", "n_null", "n_valid",
        "min", "max", "mean", "std", "min_str", "max_str"])
    return df.sort_values("column_name").reset_index(drop=True)


def topk_per_group(ds, key: str, score_col: str, k: int,
                   tiebreak: str, as_dataset: bool = True):
    """Per-key top-k selection WITHOUT a global sort — the per-domain
    "keep the best k documents" primitive of curation pipelines. Each
    batch emits its LOCAL top-k per key (bounded partial: <= k rows per
    key per batch — the candidate contract that keeps the exchange slim),
    then ONE groupby(key) merges candidates and cuts the final k with a
    dense 1..k rank. Ordering is (score DESC, tiebreak ASC) — exactly SQL
    ``row_number() OVER (PARTITION BY key ORDER BY score DESC, tiebreak)``
    semantics, so the result is deterministic and oracle-checkable.
    Output is <= k x |keys| rows (bounded grain)."""

    def local(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([score_col, tiebreak],
                            ascending=[False, True], kind="mergesort")
        return df.groupby(key, as_index=False, sort=False).head(k)

    parts = ds.map_batches(local, batch_format="pandas")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([score_col, tiebreak],
                          ascending=[False, True], kind="mergesort").head(k)
        return g.assign(rk=np.arange(1, len(g) + 1, dtype=np.int64))

    out = parts.groupby(key).map_groups(final, batch_format="pandas")
    return out if as_dataset else out.to_pandas()
