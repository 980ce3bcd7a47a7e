"""Skew-aware (hybrid) equi-join.

A plain hash-shuffle join sends every row of a hot key to ONE reduce
partition — at 100 TB a single viral key can stall the whole exchange.
The standard fix is the hybrid join implemented here:

1. Count left-side keys (per-batch partials → cardinality-aware fold, so
   the count itself never concentrates); keys with ≥ ``hot_threshold``
   rows are HOT.
2. The right-side rows of hot keys (dimension-like: few hot keys × few
   rows each) are broadcast once via ``ray.put``; hot left rows join
   against them INSIDE ``map_batches`` — no shuffle ever sees a hot key.
3. Cold rows on both sides go through the native hash-shuffle
   ``Dataset.join``, now guaranteed skew-free.
4. The two streams union; schemas are identical by construction.

The split is semantically invisible (inner-join output equals a plain
join), so a plain SQL join stays a valid oracle for any threshold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray


def skew_aware_join(left, right, left_on: str, right_on: str,
                    hot_threshold: int = 10_000, num_partitions: int = 16):
    """Inner equi-join of two Datasets, hot keys broadcast, cold keys
    shuffled. Right side must be dimension-like on hot keys (their right
    rows are collected + broadcast)."""
    from ..functions.fold import fold_partials

    def key_part(df: pd.DataFrame) -> pd.DataFrame:
        return (pd.DataFrame({left_on: df[left_on], "n": 1})
                .groupby(left_on, as_index=False).sum())

    counts = fold_partials(left.map_batches(key_part, batch_format="pandas"),
                           [left_on], {"n": "sum"})
    hot_keys = (set() if counts.empty
                else set(counts.loc[counts["n"] >= hot_threshold, left_on]))

    if not hot_keys:
        return left.join(right, join_type="inner",
                         num_partitions=num_partitions,
                         on=(left_on,), right_on=(right_on,))

    hot_arr = np.array(sorted(hot_keys))
    hot_ref = ray.put(hot_arr)

    def right_hot_part(df: pd.DataFrame) -> pd.DataFrame:
        h = ray.get(hot_ref)
        return df[df[right_on].isin(h)]

    right_hot = (right.map_batches(right_hot_part, batch_format="pandas")
                 .to_pandas())
    rh_ref = ray.put(right_hot)

    def probe_hot(df: pd.DataFrame) -> pd.DataFrame:
        h = ray.get(hot_ref)
        rh = ray.get(rh_ref)
        mine = df[df[left_on].isin(h)]
        return mine.merge(rh, left_on=left_on, right_on=right_on,
                          how="inner")

    def keep_cold(df: pd.DataFrame) -> pd.DataFrame:
        h = ray.get(hot_ref)
        return df[~df[left_on].isin(h)]

    def keep_cold_right(df: pd.DataFrame) -> pd.DataFrame:
        h = ray.get(hot_ref)
        return df[~df[right_on].isin(h)]

    hot_out = left.map_batches(probe_hot, batch_format="pandas")
    cold_out = (left.map_batches(keep_cold, batch_format="pandas")
                .join(right.map_batches(keep_cold_right,
                                        batch_format="pandas"),
                      join_type="inner", num_partitions=num_partitions,
                      on=(left_on,), right_on=(right_on,)))

    from ..functions.rayutil import arrowize
    return arrowize(hot_out).union(arrowize(cold_out))


def anti_join_keys(left, keys, on: str):
    """Distributed LEFT ANTI join against a key-only Dataset.

    Removes every left row whose ``on`` value appears in ``keys`` without
    ever collecting the key set on the driver — the drop-set application
    path for victim sets too large to broadcast (pipelines/text_prep).

    Routed through the groupby machinery rather than the native
    ``Dataset.join(join_type="left_anti")``: ray 2.49's hash-shuffle join
    intermittently fails ("No match ... for key field reference on right
    side") when right hash partitions come up EMPTY, which a sparse drop
    set guarantees. Shape: tag both sides, union (right rows null-padded
    to the left schema), group by key, emit only untagged groups. One
    all-to-all exchange of the left side — the inherent cost of a filter
    set that cannot be broadcast."""
    import pyarrow as pa

    schema = left.schema().base_schema
    names = list(schema.names)

    def tag_left(t: pa.Table) -> pa.Table:
        t = t.select(names)
        return t.append_column(
            "__side", pa.array(np.zeros(t.num_rows, dtype=np.int8)))

    def tag_right(t: pa.Table) -> pa.Table:
        # empty blocks out of upstream groupby stages can arrive with NO
        # columns at all (ray 2.49 wart); normalize them to the schema
        n = t.num_rows if on in t.column_names else 0
        cols = {}
        for c in names:
            typ = schema.field(c).type
            cols[c] = (t[on].cast(typ) if c == on and n
                       else pa.nulls(n, type=typ))
        return pa.table(cols).append_column(
            "__side", pa.array(np.ones(n, dtype=np.int8)))

    both = (left.map_batches(tag_left, batch_format="pyarrow")
            .union(keys.map_batches(tag_right, batch_format="pyarrow")))

    def keep_unmatched(t: pa.Table) -> pa.Table:
        side = t["__side"].to_numpy(zero_copy_only=False)
        out = t.drop_columns(["__side"])
        return out.slice(0, 0) if (side == 1).any() else out

    return both.groupby(on).map_groups(keep_unmatched,
                                       batch_format="pyarrow")


def semi_mark_keys(left, keys, on: str, mark: str = "__hit",
                   num_buckets: int = 64):
    """Distributed LEFT SEMI mark-join: append a boolean ``mark`` column
    to ``left`` (True iff the row's ``on`` value appears in the key-only
    Dataset ``keys``) without ever collecting the key set on the driver —
    the membership-flag path for sets too large to broadcast
    (pipelines/validate pass-B duplicate flag on dup-heavy tables).

    Built from the same tagged-union + groupby machinery as
    anti_join_keys — ray 2.49's native ``Dataset.join`` spawns
    num_partitions CPU-holding aggregator ACTORS that starve against a
    pipeline's own actor pools on small CPU budgets (observed wedge at 4
    CPUs with a fidelity pool + metrics actor holding 3 of them), and
    mishandles empty right hash partitions — but grouped by a HASH BUCKET
    of the key instead of the key itself, so the one all-to-all exchange
    yields ``num_buckets`` bounded groups and each group resolves
    membership with ONE vectorized ``np.isin`` rather than per-key group
    calls. Size ``num_buckets`` so |left| / num_buckets fits a worker
    heap — the caller scales it with the data."""
    import pyarrow as pa

    from ..functions.rayutil import arrowize

    left = arrowize(left)
    keys = arrowize(keys)
    schema = left.schema().base_schema
    names = list(schema.names)

    def bucket_of(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
        vals = np.asarray(col.to_pandas())
        return (pd.util.hash_array(vals) % num_buckets).astype(np.int32)

    def tag_left(t: pa.Table) -> pa.Table:
        t = t.select(names)
        t = t.append_column(
            "__side", pa.array(np.zeros(t.num_rows, dtype=np.int8)))
        return t.append_column("__bucket", pa.array(bucket_of(t[on])))

    def tag_right(t: pa.Table) -> pa.Table:
        # empty blocks out of upstream groupby stages can arrive with NO
        # columns at all (ray 2.49 wart); normalize them to the schema
        n = t.num_rows if on in t.column_names else 0
        cols = {}
        for c in names:
            typ = schema.field(c).type
            cols[c] = (t[on].cast(typ) if c == on and n
                       else pa.nulls(n, type=typ))
        out = pa.table(cols)
        out = out.append_column(
            "__side", pa.array(np.ones(n, dtype=np.int8)))
        return out.append_column("__bucket", pa.array(bucket_of(out[on])))

    both = (left.map_batches(tag_left, batch_format="pyarrow")
            .union(keys.map_batches(tag_right, batch_format="pyarrow")))

    def mark_bucket(t: pa.Table) -> pa.Table:
        side = t["__side"].to_numpy(zero_copy_only=False)
        vals = np.asarray(t[on].to_pandas())
        hits = np.isin(vals[side == 0], vals[side == 1])
        out = t.drop_columns(["__side", "__bucket"])
        out = out.filter(pa.array(side == 0))
        return out.append_column(mark, pa.array(hits))

    marked = both.groupby("__bucket").map_groups(mark_bucket,
                                                 batch_format="pyarrow")

    def fix_schema(t: pa.Table) -> pa.Table:
        # groupby over an empty union leg can emit schema-less blocks
        if mark in t.column_names:
            return t
        cols = {c: pa.nulls(0, type=schema.field(c).type) for c in names}
        cols[mark] = pa.array([], type=pa.bool_())
        return pa.table(cols)

    return marked.map_batches(fix_schema, batch_format="pyarrow")
