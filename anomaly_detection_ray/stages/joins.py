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
