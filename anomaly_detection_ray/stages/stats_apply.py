"""Two-regime application of per-group statistics to a fact stream.

The normalization family (zscore / robust-zscore / winsorize / impute)
shares one shape: a per-key stats table (mean/std, median/MAD, quantile
bounds, ...) produced by one grouped pass, then a vectorized elementwise
transform of every fact row using its key's stats. Re-expresses the
reference's per-record normalization chain (``src/normalization.py`` —
one stateful scorer per stream) as two bulk passes.

Applying the stats has two scale regimes, mirroring ``functions/fold``:

- BROADCAST (key count <= ``BROADCAST_MAX_GROUPS``): the stats land on
  the driver as ``dict(key -> stat)``, shipped once via ``ray.put`` and
  mapped per batch. No shuffle of the facts; driver/actor memory is
  O(keys), fine up to millions of keys.
- JOIN (above the threshold): the stats NEVER land on the driver. Both
  sides are tagged, union'ed and co-partitioned by ONE
  ``groupby(key)`` shuffle; each group applies its single stat row to
  its fact rows. This is the 10^9-key shape — the same tagged-union
  pattern as ``stages/joins.semi_mark_keys`` (task-based, safe to mix
  with actor pools, unlike ``Dataset.join``).

Bit-equality contract: the kernel must be elementwise float ops only
(numpy broadcasting) — the broadcast regime feeds it per-row stat
ARRAYS, the join regime per-group SCALARS, and elementwise IEEE ops are
identical either way. Pinned by tests/test_new_ops.py (forced-join vs
broadcast exact equality).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# Above this many groups the stats dict stops being broadcastable:
# 5M keys x ~3 float64 stats ~= 120MB + dict overhead per mapper actor.
# Documented threshold of the broadcast regime; auto mode switches to the
# co-partitioned join-apply past it.
BROADCAST_MAX_GROUPS = 5_000_000

_TAG = "_sa_tag"  # 1 = stats row, 0 = fact row


def group_stats_apply(fact_ds, stats, key: str, stat_cols: list[str],
                      fact_cols: list[str], kernel, value_col: str = "value",
                      mode: str = "auto",
                      broadcast_max_groups: int = BROADCAST_MAX_GROUPS):
    """Apply per-``key`` statistics to every row of ``fact_ds``.

    ``stats``: pandas DataFrame (already-folded small table) OR a
    ``ray.data.Dataset`` with exactly one row per key — the Dataset form
    stays distributed in the join regime.
    ``kernel(v, *stat_values) -> dict[str, np.ndarray]``: elementwise
    transform of the fact value array; receives one argument per entry of
    ``stat_cols`` (arrays in broadcast mode, scalars in join mode).
    ``fact_cols``: passthrough columns (key included) copied to the output
    ahead of the kernel's columns.

    Returns a streaming Dataset — output is corpus-scaled (one row per
    fact row) and never lands on the driver.
    """
    import ray
    import ray.data as rd

    st_ds = None
    if isinstance(stats, pd.DataFrame):
        st_df, n = stats, len(stats)
    else:
        # one row per key: cache blocks so count + reuse don't re-execute
        # the grouped stats pass
        st_ds = stats.materialize()
        n = st_ds.count()
        st_df = None
    if mode == "auto":
        mode = "broadcast" if n <= broadcast_max_groups else "join"

    if mode == "broadcast":
        if st_df is None:
            st_df = st_ds.to_pandas()
        maps = {c: dict(zip(st_df[key].astype(str), st_df[c]))
                for c in stat_cols}
        ref = ray.put(maps)

        def apply(df: pd.DataFrame) -> pd.DataFrame:
            m = ray.get(ref)
            k = df[key].astype(str)
            args = [k.map(m[c]).to_numpy(np.float64) for c in stat_cols]
            v = df[value_col].to_numpy(np.float64)
            out = {c: df[c] for c in fact_cols}
            out.update(kernel(v, *args))
            return pd.DataFrame(out)

        return fact_ds.map_batches(apply, batch_format="pandas")

    if mode != "join":
        raise ValueError(f"unknown mode {mode!r}")

    if st_ds is None:
        st_ds = rd.from_pandas(st_df)

    # Tagged union: identical schemas on both sides. Fact columns on the
    # stats side are filled with a SAME-DTYPE zero sentinel (filtered out
    # by the tag) so integer ids don't get NaN-poisoned to float64 across
    # the union; stat columns on the fact side are float NaN.
    carry = list(fact_cols) + ([value_col] if value_col not in fact_cols
                               else [])
    cols = [*carry, *stat_cols, _TAG]
    sch = fact_ds.schema()

    def _np_type(t):
        try:
            return t.to_pandas_dtype()   # pyarrow DataType
        except AttributeError:
            return t                     # already a python/numpy type

    fact_np = {n: _np_type(t)
               for n, t in zip(sch.names, sch.types) if n in carry}

    def _sentinel(n_rows: int, dtype):
        try:
            return np.zeros(n_rows, dtype=dtype)
        except (TypeError, ValueError):  # object/string columns
            return np.full(n_rows, "", dtype=object)

    def fact_side(df: pd.DataFrame) -> pd.DataFrame:
        out = {c: df[c] for c in carry}
        for c in stat_cols:
            out[c] = np.full(len(df), np.nan)
        out[_TAG] = np.zeros(len(df), dtype=np.int8)
        return pd.DataFrame(out)[cols]

    def stats_side(df: pd.DataFrame) -> pd.DataFrame:
        # key dtype must match the fact side exactly for the union schema
        out = {key: df[key].astype(fact_np[key]) if key in fact_np
               else df[key]}
        for c in carry:
            if c != key:
                out[c] = _sentinel(len(df), fact_np.get(c, np.float64))
        for c in stat_cols:
            out[c] = df[c].astype(np.float64)
        out[_TAG] = np.ones(len(df), dtype=np.int8)
        return pd.DataFrame(out)[cols]

    tagged = (fact_ds.map_batches(fact_side, batch_format="pandas")
              .union(st_ds.map_batches(stats_side, batch_format="pandas")))

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        srow = g[g[_TAG] == 1]
        f = g[g[_TAG] == 0]
        args = [float(srow[c].iloc[0]) if len(srow) else float("nan")
                for c in stat_cols]
        v = f[value_col].to_numpy(np.float64)
        out = {c: f[c] for c in fact_cols}
        out.update(kernel(v, *args))
        return pd.DataFrame(out)

    return tagged.groupby(key).map_groups(per_group, batch_format="pandas")
