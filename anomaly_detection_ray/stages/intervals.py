"""Distributed interval (range) join.

Completes the join family (broadcast lookup, anti-join, equi-shuffle,
as-of): match left rows whose timestamp falls inside [start, end] of any
right-side interval with the same key — the classic event-in-window
containment join neither ``Dataset.join`` (equi only) nor merge_asof
(nearest only) expresses.

Scale shape — time-bucket replication, the standard distributed interval
join: each interval row is replicated to every length-``bucket_s`` time
bucket it overlaps (cost = interval_span/bucket_s copies, small when
bucket_s ≈ typical span); each left row goes to exactly ONE bucket, so
every matching pair materializes in exactly one group and no dedup pass is
needed. One union + groupby((bucket, key)) shuffle co-partitions both
sides; the in-group containment test is a vectorized numpy broadcast
(bounded by per-bucket×key counts). Timestamps compare in integer
microseconds — boundary-exact vs a SQL BETWEEN oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.rayutil import ramp_offsets
from .sessions import _epoch_us

US = 1_000_000


def interval_join(left, intervals: pd.DataFrame, key: str, ts_col: str,
                  left_cols: list[str], id_col: str,
                  start_col: str = "start_us", end_col: str = "end_us",
                  bucket_s: float = 3600.0):
    """Left Dataset × small-to-medium interval table (driver pandas —
    broadcast via closure capture; for a LARGE interval side, feed the
    replicated interval rows through the same union/groupby path as
    stages/asof.asof_join instead).

    ``intervals`` columns: key, id_col, start_col, end_col (epoch µs
    int64). Returns one row per (left row ∈ interval): ``left_cols`` +
    ``id_col`` — inclusive bounds, exactly SQL ``BETWEEN``.
    """
    if not isinstance(intervals, pd.DataFrame):
        return interval_join_large(left, intervals, key, ts_col, left_cols,
                                   id_col, start_col, end_col, bucket_s)
    bucket_us = int(round(bucket_s * US))
    iv = intervals[[key, id_col, start_col, end_col]].reset_index(drop=True)
    # replicate each interval to every bucket it overlaps
    b0 = (iv[start_col] // bucket_us).to_numpy(np.int64)
    b1 = (iv[end_col] // bucket_us).to_numpy(np.int64)
    reps = (b1 - b0 + 1).astype(np.int64)
    rep_idx = np.repeat(np.arange(len(iv)), reps)
    offs = ramp_offsets(reps)
    ivr = iv.iloc[rep_idx].reset_index(drop=True)
    ivr["__bucket"] = b0[rep_idx] + offs
    # group the replicated intervals by (bucket, key) for O(1) group lookup;
    # broadcast ONCE via ray.put (zero-copy read per worker), not per batch
    import ray
    iv_ref = ray.put({k: g for k, g in ivr.groupby(["__bucket", key])})

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        iv_groups = ray.get(iv_ref)
        us = _epoch_us(df[ts_col])
        bucket = us // bucket_us
        out = []
        for (b, k), rows in pd.DataFrame(
                {"__bucket": bucket, key: df[key],
                 "__row": np.arange(len(df))}).groupby(["__bucket", key]):
            g = iv_groups.get((b, k))
            if g is None:
                continue
            l_us = us[rows["__row"].to_numpy()]
            hit = ((l_us[:, None] >= g[start_col].to_numpy()[None, :])
                   & (l_us[:, None] <= g[end_col].to_numpy()[None, :]))
            li, ri = np.nonzero(hit)
            if len(li):
                part = df.iloc[rows["__row"].to_numpy()[li]][left_cols].copy()
                part[id_col] = g[id_col].to_numpy()[ri]
                out.append(part)
        if not out:
            return pd.DataFrame(columns=[*left_cols, id_col])
        return pd.concat(out, ignore_index=True)

    return left.map_batches(probe, batch_format="pandas")


def interval_join_large(left, intervals, key: str, ts_col: str,
                        left_cols: list[str], id_col: str,
                        start_col: str = "start_us", end_col: str = "end_us",
                        bucket_s: float = 3600.0):
    """Interval join for a LARGE interval Dataset (no broadcast): the
    replicated interval rows and the bucketed left rows meet in ONE
    ``groupby((bucket, key))`` shuffle (the asof_join co-partition
    pattern); the in-group containment test is the same numpy broadcast.
    Exactly-once pair emission holds for the same reason as the broadcast
    path — a left row lives in exactly one bucket.

    Schema contract: ``left_cols`` (except ``key``) and ``id_col`` must be
    NUMERIC — both sides pad missing columns and the union schema is
    aligned by casting to float64 (exact up to 2^53; cast ids back in the
    caller). String payloads belong on the broadcast path."""
    import numpy as np

    from ..functions.rayutil import arrowize

    bucket_us = int(round(bucket_s * US))

    # pads force float64 on both sides so the union schema is exact;
    # numeric values are exact in float64 up to 2^53 — callers cast back
    def rep_intervals(df: pd.DataFrame) -> pd.DataFrame:
        b0 = (df[start_col] // bucket_us).to_numpy(np.int64)
        b1 = (df[end_col] // bucket_us).to_numpy(np.int64)
        reps = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(df)), reps)
        offs = ramp_offsets(reps)
        out = df.iloc[idx][[key, id_col, start_col, end_col]].copy()
        for c in [id_col, start_col, end_col]:
            out[c] = out[c].astype(np.float64)
        out["__bucket"] = b0[idx] + offs
        out["__side"] = np.int8(0)
        for c in left_cols:
            if c not in out.columns:
                out[c] = np.nan
        out["__ts_us"] = np.int64(0)
        return out.reset_index(drop=True)

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        us = _epoch_us(df[ts_col])
        out = df[[key, *[c for c in left_cols if c != key]]].copy()
        for c in out.columns:
            if c != key:
                if not np.issubdtype(out[c].dtype, np.number):
                    raise TypeError(
                        f"interval_join_large: left column {c!r} is "
                        f"{out[c].dtype} — non-key columns must be numeric "
                        "(use the broadcast interval_join for string payloads)")
                out[c] = out[c].astype(np.float64)
        out["__bucket"] = us // bucket_us
        out["__side"] = np.int8(1)
        out[id_col] = np.nan
        out[start_col] = 0.0
        out[end_col] = 0.0
        out["__ts_us"] = us
        return out

    cols = [key, id_col, start_col, end_col, "__bucket", "__side",
            *[c for c in left_cols if c != key], "__ts_us"]
    u = (arrowize(left.map_batches(
            lambda df: tag_left(df)[cols], batch_format="pandas"))
         .union(arrowize(intervals.map_batches(
            lambda df: rep_intervals(df)[cols], batch_format="pandas"))))

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        iv = df[df["__side"] == 0]
        lf = df[df["__side"] == 1]
        if not len(iv) or not len(lf):
            return pd.DataFrame(columns=[*left_cols, id_col])
        l_us = lf["__ts_us"].to_numpy(np.int64)
        hit = ((l_us[:, None] >= iv[start_col].to_numpy()[None, :])
               & (l_us[:, None] <= iv[end_col].to_numpy()[None, :]))
        li, ri = np.nonzero(hit)
        if not len(li):
            return pd.DataFrame(columns=[*left_cols, id_col])
        out = lf.iloc[li][left_cols].copy()
        out[id_col] = iv[id_col].to_numpy()[ri]
        return out.reset_index(drop=True)

    return (u.groupby(["__bucket", key])
            .map_groups(probe, batch_format="pandas"))
