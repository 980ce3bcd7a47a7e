"""Event-time sessionization (gap windows).

The reference's only windowing is trailing per-record state (SURVEY §2.3);
sessions are the designed wide-op counterpart a training-data/event
pipeline needs: group a keyed event stream into sessions separated by
quiet gaps > ``gap_s``, one output row per session.

Ray mapping: the classic gaps-and-islands computation is a per-key ordered
kernel — ``groupby(key).map_groups`` with an in-group sort, vectorized
diff/cumsum (no Python row loop). ONE shuffle on the series key, same
partitioning assumption as every series check (stages/series.py:12-16:
a single key's history fits one worker; keys themselves are unbounded).
Timestamps are compared in integer microseconds so the boundary predicate
is exact (matches DuckDB ``date_diff('microsecond', ...)``, no float-edge
disagreement with the SQL oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.rayutil import ramp_offsets

US = 1_000_000


def _epoch_us(ts: pd.Series) -> np.ndarray:
    """Unit-robust integer microseconds since epoch (us- or ns-backed)."""
    if pd.api.types.is_datetime64_any_dtype(ts):
        return ((ts - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
                ).to_numpy(dtype=np.int64)
    # round, don't truncate: float-second inputs like 123.449999999
    # (a µs value round-tripped through division) must land on the µs
    return np.round(ts.to_numpy(dtype=np.float64) * US).astype(np.int64)


def sliding_window_agg(ds, key: str, ts_col: str, value_col: str,
                       window_s: float, slide_s: float):
    """Event-time SLIDING window aggregate (count + sum per (window, key)):
    window k covers [k·slide, k·slide + window). Completes the window
    family: tumbling (= slide == window, q_events_hourly), session
    (sessionize), sliding (this).

    Scale shape: each row is replicated to its window/slide ≈ constant
    number of covering windows INSIDE map_batches (np.repeat — no Python
    loop), partially aggregated per batch, then merged by the
    cardinality-aware fold; no row-level shuffle ever happens. Window
    membership is computed on integer µs so edges match a SQL
    generate_series oracle exactly."""
    from ..functions.fold import fold_partials
    w_us, s_us = int(round(window_s * US)), int(round(slide_s * US))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(dtype=np.float64)
        ok = ~np.isnan(v)
        us = _epoch_us(df[ts_col])[ok]
        v = v[ok]
        keys = df[key].to_numpy()[ok]
        k_lo = (us - w_us) // s_us + 1   # first covering window
        k_hi = us // s_us                # last covering window
        reps = (k_hi - k_lo + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(us)), reps)
        offs = ramp_offsets(reps)
        g = pd.DataFrame({"window_id": k_lo[idx] + offs, key: keys[idx],
                          "sum_v": v[idx], "n": 1})
        return g.groupby(["window_id", key], as_index=False).sum()

    return fold_partials(ds.map_batches(partial, batch_format="pandas"),
                         ["window_id", key], {"sum_v": "sum", "n": "sum"})


def sessionize(ds, key: str, ts_col: str, gap_s: float,
               order_cols: list[str] | None = None):
    """Dataset -> one row per (key, session): ``session_id`` (1-based per
    key, in time order), ``n_events``, ``start_us``, ``end_us``,
    ``duration_s``. A new session starts when the gap to the previous
    event of the same key strictly exceeds ``gap_s``."""
    gap_us = int(round(gap_s * US))

    def kern(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([ts_col, *(order_cols or [])], kind="mergesort")
        us = _epoch_us(df[ts_col])
        new_s = np.ones(len(us), dtype=np.int64)
        new_s[1:] = (np.diff(us) > gap_us).astype(np.int64)
        sid = np.cumsum(new_s)
        g = (pd.DataFrame({"session_id": sid, "n_events": 1,
                           "start_us": us, "end_us": us})
             .groupby("session_id", as_index=False)
             .agg(n_events=("n_events", "sum"), start_us=("start_us", "min"),
                  end_us=("end_us", "max")))
        g.insert(0, key, df[key].iloc[0])
        g["duration_s"] = np.round((g["end_us"] - g["start_us"]) / US, 6)
        return g

    return ds.groupby(key).map_groups(kern, batch_format="pandas")
