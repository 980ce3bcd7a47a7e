"""Suggested-value repair (normalization) + windowed PercentScore.

Reference provenance:
- LastNAverage / PeriodicLastNAverage: /root/reference/src/normalization.py:24-93
  — on Error, replace the value with the mean of the normalization memory
  (last N values, or N values spaced `period` apart); the repaired value is
  fed back into the normalization memory, making the recurrence
  order-dependent (hence a per-group sequential kernel, exactly like the
  reference's single-threaded loop — but one bounded group per task).
- PercentScore windowed meta-signal: /root/reference/src/algorithms/
  combination.py:178-218 — per-record score (Warning=1, Error=2)/(2K), then a
  trailing event-time window sum divided by max(num_in_interval, n_in_window).

Partitioning assumption: one group = one logical series, bounded size,
sorted in-group by the order columns (same contract as stages/series.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.grading import ERROR_CODE


def last_n_average_repair(values: np.ndarray, codes: np.ndarray, N: int,
                          period: int = 1) -> np.ndarray:
    """Sequential repair pass over one sorted series.

    Returns suggested_value per row: the repaired value where ``codes`` is
    Error and the memory is full, else the raw value. Matches
    OracleLastNAverage / OraclePeriodicLastNAverage (oracle.py) including the
    feedback of repaired values into the normalization memory.
    """
    mem_len = (N - 1) * period + 1
    out = values.astype(np.float64).copy()
    mem: list[float] = []
    for i in range(len(values)):
        v = float(values[i])
        if codes[i] == ERROR_CODE and len(mem) == mem_len:
            repaired = float(np.mean(mem[::period]))
            out[i] = repaired
            mem.append(repaired)
        else:
            mem.append(v)
        if len(mem) > mem_len:
            del mem[0]
    return out


def make_repair_kernel(value_col: str, code_col: str, order_cols: list[str],
                       N: int, period: int = 1,
                       out_col: str = "suggested_value"):
    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        vals = g[value_col].to_numpy(dtype=np.float64)
        codes = g[code_col].to_numpy()
        g[out_col] = last_n_average_repair(vals, codes, N, period)
        return g

    return per_group


def apply_repair(ds, key_col: str, order_cols: list[str], value_col: str,
                 code_col: str, N: int, period: int = 1):
    """Dataset -> Dataset with a ``suggested_value`` column (LastNAverage
    semantics; period>1 gives PeriodicLastNAverage)."""
    kernel = make_repair_kernel(value_col, code_col, order_cols, N, period)
    return ds.groupby(key_col).map_groups(kernel, batch_format="pandas")


def windowed_percent_score(scores: np.ndarray, ts_sec: np.ndarray,
                           interval: float, data_interval: float) -> np.ndarray:
    """Vectorized trailing-window PercentScore (combination.py:204-216):
    sum of per-record scores with timestamp > t_now - interval, divided by
    max(interval/data_interval, n_in_window). Assumes ts_sec sorted asc."""
    num_in_interval = int(interval / data_interval)
    csum = np.concatenate([[0.0], np.cumsum(scores)])
    # first index with ts > t - interval (strictly greater, per reference)
    lo = np.searchsorted(ts_sec, ts_sec - interval, side="right")
    idx = np.arange(len(scores))
    n_in = idx - lo + 1
    wsum = csum[idx + 1] - csum[lo]
    return wsum / np.maximum(num_in_interval, n_in)


def make_percent_score_kernel(code_cols: list[str], ts_col: str,
                              order_cols: list[str], interval: float,
                              data_interval: float, upper_only: bool = False,
                              status_cols: list[str] | None = None,
                              out_col: str = "percent_score"):
    """Per-group kernel: per-record score from K verdict columns then the
    trailing event-time window mean. ``upper_only`` reproduces
    PercentScore_Alicante (count only statuses containing 'upper',
    combination.py:221-265; requires ``status_cols``)."""
    K = len(code_cols)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        codes = np.stack([g[c].to_numpy() for c in code_cols])  # (K, n)
        pts = (codes == 0).astype(np.float64) + 2.0 * (codes == -1)
        if upper_only:
            masks = np.stack([
                g[s].astype(str).str.contains("upper").to_numpy()
                for s in status_cols])
            pts = pts * masks
        score = pts.sum(axis=0) / (2.0 * K)
        ts = g[ts_col]
        if pd.api.types.is_datetime64_any_dtype(ts):
            ts_sec = ((ts - pd.Timestamp(0)) / pd.Timedelta(seconds=1)).to_numpy()
        else:
            ts_sec = ts.to_numpy(dtype=np.float64)
            ts_sec = np.where(ts_sec >= 1e10, ts_sec / 1000.0, ts_sec)
        g[out_col] = windowed_percent_score(score, ts_sec, interval,
                                            data_interval)
        return g

    return per_group


def apply_percent_score(ds, key_col: str, order_cols: list[str],
                        code_cols: list[str], ts_col: str, interval: float,
                        data_interval: float, upper_only: bool = False,
                        status_cols: list[str] | None = None):
    kernel = make_percent_score_kernel(code_cols, ts_col, order_cols, interval,
                                       data_interval, upper_only, status_cols)
    return ds.groupby(key_col).map_groups(kernel, batch_format="pandas")
