"""Feature construction as a vectorized per-group Ray Data stage.

Re-expresses the reference's stateful sliding-window feature builder
(/root/reference/src/algorithms/anomaly_detection.py:288-452) columnar-ly:
the oracle (oracle.py FeatureConstruction) implements the *intended*
semantics pinned by /root/reference/src/unit_tests.py:1089-1175 (the code at
head crashes on averages/shifts — SURVEY.md §2.3); this stage reproduces the
oracle vectorized, one sorted group at a time.

Output layout (unit-test order): [raw features..., trailing averages...,
periodic strided averages..., shifts..., time features (month, day, weekday,
hour, minute)...], then optional use_cols selection. Rows whose rolling
memory is not yet full (first memory_size-1 of each series) get
``fv_valid=False`` and NaN features — the reference returns False and skips
the record.

Partitioning assumption: one group = one logical series, bounded size,
in-group sort by the order columns (same contract as stages/series.py).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd


class FeatureConfig:
    """Mirror of the per-feature config lists (averages / periodic_averages /
    shifts / time_features / max_memory / use_cols), with the reference's
    memory_size formula (anomaly_detection.py:130-168)."""

    def __init__(self, n_features: int = 1, averages=None, periodic_averages=None,
                 shifts=None, time_features=None, max_memory: int = 0,
                 use_cols=None):
        self.n_features = n_features
        self.averages = averages or []
        self.periodic_averages = periodic_averages or []
        self.shifts = shifts or []
        self.time_features = time_features or []
        self.use_cols = use_cols

        max_shift = 0
        if self.shifts:
            max_shift = max((max(s) if s else 0) for s in self.shifts) + 1
        max_average = 0
        if self.averages:
            max_average = max((max(a) if a else 0) for a in self.averages)
        max_periodic = 0
        for feature_avgs in self.periodic_averages:
            for period, ns in feature_avgs:
                max_periodic = max(max_periodic, 1 + period * (max(ns) - 1))
        self.memory_size = max(max_shift, max_average, max_periodic,
                               max_memory, 1)


def construct_features(mat: np.ndarray, ts_sec: np.ndarray,
                       cfg: FeatureConfig) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized feature construction over one sorted series.

    ``mat``: (n, n_features) float64; ``ts_sec``: (n,) unix seconds.
    Returns (fv, valid): fv (n, n_out) with NaN on invalid rows.
    """
    n, F = mat.shape
    cols: list[np.ndarray] = [mat[:, f] for f in range(F)]

    # trailing averages per feature (rolling mean, window=interval)
    for fi, intervals in enumerate(cfg.averages):
        s = pd.Series(mat[:, fi])
        for interval in intervals:
            cols.append(s.rolling(interval, min_periods=1).mean().to_numpy())

    # periodic (strided) averages: mean of v[t], v[t-p], ..., v[t-(n-1)p]
    for fi, plist in enumerate(cfg.periodic_averages):
        v = mat[:, fi]
        for period, ns in plist:
            for cnt in ns:
                acc = np.zeros(n)
                idx = np.arange(n)
                for j in range(cnt):
                    acc += v[np.maximum(idx - j * period, 0)]
                cols.append(acc / cnt)

    # shifts (lags)
    for fi, lags in enumerate(cfg.shifts):
        v = mat[:, fi]
        for look_back in lags:
            shifted = np.empty(n)
            shifted[:look_back] = np.nan
            shifted[look_back:] = v[: n - look_back]
            cols.append(shifted)

    # time features, fixed order (anomaly_detection.py:405-414)
    if cfg.time_features:
        dt = pd.to_datetime(ts_sec, unit="s")
        tf = {"month": dt.month, "day": dt.day, "weekday": dt.weekday,
              "hour": dt.hour, "minute": dt.minute}
        for name in ["month", "day", "weekday", "hour", "minute"]:
            if name in cfg.time_features:
                cols.append(np.asarray(tf[name], dtype=np.float64))

    fv = np.column_stack(cols)
    if cfg.use_cols is not None:
        fv = fv[:, cfg.use_cols]
    valid = np.arange(n) >= (cfg.memory_size - 1)
    fv[~valid] = np.nan
    return fv, valid


def make_feature_kernel(value_cols: list[str], ts_col: str,
                        order_cols: list[str], cfg: FeatureConfig,
                        prefix: str = "fv"):
    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        mat = g[value_cols].to_numpy(dtype=np.float64)
        ts = g[ts_col]
        if pd.api.types.is_datetime64_any_dtype(ts):
            ts_sec = ((ts - pd.Timestamp(0)) / pd.Timedelta(seconds=1)).to_numpy()
        else:
            ts_sec = ts.to_numpy(dtype=np.float64)
            ts_sec = np.where(ts_sec >= 1e10, ts_sec / 1000.0, ts_sec)
        fv, valid = construct_features(mat, ts_sec, cfg)
        for j in range(fv.shape[1]):
            g[f"{prefix}{j}"] = fv[:, j]
        g[f"{prefix}_valid"] = valid
        return g

    return per_group


def apply_feature_construction(ds, key_col: str, order_cols: list[str],
                               value_cols: list[str], ts_col: str,
                               cfg: FeatureConfig, prefix: str = "fv"):
    """Dataset -> Dataset with fv0..fvK feature columns + fv_valid."""
    kernel = make_feature_kernel(value_cols, ts_col, order_cols, cfg, prefix)
    return ds.groupby(key_col).map_groups(kernel, batch_format="pandas")
