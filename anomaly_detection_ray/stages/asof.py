"""As-of (nearest-timestamp) join + forecast-band check.

Re-expresses the fb_Prophet band check (/root/reference/src/algorithms/
fb_prophet.py:132-145) without Prophet: given a forecast-interval table
``(ts, yhat_lower, yhat_upper)``, each record is matched to the forecast row
with the NEAREST timestamp and graded Error iff its value falls outside
[yhat_lower, yhat_upper] (Undefined before the forecast's coverage is
configured to start). The forecast can come from any model; ``naive_forecast``
builds one from trailing per-window stats (mean ± X·std), which is the
Prophet-free stand-in used in tests.

Ray mapping: the forecast table is SMALL (horizons × frequency rows) — it is
broadcast once via ``ray.put`` and the nearest lookup is a vectorized
``np.searchsorted`` inside ``map_batches``; no shuffle. A large forecast side
would instead use per-group ``pandas.merge_asof`` inside
``groupby().map_groups`` — same semantics, co-partitioned by series key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..functions.grading import ERROR_CODE, OK_CODE, UNDEFINED_CODE


def nearest_band_codes(ts: np.ndarray, values: np.ndarray,
                       f_ts: np.ndarray, f_lo: np.ndarray,
                       f_hi: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized nearest-timestamp band check. ``f_ts`` must be sorted."""
    idx = np.searchsorted(f_ts, ts)
    idx = np.clip(idx, 1, len(f_ts) - 1)
    left, right = idx - 1, idx
    use_left = np.abs(ts - f_ts[left]) <= np.abs(f_ts[right] - ts)
    nearest = np.where(use_left, left, right)
    lo, hi = f_lo[nearest], f_hi[nearest]
    code = np.full(len(ts), OK_CODE, dtype=np.int8)
    status = np.full(len(ts), "OK", dtype=object)
    below, above = values < lo, values > hi
    code[below] = ERROR_CODE
    status[below] = "Error: Value below the lower limit"
    code[above] = ERROR_CODE
    status[above] = "Error: Value over the upper limit"
    bad = np.isnan(values)
    code[bad] = UNDEFINED_CODE
    status[bad] = "Undefined"
    return code, status


def forecast_band_check(ds, forecast: pd.DataFrame, ts_col: str = "ts",
                        value_col: str = "value", prefix: str = "fb"):
    """Dataset + forecast(ts, yhat_lower, yhat_upper) -> Dataset with
    ``<prefix>_code``/``<prefix>_status`` columns (broadcast as-of join)."""
    f = forecast.sort_values("ts")
    fc_ref = ray.put((f["ts"].to_numpy(dtype=np.float64),
                      f["yhat_lower"].to_numpy(dtype=np.float64),
                      f["yhat_upper"].to_numpy(dtype=np.float64)))

    def check(t: pa.Table) -> pa.Table:
        f_ts, f_lo, f_hi = ray.get(fc_ref)
        ts = _ts_seconds(t[ts_col])
        v = pa.compute.cast(t[value_col], pa.float64()).to_numpy(zero_copy_only=False)
        code, status = nearest_band_codes(ts, v, f_ts, f_lo, f_hi)
        return (t.append_column(f"{prefix}_code", pa.array(code, type=pa.int8()))
                 .append_column(f"{prefix}_status", pa.array(status, type=pa.string())))

    return ds.map_batches(check, batch_format="pyarrow")


def _ts_seconds(arr: pa.ChunkedArray) -> np.ndarray:
    if pa.types.is_timestamp(arr.type):
        return (pa.compute.cast(arr, pa.int64()).to_numpy(zero_copy_only=False)
                / {"s": 1, "ms": 1e3, "us": 1e6, "ns": 1e9}[arr.type.unit])
    ts = pa.compute.cast(arr, pa.float64()).to_numpy(zero_copy_only=False)
    return np.where(ts >= 1e10, ts / 1000.0, ts)


T_REF = 946684800.0  # 2000-01-01: center epoch seconds so OLS sums keep precision


def seasonal_forecast(ds, ts_col: str = "ts", value_col: str = "value",
                      period_s: float = 86400.0, n_bins: int = 24,
                      X: float = 3.0, horizon_s: float = 0.0) -> pd.DataFrame:
    """Prophet-style trend + seasonality forecaster from one distributed
    pass (fb_prophet.py:16-199 mechanics — linear trend, one seasonal
    component, uncertainty band — without the Prophet dependency):

    - trend: global OLS ``y ~ a + b·t`` from mergeable sums
    - seasonality: per-bin mean of the detrended residual (bin = phase of
      ``ts`` within ``period_s``, ``n_bins`` bins)
    - band: yhat ± X·std of the per-bin residual after both components

    One ``map_batches`` partial per batch grouped by bin carrying
    (n, Σt, Σy, Σty, Σt², Σy²) — merged driver-side (n_bins rows), so the
    training pass streams and the forecast table stays broadcast-small.
    Returns a grid forecast table (step = period_s/n_bins) covering
    [t_min, t_max + horizon_s] with columns (ts, yhat, yhat_lower,
    yhat_upper) for ``forecast_band_check``.
    """
    step = period_s / n_bins

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts = df[ts_col]
        if pd.api.types.is_datetime64_any_dtype(ts):
            sec = ((ts - pd.Timestamp(0)) // pd.Timedelta(seconds=1)
                   ).to_numpy(dtype=np.float64)
        else:
            sec = ts.to_numpy(dtype=np.float64)
        v = df[value_col].to_numpy(dtype=np.float64)
        ok = ~np.isnan(v) & ~np.isnan(sec)
        sec, v = sec[ok], v[ok]
        t = (sec - T_REF) / 86400.0  # days since 2000 — precision-safe sums
        b = ((sec % period_s) // step).astype(np.int64)
        g = pd.DataFrame({"bin": b, "n": 1, "st": t, "sy": v, "sty": t * v,
                          "stt": t * t, "syy": v * v,
                          "tmin": sec, "tmax": sec})
        return g.groupby("bin", as_index=False).agg(
            n=("n", "sum"), st=("st", "sum"), sy=("sy", "sum"),
            sty=("sty", "sum"), stt=("stt", "sum"), syy=("syy", "sum"),
            tmin=("tmin", "min"), tmax=("tmax", "max"))

    from ray.data.aggregate import Max, Min, Sum
    m = (ds.map_batches(partial, batch_format="pandas")
         .groupby("bin").aggregate(
             *[Sum(c, alias_name=c) for c in ["n", "st", "sy", "sty", "stt", "syy"]],
             Min("tmin", alias_name="tmin"), Max("tmax", alias_name="tmax"),
         ).to_pandas().sort_values("bin").reset_index(drop=True))
    N = m["n"].sum()
    St, Sy, Sty, Stt = (m[c].sum() for c in ["st", "sy", "sty", "stt"])
    denom = N * Stt - St * St
    b_slope = (N * Sty - St * Sy) / denom if denom > 0 else 0.0
    a_int = (Sy - b_slope * St) / N
    # per-bin residual mean and variance from the same sums
    n_b = m["n"].to_numpy(dtype=np.float64)
    r1 = m["sy"] - a_int * n_b - b_slope * m["st"]            # Σ residual
    r2 = (m["syy"] - 2 * a_int * m["sy"] - 2 * b_slope * m["sty"]
          + a_int * a_int * n_b + 2 * a_int * b_slope * m["st"]
          + b_slope * b_slope * m["stt"])                      # Σ residual²
    s_b = (r1 / n_b).to_numpy()
    v_b = np.maximum(r2.to_numpy() / n_b - s_b * s_b, 0.0)
    seasonal = np.zeros(n_bins)
    band = np.zeros(n_bins)
    seasonal[m["bin"].to_numpy()] = s_b
    band[m["bin"].to_numpy()] = X * np.sqrt(v_b)
    t_lo, t_hi = float(m["tmin"].min()), float(m["tmax"].max()) + horizon_s
    g0 = np.floor(t_lo / step) * step
    grid = np.arange(g0, t_hi + step, step)
    gbin = ((grid % period_s) // step).astype(np.int64) % n_bins
    yhat = a_int + b_slope * (grid - T_REF) / 86400.0 + seasonal[gbin]
    return pd.DataFrame({"ts": grid, "yhat": yhat,
                         "yhat_lower": yhat - band[gbin],
                         "yhat_upper": yhat + band[gbin]})


def asof_join(left, right, key: str, ts_col: str,
              left_cols: list[str], right_cols: list[str],
              suffix: str = "_r", lag_col: str | None = None,
              left_types: dict | None = None,
              right_types: dict | None = None,
              how: str = "inner"):
    """Distributed backward as-of join for a LARGE right side (the
    broadcast path above stops working when the forecast/right table no
    longer fits in one object): every left row is matched to the right row
    with the greatest ``ts <= left.ts`` for the same ``key``.
    ``how="inner"`` drops unmatched left rows (DuckDB ``ASOF JOIN``);
    ``how="left"`` keeps them with NaN right columns (``ASOF LEFT JOIN``
    / ``pd.merge_asof`` semantics) — in left mode ``right_cols`` must be
    numeric and come back float64, so unmatched-group blocks and matched
    blocks carry one consistent schema.

    Shape: both sides are pruned to the needed columns, tagged, padded to a
    common schema and unioned, so ONE ``groupby(key)`` shuffle co-partitions
    them; the per-group kernel is a vectorized ``np.searchsorted`` over the
    in-group sort — no driver materialization, no second shuffle. Skew is
    bounded by per-key group size (same assumption as every series kernel,
    stages/series.py:12-16); ``right_cols`` values arrive renamed with
    ``suffix``, and ``lag_col`` (optional) emits ``left.ts - matched.ts``
    in seconds.

    Re-expresses /root/reference/src/algorithms/fb_prophet.py:132-136
    (nearest-forecast lookup) as a general distributed operator.
    """
    lkeep = [key, ts_col, *left_cols]
    rout = [c + suffix for c in right_cols]
    # pad types come from the owning side's schema so the union is exact
    # (filter/read datasets resolve schema from metadata — no execution)
    def _pa_type(sch, c):
        if hasattr(sch, "field"):  # pyarrow schema
            return sch.field(c).type
        return pa.from_numpy_dtype(sch.types[sch.names.index(c)])  # pandas blocks

    if left_types is None or right_types is None:
        # schema() on a transformed dataset EXECUTES a 1-row probe per side
        # — pass explicit types on hot paths to keep the plan single-pass
        lsch, rsch = left.schema().base_schema, right.schema().base_schema
        left_types = left_types or {c: _pa_type(lsch, c) for c in left_cols}
        right_types = right_types or {c: _pa_type(rsch, c) for c in right_cols}
    ltype, rtype = left_types, right_types

    def tag_left(t: pa.Table) -> pa.Table:
        t = t.select(lkeep).append_column(
            "__side", pa.array(np.ones(t.num_rows, dtype=np.int8)))
        for c, rc in zip(right_cols, rout):
            t = t.append_column(rc, pa.nulls(t.num_rows, rtype[c]))
        return t

    def tag_right(t: pa.Table) -> pa.Table:
        out = t.select([key, ts_col])
        for c in left_cols:
            out = out.append_column(c, pa.nulls(t.num_rows, ltype[c]))
        out = out.append_column(
            "__side", pa.array(np.zeros(t.num_rows, dtype=np.int8)))
        for c, rc in zip(right_cols, rout):
            out = out.append_column(rc, t[c])
        return out

    u = (left.map_batches(tag_left, batch_format="pyarrow")
         .union(right.map_batches(tag_right, batch_format="pyarrow")))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([ts_col, "__side"], kind="mergesort")
        r = df[df["__side"] == 0]
        lf = df[df["__side"] == 1]
        if not len(lf):
            cols = [*lkeep, *rout] + ([lag_col] if lag_col else [])
            return pd.DataFrame({c: [] for c in cols})
        r_ts = r[ts_col].to_numpy()
        idx = np.searchsorted(r_ts, lf[ts_col].to_numpy(), side="right") - 1
        hit = idx >= 0 if how == "inner" else np.ones(len(lf), dtype=bool)
        out = lf.loc[hit, lkeep].copy()
        take = np.clip(idx[hit], 0, None)
        matched = idx[hit] >= 0
        for rc in rout:
            if how == "left":
                vals = (r[rc].to_numpy(dtype=np.float64) if len(r)
                        else np.empty(0))
                out[rc] = np.where(matched,
                                   vals[take] if len(r) else np.nan, np.nan)
            else:
                out[rc] = r[rc].to_numpy()[take]
        if lag_col is not None:
            if len(r):
                lag = (out[ts_col].to_numpy() - r_ts[take])
                if np.issubdtype(lag.dtype, np.timedelta64):
                    lag = lag / np.timedelta64(1, "s")
                lag = lag.astype(np.float64)
            else:
                lag = np.full(int(hit.sum()), np.nan)
            out[lag_col] = np.where(matched, lag, np.nan)
        return out.reset_index(drop=True)

    return u.groupby(key).map_groups(merge, batch_format="pandas")


def naive_forecast(ds, ts_col: str = "ts", value_col: str = "value",
                   window_s: float = 3600.0, X: float = 3.0) -> pd.DataFrame:
    """Prophet-free forecast table: per time-window mean ± X·std of the value
    (partial per-batch sums -> one small merge; the training pass)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts = df[ts_col]
        if pd.api.types.is_datetime64_any_dtype(ts):
            sec = ((ts - pd.Timestamp(0)) // pd.Timedelta(seconds=1)).to_numpy()
        else:
            sec = ts.to_numpy(dtype=np.float64)
        w = (sec // window_s).astype(np.int64)
        v = df[value_col].to_numpy(dtype=np.float64)
        ok = ~np.isnan(v)
        g = pd.DataFrame({"w": w[ok], "s1": v[ok], "s2": v[ok] ** 2, "n": 1})
        return g.groupby("w", as_index=False).sum()

    m = (ds.map_batches(partial, batch_format="pandas")
         .groupby("w").sum(["s1", "s2", "n"]).to_pandas())
    m = m.rename(columns={"sum(s1)": "s1", "sum(s2)": "s2", "sum(n)": "n"})
    mean = m["s1"] / m["n"]
    var = np.maximum(m["s2"] / m["n"] - mean**2, 0.0)
    std = np.sqrt(var)
    return pd.DataFrame({
        "ts": (m["w"].to_numpy(dtype=np.float64) + 0.5) * window_s,
        "yhat_lower": mean - X * std,
        "yhat_upper": mean + X * std,
    })
