"""Vectorized per-series check kernels.

Each kernel consumes ONE already-sorted series (a 1-D float64 array = one
group after ``groupby(key).map_groups`` in-group sort) and returns verdict
arrays for every element — the batch/columnar re-expression of the
reference's one-record-at-a-time scorers (see oracle.py for the sequential
twins and /root/reference/src/algorithms/* for provenance).

No Python loop runs per element: recurrences use ``pandas`` C kernels
(ewm / rolling / expanding) or the blocked prefix scan in ``dsp``;
window statistics use ``sliding_window_view``. The only remaining loops are
over filter taps (IIR order) and the short warm-up prefix of the percentile
check.

Every kernel returns a dict of equal-length numpy arrays, always containing
``status_code`` (int8: OK=1 Warning=0 Error=-1 Undefined=2) and ``status``
(object). Invalid-input handling (rows that fail row validation never touch
scorer state) is done by the caller: run the kernel on the valid subset and
scatter (see stages/series.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from numpy.lib.stride_tricks import sliding_window_view

from . import dsp
from .grading import (ERROR_CODE, OK_CODE, UNDEFINED_CODE, WARNING_CODE,
                      grade_normalized, normalize)

__all__ = [
    "border_check", "ema_check", "macd_check", "welford_check",
    "cumulative_check", "hampel_check", "percentile_check",
    "linear_fit_check", "filtering_check", "ema_percentile_check",
    "trend_classification_check",
]


def _undef(n: int) -> tuple[np.ndarray, np.ndarray]:
    return (np.full(n, UNDEFINED_CODE, dtype=np.int8),
            np.full(n, "Undefined", dtype=object))


def border_check(values: np.ndarray, UL: float, LL: float,
                 warning_stages: list[float]) -> dict[str, np.ndarray]:
    """Stateless range check (border_check.py:122-146). Order-independent —
    also usable directly in a stateless map_batches stage."""
    vn = normalize(values, UL, LL)
    code, status = grade_normalized(vn, warning_stages)
    return {"status_code": code, "status": status}


def ema_check(values: np.ndarray, N: int, UL: float, LL: float,
              warning_stages: list[float]) -> dict[str, np.ndarray]:
    """EMA recurrence graded vs static UL/LL (ema.py:87-126).
    ewm(alpha=2/(N+1), adjust=False) reproduces EMA_t = s*v + (1-s)*EMA_{t-1}
    with EMA_0 = v_0 exactly."""
    s = 2.0 / (N + 1)
    ema = pd.Series(values).ewm(alpha=s, adjust=False).mean().to_numpy()
    vn = normalize(ema, UL, LL)
    code, status = grade_normalized(vn, warning_stages, context="EMA")
    return {"status_code": code, "status": status, "ema": ema}


def ema_percentile_check(values: np.ndarray, percentile: float, window: int,
                         start_on: int, period: int) -> dict[str, np.ndarray]:
    """EMA graded against the [100-p, p] percentiles of its own trailing
    window, inclusive of the current EMA value (ema_percentile.py:68-98).
    Undefined until the EMA history reaches ``start_on`` samples."""
    n = len(values)
    code, status = _undef(n)
    ema = pd.Series(values).ewm(alpha=2.0 / (period + 1),
                                adjust=False).mean().to_numpy()
    qs = [100.0 - percentile, percentile]
    start = max(start_on - 1, 0)
    # warm prefix: growing window (< `window` elements, bounded loop)
    for i in range(start, min(window - 1, n)):
        p_lo, p_hi = np.percentile(ema[: i + 1], qs)
        code[i], status[i] = (
            (ERROR_CODE, "Error: EMA in upper percentile") if ema[i] > p_hi
            else (ERROR_CODE, "Error: EMA in lower percentile") if ema[i] < p_lo
            else (OK_CODE, "OK"))
    if n >= window:
        w = sliding_window_view(ema, window)
        p = np.percentile(w, qs, axis=1)
        last = w[:, -1]
        hi_err, lo_err = last > p[1], last < p[0]
        c = np.where(hi_err | lo_err, ERROR_CODE, OK_CODE).astype(np.int8)
        s = np.full(len(last), "OK", dtype=object)
        s[hi_err] = "Error: EMA in upper percentile"
        s[lo_err] = "Error: EMA in lower percentile"
        code[window - 1:], status[window - 1:] = c, s
    return {"status_code": code, "status": status, "ema": ema}


def macd_check(values: np.ndarray, period1: int, period2: int, UL: float,
               LL: float, warning_stages: list[float]) -> dict[str, np.ndarray]:
    """Dual-EMA difference graded vs UL/LL (macd.py:81-109)."""
    sr = pd.Series(values)
    ema1 = sr.ewm(alpha=2.0 / (period1 + 1), adjust=False).mean().to_numpy()
    ema2 = sr.ewm(alpha=2.0 / (period2 + 1), adjust=False).mean().to_numpy()
    vn = normalize(ema1 - ema2, UL, LL)
    code, status = grade_normalized(vn, warning_stages, context="MACD")
    return {"status_code": code, "status": status}


def welford_check(values: np.ndarray, X: float, N: int | None = None,
                  warning_stages: list[float] = ()) -> dict[str, np.ndarray]:
    """Welford dynamic-limit check (welford.py:54-193).

    Windowed (N given): limits mean ± X·stdev(ddof=1) over the window ending
    at the PREVIOUS record; first N records Undefined.
    Infinite (N None): running mean ± X·sqrt(M2/count) (population stdev) over
    all records up to the previous one; first 2 records Undefined.
    The grade-before-update lag is reproduced with shift(1)-style indexing.
    """
    n = len(values)
    code, status = _undef(n)
    out = {"status_code": code, "status": status}
    sr = pd.Series(values)
    if N is not None:
        if n <= N:
            return out
        mean_prev = sr.rolling(N).mean().shift(1).to_numpy()
        std_prev = sr.rolling(N).std(ddof=1).shift(1).to_numpy()
        graded = np.arange(n) >= N
    else:
        if n <= 2:
            return out
        mean_prev = sr.expanding(2).mean().shift(1).to_numpy()
        std_prev = sr.expanding(2).std(ddof=0).shift(1).to_numpy()
        graded = np.arange(n) >= 2
    std_prev = np.where(std_prev <= 0, np.nextafter(0, 1), std_prev)
    half = X * std_prev
    vn = np.zeros(n)
    with np.errstate(divide="ignore", invalid="ignore"):
        vn[graded] = (values[graded] - mean_prev[graded]) / half[graded]
    g_code, g_status = grade_normalized(vn[graded], warning_stages)
    code[graded] = g_code
    status[graded] = g_status
    out["UL"] = mean_prev + half
    out["LL"] = mean_prev - half
    return out


def cumulative_check(values: np.ndarray, decay: float, averaging: int,
                     warning_stages: list[float]) -> dict[str, np.ndarray]:
    """Decaying cumulative sum of relative running-mean changes graded vs ±1
    (cumulative.py:41-111). cs_t = (cs_{t-1} + delta_t)(1-decay) is a
    first-order linear recurrence -> blocked prefix scan."""
    rm = pd.Series(values).rolling(averaging, min_periods=1).mean().to_numpy()
    prev = np.empty_like(rm)
    prev[0] = 0.0
    prev[1:] = rm[:-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        delta = (rm - prev) / np.abs(rm)
    a = 1.0 - decay
    cs = dsp.first_order_scan(a, a * delta)
    code, status = grade_normalized(cs, warning_stages)
    return {"status_code": code, "status": status, "cumulative_sum": cs}


def hampel_check(values: np.ndarray, W: int, K: float,
                 n_sigmas: float) -> dict[str, np.ndarray]:
    """Median/MAD window outlier check + repair value (hampel.py:73-98),
    reproducing the reference's off-center graded point memory[W+1]."""
    n = len(values)
    win = 2 * W + 1
    code, status = _undef(n)
    suggested = values.astype(np.float64).copy()
    if n > win:
        w = sliding_window_view(values, win)  # rows end at index win-1..n-1
        med = np.median(w, axis=1)
        mad = np.median(np.abs(w - med[:, None]), axis=1)
        pt = w[:, W + 1]
        is_err = np.abs(pt - med) > n_sigmas * (K * mad)
        # window ending at i corresponds to w row i-win+1; graded from i>=win
        rows = np.arange(win, n) - win + 1
        err = is_err[rows]
        code[win:] = np.where(err, ERROR_CODE, OK_CODE)
        status[win:] = np.where(err, "Anomaly detected", "OK")
        suggested[win:] = np.where(err, med[rows], pt[rows])
    return {"status_code": code, "status": status, "suggested_value": suggested}


def percentile_check(values: np.ndarray, buff_size: int, lo: float,
                     hi: float) -> dict[str, np.ndarray]:
    """Trailing-buffer percentile range check (percentile.py:85-98, intended
    semantics per SURVEY.md §2.4: buff_size from config, OK inside range)."""
    n = len(values)
    codes = np.full(n, OK_CODE, dtype=np.int8)
    warm = min(buff_size - 1, n)
    for i in range(warm):  # short warm-up prefix only (< buff_size elements)
        p_lo, p_hi = np.percentile(values[: i + 1], [lo, hi])
        if values[i] < p_lo or values[i] > p_hi:
            codes[i] = ERROR_CODE
    if n >= buff_size:
        w = sliding_window_view(values, buff_size)
        p = np.percentile(w, [lo, hi], axis=1)
        last = w[:, -1]
        err = (last < p[0]) | (last > p[1])
        codes[buff_size - 1:] = np.where(err, ERROR_CODE, OK_CODE)
    status = np.where(codes == ERROR_CODE, "Error", "OK").astype(object)
    return {"status_code": codes, "status": status}


def linear_fit_check(values: np.ndarray, N: int, UL: float, LL: float,
                     confidence_norm: float,
                     warning_stages: list[float]) -> dict[str, np.ndarray]:
    """Rolling OLS slope check (linear_fit.py:81-130): slope over the last N
    values graded vs UL/LL; Undefined during warm-up (first N records) and
    when SSR/value exceeds confidence_norm. Closed-form rolling OLS."""
    n = len(values)
    code, status = _undef(n)
    out = {"status_code": code, "status": status}
    if n <= N:
        return out
    w = sliding_window_view(values.astype(np.float64), N)
    x = np.arange(N, dtype=np.float64)
    xc = x - x.mean()
    sxx = float(np.dot(xc, xc))
    ymean = w.mean(axis=1)
    sxy = w @ xc
    slope = sxy / sxx
    ssr = np.maximum(((w - ymean[:, None]) ** 2).sum(axis=1) - slope**2 * sxx, 0.0)
    rows = np.arange(N, n) - N + 1  # graded from record index N
    vals = values[N:]
    vn = normalize(slope[rows], UL, LL)
    g_code, g_status = grade_normalized(vn, warning_stages, context="slope")
    with np.errstate(divide="ignore", invalid="ignore"):
        bad_fit = (ssr[rows] / vals) > confidence_norm
    g_code[bad_fit] = UNDEFINED_CODE
    g_status[bad_fit] = "Undefined"
    code[N:] = g_code
    status[N:] = g_status
    out["slope"] = np.concatenate([np.full(N, np.nan), slope[rows]])
    return out


def filtering_check(values: np.ndarray, filter_order: int,
                    cutoff_frequency: float, mode: int, UL: float, LL: float,
                    warning_stages: list[float]) -> dict[str, np.ndarray]:
    """Butterworth low-pass check (filtering.py:45-123): one lfilter pass over
    the whole sorted series with the reference's lfilter_zi initial state —
    bit-identical to per-record stepping with carried state.

    mode 0: grade the filtered signal vs UL/LL.
    mode 1: grade deviation (x - filtered)/(UL - LL); the reference's lower
    error bound checks the normalized filtered value (filtering.py:90) —
    reproduced as-is."""
    b, a = dsp.butter_lowpass(filter_order, cutoff_frequency)
    zi = dsp.lfilter_zi(b, a)
    filtered, _ = dsp.lfilter(b, a, values, zi=zi)
    vn = normalize(filtered, UL, LL)
    if mode == 1:
        deviation = (values - filtered) / (UL - LL)
        stages = np.asarray(sorted(warning_stages), dtype=np.float64)
        n_exc = (np.searchsorted(stages, np.abs(deviation), side="left")
                 if stages.size else np.zeros(len(values), dtype=np.int64))
        code = np.where(n_exc > 0, WARNING_CODE, OK_CODE).astype(np.int8)
        status = np.full(len(values), "OK", dtype=object)
        if stages.size:
            msgs = np.array([f"Warning{k}: Significant deviation."
                             for k in range(len(stages))], dtype=object)
            warn = n_exc > 0
            status[warn] = msgs[np.clip(n_exc[warn] - 1, 0, len(stages) - 1)]
        err = (deviation > 1) | (vn < -1)
        code[err] = ERROR_CODE
        status[err] = "Error: Large deviation"
        return {"status_code": code, "status": status, "filtered": filtered}
    code, status = grade_normalized(vn, warning_stages, context="Filtered signal")
    return {"status_code": code, "status": status, "filtered": filtered}


def trend_classification_check(values: np.ndarray, N: int, averaging: int,
                               prediction_conv: int,
                               warning_stages: list[float],
                               amp_scale: float,
                               num_samples: int | None = None,
                               train_noise: float = 0.01,
                               seed: int = 0) -> dict[str, np.ndarray]:
    """Trend classification (trend_classification.py:84-151). Two classifier
    paths over the normalized trailing window:

    - ``num_samples`` given → the reference's LEARNED classifier: a numpy
      MLP trained on synthetic up/flat/down ramps with ``train_noise``
      (stages/trend.py; trend_classification.py:154-193), memoized per
      process, batch-predicted over all windows at once.
    - ``num_samples`` None → closed-form slope classifier: the OLS slope of
      the normalized window against half the pure-ramp slope, which is the
      decision the synthetic-ramp net learns. Classes: 0=down, 1=flat, 2=up.

    Downstream mechanics reproduced exactly: FV = trailing means, amplitude
    = (max-min)/amp_scale, prediction averaged over ``prediction_conv``,
    value_normalized = 1 + (avg_pred - 1)*amplitude, Error outside [0, 2],
    Warning iff beyond the LAST configured stage (the reference's stage loop
    breaks to OK on the first non-exceeded stage — reproduced as-is)."""
    n = len(values)
    code, status = _undef(n)
    out = {"status_code": code, "status": status}
    if n < N:
        return out
    avg = pd.Series(values).rolling(averaging, min_periods=1).mean().to_numpy()
    w = sliding_window_view(avg, N)            # rows end at index N-1..n-1
    wmax, wmin = w.max(axis=1), w.min(axis=1)
    span = wmax - wmin
    amplitude = span / amp_scale
    x = np.arange(N, dtype=np.float64)
    xc = x - x.mean()
    sxx = float(np.dot(xc, xc))
    with np.errstate(divide="ignore", invalid="ignore"):
        wn = (w - w.mean(axis=1)[:, None]) / span[:, None]
    wn = np.nan_to_num(wn)
    if num_samples is not None:
        from ..stages.trend import trend_model
        model = trend_model(N, int(num_samples), float(train_noise), seed)
        pred = np.where(span == 0, 1, model.predict_classes(wn))
    else:
        slope = np.where(span > 0, (wn @ xc) / sxx, 0.0)
        ramp_slope = 1.0 / (N - 1) if N > 1 else 1.0
        pred = np.where(span == 0, 1,
                        np.where(slope > 0.5 * ramp_slope, 2,
                                 np.where(slope < -0.5 * ramp_slope, 0, 1)))
    # averaged prediction over the trailing prediction_conv predictions
    pred_avg = pd.Series(pred.astype(np.float64)).rolling(
        prediction_conv).mean().to_numpy()
    graded = np.arange(len(pred)) >= prediction_conv - 1
    vn = 1.0 + (pred_avg - 1.0) * amplitude
    g_code = np.full(len(pred), UNDEFINED_CODE, dtype=np.int8)
    g_status = np.full(len(pred), "Undefined", dtype=object)
    gi = graded
    up_err = gi & (vn > 2)
    lo_err = gi & (vn < 0)
    g_code[gi] = OK_CODE
    g_status[gi] = "OK"
    if warning_stages:
        last = warning_stages[-1]
        k = len(warning_stages) - 1
        w_up = gi & ~up_err & ~lo_err & (vn > 1 + last)
        w_lo = gi & ~up_err & ~lo_err & (vn < 1 - last)
        g_code[w_up | w_lo] = WARNING_CODE
        g_status[w_up] = f"Warning{k}: trend close to upper limit."
        g_status[w_lo] = f"Warning{k}: trend close to lower limit."
    g_code[up_err] = ERROR_CODE
    g_status[up_err] = "Error: measurement above upper limit"
    g_code[lo_err] = ERROR_CODE
    g_status[lo_err] = "Error: measurement below lower limit"
    code[N - 1:] = g_code
    status[N - 1:] = g_status
    return out


def cusum_reset_check(values: np.ndarray, UL: float, LL: float,
                      k: float = 0.25,
                      h: float = 2.0) -> dict[str, np.ndarray]:
    """Two-sided tabular CUSUM WITH post-alarm restart (the self-
    restarting control chart): after an alarm row both sides reset to 0,
    so each alarm marks a fresh change-point rather than one long
    excursion. The reset breaks the prefix-scan identity (see
    cusum_check), so this is a true sequential pass per series — bounded
    by the per-series-fits-a-worker contract every ordered kernel in
    stages/series.py already relies on; the oracle is a per-user
    recursive CTE."""
    n = len(values)
    code, status = _undef(n)
    if n == 0:
        return {"status_code": code, "status": status}
    vn = normalize(values, UL, LL)
    sp = sn = 0.0
    s_pos = np.empty(n)
    s_neg = np.empty(n)
    alarm = np.zeros(n, dtype=bool)
    for i in range(n):
        sp = max(0.0, sp + (vn[i] - k))
        sn = max(0.0, sn + (-vn[i] - k))
        s_pos[i] = sp
        s_neg[i] = sn
        if sp > h or sn > h:
            alarm[i] = True
            sp = sn = 0.0
    code[:] = np.where(alarm, ERROR_CODE, OK_CODE)
    status[:] = np.where(alarm, "Anomaly detected: CUSUM drift", "OK")
    return {"status_code": code, "status": status,
            "s_pos": s_pos, "s_neg": s_neg}


def cusum_check(values: np.ndarray, UL: float, LL: float,
                k: float = 0.25, h: float = 2.0) -> dict[str, np.ndarray]:
    """Two-sided tabular CUSUM drift detector (Page 1954) over the
    border-normalized value vn = 2(v-mid)/rng, WITHOUT post-alarm reset:
    s+_t = max(0, s+_{t-1} + vn_t - k), s-_t = max(0, s-_{t-1} - vn_t - k),
    alarm when either side exceeds ``h``. No-reset makes both sides exact
    prefix scans — s_t = c_t - min(0, running_min(c)) with c = cumsum(x) —
    so the kernel is two vectorized cumsum+running-min passes and the
    DuckDB oracle is pure window SQL (SUM/MIN OVER), no recursive CTE."""
    n = len(values)
    code, status = _undef(n)
    if n == 0:
        return {"status_code": code, "status": status}
    vn = normalize(values, UL, LL)
    cp = np.cumsum(vn - k)
    cn = np.cumsum(-vn - k)
    sp = cp - np.minimum(np.minimum.accumulate(cp), 0.0)
    sn = cn - np.minimum(np.minimum.accumulate(cn), 0.0)
    alarm = (sp > h) | (sn > h)
    code[:] = np.where(alarm, ERROR_CODE, OK_CODE)
    status[:] = np.where(alarm, "Anomaly detected: CUSUM drift", "OK")
    return {"status_code": code, "status": status, "s_pos": sp, "s_neg": sn}
