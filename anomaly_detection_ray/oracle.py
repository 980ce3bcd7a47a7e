"""Pure-Python sequential oracle for the reference scorer semantics.

Each class mirrors one scorer from /root/reference/src/algorithms/* —
re-implemented from the observed semantics (NOT copied): insert one message
at a time, get back ``(status, status_code)`` with the reference's 4-valued
verdict. The Ray engine's vectorized kernels are tested for parity against
these oracles on the golden vectors from the reference unit tests
(unit_tests.py, see FIXTURES.md §A) and on randomized streams.

Where the reference is defective at head, the *intended* semantics defined
by its unit-test vectors are implemented instead (SURVEY.md §2.3/§2.4):
 - feature construction: memory holds full vectors (anomaly_detection.py:342
   crashes on tuple-indexing a list at head);
 - Percentile: ``buff_size`` read from config, OK status inside the range
   (percentile.py:22-46 never sets buff_size; OK branch missing).
"""

from __future__ import annotations

import math
import statistics

import numpy as np
import pandas as pd

from .functions import dsp

OK, WARNING, ERROR, UNDEFINED = "OK", "Warning", "Error", "Undefined"
OK_CODE, WARNING_CODE, ERROR_CODE, UNDEFINED_CODE = 1, 0, -1, 2


def check_message(message: dict | None, input_vector_size: int) -> bool:
    """Row-validation semantics of check_ftr_vector
    (/root/reference/src/algorithms/anomaly_detection.py:204-263)."""
    if message is None:
        return False
    if "ftr_vector" not in message:
        return False
    if "timestamp" not in message:
        return False
    fv = message["ftr_vector"]
    if len(fv) != input_vector_size:
        return False
    if any(type(x) is str for x in fv):
        return False
    if any(x is None for x in fv):
        return False
    if any(math.isnan(x) for x in fv):
        return False
    ts = message["timestamp"]
    if not isinstance(ts, (int, float)) or isinstance(ts, bool):
        return False
    try:
        pd.to_datetime(ts, unit="s")
    except Exception:
        try:
            pd.to_datetime(ts, unit="ms")
        except Exception:
            return False
    return True


def grade_scalar(value_normalized: float, warning_stages: list[float], context: str = "measurement"):
    """Scalar warning-stage grading loop (border_check.py:129-146)."""
    stages = sorted(warning_stages)
    if value_normalized > 1:
        return f"Error: {context} above upper limit", ERROR_CODE
    if value_normalized < -1:
        return f"Error: {context} below lower limit", ERROR_CODE
    status, code = OK, OK_CODE
    for k, stage in enumerate(stages):
        if value_normalized > stage:
            status, code = f"Warning{k}: {context} close to upper limit.", WARNING_CODE
        elif value_normalized < -stage:
            status, code = f"Warning{k}: {context} close to lower limit.", WARNING_CODE
        else:
            break
    return status, code


class FeatureConstruction:
    """Intended feature-construction semantics (anomaly_detection.py:288-452,
    with the §2.3 defect fixed: memory holds full vectors).

    Output layout: [raw..., averages..., periodic_averages..., shifts...,
    time_features...] then optional use_cols selection. Time-feature order is
    fixed month, day, weekday, hour, minute (the code's check order at
    :405-414, independent of config order)."""

    def __init__(self, input_vector_size=1, averages=None, periodic_averages=None,
                 shifts=None, time_features=None, max_memory=0, use_cols=None):
        self.averages = averages or []
        self.periodic_averages = periodic_averages or []
        self.shifts = shifts or []
        self.time_features = time_features or []
        self.use_cols = use_cols
        self.memory: list[list] = []  # rows [vector..., ts]

        max_shift = 0
        if self.shifts:
            max_shift = max((max(s) if s else 0) for s in self.shifts) + 1
        max_average = 0
        if self.averages:
            max_average = max((max(a) if a else 0) for a in self.averages)
        max_periodic = 0
        for feature_avgs in self.periodic_averages:
            for period, ns in feature_avgs:
                req = 1 + period * (max(ns) - 1)
                max_periodic = max(max_periodic, req)
        self.memory_size = max(max_shift, max_average, max_periodic, max_memory, 1)

    def insert(self, vector: list[float], timestamp: float):
        ts = timestamp if timestamp < 1e10 else timestamp / 1000.0
        self.memory.append([list(vector), ts])
        self.memory = self.memory[-self.memory_size:]
        if len(self.memory) < self.memory_size:
            return False

        vals = [row[0] for row in self.memory]  # list of vectors, oldest first
        out = list(vector)
        # trailing averages per feature
        for fi, intervals in enumerate(self.averages):
            for interval in intervals:
                window = [v[fi] for v in vals[-interval:]]
                out.append(statistics.mean(window))
        # periodic (strided) averages
        for fi, plist in enumerate(self.periodic_averages):
            for period, ns in plist:
                for n in ns:
                    picked = []
                    for i in range(self.memory_size):
                        if len(picked) == n:
                            break
                        if i % period == 0:
                            picked.append(vals[self.memory_size - 1 - i][fi])
                    out.append(statistics.mean(picked))
        # shifts (lags)
        for fi, lags in enumerate(self.shifts):
            for look_back in lags:
                out.append(vals[self.memory_size - 1 - look_back][fi])
        # time features, fixed order (anomaly_detection.py:405-414)
        if self.time_features:
            dt = pd.to_datetime(ts, unit="s")
            if "month" in self.time_features:
                out.append(int(dt.month))
            if "day" in self.time_features:
                out.append(int(dt.day))
            if "weekday" in self.time_features:
                out.append(int(dt.weekday()))
            if "hour" in self.time_features:
                out.append(int(dt.hour))
            if "minute" in self.time_features:
                out.append(int(dt.minute))
        if self.use_cols is not None:
            return [out[i] for i in self.use_cols]
        return out


class OracleBorderCheck:
    """border_check.py:68-160 semantics."""

    def __init__(self, UL, LL, warning_stages, input_vector_size=1):
        self.UL, self.LL = UL, LL
        self.warning_stages = sorted(warning_stages)
        self.input_vector_size = input_vector_size

    def insert(self, message: dict):
        if not check_message(message, self.input_vector_size):
            return UNDEFINED, UNDEFINED_CODE
        value = message["ftr_vector"][0]
        vn = 2 * (value - (self.UL + self.LL) / 2) / (self.UL - self.LL)
        return grade_scalar(vn, self.warning_stages)


class OracleWelford:
    """welford.py:54-193 semantics: grade against limits from the *previous*
    window (windowed) or the running Welford stats up to the previous record
    (infinite); first record(s) Undefined; stdev ddof=1 windowed, population
    (sqrt(M2/count)) infinite."""

    def __init__(self, X, N=None, warning_stages=(), input_vector_size=1):
        self.X, self.N = X, N
        self.warning_stages = sorted(warning_stages)
        self.input_vector_size = input_vector_size
        self.count = 0
        self.memory: list[float] = []
        self.mean = None
        self.s = None
        self.UL = self.LL = None

    def insert(self, message: dict):
        if not check_message(message, self.input_vector_size):
            return UNDEFINED, UNDEFINED_CODE
        value = message["ftr_vector"][0]
        if self.count == 0:
            self.mean, self.s = value, 0.0
            status, code = UNDEFINED, UNDEFINED_CODE
        elif (self.N is None and self.count > 1) or (self.N is not None and self.N <= self.count):
            if self.UL != self.LL:
                vn = 2 * (value - (self.UL + self.LL) / 2) / (self.UL - self.LL)
            elif value == self.LL:
                vn = 0.0
            else:
                vn = float("inf")
            status, code = grade_scalar(vn, self.warning_stages)
        else:
            status, code = UNDEFINED, UNDEFINED_CODE

        self.count += 1
        if self.N is not None:
            self.memory.append(value)
            self.memory = self.memory[-self.N:]
            if self.count >= self.N:
                self.mean = statistics.mean(self.memory)
                self.s = statistics.stdev(self.memory)
                if self.s == 0:
                    self.s = np.nextafter(0, 1)
                self.LL = self.mean - self.X * self.s
                self.UL = self.mean + self.X * self.s
        elif self.count > 1:
            new_mean = self.mean + (value - self.mean) / self.count
            self.s = self.s + (value - self.mean) * (value - new_mean)
            self.mean = new_mean
            if self.s == 0:
                self.s = np.nextafter(0, 1)
            half = self.X * math.sqrt(self.s / self.count)
            self.LL, self.UL = self.mean - half, self.mean + half
        return status, code


class OracleEMA:
    """ema.py:48-148: EMA with s=2/(N+1), graded against static UL/LL."""

    def __init__(self, N, UL, LL, warning_stages, input_vector_size=1):
        self.smoothing = 2 / (N + 1)
        self.UL, self.LL = UL, LL
        self.warning_stages = sorted(warning_stages)
        self.input_vector_size = input_vector_size
        self.ema = None

    def insert(self, message: dict):
        if not check_message(message, self.input_vector_size):
            return UNDEFINED, UNDEFINED_CODE
        value = message["ftr_vector"][0]
        if self.ema is None:
            self.ema = value
        else:
            self.ema = value * self.smoothing + self.ema * (1 - self.smoothing)
        vn = 2 * (self.ema - (self.UL + self.LL) / 2) / (self.UL - self.LL)
        return grade_scalar(vn, self.warning_stages, context="EMA")


class OracleMACD:
    """macd.py:45-120: EMA(period1) - EMA(period2) graded vs UL/LL."""

    def __init__(self, period1, period2, UL, LL, warning_stages, input_vector_size=1):
        self.p1, self.p2 = period1, period2
        self.UL, self.LL = UL, LL
        self.warning_stages = sorted(warning_stages)
        self.input_vector_size = input_vector_size
        self.ema1 = self.ema2 = None

    def insert(self, message: dict):
        if not check_message(message, self.input_vector_size):
            return UNDEFINED, UNDEFINED_CODE
        value = message["ftr_vector"][0]
        if self.ema1 is None:
            self.ema1 = self.ema2 = value
        else:
            a1, a2 = 2 / (self.p1 + 1), 2 / (self.p2 + 1)
            self.ema1 = value * a1 + self.ema1 * (1 - a1)
            self.ema2 = value * a2 + self.ema2 * (1 - a2)
        vn = 2 * ((self.ema1 - self.ema2) - (self.UL + self.LL) / 2) / (self.UL - self.LL)
        return grade_scalar(vn, self.warning_stages, context="MACD")


class OracleCumulative:
    """cumulative.py:41-111: decaying cumulative sum of relative running-mean
    changes, graded against fixed ±1 with warning stages."""

    def __init__(self, decay, averaging, warning_stages, input_vector_size=1):
        self.decay, self.averaging = decay, averaging
        self.warning_stages = sorted(warning_stages)
        self.input_vector_size = input_vector_size
        self.memory: list[float] = []
        self.running_mean = 0.0
        self.cumulative_sum = 0.0

    def insert(self, message: dict):
        if not check_message(message, self.input_vector_size):
            return UNDEFINED, UNDEFINED_CODE
        value = message["ftr_vector"][0]
        previous = self.running_mean
        self.memory.append(value)
        self.memory = self.memory[-self.averaging:]
        self.running_mean = float(np.average(self.memory))
        delta = (self.running_mean - previous) / abs(self.running_mean)
        self.cumulative_sum = (self.cumulative_sum + delta) * (1 - self.decay)
        return grade_scalar(self.cumulative_sum, self.warning_stages)


class OracleHampel:
    """hampel.py:41-121: median/MAD outlier check over a 2W+1 window with the
    reference's off-center graded point memory[W+1]; first 2W+1 records
    Undefined; Error => suggested_value = window median."""

    def __init__(self, W, K, n_sigmas, input_vector_size=1):
        self.W, self.K, self.n_sigmas = W, K, n_sigmas
        self.input_vector_size = input_vector_size
        self.memory: list = [None] * (2 * W + 1)
        self.count = 0
        self.suggested_value = None

    def insert(self, message: dict):
        if not check_message(message, self.input_vector_size):
            return UNDEFINED, UNDEFINED_CODE
        value = message["ftr_vector"][0]
        self.memory.append(value)
        self.memory = self.memory[-(2 * self.W + 1):]
        if self.count < 2 * self.W + 1:
            self.suggested_value = self.memory[self.W + 1]
            status, code = UNDEFINED, UNDEFINED_CODE
        else:
            arr = np.asarray(self.memory, dtype=np.float64)
            median = float(np.median(arr))
            S0 = self.K * float(np.median(np.abs(arr - median)))
            if abs(arr[self.W + 1] - median) > self.n_sigmas * S0:
                self.suggested_value = median
                status, code = "Anomaly detected", ERROR_CODE
            else:
                self.suggested_value = float(arr[self.W + 1])
                status, code = OK, OK_CODE
        self.count += 1
        return status, code


class OraclePercentile:
    """percentile.py:48-110 *intended* semantics (buff_size from config, OK
    inside the range): newest value outside the [lo, hi] trailing-buffer
    percentiles => Error."""

    def __init__(self, percentile_range, buff_size, input_vector_size=1):
        self.lo, self.hi = percentile_range
        self.buff_size = buff_size
        self.input_vector_size = input_vector_size
        self.buff: list[float] = []

    def insert(self, message: dict):
        if not check_message(message, self.input_vector_size):
            return UNDEFINED, UNDEFINED_CODE
        value = message["ftr_vector"][0]
        self.buff.append(value)
        if len(self.buff) > self.buff_size:
            self.buff.pop(0)
        p_lo, p_hi = np.percentile(self.buff, [self.lo, self.hi])
        if self.buff[-1] < p_lo:
            return ERROR, ERROR_CODE
        if self.buff[-1] > p_hi:
            return ERROR, ERROR_CODE
        return OK, OK_CODE


class OracleFiltering:
    """filtering.py:49-147: Butterworth low-pass with carried lfilter state
    initialized to lfilter_zi; mode 0 grades the filtered signal vs UL/LL;
    mode 1 grades deviation (x - filtered)/(UL - LL) (with the reference's
    mixed-signal error branch at :87-92 reproduced: the lower error bound
    checks value_normalized, not deviation)."""

    def __init__(self, filter_order, cutoff_frequency, mode, UL, LL, warning_stages,
                 input_vector_size=1):
        self.mode, self.UL, self.LL = mode, UL, LL
        self.warning_stages = sorted(warning_stages)
        self.input_vector_size = input_vector_size
        self.b, self.a = dsp.butter_lowpass(filter_order, cutoff_frequency)
        self.z = dsp.lfilter_zi(self.b, self.a)
        self.filtered = None

    def insert(self, message: dict):
        if not check_message(message, self.input_vector_size):
            return UNDEFINED, UNDEFINED_CODE
        x = message["ftr_vector"][0]
        y, self.z = dsp.lfilter(self.b, self.a, [x], zi=self.z)
        self.filtered = float(y[0])
        vn = 2 * (self.filtered - (self.UL + self.LL) / 2) / (self.UL - self.LL)
        if self.mode == 1:
            deviation = (x - self.filtered) / (self.UL - self.LL)
            if deviation > 1:
                return "Error: Large deviation", ERROR_CODE
            if vn < -1:  # reference quirk: lower bound on the normalized filtered value
                return "Error: Large deviation", ERROR_CODE
            status, code = OK, OK_CODE
            for k, stage in enumerate(self.warning_stages):
                if deviation > stage:
                    status, code = f"Warning{k}: Significant deviation.", WARNING_CODE
                elif deviation < -stage:
                    status, code = f"Warning{k}: Significant deviation.", WARNING_CODE
                else:
                    break
            return status, code
        return grade_scalar(vn, self.warning_stages, context="Filtered signal")


class OracleLinearFit:
    """linear_fit.py:50-151: rolling OLS slope over the last N values graded
    vs UL/LL; Undefined for the first N records and when fit quality
    residuals/value > confidence_norm."""

    def __init__(self, N, UL, LL, confidence_norm, warning_stages, input_vector_size=1):
        self.N, self.UL, self.LL = N, UL, LL
        self.confidence_norm = confidence_norm
        self.warning_stages = sorted(warning_stages)
        self.input_vector_size = input_vector_size
        self.memory: list[float] = []
        self.count = 0

    def insert(self, message: dict):
        if not check_message(message, self.input_vector_size):
            return UNDEFINED, UNDEFINED_CODE
        value = message["ftr_vector"][0]
        self.memory.append(value)
        self.memory = self.memory[-self.N:]
        status, code = UNDEFINED, UNDEFINED_CODE
        if self.count >= self.N:
            x = np.arange(len(self.memory), dtype=np.float64)
            y = np.asarray(self.memory, dtype=np.float64)
            coeffs, residuals, *_ = np.polyfit(x, y, deg=1, full=True)
            slope = coeffs[0]
            res = residuals[0] if len(residuals) else 0.0
            vn = 2 * (slope - (self.UL + self.LL) / 2) / (self.UL - self.LL)
            if res / value > self.confidence_norm:
                status, code = UNDEFINED, UNDEFINED_CODE
            else:
                status, code = grade_scalar(vn, self.warning_stages, context="slope")
        self.count += 1
        return status, code


def combine_and(codes: list[int]) -> int:
    """combination.py:122-148: max status code ignoring Undefined; all
    Undefined => Undefined."""
    best = -2
    for c in codes:
        if c != 2 and c > best:
            best = c
    return UNDEFINED_CODE if best == -2 else best


def combine_or(codes: list[int]) -> int:
    """combination.py:151-176: min status code (Undefined beats nothing)."""
    return min(codes, default=UNDEFINED_CODE)


def percent_score(codes: list[int]) -> float:
    """combination.py:187-199 per-record score: Warning=1, Error=2, /2K."""
    score = sum(1 if c == 0 else 2 if c == -1 else 0 for c in codes)
    return score / (2 * len(codes))


class OracleLastNAverage:
    """normalization.py:24-55: on Error, replace with mean of last N vectors
    (the normalized value feeds back into its own memory)."""

    def __init__(self, N):
        self.N = N
        self.memory: list[list[float]] = []

    def add_value(self, value):
        self.memory.append(list(value))
        self.memory = self.memory[-self.N:]

    def get_normalized(self, value):
        if self.N == len(self.memory):
            normalized = np.mean(np.asarray(self.memory, dtype=np.float64), axis=0).tolist()
            self.add_value(normalized)
            return normalized
        self.add_value(value)
        return False


class OraclePeriodicLastNAverage:
    """normalization.py:58-93: mean of N samples spaced `period` apart."""

    def __init__(self, N, period):
        self.N, self.period = N, period
        self.memory_len = (N - 1) * period + 1
        self.memory: list[list[float]] = []

    def add_value(self, value):
        self.memory.append(list(value))
        self.memory = self.memory[-self.memory_len:]

    def get_normalized(self, value):
        if self.memory_len == len(self.memory):
            picked = np.asarray(self.memory[:: self.period], dtype=np.float64)
            normalized = np.mean(picked, axis=0).tolist()
            self.add_value(normalized)
            return normalized
        self.add_value(value)
        return False
