"""Optimal multiple-changepoint detection (PELT, Killick et al. 2012).

Finds the segmentation of a series that minimizes
``sum(segment squared error) + beta * n_changepoints`` — exactly, not
greedily — with the PELT pruning rule keeping the candidate set small
(linear time on series with changepoints that actually exist). The
piecewise-constant-mean cost is the standard normal mean-change model;
``beta`` defaults to the BIC penalty ``2 * sigma^2 * log(n)`` with sigma
estimated robustly from first differences (MAD / sqrt(2) / 0.6745 —
insensitive to level shifts, which is the point).

Complements the sequential CUSUM kernel: CUSUM raises WHILE drift
accumulates; PELT recovers WHERE the level changed, optimally and after
the fact — the batch audit tool for "when did this source's behavior
change".

Execution shape: a per-series kernel behind stages/series.py's
``groupby(key).map_groups`` (bounded-series-per-worker contract); exact
optimality is pinned against an O(n^2) full DP in tests/test_changepoint.py.
"""

from __future__ import annotations

import numpy as np

from .grading import ERROR_CODE, OK_CODE, UNDEFINED_CODE


def _robust_sigma(x: np.ndarray) -> float:
    """Noise scale from first differences: MAD(diff)/(0.6745*sqrt(2)) —
    level shifts contribute only |changepoints| outlier diffs, which the
    median ignores."""
    d = np.diff(x)
    if len(d) == 0:
        return 0.0
    mad = float(np.median(np.abs(d - np.median(d))))
    return mad / (0.6745 * np.sqrt(2.0))


def pelt_mean(x: np.ndarray, beta: float | None = None,
              min_size: int = 2) -> list[int]:
    """Changepoint indices (each the START of a new segment, ascending)
    for the piecewise-constant-mean model, exact PELT.

    ``beta``: penalty per changepoint; default 2*sigma^2*log(n) (BIC).
    ``min_size``: minimum segment length."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if n < 2 * min_size:
        return []
    if beta is None:
        sig = _robust_sigma(x)
        if sig <= 0.0:
            sig = 1e-12
        beta = 2.0 * sig * sig * np.log(n)
    c1 = np.concatenate([[0.0], np.cumsum(x)])
    c2 = np.concatenate([[0.0], np.cumsum(x * x)])

    def cost(a: int, b: int) -> float:
        # sum_{i in [a, b)} (x_i - mean)^2, closed form
        s = c1[b] - c1[a]
        return (c2[b] - c2[a]) - s * s / (b - a)

    F = np.full(n + 1, np.inf)
    F[0] = -beta
    prev = np.zeros(n + 1, dtype=np.int64)
    cand = [0]
    for t in range(min_size, n + 1):
        best, arg = np.inf, 0
        for s in cand:
            if t - s < min_size:
                continue
            v = F[s] + cost(s, t) + beta
            if v < best:
                best, arg = v, s
        F[t] = best
        prev[t] = arg
        # PELT prune (sum-of-squares cost is subadditive, K = 0): an s
        # that loses to F[t] even before paying the penalty can never be
        # the optimal last changepoint for any t' > t
        cand = [s for s in cand if F[s] + cost(s, t) <= F[t]]
        cand.append(t)
    # backtrack
    cps = []
    t = n
    while t > 0:
        s = int(prev[t])
        if s > 0:
            cps.append(s)
        t = s
    return sorted(cps)


def changepoint_check(values: np.ndarray, min_size: int = 5,
                      beta_scale: float = 1.0) -> dict[str, np.ndarray]:
    """Series kernel: Error exactly AT each detected changepoint (the
    first index of every new segment), OK elsewhere; ``beta_scale``
    multiplies the BIC penalty (higher = fewer changepoints).
    Deterministic — no RNG."""
    n = len(values)
    code = np.full(n, OK_CODE, dtype=np.int8)
    status = np.full(n, "OK", dtype=object)
    if n < 2 * min_size:
        code[:] = UNDEFINED_CODE
        status[:] = "Undefined"
        return {"status_code": code, "status": status}
    x = np.asarray(values, dtype=np.float64)
    sig = _robust_sigma(x)
    beta = 2.0 * max(sig, 1e-12) ** 2 * np.log(n) * beta_scale
    for cp in pelt_mean(x, beta=beta, min_size=min_size):
        code[cp] = ERROR_CODE
        status[cp] = "Anomaly detected: level changepoint"
    return {"status_code": code, "status": status}
