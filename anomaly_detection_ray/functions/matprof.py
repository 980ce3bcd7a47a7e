"""Self-join z-normalized matrix profile (STOMP) + discord check.

The matrix profile (Yeh et al. 2016, "Matrix Profile I"; STOMP recurrence
from Zhu et al. 2016) is the distance from every length-``m`` subsequence
to its nearest non-trivial neighbor in the same series. Discords — the
subsequences with the LARGEST profile values — are anomalies that window
statistics miss entirely: a shape that is locally smooth (passes Border/
Welford/Hampel) but unlike anything else the series ever does.

Implementation: O(n^2) total via the STOMP dot-product recurrence — each
row of QT is derived from the previous in O(n) numpy ops (no per-row FFT),
with the standard m/2 trivial-match exclusion zone. Zero-variance
(constant) subsequences use the convention corr=1 against other constants
and corr=0 against everything else, so flatlines match flatlines instead
of poisoning the profile.

Execution shape: a per-series kernel behind stages/series.py's
``groupby(key).map_groups`` — the same bounded-series-per-worker contract
every order-dependent scorer in this repo uses; nothing here shuffles
beyond that one exchange.
"""

from __future__ import annotations

import numpy as np

from .grading import ERROR_CODE, OK_CODE, UNDEFINED_CODE

_EPS = 1e-12


def matrix_profile(x: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Self-join matrix profile and profile index for window ``m``.

    Returns (mp, mpi): for each of the n-m+1 subsequences, the
    z-normalized Euclidean distance to its nearest neighbor outside the
    +-m/2 exclusion zone, and that neighbor's start index. Matches the
    O(n^2 m) brute-force definition to float tolerance (pinned in
    tests/test_matprof.py)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    l = n - m + 1
    excl = max(1, m // 2)
    if l < excl + 2:
        return (np.full(max(l, 0), np.nan),
                np.full(max(l, 0), -1, dtype=np.int64))
    c = np.cumsum(np.concatenate([[0.0], x]))
    c2 = np.cumsum(np.concatenate([[0.0], x * x]))
    mu = (c[m:] - c[:-m]) / m
    var = np.maximum((c2[m:] - c2[:-m]) / m - mu * mu, 0.0)
    sig = np.sqrt(var)
    zj = sig <= _EPS
    # QT0[j] = dot(x[0:m], x[j:j+m]) — one FFT-backed convolve, then the
    # STOMP recurrence keeps every later row O(n)
    QT0 = np.convolve(x, x[:m][::-1], mode="valid")
    QT = QT0.copy()
    mp = np.full(l, np.inf)
    mpi = np.full(l, -1, dtype=np.int64)
    for i in range(l):
        if i > 0:
            QT = np.concatenate((
                [QT0[i]],  # dot(x[i:i+m], x[0:m]) by self-join symmetry
                QT[:-1] - x[: l - 1] * x[i - 1] + x[m: m + l - 1] * x[i + m - 1],
            ))
        if zj[i]:
            corr = np.where(zj, 1.0, 0.0)
        else:
            with np.errstate(divide="ignore", invalid="ignore"):
                corr = (QT - m * mu[i] * mu) / (m * sig[i] * sig)
            corr = np.where(zj, 0.0, np.clip(corr, -1.0, 1.0))
        d = np.sqrt(np.maximum(2.0 * m * (1.0 - corr), 0.0))
        d[max(0, i - excl): i + excl + 1] = np.inf
        j = int(np.argmin(d))
        mp[i] = d[j]
        mpi[i] = j
    return mp, mpi


def matrix_profile_check(values: np.ndarray, m: int = 16,
                         threshold: float = 4.0) -> dict[str, np.ndarray]:
    """Discord check per point: the subsequence STARTING at each index is
    scored by its matrix-profile robust z ((mp - median) / MAD, the same
    50%-breakdown scale as robust_zscore), with the MAD floored at 1% of
    the scale-free maximum distance sqrt(2m) — a perfectly periodic
    series has profile MAD ~ float noise, and an unfloored scale would
    flag quantization wiggles. Error where the score exceeds
    ``threshold``. The last m-1 points (no subsequence starts there) and
    too-short series are Undefined. Deterministic — no RNG anywhere."""
    n = len(values)
    code = np.full(n, UNDEFINED_CODE, dtype=np.int8)
    status = np.full(n, "Undefined", dtype=object)
    mp, _ = matrix_profile(values, m)
    l = len(mp)
    if l == 0 or not np.isfinite(mp).any():
        return {"status_code": code, "status": status}
    med = float(np.median(mp))
    mad = float(np.median(np.abs(mp - med)))
    scale = max(mad, 0.01 * np.sqrt(2.0 * m))
    rz = (mp - med) / scale
    err = rz > threshold
    code[:l] = np.where(err, ERROR_CODE, OK_CODE)
    status[:l] = np.where(err, "Anomaly detected: discord subsequence", "OK")
    return {"status_code": code, "status": status}
