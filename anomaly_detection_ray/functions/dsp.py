"""Minimal DSP kernels (no scipy in this environment).

Implements digital Butterworth low-pass design, ``lfilter`` (direct form II
transposed) and ``lfilter_zi`` from the standard published formulations
(Oppenheim & Schafer; same algorithms scipy.signal documents), so the
Filtering check (/root/reference/src/algorithms/filtering.py:45-76) can be
reproduced without scipy. Verified against the reference unit-test
coefficients (unit_tests.py:415-440) to 8 decimals.
"""

from __future__ import annotations

import numpy as np


def butter_lowpass(order: int, wn: float) -> tuple[np.ndarray, np.ndarray]:
    """Digital Butterworth low-pass (b, a), cutoff ``wn`` in (0, 1) of Nyquist.

    Analog prototype poles -> low-pass frequency transform with bilinear
    pre-warp -> bilinear transform -> polynomial coefficients.
    """
    if not 0 < wn < 1:
        raise ValueError("wn must be in (0, 1)")
    # Butterworth analog prototype: poles evenly spaced on the left unit circle
    m = np.arange(-order + 1, order, 2)
    p = -np.exp(1j * np.pi * m / (2 * order))
    k = 1.0

    fs = 2.0
    warped = 2 * fs * np.tan(np.pi * wn / fs)

    # lp2lp: scale poles to the warped cutoff
    p = warped * p
    k = k * warped**order

    # bilinear transform
    fs2 = 2.0 * fs
    p_z = (fs2 + p) / (fs2 - p)
    z_z = -np.ones(order)  # zeros from degree difference map to z = -1
    k_z = k * np.real(1.0 / np.prod(fs2 - p))

    b = k_z * np.poly(z_z)
    a = np.real(np.poly(p_z))
    return np.real(b), a


def lfilter_zi(b: np.ndarray, a: np.ndarray) -> np.ndarray:
    """Initial filter state for step-response steady state (unit step in -> 1)."""
    b = np.asarray(b, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    b = b / a[0]
    a = a / a[0]
    n = max(len(a), len(b))
    a = np.pad(a, (0, n - len(a)))
    b = np.pad(b, (0, n - len(b)))

    # companion matrix of a
    comp = np.zeros((n - 1, n - 1))
    comp[0, :] = -a[1:]
    if n > 2:
        comp[1:, :-1] = np.eye(n - 2)
    IminusA = np.eye(n - 1) - comp.T
    B = b[1:] - a[1:] * b[0]
    return np.linalg.solve(IminusA, B)


def lfilter(
    b: np.ndarray, a: np.ndarray, x: np.ndarray, zi: np.ndarray | None = None
):
    """IIR filter, direct form II transposed. Returns y (and final state if zi given).

    The per-sample loop is unavoidable for an IIR recurrence; group sizes in
    the per-series kernels are bounded (SURVEY.md §7.5) so this stays off the
    per-row hot path of the wide pipeline.
    """
    b = np.asarray(b, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    b = b / a[0]
    a = a / a[0]
    n = max(len(a), len(b))
    a = np.pad(a, (0, n - len(a)))
    b = np.pad(b, (0, n - len(b)))

    return_state = zi is not None
    z = np.zeros(n - 1, dtype=np.float64) if zi is None else np.array(zi, dtype=np.float64)
    y = np.empty_like(x)
    for i in range(len(x)):
        xn = x[i]
        yn = b[0] * xn + z[0]
        for j in range(n - 2):
            z[j] = b[j + 1] * xn + z[j + 1] - a[j + 1] * yn
        z[n - 2] = b[n - 1] * xn - a[n - 1] * yn
        y[i] = yn
    if return_state:
        return y, z
    return y


def first_order_scan(a: float, x: np.ndarray, y0: float = 0.0) -> np.ndarray:
    """Vectorized linear recurrence ``y_t = a*y_{t-1} + x_t`` (t = 0..n-1).

    Blocked prefix-scan: within a block, ``y_t = a^{t+1}*(y0/a + cumsum(x_i * a^-i))``
    rearranged to avoid overflow by bounding the block length so ``a^-L``
    stays finite. O(n) with numpy vector ops — used for EMA-family and
    cumulative-sum recurrences instead of a per-row Python loop.
    """
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    out = np.empty(n, dtype=np.float64)
    if n == 0:
        return out
    if a == 0.0:
        return x.copy()
    absa = abs(a)
    if absa >= 1.0:
        L = 4096
    else:
        L = max(8, min(4096, int(600.0 / -np.log(absa))))
    start = 0
    carry = y0
    while start < n:
        xb = x[start : start + L]
        m = len(xb)
        pw = a ** np.arange(1, m + 1)        # a^1 .. a^m
        inv = a ** -np.arange(1, m + 1)      # a^-1 .. a^-m
        c = np.cumsum(xb * inv)
        yb = pw * (carry + c)
        out[start : start + m] = yb
        carry = yb[-1]
        start += m
    return out
