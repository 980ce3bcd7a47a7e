"""Vectorized warning-stage grading — the reference's shared verdict idiom.

The canonical scalar form lives at
/root/reference/src/algorithms/border_check.py:122-146: normalize a value to
[-1, 1] via ``vn = 2*(v - (UL+LL)/2)/(UL-LL)``; ``vn > 1`` / ``vn < -1`` is an
Error; otherwise walk the ascending ``warning_stages`` and take the highest
stage with ``|vn| > stage`` as Warning<k>; else OK.

Here the same semantics are computed over whole numpy arrays (one batch /
one sorted group at a time) with ``searchsorted`` + ``np.select`` — no
per-row Python.
"""

from __future__ import annotations

import numpy as np

OK_CODE = 1
WARNING_CODE = 0
ERROR_CODE = -1
UNDEFINED_CODE = 2


def normalize(values: np.ndarray, UL: float, LL: float) -> np.ndarray:
    """Range-normalize to [-1, 1] (border_check.py:123-124)."""
    return 2.0 * (np.asarray(values, dtype=np.float64) - (UL + LL) / 2.0) / (UL - LL)


def grade_normalized(
    vn: np.ndarray,
    warning_stages: list[float],
    context: str = "measurement",
    upper_msg: str | None = None,
    lower_msg: str | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Grade already-normalized values. Returns (status_code int8, status str).

    Exact reference loop semantics (border_check.py:129-146): strict
    inequalities everywhere; warning level = number of stages strictly below
    ``|vn|`` (stages ascend, so the loop's break point equals that count).
    NaN in ``vn`` grades as Undefined.
    """
    vn = np.asarray(vn, dtype=np.float64)
    stages = np.asarray(sorted(warning_stages), dtype=np.float64)
    absvn = np.abs(vn)

    nan_mask = np.isnan(vn)
    err_up = vn > 1.0
    err_dn = vn < -1.0
    # count of stages strictly less than |vn|
    n_exceeded = np.searchsorted(stages, absvn, side="left") if stages.size else np.zeros(len(vn), dtype=np.int64)
    warn = (n_exceeded > 0) & ~err_up & ~err_dn & ~nan_mask

    code = np.full(vn.shape, OK_CODE, dtype=np.int8)
    code[warn] = WARNING_CODE
    code[err_up | err_dn] = ERROR_CODE
    code[nan_mask] = UNDEFINED_CODE

    if upper_msg is None:
        upper_msg = f"Error: {context} above upper limit"
    if lower_msg is None:
        lower_msg = f"Error: {context} below lower limit"

    status = np.full(vn.shape, "OK", dtype=object)
    status[err_up] = upper_msg
    status[err_dn] = lower_msg
    status[nan_mask] = "Undefined"
    if stages.size:
        widx = np.clip(n_exceeded - 1, 0, len(stages) - 1)
        up_w = np.array([f"Warning{k}: {context} close to upper limit." for k in range(len(stages))], dtype=object)
        dn_w = np.array([f"Warning{k}: {context} close to lower limit." for k in range(len(stages))], dtype=object)
        wmask_up = warn & (vn > 0)
        wmask_dn = warn & (vn <= 0)
        status[wmask_up] = up_w[widx[wmask_up]]
        status[wmask_dn] = dn_w[widx[wmask_dn]]
    return code, status


def grade(
    values: np.ndarray,
    UL: float,
    LL: float,
    warning_stages: list[float],
    context: str = "measurement",
) -> tuple[np.ndarray, np.ndarray]:
    """Normalize then grade (the full border-check kernel)."""
    return grade_normalized(normalize(values, UL, LL), warning_stages, context=context)


def grade_normalized_codes(vn: np.ndarray, warning_stages: list[float]) -> np.ndarray:
    """Codes-only fast path (no status strings)."""
    code, _ = grade_normalized(vn, warning_stages)
    return code
