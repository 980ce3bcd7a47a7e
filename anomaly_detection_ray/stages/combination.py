"""Verdict combination — vectorized status determiners
(/root/reference/src/algorithms/combination.py:122-218).

Each check stage appended its own ``<prefix>_code`` column; combining K
checks is a masked row-wise reduce over those columns — the columnar form
of the reference's Combination scorer that ran K sub-scorers per message.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.grading import UNDEFINED_CODE


def _stack(t: pa.Table, code_cols: list[str]) -> np.ndarray:
    return np.stack([t[c].to_numpy(zero_copy_only=False).astype(np.int8)
                     for c in code_cols], axis=1)


def combine_and(codes: np.ndarray) -> np.ndarray:
    """Max status code ignoring Undefined; all-Undefined => Undefined
    (combination.py:122-148)."""
    masked = np.ma.masked_equal(codes, UNDEFINED_CODE)
    out = masked.max(axis=1)
    return out.filled(UNDEFINED_CODE).astype(np.int8)


def combine_or(codes: np.ndarray) -> np.ndarray:
    """Min status code (combination.py:151-176)."""
    return codes.min(axis=1).astype(np.int8)


def percent_score(codes: np.ndarray) -> np.ndarray:
    """Per-record anomaly score: Warning=1, Error=2, /2K
    (combination.py:187-199)."""
    score = (codes == 0).sum(axis=1) + 2 * (codes == -1).sum(axis=1)
    return score / (2.0 * codes.shape[1])


def combine_stage(t: pa.Table, code_cols: list[str], mode: str = "or",
                  out_col: str = "status_code") -> pa.Table:
    codes = _stack(t, code_cols)
    if mode == "and":
        combined = combine_and(codes)
    elif mode == "or":
        combined = combine_or(codes)
    else:
        raise ValueError(f"unknown combination mode {mode!r}")
    t = t.append_column(out_col, pa.array(combined, type=pa.int8()))
    return t.append_column("anomaly_score",
                           pa.array(percent_score(codes), type=pa.float64()))
