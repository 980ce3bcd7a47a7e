"""Row validation — the vectorized re-expression of ``check_ftr_vector``
(/root/reference/src/algorithms/anomaly_detection.py:204-263).

The reference rejects a record when the vector is missing/mis-sized or
contains a string/None/NaN, or the timestamp is absent/non-numeric/out of
datetime range; rejected records get status Undefined (code 2) and never
touch scorer state. Here the same checks run as Arrow/numpy predicates over
whole batches, appending ``rv_code`` (int8) and ``rv_reason`` (string).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.grading import OK_CODE, UNDEFINED_CODE

# pandas datetime64[ns] bounds in unix seconds / ms — the reference's
# "timestamp parseable" window (anomaly_detection.py:249-257)
_TS_MAX_S = 9.2e9  # ~2262 in seconds-unit; beyond this the reference retries ms
_TS_MAX_MS = 9.2e12


def _bool_np(arr: pa.ChunkedArray | pa.Array, default: bool = False) -> np.ndarray:
    """Arrow boolean -> numpy bool with nulls as ``default``."""
    return pc.fill_null(arr, default).to_numpy(zero_copy_only=False).astype(bool)


def validate_clips(t: pa.Table) -> pa.Table:
    """Clip-table row validation: metadata nulls / non-positive values are the
    NaN-equivalents of the reference's vector check (FIXTURES.md §B
    'NaN-equivalent' class)."""
    n = t.num_rows
    reasons = np.full(n, "", dtype=object)
    bad = np.zeros(n, dtype=bool)

    for col, label in [("clip_id", "null clip_id"), ("sr_hz", "null sr_hz"),
                       ("dur_ms", "null dur_ms"), ("bytes", "null bytes")]:
        m = _bool_np(pc.is_null(t[col]), default=True)
        reasons[m & ~bad] = label
        bad |= m
    for col, label in [("sr_hz", "non-positive sr_hz"), ("dur_ms", "non-positive dur_ms")]:
        m = _bool_np(pc.less_equal(t[col], 0))
        reasons[m & ~bad] = label
        bad |= m

    code = np.where(bad, UNDEFINED_CODE, OK_CODE).astype(np.int8)
    return (t.append_column("rv_code", pa.array(code, type=pa.int8()))
             .append_column("rv_reason", pa.array(reasons, type=pa.string())))


def validate_events(t: pa.Table, value_col: str = "value",
                    ts_col: str = "ts") -> pa.Table:
    """Events-table analogue of check_ftr_vector: value present & finite,
    timestamp present & in pandas datetime range."""
    n = t.num_rows
    val = t[value_col]
    bad_value = _bool_np(pc.is_null(val), default=True)
    if pa.types.is_floating(val.type):
        bad_value |= _bool_np(pc.is_nan(pc.fill_null(val, 0.0)))

    ts = t[ts_col]
    bad_ts = _bool_np(pc.is_null(ts), default=True)
    if pa.types.is_integer(ts.type) or pa.types.is_floating(ts.type):
        tsv = pc.fill_null(ts, 0).to_numpy(zero_copy_only=False).astype(np.float64)
        bad_ts |= ~((np.abs(tsv) < _TS_MAX_S) | (np.abs(tsv) < _TS_MAX_MS))

    code = np.where(bad_value | bad_ts, UNDEFINED_CODE, OK_CODE).astype(np.int8)
    reasons = np.full(n, "", dtype=object)
    reasons[bad_ts] = "invalid timestamp"
    reasons[bad_value] = "invalid value"
    return (t.append_column("rv_code", pa.array(code, type=pa.int8()))
             .append_column("rv_reason", pa.array(reasons, type=pa.string())))
