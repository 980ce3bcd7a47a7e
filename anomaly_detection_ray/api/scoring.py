"""Scoring backends for the REST service — both routed through the SAME
config compat layer the CLI uses (pipelines/config.run_reference_config),
so the service fronts the engine rather than reimplementing it.

Single-record parity (reference router.py:79-117 detect_anomaly +
src/Test.py:103-177): the reference builds a FRESH consumer per call,
inserts ONE ``{"timestamp", "ftr_vector"}`` record, and returns 1 iff any
configured algorithm's first status string starts with "Error"
(Test.classify_data). Here the record becomes a 1-row Dataset through the
same ts/f0..fk column convention as sources/messages.read_message_json,
runs the configured chain, and maps any ``*_code == ERROR_CODE`` to 1.

Batch extension (engine-native, no reference equivalent): score a whole
message FILE through the distributed pipeline and return summary counts —
the Ray data plane the single-record endpoint cannot show.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np
import pandas as pd

from ..functions.grading import ERROR_CODE
from ..pipelines.config import run_reference_config
from .store import ApiError


def _record_frame(timestamp: float, ftr_vector: list[float]) -> pd.DataFrame:
    cols: dict[str, Any] = {"ts": [float(timestamp)]}
    for i, v in enumerate(ftr_vector):
        cols[f"f{i}"] = [float(v)]
    return pd.DataFrame(cols)


def detect_anomaly_record(config: dict, timestamp: float,
                          ftr_vector: list[float],
                          base_dir: str | None = None) -> int:
    """Run ONE record through the detector's configured chain; 1 iff any
    check graded it Error (the reference's pred_is_anomaly contract)."""
    import ray.data as rd

    if not ftr_vector or any(v is None or (isinstance(v, float)
                                           and math.isnan(v))
                             for v in ftr_vector):
        raise ApiError(400, "ftr_vector must be non-empty numbers")
    ds = rd.from_pandas(_record_frame(timestamp, ftr_vector))
    try:
        out = run_reference_config(config, ds=ds, base_dir=base_dir)
        row = out.to_pandas()
    except ApiError:
        raise
    except Exception as e:  # reference ProcessingException -> 500
        raise ApiError(500, f"An error occurred in start_consumer: {e}")
    if row.empty:
        raise ApiError(500, "scorer chain produced no verdict row")
    code_cols = [c for c in row.columns if c.endswith("_code")]
    codes = row.iloc[0][code_cols].to_numpy()
    return int(bool((codes == ERROR_CODE).any()))


def detect_anomaly_file(config: dict, data_path: str,
                        base_dir: str | None = None) -> dict:
    """Engine-native batch scoring: run a message CSV/JSON through the
    distributed chain and fold per-check verdict counts (one streaming
    aggregate — rows never collect on the driver)."""
    try:
        out = run_reference_config(config, data_path=data_path,
                                   base_dir=base_dir)
    except FileNotFoundError:
        raise ApiError(404, f"Data file with id {data_path} not found.")
    except Exception as e:
        raise ApiError(500, f"An error occurred in batch scoring: {e}")

    def fold(t) -> pd.DataFrame:
        df = t.to_pandas() if not isinstance(t, pd.DataFrame) else t
        code_cols = [c for c in df.columns if c.endswith("_code")]
        rec = {"rows": len(df)}
        for c in code_cols:
            rec[f"{c}_errors"] = int(
                (df[c].to_numpy() == ERROR_CODE).sum())
        return pd.DataFrame([rec])

    parts = out.map_batches(fold, batch_format="pyarrow").to_pandas()
    summary = {c: int(parts[c].fillna(0).sum()) for c in parts.columns}
    summary["anomalies"] = int(sum(
        v for k, v in summary.items() if k.endswith("_code_errors")))
    return summary
