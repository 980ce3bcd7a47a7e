"""Labelled-evaluation harness — the reference's Test consumer +
GridSearch wrapper surface (/root/reference/src/Test.py:49-161,
/root/reference/src/AnomalyDetectorWrapper.py:6-67): grade a
reference-schema config against a labelled stream and return
precision / recall / F1, and sweep a parameter grid for the best config.

The reference's head code is broken here (``Test.confusion_matrix`` is
called but does not exist; ``classify_data`` latches one global flag) —
this implements the evident intent: a row is a predicted anomaly iff any
configured check graded it Error (status ``"Error..."`` <=> code -1,
Test.py:168-177), and the confusion counts are taken per-row against the
stream's ``label`` column (the ads-1..9 labelled sets).

Ray mapping: the scored Dataset streams through ONE ``map_batches`` that
emits per-batch confusion partials (tp/fp/fn/tn); only the tiny partial
table reaches the driver. Nothing is materialized, so evaluation scales
with the scored stream. Grid search runs candidates sequentially — each
candidate is itself a fully distributed pipeline, which beats distributing
the (small) grid and serializing every pipeline.
"""

from __future__ import annotations

from itertools import product
from typing import Any

import numpy as np
import pandas as pd

from ..functions.grading import ERROR_CODE


def _truthy(arr: pd.Series) -> np.ndarray:
    """Label column -> bool (ads CSVs carry 'True'/'False' strings)."""
    if arr.dtype == bool:
        return arr.to_numpy()
    if np.issubdtype(arr.dtype, np.number):
        return arr.to_numpy() != 0
    s = arr.astype(str).str.strip().str.lower()
    return s.isin(("true", "1", "t", "yes")).to_numpy()


def confusion_counts(ds, code_cols: list[str], label_col: str = "label") -> dict:
    """Stream the scored Dataset once; per-batch confusion partials, driver
    folds the 4-int rows."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        y = _truthy(df[label_col])
        pred = np.zeros(len(df), dtype=bool)
        for c in code_cols:
            pred |= df[c].to_numpy() == ERROR_CODE
        return pd.DataFrame({
            "tp": [int((pred & y).sum())], "fp": [int((pred & ~y).sum())],
            "fn": [int((~pred & y).sum())], "tn": [int((~pred & ~y).sum())]})

    p = ds.map_batches(partial, batch_format="pandas").to_pandas().sum()
    tp, fp, fn, tn = int(p["tp"]), int(p["fp"]), int(p["fn"]), int(p["tn"])
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return {"tp": tp, "fp": fp, "fn": fn, "tn": tn, "n": tp + fp + fn + tn,
            "precision": precision, "recall": recall, "f1": f1}


def evaluate_config(conf: dict | str, data_path: str | None = None,
                    ds=None, key_col: str | None = None,
                    value_col: str = "f0", label_col: str = "label",
                    base_dir: str | None = None) -> dict:
    """Run a reference-schema config over a labelled stream and score it.

    Returns ``{tp, fp, fn, tn, n, precision, recall, f1}``. Prediction =
    any configured check's ``<prefix>_code == -1`` on the row.
    """
    from .config import run_reference_config
    scored = run_reference_config(conf, data_path=data_path, ds=ds,
                                  key_col=key_col, value_col=value_col,
                                  base_dir=base_dir)
    code_cols = [c for c in scored.schema().names if c.endswith("_code")
                 and c != "rv_code"]
    return confusion_counts(scored, code_cols, label_col)


def grid_search(base_conf: dict, param_grid: dict[str, list[Any]],
                data_path: str | None = None, ds=None,
                key_col: str | None = None, value_col: str = "f0",
                label_col: str = "label",
                base_dir: str | None = None) -> pd.DataFrame:
    """AnomalyDetectorWrapper/GridSearchCV parity: sweep the cartesian
    product of ``param_grid`` over the FIRST algorithm's conf, score each
    candidate by F1, return one row per candidate sorted best-first."""
    rows = []
    keys = list(param_grid)
    for combo in product(*(param_grid[k] for k in keys)):
        conf = {**base_conf,
                "anomaly_detection_conf":
                    [dict(base_conf["anomaly_detection_conf"][0]),
                     *base_conf["anomaly_detection_conf"][1:]]}
        conf["anomaly_detection_conf"][0].update(dict(zip(keys, combo)))
        m = evaluate_config(conf, data_path=data_path, ds=ds,
                            key_col=key_col, value_col=value_col,
                            label_col=label_col, base_dir=base_dir)
        rows.append({**dict(zip(keys, combo)), **m})
    out = pd.DataFrame(rows).sort_values("f1", ascending=False)
    return out.reset_index(drop=True)
