"""Distribution-drift checks (KS + PSI) per partition vs the global
distribution — SURVEY.md §7.3 step 6, graded with the reference's
warning-stage idiom.

Two-level pattern: every batch emits fixed-edge histogram partials per
partition_id present in the batch (tiny rows: P × #batches), a small
``groupby(partition_id)`` merges them, the driver sums the P rows into the
global histogram and computes per-partition KS/PSI against the
leave-one-out global (global minus the partition, so a drifted partition
cannot mask itself inside its own baseline).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.grading import ERROR_CODE, OK_CODE, WARNING_CODE
from ..functions.sketches import ks_statistic, psi

DEFAULT_EDGES = {
    "sr_hz": np.array([4000, 8000, 11025, 16000, 22050, 32000, 44100, 48000, 96000], dtype=float),
    "dur_ms": np.array([200, 500, 1000, 1500, 2000, 3000, 4500, 6000, 9000, 12000, 15000], dtype=float),
}


def _hist_partial_batch(t: pa.Table, columns: dict[str, np.ndarray],
                        part_col: str) -> pa.Table:
    """Per-batch fixed-edge histogram partials, one row per (partition key,
    column). The key column keeps its native type (int partition ids or a
    string group key like codec/event_type)."""
    parts = t[part_col].to_numpy(zero_copy_only=False)
    out_part, out_col, out_counts = [], [], []
    uniq = pd.unique(parts)
    for p in uniq:
        mask = parts == p
        for col, edges in columns.items():
            v = pc.cast(t[col], pa.float64()).to_numpy(zero_copy_only=False)[mask]
            v = v[~np.isnan(v)]
            idx = np.searchsorted(edges, v, side="right")
            counts = np.bincount(idx, minlength=len(edges) + 1)
            out_part.append(p)
            out_col.append(col)
            out_counts.append(counts.astype(np.int64))
    return pa.table({
        "partition_id": pa.array(out_part),
        "column": pa.array(out_col, type=pa.string()),
        "counts": pa.array([c.tolist() for c in out_counts], type=pa.list_(pa.int64())),
    })


def _merge_hist_group(g: pd.DataFrame) -> pd.DataFrame:
    total = np.sum(np.stack([np.asarray(c) for c in g["counts"]]), axis=0)
    return pd.DataFrame({"partition_id": [g["partition_id"].iloc[0]],
                         "column": [g["column"].iloc[0]],
                         "counts": [total.tolist()]})


def partition_drift(ds, columns: dict[str, np.ndarray] | None = None,
                    part_col: str = "partition_id",
                    ks_error: float = 0.1, ks_warning: float = 0.05,
                    psi_error: float = 0.25, psi_warning: float = 0.1,
                    driver_merge: bool = True) -> pd.DataFrame:
    """Per-partition drift verdicts. Returns one row per (partition, column):
    ks, psi, drift_code.

    Thresholds are sample-size aware so small partitions don't false-alarm:
    the effective KS threshold is max(configured floor, the two-sample KS
    critical value c(α)·sqrt((n+m)/(n·m)) with c=1.95 for error / 1.36 for
    warning), and the PSI threshold is floored at a multiple of its
    no-change expectation E[PSI] ≈ (B-1)(1/n + 1/m) (chi-square scale)."""
    columns = columns or DEFAULT_EDGES
    partials = ds.map_batches(
        lambda t: _hist_partial_batch(t, columns, part_col), batch_format="pyarrow")
    if driver_merge:
        # partials are tiny (#batches × P × #cols rows) — one pandas fold on
        # the driver beats a Ray shuffle up to ~1e7 partial rows; past that,
        # flip driver_merge=False for the groupby merge path.
        pdf = partials.to_pandas()
        merged = (pdf.groupby(["partition_id", "column"], as_index=False, sort=False)
                  .agg(counts=("counts", lambda s: np.sum(
                      np.stack([np.asarray(c) for c in s]), axis=0))))
    else:
        merged = partials.groupby(["partition_id", "column"]).map_groups(
            _merge_hist_group, batch_format="pandas").to_pandas()

    return grade_drift(merged, ks_error, ks_warning, psi_error, psi_warning)


def grade_drift(merged: pd.DataFrame, ks_error: float = 0.1,
                ks_warning: float = 0.05, psi_error: float = 0.25,
                psi_warning: float = 0.1) -> pd.DataFrame:
    """Grade merged histograms (rows: partition_id, column, counts) into
    per-(partition, column) ks/psi/drift_code verdicts."""
    rows = []
    for col, g in merged.groupby("column"):
        stacks = {r["partition_id"]: np.asarray(r["counts"]) for _, r in g.iterrows()}
        global_counts = np.sum(np.stack(list(stacks.values())), axis=0)
        # Robust reference: per-bin MEDIAN of partition proportions,
        # renormalized — a minority of drifted partitions cannot contaminate
        # the baseline the way a plain global (or leave-one-out) sum can.
        props = np.stack([c / max(c.sum(), 1) for c in stacks.values()])
        ref_p = np.median(props, axis=0)
        ref_p = ref_p / ref_p.sum() if ref_p.sum() > 0 else ref_p
        for pid, counts in sorted(stacks.items()):
            rest = np.round(ref_p * (global_counts.sum() - counts.sum()))
            k = ks_statistic(rest, counts)
            p = psi(rest, counts)
            n, m = counts.sum(), rest.sum()
            if n == 0 or m == 0:
                rows.append({"partition_id": pid, "column": col, "ks": k,
                             "psi": p, "drift_code": OK_CODE})
                continue
            size_term = np.sqrt((n + m) / (n * m))
            B = len(counts)
            psi_noise = (B - 1) * (1.0 / n + 1.0 / m)
            ks_err_t = max(ks_error, 1.95 * size_term)
            ks_warn_t = max(ks_warning, 1.36 * size_term)
            psi_err_t = max(psi_error, 10.0 * psi_noise)
            psi_warn_t = max(psi_warning, 5.0 * psi_noise)
            if (k >= ks_err_t) or (p >= psi_err_t):
                code = ERROR_CODE
            elif (k >= ks_warn_t) or (p >= psi_warn_t):
                code = WARNING_CODE
            else:
                code = OK_CODE
            rows.append({"partition_id": pid, "column": col, "ks": k,
                         "psi": p, "drift_code": code})
    return pd.DataFrame(rows)
