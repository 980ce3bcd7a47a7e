"""Per-series ordered check application — the Ray Data home of every
order-dependent scorer (EMA, Welford, MACD, Cumulative, Hampel, Percentile,
LinearFit, Filtering).

``groupby(key).map_groups`` hands each series to one task; the kernel sorts
the group by the order column (stable, so equal timestamps keep a
deterministic tiebreak), runs the vectorized kernels from
functions/rolling.py over the VALID values only (reference semantics:
records failing row validation never touch scorer state —
anomaly_detection.py:97-105), and scatters verdicts back to row order.

Partitioning assumption (documented per SURVEY.md guidance): one group =
one logical series and must fit in a worker's memory; series keys are
chosen so group sizes stay bounded (user_id / partition_id — not a global
sort). Flags match the sequential oracle exactly, including warm-up
Undefined runs.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import pandas as pd

from ..functions import rolling
from ..functions.grading import UNDEFINED_CODE

KERNELS: dict[str, Callable[..., dict[str, np.ndarray]]] = {
    "border_check": rolling.border_check,
    "ema": rolling.ema_check,
    "macd": rolling.macd_check,
    "welford": rolling.welford_check,
    "cumulative": rolling.cumulative_check,
    "hampel": rolling.hampel_check,
    "percentile": rolling.percentile_check,
    "linear_fit": rolling.linear_fit_check,
    "filtering": rolling.filtering_check,
    "ema_percentile": rolling.ema_percentile_check,
    "trend_classification": rolling.trend_classification_check,
    "cusum": rolling.cusum_check,
    "cusum_reset": rolling.cusum_reset_check,
}


def _register_rrcf():
    from . import rrcf as rrcf_mod
    KERNELS["rrcf"] = rrcf_mod.rrcf_check


def _register_matprof():
    from ..functions import matprof
    KERNELS["matrix_profile"] = matprof.matrix_profile_check


def _register_changepoint():
    from ..functions import changepoint
    KERNELS["changepoint"] = changepoint.changepoint_check


_register_changepoint()


_register_rrcf()
_register_matprof()


def make_series_kernel(checks: list[dict[str, Any]], value_col: str,
                       order_cols: list[str],
                       valid_col: str | None = "rv_code",
                       keep_status: bool = True):
    """Build the per-group pandas kernel.

    ``checks``: [{"name": prefix, "kernel": kernel-name, "params": {...}}]
    """
    resolved = [(c["name"],
                 c["kernel"] if callable(c["kernel"]) else KERNELS[c["kernel"]],
                 c.get("params", {})) for c in checks]

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        vals = pd.to_numeric(g[value_col], errors="coerce").to_numpy(dtype=np.float64)
        valid = ~np.isnan(vals)
        if valid_col is not None and valid_col in g:
            valid &= (g[valid_col].to_numpy() != UNDEFINED_CODE)
        v = vals[valid]
        for prefix, kernel, params in resolved:
            out = kernel(v, **params)
            codes = np.full(len(g), UNDEFINED_CODE, dtype=np.int8)
            codes[valid] = out["status_code"]
            g[f"{prefix}_code"] = codes
            if keep_status:
                status = np.full(len(g), "Undefined", dtype=object)
                status[valid] = out["status"]
                g[f"{prefix}_status"] = status
        return g

    return per_group


def apply_series_checks(ds, key_col: str, order_cols: list[str], value_col: str,
                        checks: list[dict[str, Any]],
                        valid_col: str | None = None, keep_status: bool = True):
    """Dataset -> Dataset with one verdict column set per configured check."""
    kernel = make_series_kernel(checks, value_col, order_cols, valid_col, keep_status)
    return ds.groupby(key_col).map_groups(kernel, batch_format="pandas")
