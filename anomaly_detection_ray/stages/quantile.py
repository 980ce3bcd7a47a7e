"""Exact distributed quantiles for UNBOUNDED-cardinality numerics.

Selection by histogram refinement — the classic multi-pass distributed
k-th-element algorithm: each pass histograms the candidate range into
``bins`` buckets via per-batch partial counts (one streaming pass, tiny
driver merge), descends into the bucket containing the target rank, and
repeats until the surviving range holds few enough values to collect and
select exactly. O(log_bins(n)) passes, never more than ``max_collect``
values on the driver — the complement of the one-pass bounded-cardinality
path (q_exact_quantiles_events) and of the approximate t-digest.

Rank semantics match DuckDB ``quantile_disc``: the element at 0-based
index ceil(q·n)-1 of the sorted values (probed against DuckDB across
n=7..2006, q=.5/.9/.99). The -1e-9 guard in the rank computation
absorbs binary-float noise in q (e.g. 0.1*3 = 0.30000000000000004), so
a noisy q·n a hair above an integer still selects the exact-arithmetic
index.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.fold import fold_partials


def _range_counts(ds, col: str, lo: float, hi: float, bins: int,
                  last_inclusive: bool) -> np.ndarray:
    """One streaming pass: counts per bucket over [lo, hi) (hi inclusive
    when ``last_inclusive``), ignoring NaN and out-of-range values."""
    w = (hi - lo) / bins

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(dtype=np.float64)
        m = ~np.isnan(v) & (v >= lo) & ((v <= hi) if last_inclusive
                                        else (v < hi))
        v = v[m]
        b = np.minimum(((v - lo) / w).astype(np.int64), bins - 1)
        u, c = np.unique(b, return_counts=True)
        return pd.DataFrame({"bin": u, "n": c})

    m = fold_partials(ds.map_batches(partial, batch_format="pandas"),
                      ["bin"], {"n": "sum"})
    out = np.zeros(bins, dtype=np.int64)
    if len(m):
        out[m["bin"].to_numpy(np.int64)] = m["n"].to_numpy(np.int64)
    return out


def refined_quantile(ds, col: str, qs, bins: int = 256,
                     max_collect: int = 10_000) -> dict[float, float]:
    """{q: exact value} for each q. One (n, min, max) pass, then per-q
    refinement passes (at 100 TB you would carry all targets through
    shared histogram passes; per-q loops keep this reference
    implementation simple — the pass count is the same O(log n))."""

    def stat_partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return pd.DataFrame({"k": [], "n": [], "lo": [], "hi": []})
        return pd.DataFrame({"k": [0], "n": [len(v)],
                             "lo": [float(v.min())], "hi": [float(v.max())]})

    st = fold_partials(ds.map_batches(stat_partial, batch_format="pandas"),
                       ["k"], {"n": "sum", "lo": "min", "hi": "max"})
    if st.empty or not int(st["n"].iloc[0]):
        return {float(q): float("nan") for q in qs}
    n_total = int(st["n"].iloc[0])
    g_lo, g_hi = float(st["lo"].iloc[0]), float(st["hi"].iloc[0])

    out: dict[float, float] = {}
    for q in qs:
        rank = int(np.ceil(q * n_total - 1e-9))  # 1-based target rank
        rank = min(max(rank, 1), n_total)
        lo, hi, in_range, last_inc = g_lo, g_hi, n_total, True
        resolved = None
        while in_range > max_collect:
            if hi <= lo:
                # Degenerate range: every surviving value equals lo
                # (heavy mode / all-equal column) — no collect needed.
                resolved = lo
                break
            counts = _range_counts(ds, col, lo, hi, bins, last_inc)
            cum = np.cumsum(counts)
            j = int(np.searchsorted(cum, rank))
            w = (hi - lo) / bins
            new_lo, new_hi = lo + j * w, lo + (j + 1) * w
            if new_hi <= new_lo or (new_lo, new_hi) == (lo, hi):
                # Float-width floor: >max_collect values packed into a
                # range refinement can no longer split — they occupy at
                # most a handful of adjacent representable floats. Fold
                # distinct-value counts (tiny) and select by rank
                # instead of collecting in_range copies.
                resolved = _rank_among_values(ds, col, lo, hi, last_inc,
                                              rank)
                break
            rank -= int(cum[j - 1]) if j else 0
            lo, hi = new_lo, new_hi
            last_inc = last_inc and (j == bins - 1)
            in_range = int(counts[j])

        if resolved is not None:
            out[float(q)] = float(resolved)
            continue

        def collect(df: pd.DataFrame, lo=lo, hi=hi, inc=last_inc) -> pd.DataFrame:
            v = df[col].to_numpy(dtype=np.float64)
            m = ~np.isnan(v) & (v >= lo) & ((v <= hi) if inc else (v < hi))
            return pd.DataFrame({"v": v[m]})

        vals = np.sort(ds.map_batches(collect, batch_format="pandas")
                       .to_pandas()["v"].to_numpy())
        out[float(q)] = float(vals[rank - 1])
    return out


def _rank_among_values(ds, col: str, lo: float, hi: float,
                       last_inclusive: bool, rank: int) -> float:
    """Exact rank selection over a range that histogram refinement can no
    longer split: fold (distinct value, count) partials — the range spans
    only a few representable floats by construction, so the folded table
    is tiny — and walk the cumulative counts to the 1-based ``rank``."""

    def uniq_partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(dtype=np.float64)
        m = ~np.isnan(v) & (v >= lo) & ((v <= hi) if last_inclusive
                                        else (v < hi))
        u, c = np.unique(v[m], return_counts=True)
        return pd.DataFrame({"v": u, "n": c})

    vc = fold_partials(ds.map_batches(uniq_partial, batch_format="pandas"),
                       ["v"], {"n": "sum"}).sort_values("v")
    cum = vc["n"].to_numpy(np.int64).cumsum()
    j = int(np.searchsorted(cum, rank))
    return float(vc["v"].to_numpy(np.float64)[j])
