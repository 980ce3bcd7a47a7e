"""Exact distributed Gini coefficient per group — order statistics
without a global sort.

G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n over the ascending-sorted
non-negative values of each group. The rank-weighted sum T = Σ i·x₍ᵢ₎
normally wants a global sort; here it is computed by histogram
refinement (the same multi-pass shape as stages/quantile.py):

1. one stats pass per level histograms every group's active value
   ranges into ``bins`` buckets (per-batch partials -> one slim fold;
   the exchange is O(groups × bins), never raw rows);
2. each bucket's rows occupy a KNOWN global rank window
   [offset+1, offset+count] (offset = ranks below it), so buckets small
   enough to collect contribute exactly Σ (offset+j)·x₍ⱼ₎ from a bounded
   driver-side sort, and oversized buckets recurse with their offset —
   O(log_bins n) levels, ≤ ``max_collect`` values on the driver per
   collection.

Range semantics: every task/bucket is half-open [lo, hi) except the
rightmost chain, which stays hi-inclusive — a value exactly on a bucket
edge belongs to exactly one bucket in the histogram, the recursion, and
the collect filter alike (an inclusive-both-ends filter double-counted
edge values between adjacent buckets in the first draft; caught by the
count-vs-collect cross-check below).

Tie correctness: Σ i·x is invariant under any ordering of equal values
(x constant across the tie run), so bucket assignment of ties never
changes the result — which is also why the DuckDB oracle can ORDER BY
value alone. Zero-sum groups (all zeros) report NaN (Gini undefined).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

from ..functions.fold import fold_partials


def _range_mask(v: np.ndarray, lo: float, hi: float, inc: bool):
    m = ~np.isnan(v) & (v >= lo)
    return m & ((v <= hi) if inc else (v < hi))


def _level_pass(ds, col: str, group_col: str, tasks: list, bins: int):
    """One streaming pass: per (task, bin) -> (count, sum). ``tasks`` is
    [(task_id, group, lo, hi, inc)]; the small task table is broadcast
    via ray.put and read once per task invocation, never re-shipped per
    batch row."""
    ref = ray.put(tasks)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        tl = ray.get(ref)
        v = df[col].to_numpy(np.float64)
        gv = df[group_col].to_numpy()
        rows = {"task": [], "bin": [], "n": [], "s": []}
        for tid, g, lo, hi, inc in tl:
            w = (hi - lo) / bins
            m = (gv == g) & _range_mask(v, lo, hi, inc)
            if not m.any():
                continue
            if w <= 0:                      # constant-value range: 1 bin
                rows["task"].append(tid)
                rows["bin"].append(0)
                rows["n"].append(int(m.sum()))
                rows["s"].append(float(v[m].sum()))
                continue
            b = np.minimum(((v[m] - lo) / w).astype(np.int64), bins - 1)
            u, c = np.unique(b, return_counts=True)
            s = np.bincount(b, weights=v[m], minlength=bins)[u]
            rows["task"].extend([tid] * len(u))
            rows["bin"].extend(u.tolist())
            rows["n"].extend(c.tolist())
            rows["s"].extend(s.tolist())
        return pd.DataFrame(rows)

    return fold_partials(ds.map_batches(partial, batch_format="pandas"),
                         ["task", "bin"], {"n": "sum", "s": "sum"})


def _collect_pass(ds, col: str, group_col: str, ranges: list) -> dict:
    """Collect the actual values of small buckets: ``ranges`` is
    [(range_id, group, lo, hi, inc)] with a bounded total row count by
    construction. Returns {range_id: sorted ndarray}."""
    ref = ray.put(ranges)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rl = ray.get(ref)
        v = df[col].to_numpy(np.float64)
        gv = df[group_col].to_numpy()
        out_r, out_v = [], []
        for rid, g, lo, hi, inc in rl:
            m = (gv == g) & _range_mask(v, lo, hi, inc)
            k = int(m.sum())
            if k:
                out_r.extend([rid] * k)
                out_v.extend(v[m].tolist())
        return pd.DataFrame({"rid": out_r, "val": out_v})

    got = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return {rid: np.sort(sub["val"].to_numpy(np.float64))
            for rid, sub in got.groupby("rid")}


def _bucket_bounds(lo: float, hi: float, w: float, b: int, bins: int,
                   parent_inc: bool) -> tuple[float, float, bool]:
    if w <= 0:
        return lo, hi, parent_inc
    blo = lo + b * w
    if b == bins - 1:
        return blo, hi, parent_inc
    return blo, lo + (b + 1) * w, False


def exact_gini(ds, col: str, group_col: str, bins: int = 256,
               max_collect: int = 100_000, max_levels: int = 16
               ) -> pd.DataFrame:
    """DataFrame (group, n, gini) — exact, groups sorted ascending.
    Values must be non-negative (standard Gini domain); NaN and negative
    values are excluded from n, Σx, and ranks in every pass."""
    def stat_partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(np.float64)
        ok = ~np.isnan(v) & (v >= 0)
        t = pd.DataFrame({group_col: df[group_col].to_numpy()[ok],
                          "v": v[ok]})
        return (t.groupby(group_col)["v"]
                 .agg(n="count", s="sum", lo="min", hi="max")
                 .reset_index())

    st = fold_partials(ds.map_batches(stat_partial, batch_format="pandas"),
                       [group_col], {"n": "sum", "s": "sum",
                                     "lo": "min", "hi": "max"})
    groups = {r[group_col]: (int(r["n"]), float(r["s"]))
              for _, r in st.iterrows()}
    T = {g: 0.0 for g in groups}            # Σ i·x₍ᵢ₎ accumulators

    # work items: (group, lo, hi, inc, rank_offset)
    work = [(r[group_col], float(r["lo"]), float(r["hi"]), True, 0)
            for _, r in st.iterrows() if int(r["n"]) > 0]
    level = 0
    while work and level < max_levels:
        level += 1
        tasks = [(i, g, lo, hi, inc)
                 for i, (g, lo, hi, inc, _) in enumerate(work)]
        hist = _level_pass(ds, col, group_col, tasks, bins)
        next_work, collect, coll_meta = [], [], []
        cap = max(max_collect // max(len(work), 1), 1000)
        for i, (g, lo, hi, inc, off) in enumerate(work):
            h = (hist[hist["task"] == i]
                 .sort_values("bin").reset_index(drop=True))
            w = (hi - lo) / bins
            run = off
            for _, row in h.iterrows():
                b, n_b, s_b = int(row["bin"]), int(row["n"]), float(row["s"])
                if n_b <= 0:
                    continue
                blo, bhi, binc = _bucket_bounds(lo, hi, w, b, bins, inc)
                if n_b == 1:
                    T[g] += (run + 1) * s_b
                elif bhi - blo <= 1e-12 * max(abs(bhi), 1.0):
                    # tie run: Σ (run+j)·x with x constant = mean value
                    x = s_b / n_b
                    T[g] += x * (n_b * run + n_b * (n_b + 1) / 2.0)
                elif n_b <= cap or level == max_levels:
                    rid = len(collect)
                    collect.append((rid, g, blo, bhi, binc))
                    coll_meta.append((rid, g, run, n_b))
                else:
                    next_work.append((g, blo, bhi, binc, run))
                run += n_b
        if collect:
            vals = _collect_pass(ds, col, group_col, collect)
            for rid, g, off2, n_b in coll_meta:
                x = vals.get(rid, np.zeros(0))
                if len(x) != n_b:           # cross-check: histogram and
                    raise RuntimeError(     # collect must agree exactly
                        f"gini bucket count drift: {len(x)} != {n_b}")
                ranks = off2 + np.arange(1, n_b + 1, dtype=np.float64)
                T[g] += float((ranks * x).sum())
        work = next_work

    rows = []
    for g, (n, s) in sorted(groups.items(), key=lambda kv: str(kv[0])):
        if n <= 0 or s <= 0:
            rows.append((g, n, float("nan")))
        else:
            rows.append((g, n, 2.0 * T[g] / (n * s) - (n + 1.0) / n))
    return pd.DataFrame(rows, columns=[group_col, "n", "gini"])
