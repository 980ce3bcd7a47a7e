"""The engine's query library over the driver test tables
(/root/testdata/sf*/ — region nation customer supplier part orders lineitem
events documents embeddings).

Every function takes ``sf_dir`` and returns a Dataset / pandas DataFrame /
pyarrow Table. Names and output column names line up 1:1 with the DuckDB
oracle SQL in ``oracle_sql()`` (__ray_entry__.py) — the driver hashes
values after sorting columns by name, so **column names are part of the
contract**.

Implementation rules (ray_guide): prune columns at the read; vectorized
Arrow/pandas kernels in map_batches; partial aggregation before any
groupby; broadcast small sides with ray.put; per-series ordered kernels in
groupby().map_groups.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..functions import text as tx
from ..functions.grading import grade_normalized, normalize
from ..stages import dedup as dd
from ..stages import row_validate as rv
from ..stages import series as series_mod
from ..stages import similarity as sim
from ..stages import stats as stats_mod
from ..stages.checks import border_stage

# events border-check config (value range ~[0, 490], mean ~50)
EV_UL, EV_LL = 80.0, 20.0
EV_WS = [0.7, 0.9]
WF_N, WF_X = 20, 3.0


def rnd(x, d: int):
    """Round half away from zero (DuckDB ``round()`` semantics — numpy's
    half-to-even would diverge from the oracle on exact .5 boundaries)."""
    m = 10.0 ** d
    a = np.asarray(x, dtype=np.float64)
    return np.copysign(np.floor(np.abs(a) * m + 0.5) / m, a)


from ..functions.fold import fold_partials as _fold  # noqa: E402  (shared
# cardinality-aware merge: incremental driver fold, auto-spill to Ray groupby)


def _read(sf_dir: str, table: str, columns=None):
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


# ------------------------------------------------------------ validation

def q_row_validate_events(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_id", "ts", "value"])
    out = ds.map_batches(rv.validate_events, batch_format="pyarrow")
    return out.select_columns(["event_id", "rv_code"])


def q_border_check_events(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_id", "value"])
    out = ds.map_batches(
        lambda t: border_stage(t, "value", EV_UL, EV_LL, EV_WS, prefix="bc"),
        batch_format="pyarrow")
    return out.select_columns(["event_id", "bc_code", "bc_status"])


def q_grouped_stats_events(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    df = stats_mod.grouped_welford(ds, "value", "event_type", n_salts=8,
                                   salt_col="event_id")
    out = df.rename(columns={"key": "event_type"})
    out["n"] = out["n"].astype("int64")
    for c in ["mean", "std", "std_sample", "min", "max"]:
        out[c] = rnd(out[c], 4)
    return out[["event_type", "n", "mean", "std", "std_sample", "min", "max"]]


def _zscore_kernel(v, mean, std):
    with np.errstate(invalid="ignore", divide="ignore"):
        z = (v - mean) / np.where(std == 0.0, np.nan, std)
    return {"z": rnd(pd.Series(z), 6)}


def q_zscore_events(sf_dir: str):
    """Group-wise z-score normalization (standard per-entity feature
    scaling): pass 1 = salted grouped Welford partials folded to a
    per-user (mean, sample-std) table; pass 2 = the two-regime
    stats_apply (broadcast dict below the documented group-count
    threshold, co-partitioned tagged-union join-apply above it — the
    10^9-key shape; regimes bit-equal by the elementwise-kernel
    contract). Null/NaN values and single-row or zero-variance groups
    emit NULL z (matches SQL NULLIF semantics)."""
    from ..stages.stats_apply import group_stats_apply
    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])
    st = stats_mod.grouped_welford(ds, "value", "user_id", n_salts=8,
                                   salt_col="event_id", as_dataset=True)
    st = st.map_batches(
        lambda df: df.rename(columns={"key": "user_id"})
        [["user_id", "mean", "std_sample"]], batch_format="pandas")
    return group_stats_apply(ds, st, "user_id", ["mean", "std_sample"],
                             ["event_id", "user_id"], _zscore_kernel)


def q_robust_zscore_events(sf_dir: str):
    """Group-wise ROBUST z-score: (value - group median) / group MAD —
    the outlier-resistant twin of zscore_events (mean/std break down
    when the contamination you're hunting inflates them; median/MAD
    have a 50% breakdown point). One groupby exchange of slim
    (user_id, value) rows with per-group vectorized median+MAD (the
    same per-key-fits-one-worker contract as the series kernels); the
    group-stats table feeds the two-regime stats_apply (broadcast dict
    vs co-partitioned join past the group-count threshold), exactly the
    zscore_events shape. NULL for null values and zero-MAD groups
    (NULLIF semantics)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def grp(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            med, mad = np.nan, np.nan
        else:
            med = float(np.median(v))
            mad = float(np.median(np.abs(v - med)))
        return pd.DataFrame({"user_id": [df["user_id"].iloc[0]],
                             "med": [med], "mad": [mad]})

    from ..stages.stats_apply import group_stats_apply

    def kernel(v, me, ma):
        with np.errstate(invalid="ignore", divide="ignore"):
            rz = (v - me) / np.where(ma == 0.0, np.nan, ma)
        return {"rz": rnd(pd.Series(rz), 6)}

    st = (ds.select_columns(["user_id", "value"])
            .groupby("user_id").map_groups(grp, batch_format="pandas"))
    return group_stats_apply(ds, st, "user_id", ["med", "mad"],
                             ["event_id", "user_id"], kernel)


def q_winsorize_events(sf_dir: str):
    """Group-wise winsorization: clamp value into the group's
    [p05, p95] (np.quantile linear interpolation == DuckDB
    quantile_cont) — the standard heavy-tail taming transform before
    training on raw metrics. Same exchange shape as
    robust_zscore_events: one slim groupby, cardinality-bounded
    bounds table applied through the two-regime stats_apply (broadcast
    dict vs co-partitioned join past the group-count threshold)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def grp(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        v = v[~np.isnan(v)]
        lo, hi = ((np.nan, np.nan) if len(v) == 0 else
                  (float(np.quantile(v, 0.05)), float(np.quantile(v, 0.95))))
        return pd.DataFrame({"user_id": [df["user_id"].iloc[0]],
                             "lo": [lo], "hi": [hi]})

    from ..stages.stats_apply import group_stats_apply

    def kernel(v, lo, hi):
        return {"value_w": rnd(pd.Series(np.clip(v, lo, hi)), 6)}

    st = (ds.select_columns(["user_id", "value"])
            .groupby("user_id").map_groups(grp, batch_format="pandas"))
    return group_stats_apply(ds, st, "user_id", ["lo", "hi"],
                             ["event_id", "user_id"], kernel)


def q_impute_median_events(sf_dir: str):
    """Distributed batch imputation: null values filled with the
    group's median (the robust batch twin of the reference's sequential
    LastNAverage repair — normalization.py replaces a flagged record
    from its trailing window; at rest, the whole-corpus median is the
    order-free equivalent). Groups that are entirely null stay null."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def grp(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        v = v[~np.isnan(v)]
        return pd.DataFrame({"user_id": [df["user_id"].iloc[0]],
                             "med": [float(np.median(v)) if len(v) else np.nan]})

    from ..stages.stats_apply import group_stats_apply

    def kernel(v, med):
        filled = np.where(np.isnan(v), med, v)
        return {"value_f": rnd(pd.Series(filled), 6),
                "was_null": np.isnan(v)}

    st = (ds.select_columns(["user_id", "value"])
            .groupby("user_id").map_groups(grp, batch_format="pandas"))
    return group_stats_apply(ds, st, "user_id", ["med"],
                             ["event_id", "user_id"], kernel)


def _welford_series(sf_dir: str, N):
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    out = series_mod.apply_series_checks(
        ds, "user_id", ["ts", "event_id"], "value",
        [{"name": "wf", "kernel": "welford",
          "params": {"X": WF_X, "N": N, "warning_stages": []}}],
        keep_status=False)
    return out.select_columns(["event_id", "wf_code"])


def q_welford_window_events(sf_dir: str):
    return _welford_series(sf_dir, WF_N)


def q_welford_inf_events(sf_dir: str):
    return _welford_series(sf_dir, None)


def q_uniqueness_events(sf_dir: str):
    """Duplicate (user_id, event_type) keys with counts — the exact-confirm
    stage of the uniqueness check on a composite key."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["user_id", "event_type"], as_index=False).agg(
            cnt=("event_type", "size"))

    partials = ds.map_batches(partial, batch_format="pandas")
    merged = _fold(partials, ["user_id", "event_type"], {"cnt": "sum"})
    out = merged.rename(columns={"cnt": "n_events"})
    out = out[out["n_events"] > 1].reset_index(drop=True)
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values(["user_id", "event_type"]).reset_index(drop=True)


def q_referential_orders_customer(sf_dir: str):
    """Anti-join: orders whose o_custkey has no customer row (broadcast
    key-set semi-join — no shuffle)."""
    cust = _read(sf_dir, "customer", ["c_custkey"]).to_pandas()
    key_ref = ray.put(np.sort(cust["c_custkey"].to_numpy(dtype=np.int64)))
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def anti(t: pa.Table) -> pa.Table:
        keys = ray.get(key_ref)
        mask = ~np.isin(t["o_custkey"].to_numpy(zero_copy_only=False), keys)
        return t.filter(pa.array(mask))

    df = ds.map_batches(anti, batch_format="pyarrow").to_pandas()
    if df.shape[1] == 0:  # empty Dataset drops schema in to_pandas
        df = pd.DataFrame({"o_orderkey": pd.Series(dtype="int64"),
                           "o_custkey": pd.Series(dtype="int64")})
    return df


def q_value_histogram_events(sf_dir: str):
    """Fixed-edge histogram of value per event_type (the drift partial,
    SQL-checkable). Bins: [0,50,100,...,500] -> bin index 0..10."""
    edges = np.arange(50.0, 500.1, 50.0)  # searchsorted(right): 10 edges
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = np.searchsorted(edges, df["value"].to_numpy(), side="right")
        g = (pd.DataFrame({"event_type": df["event_type"], "bin": b})
             .groupby(["event_type", "bin"], as_index=False).agg(cnt=("bin", "size")))
        return g

    merged = _fold(ds.map_batches(partial, batch_format="pandas"),
                   ["event_type", "bin"], {"cnt": "sum"})
    out = merged.rename(columns={"cnt": "n"})
    out["bin"] = out["bin"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["event_type", "bin"]).reset_index(drop=True)


def q_bloom_dedup_documents(sf_dir: str):
    """Exact duplicate texts via sharded-Bloom-actor candidate pre-filter +
    exact confirmation (north star 'Bloom-filter uniqueness'; result is
    exact, so SQL-checkable)."""
    from ..stages import uniqueness as uniq_mod
    ds = _read(sf_dir, "documents", ["text"])

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"text_hash": dd.md5_hex(df["text"].fillna(""))})

    hashed = ds.map_batches(add_hash, batch_format="pandas")
    out = uniq_mod.bloom_dedup_candidates(hashed, key_col="text_hash")
    out["cnt"] = out["cnt"].astype("int64")
    return out.sort_values("text_hash").reset_index(drop=True)


def q_tdigest_quantiles_events(sf_dir: str):
    """Approximate p50/p90/p99 of value via mergeable t-digest partials
    (rows-only; accuracy pinned in tests/test_sketches.py)."""
    ds = _read(sf_dir, "events", ["value"])
    td = stats_mod.tdigest_column(ds, "value")
    qs = [0.5, 0.9, 0.99]
    return pd.DataFrame({"q": qs, "value": [float(td.quantile(x)) for x in qs]})


def q_time_filter_events(sf_dir: str):
    """Keep events whose time-of-day is strictly within 2h of 12:00
    (consumer.py:195-221 filter_by_time semantics — plain absolute
    difference, no midnight wrap)."""
    target_s, tol_s = 12 * 3600, 2 * 3600
    ds = _read(sf_dir, "events", ["event_id", "ts"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        tod = (df["ts"].dt.hour * 3600 + df["ts"].dt.minute * 60
               + df["ts"].dt.second)
        return df.loc[(tod - target_s).abs() < tol_s, ["event_id"]]

    return ds.map_batches(f, batch_format="pandas")


def q_drift_events_psi(sf_dir: str):
    """PSI/KS of value per event_type vs the cross-type median profile
    (rows-only: not SQL-expressible)."""
    from ..stages import drift as drift_mod
    edges = {"value": np.arange(25.0, 500.1, 25.0)}
    ds = _read(sf_dir, "events", ["event_type", "value"])
    df = drift_mod.partition_drift(ds, columns=edges, part_col="event_type")
    df = df.rename(columns={"partition_id": "event_type"})
    df[["ks", "psi"]] = df[["ks", "psi"]].round(6)
    return (df[["event_type", "column", "ks", "psi", "drift_code"]]
            .sort_values("event_type").reset_index(drop=True))


# ------------------------------------------------------------ TPC-H-ish

def q_pricing_summary(sf_dir: str):
    """Q1-style pricing summary with partial per-batch aggregation."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                "l_discount", "l_tax", "l_shipdate"])
    cutoff = np.datetime64("1998-09-02")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"].to_numpy() <= cutoff]
        if df.empty:
            return pd.DataFrame(columns=["l_returnflag", "l_linestatus", "sum_qty",
                                         "sum_base_price", "sum_disc_price",
                                         "sum_charge", "sum_disc", "count_order"])
        disc_price = df["l_extendedprice"] * (1 - df["l_discount"])
        charge = disc_price * (1 + df["l_tax"])
        g = pd.DataFrame({
            "l_returnflag": df["l_returnflag"], "l_linestatus": df["l_linestatus"],
            "sum_qty": df["l_quantity"], "sum_base_price": df["l_extendedprice"],
            "sum_disc_price": disc_price, "sum_charge": charge,
            "sum_disc": df["l_discount"], "count_order": 1,
        }).groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()
        return g

    partials = ds.map_batches(partial, batch_format="pandas")
    merged = _fold(partials, ["l_returnflag", "l_linestatus"],
                   {c: "sum" for c in ["sum_qty", "sum_base_price",
                                       "sum_disc_price", "sum_charge",
                                       "sum_disc", "count_order"]})
    merged["avg_qty"] = rnd(merged["sum_qty"] / merged["count_order"], 4)
    merged["avg_price"] = rnd(merged["sum_base_price"] / merged["count_order"], 4)
    merged["avg_disc"] = rnd(merged["sum_disc"] / merged["count_order"], 6)
    for c in ["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"]:
        merged[c] = rnd(merged[c], 2)
    merged["count_order"] = merged["count_order"].astype("int64")
    merged = merged.drop(columns=["sum_disc"])
    return merged.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def q_top_customers_revenue(sf_dir: str):
    """Join orders->customer via broadcast lookup; top 10 by revenue."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"]).to_pandas()
    name_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_name"])))
    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_custkey", as_index=False).agg(
            revenue=("o_totalprice", "sum"), n_orders=("o_totalprice", "size"))

    merged = _fold(ds.map_batches(partial, batch_format="pandas"),
                   ["o_custkey"], {"revenue": "sum", "n_orders": "sum"})
    names = ray.get(name_ref)
    merged = merged[merged["o_custkey"].isin(names)]  # inner-join semantics
    top = merged.sort_values(["revenue", "o_custkey"],
                             ascending=[False, True]).head(10)
    top["c_name"] = top["o_custkey"].map(names)
    top["revenue"] = rnd(top["revenue"], 2)
    top["n_orders"] = top["n_orders"].astype("int64")
    return top[["o_custkey", "c_name", "revenue", "n_orders"]].reset_index(drop=True)


def q_large_orders(sf_dir: str):
    """TPC-H Q18-shaped group-HAVING + join-back: orders whose line
    quantity sum exceeds 220. Per-batch partial sums -> native groupby
    Sum -> HAVING filter IN RAY; the qualifying key set (HAVING-bounded,
    ~0.35% of orders) broadcasts to drive a semi-join of the orders fact
    plus the dense customer name lookup — the fact table shuffles slim
    (orderkey, qty) partials only, never rows. Quantities are
    integer-valued doubles, so sums are exact and the DuckDB oracle
    matches bit-for-bit."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("l_orderkey", as_index=False).agg(
            qty=("l_quantity", "sum"))

    from ray.data.aggregate import Sum
    tot = (li.map_batches(partial, batch_format="pandas")
           .groupby("l_orderkey").aggregate(Sum(on="qty",
                                                alias_name="total_qty")))
    hot = (tot.map_batches(lambda t: t.filter(pc.field("total_qty") > 220),
                           batch_format="pyarrow").to_pandas()
           .set_index("l_orderkey")["total_qty"])
    hot_ref = ray.put(hot)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"]).to_pandas()
    name_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_name"])))
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        h = ray.get(hot_ref)
        sub = df[df["o_orderkey"].isin(h.index)].copy()
        sub["c_name"] = sub["o_custkey"].map(ray.get(name_ref))
        sub["total_qty"] = sub["o_orderkey"].map(h)
        sub["o_totalprice"] = rnd(sub["o_totalprice"], 2)
        return sub[["o_orderkey", "o_custkey", "c_name", "o_totalprice",
                    "total_qty"]]

    return orders.map_batches(pick, batch_format="pandas")


def q_anti_join_customer_orders(sf_dir: str):
    """Customers with NO pending ('P') order via the native shuffle
    ``left_anti`` join — the fully distributed large-large referential
    path (the ``referential_orders_customer`` query is the broadcast
    small-side variant). The fact side is predicate-filtered at the read
    and pre-reduced to per-batch distinct keys before the exchange, so
    the shuffle moves O(distinct) not O(rows)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    ords = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])

    def distinct_keys(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keys = pc.unique(t.filter(pc.equal(t["o_orderstatus"],
                                           "P"))["o_custkey"])
        return pa.table({"o_custkey": keys})

    keys = ords.map_batches(distinct_keys, batch_format="pyarrow")
    out = cust.join(keys, join_type="left_anti", num_partitions=16,
                    on=("c_custkey",), right_on=("o_custkey",))
    return out.sort("c_custkey")


def q_semi_mark_orders_customer(sf_dir: str):
    """Every order marked with whether its customer sits in the BUILDING
    market segment — the distributed LEFT SEMI **mark** join
    (stages/joins.semi_mark_keys: tagged union + one bucket-grouped
    exchange, one vectorized isin per bucket; no driver-side key set, no
    Dataset.join aggregator actors). Same machinery the flagship's pass-B
    duplicate flag uses past its broadcast threshold, here oracle-gated
    against DuckDB's IN-subquery semantics."""
    from ..stages.joins import semi_mark_keys
    ords = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def seg_keys(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = t.filter(pc.equal(t["c_mktsegment"], "BUILDING"))
        return pa.table({"o_custkey": keep["c_custkey"]})

    keys = cust.map_batches(seg_keys, batch_format="pyarrow")
    out = semi_mark_keys(ords, keys, on="o_custkey",
                         mark="building_cust", num_buckets=32)
    return out.sort("o_orderkey")


def q_skew_join_lineitem_supplier(sf_dir: str):
    """Skew-aware hybrid join (stages/joins.skew_aware_join): lineitem ⋈
    supplier on suppkey with a threshold that classifies the busiest
    supplier keys HOT (broadcast path) and the rest COLD (hash shuffle) —
    both paths exercised at every sf; revenue by supplier nation. The
    split is invisible to semantics, so a plain SQL join is the oracle."""
    from ..stages.joins import skew_aware_join
    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice",
                                    "l_discount"])
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    j = skew_aware_join(li, sup, "l_suppkey", "s_suppkey",
                        hot_threshold=620, num_partitions=16)

    def post(df: pd.DataFrame) -> pd.DataFrame:
        return (pd.DataFrame({
            "s_nationkey": df["s_nationkey"],
            "revenue": df["l_extendedprice"] * (1 - df["l_discount"]),
            "n_items": 1,
        }).groupby("s_nationkey", as_index=False).sum())

    merged = _fold(j.map_batches(post, batch_format="pandas"),
                   ["s_nationkey"], {"revenue": "sum", "n_items": "sum"})
    merged["revenue"] = rnd(merged["revenue"], 2)
    for c in ["s_nationkey", "n_items"]:
        merged[c] = merged[c].astype("int64")
    return merged.sort_values("s_nationkey").reset_index(drop=True)


def q_sessionize_events(sf_dir: str):
    """Gap-window sessionization of the per-user event stream (8h gap):
    one row per session with count/span (stages/sessions.sessionize — one
    series-key shuffle, vectorized gaps-and-islands kernel; DuckDB
    window-function oracle)."""
    from ..stages.sessions import sessionize
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    out = sessionize(ds, key="user_id", ts_col="ts", gap_s=8 * 3600.0)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        for c in ["user_id", "session_id", "n_events", "start_us", "end_us"]:
            df[c] = df[c].astype("int64")
        return df

    return out.map_batches(fin, batch_format="pandas")


def q_stratified_sample_documents(sf_dir: str):
    """Deterministic hash-threshold sampling (training-data op): keep ~25%
    of documents per source stratum by comparing the first 8 hex chars of
    md5(doc_id) against a hex threshold — reproducible across runs,
    cluster sizes and partitionings, no RNG state, no shuffle, and exactly
    SQL-mirrorable (lexicographic hex compare == numeric compare)."""
    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    THRESH = "40000000"  # 0x40000000 / 2^32 = 25%

    def f(df: pd.DataFrame) -> pd.DataFrame:
        h = dd.md5_hex(df["doc_id"].astype(str)).str[:8]
        return df.loc[(h < THRESH).to_numpy(),
                      ["doc_id", "source", "n_chars"]]

    return ds.map_batches(f, batch_format="pandas")


def q_pack_documents(sf_dir: str):
    """Sequence packing (stages/pack.prefix_pack): whitespace-token counts
    packed head-to-tail into 512-token bins in ascending doc_id order via
    the distributed prefix sum (range buckets -> driver prefix of bucket
    sums -> one bounded shuffle) — the concat-and-chunk batching step of
    an LLM pretraining pipeline. SQL oracle = SUM() OVER (ORDER BY)."""
    from ..stages.pack import prefix_pack
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tok(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "n_tokens": tx.token_count(df["text"])})

    out = prefix_pack(ds.map_batches(tok, batch_format="pandas"),
                      "doc_id", "n_tokens", budget=512)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        for c in df.columns:
            df[c] = df[c].astype("int64")
        return df

    return out.map_batches(fin, batch_format="pandas")


def q_mixture_sample_documents(sf_dir: str):
    """Weighted source mixing (the data-mixing op of an LLM training
    pipeline): each source stratum is downsampled at its OWN rate
    (rate = (1 + src_idx mod 8)/16 here — in production the tuned mixture
    weights) by deterministic hash thresholding: keep iff the first 8 hex
    chars of md5(doc_id) sort below the per-source 8-hex threshold.
    Reproducible across runs/partitionings, no RNG state, no shuffle;
    thresholds are a tiny per-rate dict map, the compare is a vectorized
    string compare, and the SQL mirror uses printf('%08x')."""
    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    thr_hex = {r: f"{(1 + r) * (1 << 28):08x}" for r in range(8)}

    def f(df: pd.DataFrame) -> pd.DataFrame:
        h = dd.md5_hex(df["doc_id"].astype(str)).str[:8]
        idx = (df["source"].str[3:].astype(np.int64) % 8)
        keep = (h < idx.map(thr_hex)).to_numpy()
        return df.loc[keep, ["doc_id", "source"]]

    return ds.map_batches(f, batch_format="pandas")


def q_doc_quality_verdicts(sf_dir: str):
    """Gopher-style graded document-quality verdict — the reference's
    4-valued code idiom (OK/Warning/Error/Undefined) applied to corpus
    curation: Error on too-few words, low distinct-word fraction or a
    dominating top word; Warning on bigram repetition or long same-word
    runs; Undefined on null/empty text. All driving fractions are the
    bit-identical divisions of the D-verified repetition kernels, and
    comparisons use strict inequalities in both engines, so the verdict
    is exactly SQL-mirrorable. Embarrassingly parallel (no shuffle)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def grade(df: pd.DataFrame) -> pd.DataFrame:
        r = tx.repetition_features(df["text"])
        undef = (df["text"].isna()
                 | (df["text"].fillna("").str.strip() == "")).to_numpy()
        err = ((r["n_words"] < 12) | (r["uniq_word_frac"] < 0.31)
               | (r["top_word_frac"] > 0.18))
        warn = (r["top_bigram_frac"] > 0.06) | (r["max_word_run"] >= 3)
        code = np.where(undef, 2,
                        np.where(err, -1, np.where(warn, 0, 1)))
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "dq_code": code.astype(np.int8)})

    return ds.map_batches(grade, batch_format="pandas")


def q_source_quality_report(sf_dir: str):
    """Per-source corpus quality report — the curation dashboard
    aggregate: docs, token/char/punct totals and corpus-level rates per
    source stratum. Per-batch partial sums (one row per source per
    batch) fold on the driver (source cardinality is bounded); rates are
    integer-ratio IEEE divisions so the oracle matches bit-for-bit
    (token/punct kernels are the already-D-verified text ops)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df["text"].fillna("")
        return (pd.DataFrame({"source": df["source"],
                              "n_docs": 1,
                              "n_tokens": tx.token_count(s),
                              "n_chars": s.str.len().to_numpy(np.int64),
                              "n_punct": s.str.count(tx.PUNCT_RE)
                              .to_numpy(np.int64)})
                .groupby("source", as_index=False).sum())

    m = _fold(ds.map_batches(partial, batch_format="pandas"), ["source"],
              {"n_docs": "sum", "n_tokens": "sum", "n_chars": "sum",
               "n_punct": "sum"})
    for c in ["n_docs", "n_tokens", "n_chars", "n_punct"]:
        m[c] = m[c].astype("int64")
    m["mean_tokens"] = m["n_tokens"] / m["n_docs"]
    m["punct_rate"] = m["n_punct"] / m["n_chars"].replace(0, np.nan)
    return m.sort_values("source").reset_index(drop=True)


def q_doc_split_documents(sf_dir: str):
    """Deterministic train/val/test split (90/5/5) by md5(doc_id) hash
    thresholding — the standard leakage-safe corpus split: assignment is
    a pure function of the id, so any run, partitioning, or incremental
    re-crawl puts a document in the same fold; no RNG state, no shuffle,
    embarrassingly parallel. Thresholds are exact 8-hex literals so the
    DuckDB oracle's substr(md5(...)) compare is identical."""
    ds = _read(sf_dir, "documents", ["doc_id"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        h = dd.md5_hex(df["doc_id"].astype(str)).str[:8]
        split = np.where(h < "e6666666", "train",
                         np.where(h < "f3333333", "val", "test"))
        return pd.DataFrame({"doc_id": df["doc_id"], "split": split})

    return ds.map_batches(f, batch_format="pandas")


def q_top_events_per_user(sf_dir: str):
    """Per-group top-k (k=3 events by value per user): per-batch partial
    top-k shrinks the shuffle to <= k rows per (user, batch), then one
    small groupby merge re-ranks the candidates — no global sort."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])
    K = 3

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=["value"])
        df = df.sort_values(["value", "event_id"], ascending=[False, True],
                            kind="mergesort")
        return df.groupby("user_id", as_index=False).head(K)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["value", "event_id"], ascending=[False, True],
                            kind="mergesort").head(K).copy()
        df["rk"] = np.arange(1, len(df) + 1, dtype=np.int64)
        df["value"] = rnd(df["value"], 4)
        return df

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("user_id").map_groups(merge, batch_format="pandas"))


def q_props_extract_events(sf_dir: str):
    """Semi-structured extraction: pull the integer ``k`` out of the JSON
    ``props`` column with a vectorized compiled-regex extract, then
    per-type partial aggregation (the engine's semi-structured scalar-fn
    surface; DuckDB regexp_extract oracle — no JSON extension needed)."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = pd.to_numeric(df["props"].str.extract(r'"k": (\d+)', expand=False),
                          errors="coerce")
        g = pd.DataFrame({"event_type": df["event_type"], "sum_k": k,
                          "max_k": k, "n": k.notna().astype(np.int64)})
        return g.groupby("event_type", as_index=False).agg(
            sum_k=("sum_k", "sum"), max_k=("max_k", "max"), n=("n", "sum"))

    merged = _fold(ds.map_batches(partial, batch_format="pandas"),
                   ["event_type"], {"sum_k": "sum", "max_k": "max", "n": "sum"})
    merged["avg_k"] = rnd(merged["sum_k"] / merged["n"], 6)
    merged["n"] = merged["n"].astype("int64")
    merged["max_k"] = merged["max_k"].astype("int64")
    return (merged[["event_type", "n", "avg_k", "max_k"]]
            .sort_values("event_type").reset_index(drop=True))


def q_covariance_embeddings(sf_dir: str):
    """Distributed sample-covariance over the embedding matrix — the
    trillion-scale covariance shape (cf. ASCS, SIGMOD'21): ONE streaming
    pass of per-batch (X'X, colsum, n) partials, a dim²-float driver
    merge (corpus-size-independent), cov = (S - s s'/n)/(n-1). Emitted
    long-form for the leading 8×8 block (i <= j) so the DuckDB
    covar_samp oracle's unnest self-join stays tractable at gate scale —
    the full 64×64 matrix costs the same single pass."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    D = 8

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(df["embedding"].to_numpy()).astype(np.float64)[:, :D]
        return pd.DataFrame({"xtx": [(X.T @ X).tobytes()],
                             "s": [X.sum(axis=0).tobytes()],
                             "n": [len(X)]})

    p = emb.map_batches(partial, batch_format="pandas").to_pandas()
    xtx = np.sum([np.frombuffer(b).reshape(D, D) for b in p["xtx"]], axis=0)
    s = np.sum([np.frombuffer(b) for b in p["s"]], axis=0)
    n = int(p["n"].sum())
    cov = (xtx - np.outer(s, s) / n) / (n - 1)
    i, j = np.triu_indices(D)
    return pd.DataFrame({"i": i.astype(np.int64), "j": j.astype(np.int64),
                         "cov": rnd(pd.Series(cov[i, j]), 6)})


def q_kmeans_embeddings(sf_dir: str):
    """Full-corpus distributed k-means over the embedding table (Lloyd's,
    one streaming pass per iteration, k×dim driver merge —
    stages/similarity.kmeans_fit) + final assignment pass. Seeded
    deterministic => fixture oracle."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    C = sim.kmeans_fit(emb, k=8, iters=5, seed=0)
    out = sim.kmeans_assign(emb, C)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["vec_id"] = df["vec_id"].astype("int64")
        df["dist"] = rnd(df["dist"], 6)
        return df

    return out.map_batches(fin, batch_format="pandas")


def q_text_prep_documents(sf_dir: str):
    """Document-curation flagship (pipelines/text_prep): global dedup
    discovery (exact + MinHash near-dup) -> per-partition lang/quality
    gate -> partitioned parquet with manifest/resume; returns the
    per-partition curation metrics (deterministic => fixture oracle)."""
    from .text_prep import TextPrepConfig, run_text_prep
    sf = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join("/tmp/adr_text_prep", sf)
    res = run_text_prep(os.path.join(sf_dir, "documents.parquet"), out,
                        TextPrepConfig(P=8), resume=False)
    m = res["metrics"]
    for c in m.columns:
        m[c] = m[c].astype("int64")
    return m


def q_bpe_vocab_documents(sf_dir: str):
    """Trainable BPE vocabulary over the document corpus: one distributed
    word-count pass, then Sennrich-style merges on the bounded (word,
    count) table (functions/bpe.py — corpus is never touched after the
    count, the property that makes BPE training 100-TB-viable).
    Deterministic tie-breaking => fixture oracle."""
    from ..functions import bpe
    ds = _read(sf_dir, "documents", ["text"])
    counts = bpe.word_counts(ds)
    rules = bpe.train_bpe(counts, num_merges=40, min_freq=2)
    for c in ["rank", "freq"]:
        rules[c] = rules[c].astype("int64")
    return rules


def q_bpe_encode_documents(sf_dir: str):
    """Tokenizer APPLICATION over the corpus — the pass that actually
    runs at 100 TB once a vocabulary exists: train the merge table on the
    bounded word-count fold (as bpe_vocab_documents), then an actor-pool
    encode stage (functions/bpe.BpeEncoder: rules shipped once per actor
    via the constructor, per-DISTINCT-word memoization inside the actor)
    emits per-doc (n_words, n_bpe_tokens). Deterministic rule table +
    deterministic apply => fixture oracle."""
    from ..functions import bpe
    from ..stages.sizing import pool_size
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    rules = bpe.train_bpe(bpe.word_counts(ds), num_merges=40, min_freq=2)
    # plain dict-of-lists: a DataFrame in constructor kwargs defeats
    # Ray's schema-dedup hashing (warns per actor)
    return ds.map_batches(bpe.BpeEncoder,
                          fn_constructor_kwargs={
                              "rules": rules.to_dict("list")},
                          batch_format="pandas", batch_size=256,
                          concurrency=pool_size(0), num_cpus=1)


def q_equidepth_histogram_events(sf_dir: str):
    """Equi-depth (decile) histogram of events.value — the optimizer/
    profiler bucketing shape: ONE pass of per-batch (value, count)
    partials; the fold yields BOTH the exact quantile_disc boundaries
    (0-based index ceil(q·n)-1, the probed quantile_disc rule, with a
    -1e-9 float-noise guard) and, by searchsorted of the distinct
    values against them, the per-bucket row counts — no second pass, no
    sort of the data. Bucket = count of boundaries strictly below the
    value (ties go down), mirrored by list_filter in the oracle."""
    ds = _read(sf_dir, "events", ["value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=["value"])
        return (df.groupby("value", as_index=False).size()
                .rename(columns={"size": "n"}))

    m = _fold(ds.map_batches(partial, batch_format="pandas"), ["value"],
              {"n": "sum"}).sort_values("value").reset_index(drop=True)
    vals = m["value"].to_numpy(np.float64)
    cnts = m["n"].to_numpy(np.int64)
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    qs = np.arange(1, 10) * 0.1
    idx = np.ceil(qs * n - 1e-9).astype(np.int64) - 1
    bounds = vals[np.searchsorted(cum, idx + 1)]
    bucket = np.searchsorted(bounds, vals, side="left")
    out = (pd.DataFrame({"bucket": bucket.astype(np.int64), "n_rows": cnts})
           .groupby("bucket", as_index=False).sum())
    out["n_rows"] = out["n_rows"].astype("int64")
    return out


def q_exact_quantiles_events(sf_dir: str):
    """EXACT distributed quantiles for bounded-cardinality numerics (the
    complement of the t-digest, which serves unbounded cardinality): one
    pass of per-batch (type, value) count partials -> fold -> cumulative
    selection per type. No sort of the data, exact by construction;
    DuckDB quantile_disc oracle (element at 0-based index ceil(q·n)-1,
    with a -1e-9 guard against binary-float noise in q)."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=["value"])
        g = (df.groupby(["event_type", "value"], as_index=False)
             .size().rename(columns={"size": "n"}))
        return g

    merged = _fold(ds.map_batches(partial, batch_format="pandas"),
                   ["event_type", "value"], {"n": "sum"})
    if merged.empty:
        return pd.DataFrame({"event_type": pd.Series(dtype=str),
                             "n": pd.Series(dtype="int64"),
                             "p50": [], "p90": [], "p99": []})
    rows = []
    for et, g in merged.groupby("event_type"):
        g = g.sort_values("value")
        cum = g["n"].cumsum().to_numpy()
        total = int(cum[-1])
        vals = g["value"].to_numpy()
        row = {"event_type": et, "n": total}
        for q, name in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
            idx = int(np.ceil(q * total - 1e-9)) - 1
            row[name] = float(vals[np.searchsorted(cum, idx + 1)])
        rows.append(row)
    out = pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)
    out["n"] = out["n"].astype("int64")
    return out[["event_type", "n", "p50", "p90", "p99"]]


def q_refined_quantiles_norms(sf_dir: str):
    """Exact quantiles of a CONTINUOUS (unbounded-cardinality) column —
    embedding L2 norms — by multi-pass histogram-refinement selection
    (stages/quantile.refined_quantile; quantile_disc semantics). Norms
    rounded to 4 first so both computation paths select from the
    identical multiset (list_sum vs numpy low-bit independence)."""
    from ..stages.quantile import refined_quantile
    ds = _read(sf_dir, "embeddings", ["embedding"])

    def norms(df: pd.DataFrame) -> pd.DataFrame:
        V = np.stack([np.asarray(v, dtype=np.float64)
                      for v in df["embedding"]])
        return pd.DataFrame({"norm": rnd(np.linalg.norm(V, axis=1), 4)})

    nds = ds.map_batches(norms, batch_format="pandas")
    got = refined_quantile(nds, "norm", [0.25, 0.5, 0.9], bins=32,
                           max_collect=64)
    return pd.DataFrame({"q": list(got), "norm": [got[q] for q in got]})


def q_approx_distinct_events(sf_dir: str):
    """HLL approximate distinct users per event_type next to the exact
    count: per-batch HLL partials merged by register-max — order- and
    partitioning-invariant (registers are maxima), so the estimate is
    bit-deterministic across runs and cluster sizes => fixture oracle.
    The exact column is the small-scale cross-check only (driver union of
    per-batch uniques, O(distinct keys)); at the north-star scale you run
    the HLL alone — O(types × 4 KB) regardless of cardinality — or the
    shuffle-exact path of q_uniqueness_events."""
    from ..functions.sketches import HyperLogLog
    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type"):
            h = HyperLogLog(p=12)
            h.add_hashes(pd.util.hash_pandas_object(
                g["user_id"], index=False).to_numpy(np.uint64))
            rows.append({"event_type": et, "regs": h.registers.tobytes(),
                         "exact_part": g["user_id"].unique()})
        return pd.DataFrame(rows)

    parts = ds.map_batches(partial, batch_size=8192,
                           batch_format="pandas").to_pandas()
    out = []
    for et, g in parts.groupby("event_type"):
        h = HyperLogLog(p=12)
        for r in g["regs"]:
            h.registers = np.maximum(h.registers,
                                     np.frombuffer(r, dtype=np.uint8))
        exact = len(set(np.concatenate(g["exact_part"].to_list())))
        out.append({"event_type": et, "hll_estimate": round(h.estimate(), 2),
                    "exact": exact})
    df = pd.DataFrame(out).sort_values("event_type").reset_index(drop=True)
    df["exact"] = df["exact"].astype("int64")
    return df


def q_deterministic_shuffle_documents(sf_dir: str):
    """Training-data shuffle as a DETERMINISTIC global sort: order by
    md5(doc_id) (seeded, partitioning-invariant, reproducible — unlike
    random_shuffle) and take the first 100. Exercises the engine's global
    ``Dataset.sort`` + limit; DuckDB ORDER BY md5 LIMIT oracle verifies
    the global order boundary exactly."""
    ds = _read(sf_dir, "documents", ["doc_id"])

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["doc_id"],
                             "shuffle_key": dd.md5_hex(
                                 df["doc_id"].astype(str))})

    return (ds.map_batches(keyed, batch_format="pandas")
            .sort("shuffle_key").limit(100))


def q_temporal_drift_events(sf_dir: str):
    """Day-over-day distribution drift: PSI of each day's value histogram
    vs the previous day (fixed 20 bins over [0,500), clipped; Laplace
    eps=0.5 smoothing so empty bins are defined). One partial-counts pass
    -> fold -> tiny driver PSI; DuckDB window-join oracle recomputes the
    identical formula."""
    N_BINS, LO, W, EPS = 20, 0.0, 25.0, 0.5
    ds = _read(sf_dir, "events", ["ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(dtype=np.float64)
        ok = ~np.isnan(v)
        day = ((df["ts"].dt.floor("D") - pd.Timestamp(0))
               // pd.Timedelta(days=1)).to_numpy(np.int64)[ok]
        b = np.clip(((v[ok] - LO) // W).astype(np.int64), 0, N_BINS - 1)
        return (pd.DataFrame({"day": day, "bin": b, "n": 1})
                .groupby(["day", "bin"], as_index=False).sum())

    m = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["day", "bin"], {"n": "sum"})
    # dense (day × bin) grid so empty bins participate via smoothing
    days = np.sort(m["day"].unique())
    grid = (m.set_index(["day", "bin"])["n"]
            .reindex(pd.MultiIndex.from_product([days, range(N_BINS)],
                                                names=["day", "bin"]),
                     fill_value=0).unstack())
    tot = grid.sum(axis=1).to_numpy(dtype=np.float64)
    p = (grid.to_numpy(dtype=np.float64) + EPS) / (tot[:, None]
                                                   + EPS * N_BINS)
    rows = []
    for i in range(1, len(days)):
        psi = float(np.sum((p[i] - p[i - 1]) * np.log(p[i] / p[i - 1])))
        rows.append({"day": int(days[i]), "n": int(tot[i]),
                     "psi": float(rnd(psi, 6))})
    return pd.DataFrame(rows, columns=["day", "n", "psi"])


def q_sliding_window_events(sf_dir: str):
    """3h event-time windows sliding every 1h, per event_type: count +
    mean (stages/sessions.sliding_window_agg — in-batch window
    replication, partial agg, no row shuffle; generate_series oracle)."""
    from ..stages.sessions import sliding_window_agg
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    merged = sliding_window_agg(ds, key="event_type", ts_col="ts",
                                value_col="value", window_s=3 * 3600.0,
                                slide_s=3600.0)
    merged["avg_value"] = rnd(merged["sum_v"] / merged["n"], 6)
    merged["n"] = merged["n"].astype("int64")
    merged["window_id"] = merged["window_id"].astype("int64")
    return (merged.drop(columns=["sum_v"])
            .sort_values(["window_id", "event_type"]).reset_index(drop=True))


def q_interval_join_events(sf_dir: str):
    """Interval (range) join: every event falling inside a 4h 'incident
    window' opened by an error event with value > 200 for the same user
    (stages/intervals.interval_join — time-bucket replication, exactly-once
    pair emission; DuckDB BETWEEN-join oracle). The window table is built
    distributed, collected small, broadcast via ray.put."""
    from ..stages.intervals import interval_join
    from ..stages.sessions import _epoch_us
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type",
                                  "value"])

    def win_part(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["event_type"] == "error") & (df["value"] > 200.0)
        sub = df.loc[m]
        s = _epoch_us(sub["ts"])
        return pd.DataFrame({"user_id": sub["user_id"],
                             "incident_id": sub["event_id"],
                             "start_us": s,
                             "end_us": s + 4 * 3600 * 1_000_000})

    # the window side stays a DATASET -> auto-dispatch to the union
    # co-partition (large-side) path: the whole range join is D-verified
    # with no broadcast anywhere
    windows = ev.map_batches(win_part, batch_format="pandas")
    out = interval_join(ev.drop_columns(["event_type", "value"]), windows,
                        key="user_id", ts_col="ts",
                        left_cols=["event_id", "user_id"],
                        id_col="incident_id", bucket_s=4 * 3600.0)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        for c in df.columns:
            df[c] = df[c].astype("int64")
        return df

    return out.map_batches(fin, batch_format="pandas")


def q_join_orders_lineitem(sf_dir: str):
    """Large×large co-partitioned hash join (native ``Dataset.join``
    shuffle — neither side is broadcast-small at the north-star scale):
    revenue by (order priority, return flag). Payload is minimized BEFORE
    the exchange: per-batch partial aggregation collapses lineitem to
    (orderkey, flag, revenue, n_items) rows, so the all-to-all moves
    pre-reduced rows, not raw line items; the post-join aggregate is again
    partial-then-fold."""
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"])

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        return (pd.DataFrame({
            "l_orderkey": df["l_orderkey"],
            "l_returnflag": df["l_returnflag"],
            "revenue": df["l_extendedprice"] * (1 - df["l_discount"]),
            "n_items": 1,
        }).groupby(["l_orderkey", "l_returnflag"], as_index=False).sum())

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    j = li.map_batches(pre, batch_format="pandas").join(
        orders, join_type="inner", num_partitions=16,
        on=("l_orderkey",), right_on=("o_orderkey",))

    def post(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["o_orderpriority", "l_returnflag"],
                          as_index=False).agg(revenue=("revenue", "sum"),
                                              n_items=("n_items", "sum"))

    merged = _fold(j.map_batches(post, batch_format="pandas"),
                   ["o_orderpriority", "l_returnflag"],
                   {"revenue": "sum", "n_items": "sum"})
    merged["revenue"] = rnd(merged["revenue"], 2)
    merged["n_items"] = merged["n_items"].astype("int64")
    return (merged.sort_values(["o_orderpriority", "l_returnflag"])
            .reset_index(drop=True))


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3-shaped 3-way join: BUILDING-segment customers' orders
    placed before 1997-07-01 with lineitems shipped after it, top 10 open
    orders by revenue. Ray shape: the filtered customer side is a
    BROADCAST key set (smallest side — semi-join via ray.put, no
    shuffle); lineitem is date-filtered at the read and pre-reduced to
    (orderkey, revenue) per batch BEFORE the one native shuffle join with
    orders; final top-10 folds batches×1-row partials on the driver with
    a deterministic (revenue desc, orderkey) tie-break."""
    cutoff = pd.Timestamp("1997-07-01")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    keys = cust.filter(expr="c_mktsegment == 'BUILDING'").to_pandas()
    keyset = ray.put(keys["c_custkey"].to_numpy())

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate",
                    "o_orderpriority"])

    def ofilter(df: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(keyset)
        m = (df["o_orderdate"] < cutoff) & df["o_custkey"].isin(ks)
        return df.loc[m, ["o_orderkey", "o_orderdate", "o_orderpriority"]]

    orders = orders.map_batches(ofilter, batch_format="pandas")

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"] > cutoff]
        return (pd.DataFrame({
            "l_orderkey": df["l_orderkey"],
            "revenue": df["l_extendedprice"] * (1 - df["l_discount"]),
        }).groupby("l_orderkey", as_index=False).sum())

    j = li.map_batches(pre, batch_format="pandas").join(
        orders, join_type="inner", num_partitions=16,
        on=("l_orderkey",), right_on=("o_orderkey",))

    def post(df: pd.DataFrame) -> pd.DataFrame:
        # NO per-batch top-k: an order's revenue can straddle batches
        # within a join partition, so early truncation could drop part of
        # a group's sum. Emit full group partials; the cardinality-aware
        # fold merges them (driver below the key threshold, Ray shuffle
        # above), and the top-10 cut happens only on fully-merged sums.
        return (df.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"],
                           as_index=False).agg(revenue=("revenue", "sum")))

    top = (_fold(j.map_batches(post, batch_format="pandas"),
                 ["l_orderkey", "o_orderdate", "o_orderpriority"],
                 {"revenue": "sum"})
           .sort_values(["revenue", "l_orderkey"],
                        ascending=[False, True]).head(10))
    top["revenue"] = rnd(top["revenue"], 2)
    top["l_orderkey"] = top["l_orderkey"].astype("int64")
    return top.reset_index(drop=True)


def q_local_supplier_volume(sf_dir: str):
    """TPC-H Q5-shaped star join: 1996 revenue per ASIA nation where the
    supplier and the ordering customer share the nation. Ray shape: the
    three dimension tables (supplier/customer/nation+region) become
    DENSE-ARRAY broadcast lookups (``ray.put`` once, numpy fancy-index
    per batch — never a shuffle); lineitem maps suppkey->nation and
    pre-reduces to (orderkey, s_nat, revenue) before the single
    large-large shuffle join with date-filtered orders; the same-nation
    filter + nation naming happen post-join in-batch, and the per-nation
    sums fold driver-side (#batches x #nations tiny rows)."""
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    cusd = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    asia = int(reg.loc[reg["r_name"] == "ASIA", "r_regionkey"].iloc[0])

    sup_nat = np.full(int(sup["s_suppkey"].max()) + 1, -1, dtype=np.int64)
    sup_nat[sup["s_suppkey"].to_numpy()] = sup["s_nationkey"].to_numpy()
    cus_nat = np.full(int(cusd["c_custkey"].max()) + 1, -1, dtype=np.int64)
    cus_nat[cusd["c_custkey"].to_numpy()] = cusd["c_nationkey"].to_numpy()
    nat_reg = np.full(int(nat["n_nationkey"].max()) + 1, -1, dtype=np.int64)
    nat_reg[nat["n_nationkey"].to_numpy()] = nat["n_regionkey"].to_numpy()
    nat_name = dict(zip(nat["n_nationkey"], nat["n_name"]))
    sup_ref, cus_ref = ray.put(sup_nat), ray.put(cus_nat)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        sn = ray.get(sup_ref)
        return (pd.DataFrame({
            "l_orderkey": df["l_orderkey"],
            "s_nat": sn[df["l_suppkey"].to_numpy()],
            "revenue": df["l_extendedprice"] * (1 - df["l_discount"]),
        }).groupby(["l_orderkey", "s_nat"], as_index=False).sum())

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    lo = pd.Timestamp("1996-01-01")
    hi = pd.Timestamp("1997-01-01")

    def ofilter(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["o_orderdate"] >= lo) & (df["o_orderdate"] < hi)
        return df.loc[m, ["o_orderkey", "o_custkey"]]

    j = li.map_batches(pre, batch_format="pandas").join(
        orders.map_batches(ofilter, batch_format="pandas"),
        join_type="inner", num_partitions=16,
        on=("l_orderkey",), right_on=("o_orderkey",))

    def post(df: pd.DataFrame) -> pd.DataFrame:
        cn = ray.get(cus_ref)
        c_nat = cn[df["o_custkey"].to_numpy()]
        m = (c_nat == df["s_nat"].to_numpy()) & \
            (nat_reg[df["s_nat"].to_numpy()] == asia)
        return (df.loc[m, ["s_nat", "revenue"]]
                .groupby("s_nat", as_index=False).sum())

    merged = _fold(j.map_batches(post, batch_format="pandas"),
                   ["s_nat"], {"revenue": "sum"})
    merged["n_name"] = merged["s_nat"].map(nat_name)
    merged["revenue"] = rnd(merged["revenue"], 2)
    return (merged[["n_name", "revenue"]]
            .sort_values("revenue", ascending=False).reset_index(drop=True))


def q_user_event_paths(sf_dir: str):
    """Ordered string aggregation — the path/journey shape: each user's
    event-type sequence in (ts, event_id) order, concatenated. The
    per-user group sorts inside one map_groups task (group-fits-worker);
    only the first 40 steps are emitted so row width stays bounded —
    the SAME truncation is applied in the oracle (list slicing), so the
    compare is exact."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts",
                                  "event_type"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        seq = ">".join(g["event_type"].head(40))
        return pd.DataFrame({"user_id": [int(g["user_id"].iloc[0])],
                             "n_events": [len(g)],
                             "path40": [seq]})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pandas")


def q_benford_events(sf_dir: str):
    """Benford leading-digit profile of events.value — the classic
    numeric-forensics data-quality check: counts per leading digit 1-9
    (zero/NaN/null excluded) plus each digit's deviation from the
    Benford expectation log10(1+1/d). One pass of per-batch digit-count
    partials. Digits are extracted from the exact scaled-integer decimal
    string (values carry <=2 decimals) because float log10/pow
    extraction disagrees between numpy and DuckDB on edge values;
    deviation comes from identical integer counts on both sides."""
    ds = _read(sf_dir, "events", ["value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = np.abs(df["value"].to_numpy(np.float64))
        v = v[~np.isnan(v) & (v > 0)]
        # values carry <=2 decimals: scale to the exact-integer domain
        # and take the first digit of the integer's decimal string —
        # float log10/pow digit extraction differs between engines on
        # edge values like 0.7 (measured), integer strings never do
        iv = np.round(v * 100.0).astype(np.int64)
        iv = iv[iv > 0]
        d = pd.Series(iv).astype(str).str[0].astype(np.int64).to_numpy()
        u, c = np.unique(d, return_counts=True)
        return pd.DataFrame({"digit": u.astype(np.int64), "n": c})

    m = _fold(ds.map_batches(partial, batch_format="pandas"), ["digit"],
              {"n": "sum"})
    m = (m.set_index("digit").reindex(range(1, 10), fill_value=0)
         .reset_index())
    m["n"] = m["n"].astype("int64")
    total = int(m["n"].sum())
    exp = np.log10(1.0 + 1.0 / m["digit"].to_numpy(np.float64))
    m["benford_dev"] = rnd(pd.Series(m["n"] / total - exp), 6)
    return m


def q_percent_rank_events(sf_dir: str):
    """percent_rank() OVER (PARTITION BY user ORDER BY value) — the
    order-statistics window shape: one groupby(user).map_groups (the
    per-series group-fits-a-worker contract of stages/series); ties take
    the minimum rank exactly like SQL rank(), and (rank-1)/(n-1) is an
    integer-ratio IEEE division, so the oracle matches bit-for-bit.
    NULL/NaN values are excluded on both sides."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def valid(df: pd.DataFrame) -> pd.DataFrame:
        return df.dropna(subset=["value"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        r = g["value"].rank(method="min").to_numpy(np.float64)
        n = len(g)
        pct = (r - 1.0) / (n - 1.0) if n > 1 else np.zeros(n)
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(np.int64),
                             "pct_rank": pct})

    return (ds.map_batches(valid, batch_format="pandas")
            .groupby("user_id").map_groups(per_user, batch_format="pandas"))


def q_heavy_hitters_events(sf_dir: str):
    """Exact heavy hitters via the classic two-pass sketch pattern —
    dominant-value detection, a core data-quality check (a value holding
    >phi of a column usually means a default/sentinel leak). Pass 1:
    one bounded-memory Misra-Gries summary (k=256 counters) per batch,
    partials summed by the cardinality-aware fold, then MG-compacted to
    <=k candidates (Agarwal et al. merge rule keeps every key with true
    count > n/k, and k > 1/phi, so the candidate set is a guaranteed
    superset). Pass 2: exact counts for ONLY the <=k candidates (tiny
    broadcast, shuffle-free), filtered by the true threshold — so the
    output is exact with no global groupby over the full key space.
    Keys are round-half-away(value, 0) ints (DuckDB round semantics)."""
    from ..functions.sketches import MisraGries
    ds = _read(sf_dir, "events", ["value"])
    PHI, K = 0.005, 256
    SENTINEL = np.int64(-(2 ** 62))  # carries the batch row count

    def to_keys(df: pd.DataFrame) -> np.ndarray:
        v = df["value"].to_numpy(np.float64)
        v = v[~np.isnan(v)]
        return rnd(v, 0).astype(np.int64)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        iv = to_keys(df)
        mg = MisraGries(K)
        mg.add_many(iv)
        keys, cnts = mg.items()
        keys.append(SENTINEL)
        cnts.append(len(iv))
        return pd.DataFrame({"v": np.asarray(keys, dtype=np.int64),
                             "n": np.asarray(cnts, dtype=np.int64)})

    m = _fold(ds.map_batches(partial, batch_format="pandas"), ["v"],
              {"n": "sum"})
    n_total = int(m.loc[m["v"] == SENTINEL, "n"].sum())
    m = m[m["v"] != SENTINEL]
    cand_keys, _ = MisraGries.compact(
        m["v"].to_numpy(np.int64), m["n"].to_numpy(np.int64), K)
    cand = set(int(x) for x in cand_keys)  # <=K ints: closure broadcast

    def exact(df: pd.DataFrame) -> pd.DataFrame:
        iv = to_keys(df)
        u, c = np.unique(iv, return_counts=True)
        keep = np.fromiter((int(x) in cand for x in u), dtype=bool,
                           count=len(u))
        return pd.DataFrame({"v": u[keep], "n": c[keep].astype(np.int64)})

    out = _fold(ds.map_batches(exact, batch_format="pandas"), ["v"],
                {"n": "sum"})
    out = out[out["n"] > PHI * n_total].reset_index(drop=True)
    out["v"] = out["v"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out


def q_mode_events(sf_dir: str):
    """Deterministic per-group mode — the modal event_type per user (ties
    broken to the lexicographically smallest type, so the result is
    well-defined on both sides, unlike SQL mode()). Slim (user, type, n)
    count partials fold once; the argmax runs on the already-aggregated
    frame (users × ≤5 types), never on raw rows."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["user_id", "event_type"], as_index=False)
             .size().rename(columns={"size": "n"}))
        return g

    m = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["user_id", "event_type"], {"n": "sum"})
    m = m.sort_values(["user_id", "n", "event_type"],
                      ascending=[True, False, True], kind="mergesort")
    out = m.drop_duplicates("user_id", keep="first").reset_index(drop=True)
    out = out.rename(columns={"event_type": "mode_type"})
    out["user_id"] = out["user_id"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out[["user_id", "mode_type", "n"]]


def q_entropy_by_source(sf_dir: str):
    """Per-source Shannon entropy of the language mix — a categorical
    balance/diversity profile (a source whose lang entropy collapses is a
    crawl-drift signal). One (source, lang, n) count-partial pass; the
    entropy Σ -p·log2(p) is computed on the tiny aggregated frame."""
    ds = _read(sf_dir, "documents", ["source", "lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["source", "lang"], as_index=False)
                .size().rename(columns={"size": "n"}))

    m = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["source", "lang"], {"n": "sum"})

    def ent(g: pd.DataFrame) -> float:
        p = g["n"].to_numpy(np.float64)
        p = p / p.sum()
        return float(-(p * np.log2(p)).sum())

    out = (m.groupby("source")
           .apply(lambda g: pd.Series(
               {"n_docs": int(g["n"].sum()), "n_langs": int(len(g)),
                "lang_entropy": ent(g)}), include_groups=False)
           .reset_index())
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_langs"] = out["n_langs"].astype("int64")
    out["lang_entropy"] = rnd(out["lang_entropy"], 6)
    return out


def q_chi2_drift_events(sf_dir: str):
    """Chi-squared homogeneity test for CATEGORICAL drift (KS/PSI cover
    numeric columns): does the event_type mix differ between the first
    and second half of the month? One (half, type, n) counting pass; the
    statistic runs on the tiny contingency fold with the same per-cell
    IEEE ops as the SQL oracle. Emits per-type contributions plus the
    total chi2 and degrees of freedom."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])
    SPLIT = pd.Timestamp("2024-01-16")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({"event_type": df["event_type"],
                          "half": (df["ts"] >= SPLIT).astype(np.int64),
                          "n": 1})
        return t.groupby(["event_type", "half"], as_index=False).sum()

    m = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["event_type", "half"], {"n": "sum"})
    wide = (m.pivot_table(index="event_type", columns="half", values="n",
                          fill_value=0, aggfunc="sum").reindex(
                columns=[0, 1], fill_value=0))
    o = wide.to_numpy(np.float64)
    row = o.sum(axis=1, keepdims=True)
    colsum = o.sum(axis=0, keepdims=True)
    tot = o.sum()
    e = row * colsum / tot
    contrib = ((o - e) ** 2 / e).sum(axis=1)
    out = pd.DataFrame({
        "event_type": wide.index.to_numpy(),
        "n_first": wide[0].to_numpy(np.int64),
        "n_second": wide[1].to_numpy(np.int64),
        "chi2_contrib": rnd(contrib, 6)})
    out["chi2_total"] = rnd(float(contrib.sum()), 6)
    out["dof"] = np.int64(len(wide) - 1)
    return out.sort_values("event_type").reset_index(drop=True)


def q_heartbeat_gaps_events(sf_dir: str):
    """Missed-heartbeat detection per series — the SLA/liveness check:
    count inter-event gaps over 12 h and the max gap per user. Ordered
    per-series kernel in groupby(user).map_groups (the group-fits-a-
    worker series contract); gap seconds are exact integer-microsecond
    differences / 1e6 so the lag-window oracle matches bit-for-bit."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    GAP_S = 43200.0

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        t = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        d = np.diff(t) / 1e6
        return pd.DataFrame({
            "user_id": [np.int64(g["user_id"].iloc[0])],
            "n_events": [np.int64(len(g))],
            "n_gaps": [np.int64((d > GAP_S).sum())],
            "max_gap_s": [rnd(float(d.max()), 3) if len(d) else np.nan]})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pandas")


def q_expectations_freshness(sf_dir: str):
    """Freshness expectation kind: per-group (and whole-table) max event
    time must be within max_lag_s of an EXPLICIT as_of (no wall clock —
    deterministic, oracle-able; a scheduler passes its tick in). Slim
    (group, max-ts) partials, one fold; violations = stale groups."""
    from ..stages import expectations as ex
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    suite = [
        {"check": "freshness", "column": "ts", "by": "user_id",
         "as_of": "2024-01-30 00:00:00", "max_lag_s": 86400.0,
         "mostly": 0.5},
        {"check": "freshness", "column": "ts",
         "as_of": "2024-01-30 00:00:00", "max_lag_s": 604800.0},
    ]
    return ex.run_expectations(ds, suite)


def q_fd_check(sf_dir: str):
    """Functional-dependency constraint mining — does lhs -> rhs hold,
    and over how many violating lhs values? The discovery side of the
    declarative expectations suite: a held FD is a constraint worth
    pinning; a near-held one localizes dirty keys. Four candidates across
    three tables (mix of holding and failing). Per candidate: slim
    distinct (lhs, rhs) pair partials per batch (bounded by distinct-pair
    count, not rows) -> one cardinality-aware fold -> per-lhs distinct-rhs
    count on the folded frame."""
    cands = [("events", "user_id", "event_type"),
             ("orders", "o_custkey", "o_orderpriority"),
             ("lineitem", "l_partkey", "l_suppkey"),
             ("customer", "c_custkey", "c_nationkey")]
    out = []
    for table, lhs, rhs in cands:
        ds = _read(sf_dir, table, [lhs, rhs])

        def pairs(df: pd.DataFrame, lhs=lhs, rhs=rhs) -> pd.DataFrame:
            p = (df[[lhs, rhs]].drop_duplicates()
                 .rename(columns={lhs: "l", rhs: "r"}))
            p["c"] = 1
            return p

        m = _fold(ds.map_batches(pairs, batch_format="pandas"),
                  ["l", "r"], {"c": "sum"})
        per_lhs = m.groupby("l")["r"].nunique()
        out.append({"fd": f"{table}.{lhs}->{rhs}",
                    "n_lhs": int(len(per_lhs)),
                    "n_violating_lhs": int((per_lhs > 1).sum()),
                    "holds": bool((per_lhs <= 1).all())})
    res = pd.DataFrame(out)
    res["n_lhs"] = res["n_lhs"].astype("int64")
    res["n_violating_lhs"] = res["n_violating_lhs"].astype("int64")
    return res


def q_mutual_information_events(sf_dir: str):
    """Mutual information I(event_type; hour-of-day) in bits — the
    cross-column dependence profile for categorical pairs (corr_events
    covers the numeric case). One (type, hour, n) counting pass; the
    plug-in MI estimate runs on the tiny folded contingency table with
    the same per-term IEEE ops as the SQL oracle."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({"event_type": df["event_type"],
                          "hour": df["ts"].dt.hour.astype(np.int64),
                          "n": 1})
        return t.groupby(["event_type", "hour"], as_index=False).sum()

    m = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["event_type", "hour"], {"n": "sum"})
    n = float(m["n"].sum())
    pxy = m["n"].to_numpy(np.float64) / n
    px = (m.groupby("event_type")["n"].transform("sum")
          .to_numpy(np.float64) / n)
    py = (m.groupby("hour")["n"].transform("sum")
          .to_numpy(np.float64) / n)
    mi = float((pxy * np.log2(pxy / (px * py))).sum())
    return pd.DataFrame({"n": [int(n)], "mi_bits": rnd([mi], 6)})


def q_snapshot_diff_events(sf_dir: str):
    """Snapshot reconciliation — the validation-engine diff between two
    table versions: which keys were added, removed, or changed. Version B
    is a deterministic mutation of events (delete id%101==0, double value
    where id%97==0, insert id+10M clones where id%103==0) so the oracle
    can build the identical snapshot in SQL. Shape: both sides shrink to
    slim (key, present-side counts, value-bit-pattern) partials combined
    inside map_batches, merged by ONE cardinality-aware fold (auto-spills
    to a Ray groupby above the driver threshold — sum/max aggregates
    only, so both fold regimes apply); classification is vectorized on
    the merged frame. Values compare by float64 bit pattern with an
    explicit both-NaN override, matching DuckDB's NaN = NaN and
    NULL IS DISTINCT FROM NULL semantics."""
    ds = _read(sf_dir, "events", ["event_id", "value"])
    MISSING = np.int64(-(2 ** 63))  # folds as max() identity

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        eid = df["event_id"].to_numpy(np.int64)
        v = df["value"].to_numpy(np.float64)
        bits = v.view(np.int64)
        # side A: the original snapshot
        a = pd.DataFrame({"event_id": eid, "n_a": 1, "n_b": 0,
                          "va": bits, "vb": MISSING})
        # side B: survived deletes, with the %97 update applied
        keep = eid % 101 != 0
        vb = np.where(eid % 97 == 0, v * 2.0, v).view(np.int64)
        b = pd.DataFrame({"event_id": eid[keep], "n_a": 0, "n_b": 1,
                          "va": MISSING, "vb": vb[keep]})
        # side B inserts
        ins = eid % 103 == 0
        i = pd.DataFrame({"event_id": eid[ins] + 10_000_000,
                          "n_a": 0, "n_b": 1, "va": MISSING,
                          "vb": (v[ins] + 1.0).view(np.int64)})
        out = pd.concat([a, b, i], ignore_index=True)
        return out.groupby("event_id", as_index=False).agg(
            {"n_a": "sum", "n_b": "sum", "va": "max", "vb": "max"})

    m = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["event_id"], {"n_a": "sum", "n_b": "sum",
                             "va": "max", "vb": "max"})
    n_a = m["n_a"].to_numpy(np.int64)
    n_b = m["n_b"].to_numpy(np.int64)
    va = m["va"].to_numpy(np.int64).view(np.float64)
    vb = m["vb"].to_numpy(np.int64).view(np.float64)
    both_nan = np.isnan(va) & np.isnan(vb)
    changed = (n_a > 0) & (n_b > 0) \
        & (m["va"].to_numpy() != m["vb"].to_numpy()) & ~both_nan
    ct = np.where(n_a == 0, "added",
                  np.where(n_b == 0, "removed",
                           np.where(changed, "changed", "")))
    out = pd.DataFrame({"event_id": m["event_id"].astype("int64"),
                        "change_type": ct})
    return out[out["change_type"] != ""].reset_index(drop=True)


def q_corr_events(sf_dir: str):
    """Per-type Pearson correlation between value and hour-of-day — the
    cross-column dependence profile (time-of-day effects are a classic
    silent data shift). Mergeable moment partials (n, Σx, Σy, Σxx, Σyy,
    Σxy) per event_type combine associatively — one slim fold, no raw-row
    shuffle; the oracle computes the identical raw-moments formula so
    both sides round to the same 6dp."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=["value"])
        x = d["value"].to_numpy(np.float64)
        y = d["ts"].dt.hour.to_numpy(np.float64)
        t = pd.DataFrame({"event_type": d["event_type"], "x": x, "y": y,
                          "xx": x * x, "yy": y * y, "xy": x * y, "n": 1.0})
        return t.groupby("event_type", as_index=False).sum()

    m = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["event_type"], {c: "sum" for c in
                               ["x", "y", "xx", "yy", "xy", "n"]})
    n = m["n"].to_numpy(np.float64)
    cov = m["xy"].to_numpy() - m["x"].to_numpy() * m["y"].to_numpy() / n
    vx = m["xx"].to_numpy() - m["x"].to_numpy() ** 2 / n
    vy = m["yy"].to_numpy() - m["y"].to_numpy() ** 2 / n
    out = pd.DataFrame({
        "event_type": m["event_type"],
        "n": n.astype(np.int64),
        "corr_value_hour": rnd(cov / np.sqrt(vx * vy), 6),
    })
    return out.reset_index(drop=True)


def q_regression_events(sf_dir: str):
    """Per-user OLS trend line of value over time (slope/day, intercept,
    r²) — the per-entity drift-rate profile (is this source's metric
    creeping, and how fast?). Mergeable raw-moment partials (n, Σx, Σy,
    Σxx, Σxy, Σyy) per user fold associatively — one slim exchange
    bounded by user cardinality, no raw-row shuffle; the oracle computes
    the identical closed form over the identical moments. x is epoch
    DAYS minus a fixed reference (day 20000 ≈ 2024-10): small-magnitude
    x keeps both the Σxx - (Σx)²/n cancellation and the intercept's
    slope·mean(x) amplification well inside float64 — with raw epoch
    days the intercept mismatched the oracle in the 4th decimal (ulp
    slope differences × 20600 days), measured before centering."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=["value"])
        x = (d["ts"].to_numpy("datetime64[us]").astype(np.int64)
             / 86400e6 - 20000.0)
        y = d["value"].to_numpy(np.float64)
        t = pd.DataFrame({"user_id": d["user_id"], "x": x, "y": y,
                          "xx": x * x, "yy": y * y, "xy": x * y,
                          "n": 1.0})
        return t.groupby("user_id", as_index=False).sum()

    m = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["user_id"], {c: "sum" for c in
                            ["x", "y", "xx", "yy", "xy", "n"]})
    n = m["n"].to_numpy(np.float64)
    sx, sy = m["x"].to_numpy(), m["y"].to_numpy()
    cov = m["xy"].to_numpy() - sx * sy / n
    vx = m["xx"].to_numpy() - sx * sx / n
    vy = m["yy"].to_numpy() - sy * sy / n
    keep = (n >= 2) & (vx > 0)
    slope = cov / vx
    out = pd.DataFrame({
        "user_id": m["user_id"].astype("int64"),
        "n": n.astype(np.int64),
        "slope_per_day": rnd(slope, 6),
        "intercept": rnd((sy - slope * sx) / n, 4),
        "r2": rnd(np.where(vy > 0, cov * cov / (vx * vy), np.nan), 6),
    })
    return out[keep].reset_index(drop=True)


def q_autocorr_events(sf_dir: str):
    """Per-user lag-1 autocorrelation of the time-ordered value series —
    the memory/whiteness profile (a sensor whose residuals suddenly
    autocorrelate has drifted or stuck). Order-dependent, so it rides
    the series partitioning assumption (one user's series per task,
    stages/series.py): groupby(user).map_groups sorts by (ts, event_id)
    — the deterministic tiebreak the oracle's window ORDER BY mirrors —
    and emits one row per user. Pearson r over the (v[t-1], v[t]) pairs
    equals SQL corr(value, lag(value)) exactly up to summation order;
    both sides round to 6dp."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        v = g["value"].to_numpy(np.float64)
        ok = ~np.isnan(v)
        v = v[ok]
        uid = int(g["user_id"].iloc[0])
        if len(v) < 3:
            return pd.DataFrame({"user_id": [], "n_pairs": [],
                                 "autocorr_lag1": []})
        a, b = v[:-1], v[1:]
        n = len(a)
        cov = (a * b).sum() - a.sum() * b.sum() / n
        va = (a * a).sum() - a.sum() ** 2 / n
        vb = (b * b).sum() - b.sum() ** 2 / n
        if va <= 0 or vb <= 0:
            return pd.DataFrame({"user_id": [], "n_pairs": [],
                                 "autocorr_lag1": []})
        return pd.DataFrame({"user_id": [uid], "n_pairs": [n],
                             "autocorr_lag1": rnd(cov / np.sqrt(va * vb),
                                                  6)})

    out = (ds.groupby("user_id")
             .map_groups(per_user, batch_format="pandas")).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    out["n_pairs"] = out["n_pairs"].astype("int64")
    return out.reset_index(drop=True)


def q_gini_events(sf_dir: str):
    """Exact per-type Gini concentration of event values — the
    inequality profile (is traffic/value concentrated in a few heavy
    records?). Exact order statistics WITHOUT a global sort: histogram
    refinement assigns every bucket a known global rank window
    (stages/gini.exact_gini; same multi-pass shape as the refined
    quantiles). The oracle sorts outright — identical closed form, tie
    order provably irrelevant."""
    from ..stages.gini import exact_gini
    ds = _read(sf_dir, "events", ["event_type", "value"])
    out = exact_gini(ds, "value", "event_type")
    out["n"] = out["n"].astype("int64")
    out["gini"] = rnd(out["gini"], 6)
    return out.reset_index(drop=True)


def q_pivot_events(sf_dir: str):
    """Crosstab pivot — user rows × event-type count columns: slim
    (user, type, n) partials fold once (cardinality-aware); the pivot to
    wide happens on the already-aggregated frame (bounded column set),
    never on raw rows. Mirrored by conditional FILTER aggregation."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    TYPES = ["click", "error", "purchase", "signup", "view"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (pd.DataFrame({"user_id": df["user_id"],
                              "event_type": df["event_type"], "n": 1})
                .groupby(["user_id", "event_type"], as_index=False).sum())

    m = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["user_id", "event_type"], {"n": "sum"})
    w = (m.pivot_table(index="user_id", columns="event_type", values="n",
                       aggfunc="sum", fill_value=0)
         .reindex(columns=TYPES, fill_value=0).reset_index())
    w.columns.name = None
    for c in TYPES:
        w[f"n_{c}"] = w[c].astype("int64")
    w["user_id"] = w["user_id"].astype("int64")
    return w[["user_id"] + [f"n_{c}" for c in TYPES]]


def q_funnel_events(sf_dir: str):
    """Ordered-funnel conversion — the product-analytics sequence shape:
    users whose first 'signup' is later followed by a 'purchase'.
    Per-batch per-user partials carry only (min signup ts, max purchase
    ts); the cardinality-aware fold merges them (exists-after ⇔ max
    purchase > min signup, so no event lists ever move); output is the
    3-row funnel. Timestamps compared as integer epochs — exact."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ep = ((df["ts"] - pd.Timestamp(0)) // pd.Timedelta("1us")
              ).astype("int64")
        s = df["event_type"].to_numpy()
        out = pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                            "min_signup": np.where(s == "signup", ep,
                                                   np.iinfo(np.int64).max),
                            "max_purchase": np.where(s == "purchase", ep,
                                                     np.iinfo(np.int64).min)})
        return out.groupby("user_id", as_index=False).agg(
            min_signup=("min_signup", "min"),
            max_purchase=("max_purchase", "max"))

    u = _fold(ds.map_batches(partial, batch_format="pandas"), ["user_id"],
              {"min_signup": "min", "max_purchase": "max"})
    has_signup = u["min_signup"] < np.iinfo(np.int64).max
    converted = has_signup & (u["max_purchase"] > u["min_signup"])
    return pd.DataFrame({
        "stage": ["users", "signed_up", "converted"],
        "n": np.array([len(u), int(has_signup.sum()),
                       int(converted.sum())], dtype=np.int64)})


def q_rollup_events(sf_dir: str):
    """ROLLUP(event_type, user_id) aggregate — the OLAP subtotal shape:
    the FINE level (type, user) folds once from per-batch partials
    (cardinality-aware: the fold escapes to the Ray groupby path past
    the key threshold); the coarser levels (per type, grand total) are
    DERIVED from the fine aggregate, never by re-scanning the data —
    the standard rollup trick. Rolled-up key
    columns surface as NULL exactly like SQL ROLLUP (user_id nullable
    float64 NaN, event_type None on both sides)."""
    ds = _read(sf_dir, "events", ["event_type", "user_id", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=["value"])
        return (pd.DataFrame({"event_type": df["event_type"],
                              "user_id": df["user_id"],
                              "n": 1, "sum_v": df["value"]})
                .groupby(["event_type", "user_id"], as_index=False).sum())

    fine = _fold(ds.map_batches(partial, batch_format="pandas"),
                 ["event_type", "user_id"], {"n": "sum", "sum_v": "sum"})
    by_type = (fine.groupby("event_type", as_index=False)
               .agg(n=("n", "sum"), sum_v=("sum_v", "sum")))
    by_type["user_id"] = np.nan
    total = pd.DataFrame({"event_type": [None], "user_id": [np.nan],
                          "n": [fine["n"].sum()],
                          "sum_v": [fine["sum_v"].sum()]})
    out = pd.concat([fine, by_type, total], ignore_index=True)
    out["user_id"] = out["user_id"].astype(np.float64)
    out["n"] = out["n"].astype("int64")
    out["sum_value"] = rnd(out["sum_v"], 4)
    return out[["event_type", "user_id", "n", "sum_value"]]


def q_events_hourly(sf_dir: str):
    """Tumbling 1-hour event-time window per event_type: count + mean."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # unit-robust epoch seconds (parquet ts may be us- or ns-backed)
        hour = ((df["ts"].dt.floor("h") - pd.Timestamp(0))
                // pd.Timedelta(seconds=1)).astype("int64")
        return (pd.DataFrame({"hour_epoch": hour, "event_type": df["event_type"],
                              "sum_v": df["value"], "n": 1})
                .groupby(["hour_epoch", "event_type"], as_index=False).sum())

    merged = _fold(ds.map_batches(partial, batch_format="pandas"),
                   ["hour_epoch", "event_type"], {"sum_v": "sum", "n": "sum"})
    # 6 decimals: `value` has <=2 decimals so sum/2^k terminates by the 5th
    # digit — no .5 boundary where float summation order could flip the round
    merged["avg_value"] = rnd(merged["sum_v"] / merged["n"], 6)
    merged["n"] = merged["n"].astype("int64")
    return (merged.drop(columns=["sum_v"])
            .sort_values(["hour_epoch", "event_type"]).reset_index(drop=True))


# ------------------------------------------------------------ text / dedup

def q_double_fire_audit_events(sf_dir: str):
    """Double-fire audit: events of the SAME user and type landing
    within 1 s of the previous one — the at-least-once-producer /
    retry-storm signature (distinct from exact dedup: ids differ, the
    content repeats). Per (user, type) series scan in (ts, event_id)
    order; the <60 s burst threshold in exact integer epoch-us. One row
    per series — n_double 0 for healthy producers, plus the tightest gap
    observed at all (the margin to the threshold). Lag-window oracle."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type",
                                  "ts"])
    LIMIT_US = np.int64(60_000_000)

    def per_series(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        gaps = np.diff(us)
        hit = gaps < LIMIT_US
        min_gap = (round(int(gaps.min()) / 1000.0, 6) if len(gaps)
                   else np.nan)
        return pd.DataFrame({
            "user_id": [np.int64(g["user_id"].iloc[0])],
            "event_type": [g["event_type"].iloc[0]],
            "n": [np.int64(len(g))],
            "n_double": [np.int64(hit.sum())],
            "min_gap_ms": [min_gap]})

    return ((ds.groupby(["user_id", "event_type"])
               .map_groups(per_series, batch_format="pandas"))
            .to_pandas()
            .sort_values(["user_id", "event_type"])
            .reset_index(drop=True))


def q_interarrival_audit_events(sf_dir: str):
    """Inter-arrival gap audit per user: median / p95 / max gap between
    consecutive events in event-time order — the rate-stability check
    behind heartbeat monitoring (a producer whose p95 gap blows out is
    degrading long before it flat-lines). Rides the series partitioning
    contract (one user per task); gaps are exact integer epoch-us
    differences ordered by (ts, event_id) so both sides cut identical
    quantiles (np.quantile linear interpolation == DuckDB
    quantile_cont)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        gaps = np.diff(us) / 1_000_000.0
        if len(gaps) == 0:
            med = p95 = mx = np.nan
        else:
            med = float(np.quantile(gaps, 0.5))
            p95 = float(np.quantile(gaps, 0.95))
            mx = float(gaps.max())
        return pd.DataFrame({
            "user_id": [np.int64(g["user_id"].iloc[0])],
            "n": [np.int64(len(g))],
            "median_gap_s": [float(np.round(med, 6))],
            "p95_gap_s": [float(np.round(p95, 6))],
            "max_gap_s": [float(np.round(mx, 6))]})

    out = (ds.groupby("user_id")
             .map_groups(per_user, batch_format="pandas")).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def q_independence_audit_events(sf_dir: str):
    """Chi-square independence audit of event_type x weekday (Pearson
    1900): is traffic mix stable across days of the week, or does some
    type cluster on particular days — the categorical twin of the
    value-drift tests. One bounded fold of (type, weekday) counts (<=
    types x 7 rows regardless of input size); expected counts from the
    marginals and per-cell chi-square contributions on the driver.
    Weekday from the same integer epoch-day floor both sides (epoch day
    0 = Thursday, so weekday = (day + 4) % 7 with Monday = 0)."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])
    DAY_US = np.int64(86_400_000_000)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        wd = ((us // DAY_US) + 4) % 7
        return (pd.DataFrame({"event_type": df["event_type"],
                              "weekday": wd, "n": 1.0})
                .groupby(["event_type", "weekday"], as_index=False).sum())

    m = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["event_type", "weekday"], {"n": "sum"})
    total = float(m["n"].sum())
    row_tot = m.groupby("event_type")["n"].sum()
    col_tot = m.groupby("weekday")["n"].sum()
    m = m.sort_values(["event_type", "weekday"]).reset_index(drop=True)
    exp = (row_tot.loc[m["event_type"]].to_numpy(np.float64)
           * col_tot.loc[m["weekday"]].to_numpy(np.float64) / total)
    obs = m["n"].to_numpy(np.float64)
    return pd.DataFrame({
        "event_type": m["event_type"],
        "weekday": m["weekday"].astype("int64"),
        "n": obs.astype(np.int64),
        "expected": rnd(exp, 6),
        "chi2_part": rnd((obs - exp) ** 2 / exp, 6)})


def q_freshness_audit_events(sf_dir: str):
    """Staleness audit per event type: how far does each type's newest
    event lag behind the table's global newest — the stale-producer
    detector (a type whose lag grows run over run has quietly stopped
    emitting; measured against the data's own frontier, so no wall-clock
    dependence and fully deterministic). One bounded fold of per-type
    (max ts, count) partials; lag in exact integer epoch-us."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        t = pd.DataFrame({"event_type": df["event_type"], "us": us,
                          "n": 1.0})
        return t.groupby("event_type", as_index=False).agg(
            {"us": "max", "n": "sum"})

    m = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["event_type"], {"us": "max", "n": "sum"})
    frontier = int(m["us"].max())
    out = pd.DataFrame({
        "event_type": m["event_type"],
        "n": m["n"].astype("int64"),
        "last_us": m["us"].astype("int64"),
        "lag_s": np.round((frontier - m["us"].to_numpy(np.int64))
                          / 1_000_000.0, 6)})
    return out.sort_values("event_type").reset_index(drop=True)


def q_json_props_audit_events(sf_dir: str):
    """Semi-structured payload audit of events.props: parse rate, the
    extracted `k` field's range/mean per event type — the JSON-column
    conformance check every event pipeline needs before trusting a
    nested field (malformed payloads and missing keys are counted, not
    crashed on). json.loads per record is genuinely per-item parse work
    (the codec-kernel class); everything after it folds as bounded
    per-type partials. DuckDB json_valid/json_extract oracle."""
    import json as _json
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ks, ok, bad, nk = [], [], [], []
        for s in df["props"]:
            if not isinstance(s, str):
                ks.append(np.nan); ok.append(0); bad.append(0); nk.append(0)
                continue
            try:
                v = _json.loads(s)
            except ValueError:
                ks.append(np.nan); ok.append(0); bad.append(1); nk.append(0)
                continue
            # bool is an int subclass in Python but BOOLEAN in JSON —
            # exclude it so the predicate matches the oracle's json_type
            if (isinstance(v, dict) and isinstance(v.get("k"), int)
                    and not isinstance(v.get("k"), bool)):
                ks.append(float(v["k"])); ok.append(1)
                bad.append(0); nk.append(0)
            else:
                ks.append(np.nan); ok.append(1); bad.append(0); nk.append(1)
        t = pd.DataFrame({"event_type": df["event_type"],
                          "n": 1.0, "n_valid": np.array(ok, np.float64),
                          "n_malformed": np.array(bad, np.float64),
                          "n_missing_k": np.array(nk, np.float64),
                          "k_sum": np.nan_to_num(np.array(ks)),
                          "k_min": ks, "k_max": ks})
        return t.groupby("event_type", as_index=False).agg(
            {"n": "sum", "n_valid": "sum", "n_malformed": "sum",
             "n_missing_k": "sum", "k_sum": "sum", "k_min": "min",
             "k_max": "max"})

    m = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["event_type"], {"n": "sum", "n_valid": "sum",
                               "n_malformed": "sum", "n_missing_k": "sum",
                               "k_sum": "sum", "k_min": "min",
                               "k_max": "max"})
    n_k = m["n_valid"] - m["n_missing_k"]
    out = pd.DataFrame({
        "event_type": m["event_type"],
        "n": m["n"].astype("int64"),
        "n_valid": m["n_valid"].astype("int64"),
        "n_malformed": m["n_malformed"].astype("int64"),
        "n_missing_k": m["n_missing_k"].astype("int64"),
        "k_min": m["k_min"].astype("int64"),
        "k_max": m["k_max"].astype("int64"),
        "k_mean": rnd(m["k_sum"] / n_k, 6)})
    return out.sort_values("event_type").reset_index(drop=True)


def q_coverage_audit_events(sf_dir: str):
    """Temporal completeness audit per event type: of the hour slots
    between a type's first and last event, how many actually contain
    data? Missing hours are the silent failure mode of ingestion
    pipelines (a dead producer looks exactly like this), and coverage
    belongs in the validation vocabulary next to uniqueness/referential.
    Scale shape: per-batch distinct (type, hour) partials (bounded by
    types x hours, not rows) -> one fold -> tiny per-type driver table;
    hour ids are exact integer epoch-us floors both sides. DuckDB
    generate_series oracle."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])
    HOUR_US = np.int64(3_600_000_000)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        out = pd.DataFrame({"event_type": df["event_type"],
                            "hour": us // HOUR_US})
        return out.drop_duplicates()

    m = _fold(ds.map_batches(partial, batch_format="pandas")
                .map_batches(lambda df: df.assign(one=1.0),
                             batch_format="pandas"),
              ["event_type", "hour"], {"one": "max"})
    rows = []
    for et, g in m.groupby("event_type"):
        h = g["hour"].to_numpy(np.int64)
        span = int(h.max() - h.min()) + 1
        present = len(np.unique(h))
        rows.append({"event_type": et,
                     "hours_present": np.int64(present),
                     "hours_expected": np.int64(span),
                     "hours_missing": np.int64(span - present),
                     "coverage_pct": round(100.0 * present / span, 6)})
    return (pd.DataFrame(rows).sort_values("event_type")
            .reset_index(drop=True))


def q_disorder_audit_events(sf_dir: str):
    """Event-time disorder audit per user: how often does an event arrive
    (arrival order = event_id) with a timestamp OLDER than the running
    event-time maximum, and by how much — exactly the statistic that
    sizes a streaming watermark (sources/streaming.allowed_lateness_s:
    any max_late_s above it means silently dropped rows). Rides the
    series partitioning contract (groupby(user).map_groups, one user per
    task); lateness is exact integer epoch-us arithmetic so the seconds
    round is association-proof. DuckDB running-max window oracle."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id", kind="mergesort")
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        prev_max = np.empty(len(us), dtype=np.int64)
        prev_max[0] = np.iinfo(np.int64).min  # first row: nothing earlier
        np.maximum.accumulate(us[:-1], out=prev_max[1:])
        late = us < prev_max
        max_late_us = int((prev_max - us)[late].max()) if late.any() else 0
        return pd.DataFrame({
            "user_id": [np.int64(g["user_id"].iloc[0])],
            "n": [np.int64(len(g))],
            "n_late": [np.int64(late.sum())],
            "max_late_s": [round(max_late_us / 1_000_000.0, 6)]})

    out = (ds.groupby("user_id")
             .map_groups(per_user, batch_format="pandas")).to_pandas()
    for c in ("user_id", "n", "n_late"):
        out[c] = out[c].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def q_fd_audit_documents(sf_dir: str):
    """Functional-dependency audit: does source -> lang hold? The classic
    schema-constraint check (one LHS value must map to exactly one RHS
    value) over the documents table. Scale shape: each batch emits
    per-(source, lang) partial counts (pair-cardinality bounded — the
    exchange never carries rows), one fold merges them, and the per-source
    verdict (distinct-RHS count, witness min/max, row count) is computed
    on the <= |pairs| driver table. Violated sources surface with their
    two witness values — exactly what a schema validator needs to report."""
    ds = _read(sf_dir, "documents", ["source", "lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"source": df["source"], "lang": df["lang"],
                            "n": 1.0})
        return out.groupby(["source", "lang"], as_index=False).sum()

    m = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["source", "lang"], {"n": "sum"})
    g = m.groupby("source")
    out = pd.DataFrame({
        "source": sorted(m["source"].unique()),
        "n_langs": g["lang"].nunique().sort_index().to_numpy(np.int64),
        "lang_min": g["lang"].min().sort_index().to_numpy(),
        "lang_max": g["lang"].max().sort_index().to_numpy(),
        "n_rows": g["n"].sum().sort_index().to_numpy(np.int64),
    })
    out["fd_ok"] = out["n_langs"] == 1
    return out


def q_benford_orders(sf_dir: str):
    """Benford's-law first-digit audit of order totals (Newcomb 1881 /
    Benford 1938 — the standard forensic screen for fabricated or
    truncated financial columns): observed first-significant-digit
    frequencies vs log10(1 + 1/d), with each digit's chi-square
    contribution. One bounded fold (9 partial rows per batch); the digit
    is read from the integer-cents decimal string so engine and oracle
    extract it identically (no float log10 edge cases)."""
    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(df["o_totalprice"].to_numpy(np.float64)
                         * 100.0).astype(np.int64)
        cents = cents[cents > 0]
        d = pd.Series(cents).astype(str).str[0].astype(np.int64)
        return pd.DataFrame({"digit": d, "n": 1.0}).groupby(
            "digit", as_index=False).sum()

    m = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["digit"], {"n": "sum"})
    m = m.set_index("digit")["n"].reindex(range(1, 10), fill_value=0.0)
    total = float(m.sum())
    digits = np.arange(1, 10)
    freq = m.to_numpy(np.float64) / total
    expected = np.log10(1.0 + 1.0 / digits)
    chi2 = total * (freq - expected) ** 2 / expected
    return pd.DataFrame({
        "digit": digits.astype(np.int64),
        "n": m.to_numpy(np.int64),
        "freq": rnd(freq, 6),
        "expected": rnd(expected, 6),
        "chi2_part": rnd(chi2, 6),
    })


def q_topk_docs_per_source(sf_dir: str):
    """Per-domain best-k selection (stages/stats.topk_per_group): the 5
    longest documents per source with a dense 1..k rank — the "keep the
    best k per domain" curation primitive, WITHOUT a global sort: each
    batch emits its local top-k per source (<= k rows per source per
    batch, the candidate contract), one groupby(source) merges and cuts.
    Ordering (n_chars DESC, doc_id ASC) == the oracle's row_number
    window, so the cut is deterministic on both sides."""
    from ..stages.stats import topk_per_group
    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    out = topk_per_group(ds, "source", "n_chars", k=5, tiebreak="doc_id")
    return out.map_batches(
        lambda df: df[["source", "rk", "doc_id", "n_chars"]].astype(
            {"doc_id": "int64", "n_chars": "int64"}),
        batch_format="pandas")


def q_exact_dedup_documents(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    # one row per distinct content — corpus-scaled, so the grouped result
    # stays a Dataset (comparer-side canonical ordering)
    return dd.exact_dedup_groups(ds)


def q_token_count_documents(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["doc_id"],
                             "n_tokens": tx.token_count(df["text"])})

    return ds.map_batches(f, batch_format="pandas")


def q_vocab_documents(sf_dir: str):
    """Corpus vocabulary frequency, top 100 by (count desc, word asc) —
    the coverage table every tokenizer/mixture decision reads first.
    Per-batch word-count partials (split + explode + groupby) fold once
    (exchange bounded by vocabulary size, not corpus size — the same
    shape as BPE's word-count pass); the top-k cut happens on the folded
    table. Oracle: unnest(string_split) + identical deterministic
    tie-break."""
    ds = _read(sf_dir, "documents", ["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = df["text"].fillna("").str.split(" ").explode()
        w = w[w != ""]
        return (pd.DataFrame({"word": w, "n": 1})
                .groupby("word", as_index=False).sum())

    m = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["word"], {"n": "sum"})
    m["n"] = m["n"].astype("int64")
    out = (m.sort_values(["n", "word"], ascending=[False, True],
                         kind="stable")
           .head(100).reset_index(drop=True))
    return out[["word", "n"]]


def q_zipf_documents(sf_dir: str):
    """Zipf-law fit over the full vocabulary: OLS of log(freq) on
    log(rank) (rank by count desc, word asc) — one scalar shape check
    (exponent ~ -1 for natural text; a pile of boilerplate or synthetic
    spam bends it) plus fit r² and vocab size. Same single fold as
    q_vocab_documents; the regression runs on the driver over the folded
    vocab (bounded). Oracle computes the identical moments closed form
    over the identical ranking."""
    ds = _read(sf_dir, "documents", ["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = df["text"].fillna("").str.split(" ").explode()
        w = w[w != ""]
        return (pd.DataFrame({"word": w, "n": 1})
                .groupby("word", as_index=False).sum())

    m = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["word"], {"n": "sum"})
    m = m.sort_values(["n", "word"], ascending=[False, True],
                      kind="stable").reset_index(drop=True)
    x = np.log(np.arange(1, len(m) + 1, dtype=np.float64))
    y = np.log(m["n"].to_numpy(np.float64))
    n = float(len(m))
    sx, sy = x.sum(), y.sum()
    cov = (x * y).sum() - sx * sy / n
    vx = (x * x).sum() - sx * sx / n
    vy = (y * y).sum() - sy * sy / n
    slope = cov / vx
    return pd.DataFrame({
        "n_vocab": [np.int64(len(m))],
        "zipf_slope": rnd(slope, 6),
        "fit_r2": rnd(cov * cov / (vx * vy) if vy > 0 else np.nan, 6),
    })


def q_text_quality_documents(sf_dir: str):
    """Integer quality counts (SQL-checkable exactly)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        s = df["text"].fillna("")
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_chars": s.str.len().astype("int64"),
            "n_tokens": tx.token_count(s),
            "n_punct": s.str.count(tx.PUNCT_RE).astype("int64"),
            "n_digits": s.str.count(r"\d").astype("int64"),
        })

    return ds.map_batches(f, batch_format="pandas")


def q_charlm_quality_documents(sf_dir: str):
    """LM-perplexity quality scoring (functions/charlm): train an
    add-alpha char-trigram LM on the corpus in one counting pass, then
    score every doc's bits-per-char with the broadcast table (CCNet-style
    filter signal). Integer count fold => table bit-identical across
    partitionings; deterministic => fixture oracle."""
    from ..functions import charlm
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    logp = charlm.train_char_lm(ds, "text", alpha=0.1)
    return charlm.score_char_lm(ds, logp)


def q_pii_redact_documents(sf_dir: str):
    """PII detection + redaction (functions/text.pii_scan/pii_redact).
    The synthetic corpus carries no PII, so deterministic PII is injected
    from doc_id alone by STRING CONCATENATION — the SQL oracle re-creates
    the identical injection with `||`, then both sides scan/redact with
    the same RE2-safe patterns, making the redacted text itself
    hash-checked (not just the counts). Embarrassingly parallel, no
    shuffle."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].to_numpy()
        s = df["text"].fillna("").copy()
        s = s.where(d % 3 != 0,
                    s + pd.Series(d, index=s.index).map(
                        lambda i: f" contact user{i}@example.org now"))
        s = s.where(d % 5 != 0,
                    s + pd.Series(d, index=s.index).map(
                        lambda i: f" from 10.{i % 256}.0.{i % 100} today"))
        s = s.where(d % 7 != 0,
                    s + pd.Series(d, index=s.index).map(
                        lambda i: f" call +1-555-{1000 + i % 9000} soon"))
        out = {"doc_id": d}
        out.update(tx.pii_scan(s))
        out["redacted"] = tx.pii_redact(s)
        return pd.DataFrame(out)

    return ds.map_batches(f, batch_format="pandas")


def q_repetition_stats_documents(sf_dir: str):
    """Gopher-style repetition signals per document (functions/
    text.repetition_features): word count, distinct-word fraction,
    top-word fraction, top-bigram fraction, longest same-word run —
    the repetition-quality filter of a crawl-curation pipeline, fully
    vectorized per batch and embarrassingly parallel (no shuffle).
    Fractions rounded to 6 to match the SQL oracle."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        r = tx.repetition_features(df["text"])
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "n_words": r["n_words"],
            "uniq_word_frac": rnd(r["uniq_word_frac"], 6),
            "top_word_frac": rnd(r["top_word_frac"], 6),
            "top_bigram_frac": rnd(r["top_bigram_frac"], 6),
            "max_word_run": r["max_word_run"],
        })

    return ds.map_batches(f, batch_format="pandas")


def q_lang_detect_documents(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["doc_id"], "lang": df["lang"],
                             "lang_pred": tx.detect_language(df["text"])})

    return ds.map_batches(f, batch_format="pandas")


def q_lang_confusion_documents(sf_dir: str):
    """Language-ID confusion matrix — declared `lang` column vs the
    n-gram detector (the label-quality audit that tells you whether
    the metadata or the detector drifts): per-batch (lang, lang_pred)
    count partials fold once; output is the full confusion table with
    per-cell recall share. Deterministic detector => fixture oracle."""
    ds = _read(sf_dir, "documents", ["text", "lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({"lang": df["lang"],
                          "lang_pred": tx.detect_language(df["text"]),
                          "n": 1.0})
        return t.groupby(["lang", "lang_pred"], as_index=False).sum()

    m = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["lang", "lang_pred"], {"n": "sum"})
    tot = m.groupby("lang")["n"].transform("sum")
    out = pd.DataFrame({"lang": m["lang"], "lang_pred": m["lang_pred"],
                        "n": m["n"].astype("int64"),
                        "share": rnd(m["n"] / tot, 6)})
    return out.sort_values(["lang", "lang_pred"]).reset_index(drop=True)


def q_minhash_dedup_documents(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dd.minhash_dedup(ds, threshold=0.8)


def q_ngram_jaccard_documents(sf_dir: str):
    """EXACT word-trigram Jaccard similarity join (sets filtered to
    shingles with document frequency <= 64, threshold 0.5) — deterministic
    set algebra, so the DuckDB oracle mirrors it bit-for-bit (unlike the
    probabilistic MinHash/SimHash candidate generators).
    See stages/dedup.ngram_jaccard_pairs for the 100-TB shape."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = dd.ngram_jaccard_pairs(ds, n=3, max_df=64, threshold=0.5)
    out["jaccard"] = rnd(out["jaccard"], 6)
    return out


def q_editdist_dedup_documents(sf_dir: str):
    """Fuzzy-dedup verification (stages/dedup.edit_verify_pairs): n-gram
    Jaccard candidate pairs confirmed by normalized character edit
    similarity 1 - lev/max(len) — lev matches DuckDB's levenshtein()
    bit-for-bit (fuzz-tested), and the division is IEEE-identical on both
    sides, so the oracle is exact."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = dd.ngram_jaccard_pairs(ds, n=3, max_df=64, threshold=0.5)
    out = dd.edit_verify_pairs(ds, pairs)
    out["jaccard"] = rnd(out["jaccard"], 6)
    return out


def q_contamination_documents(sf_dir: str):
    """Benchmark decontamination scan (stages/dedup.contamination_stats):
    docs with doc_id % 101 == 0 stand in for the held-out eval set; every
    other document is scanned for 8-gram (stride 1) overlap with the eval
    n-gram inventory — one broadcast of the small eval key set, one
    shuffle-free corpus pass. Exact set semantics ⇒ DuckDB oracle."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def is_eval(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["doc_id"] % 101 == 0]

    def is_corpus(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["doc_id"] % 101 != 0]

    return dd.contamination_stats(
        ds.map_batches(is_corpus, batch_format="pandas"),
        ds.map_batches(is_eval, batch_format="pandas"), window=8)


def q_dup_spans_documents(sf_dir: str):
    """Duplicated-substring stats (stages/dedup.dup_span_stats): Lee-et-
    al.-style hash-windowed substring dup detection — window=8 tokens,
    stride=4, literal single-space tokenization so the DuckDB oracle's
    string_split windows match token-for-token. Deterministic set
    counting ⇒ exact D oracle (the md5-64 key vs raw-window-string
    grouping are collision-equivalent at test scale)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dd.dup_span_stats(ds, window=8, stride=4)


def q_simhash_documents(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dd.simhash_table(ds)


def q_doc_fingerprints(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "fingerprint": np.array([tx.rolling_fingerprint(t)
                                     for t in df["text"].fillna("")],
                                    dtype=np.uint64).astype(np.int64),
        })

    return ds.map_batches(f, batch_format="pandas")


# ------------------------------------------------------------ embeddings

EMB_DUP_OFFSET = 1_000_000


def q_embedding_dedup_embeddings(sf_dir: str):
    """Embedding near-duplicate pairs: random-hyperplane LSH buckets +
    exact cosine verification in buckets (stages/dedup.embedding_near_dup).
    The synthetic embeddings table has no near-dups (max pairwise cosine
    ≈0.51), so every 10th vector gets a deterministic perturbed copy
    (id + EMB_DUP_OFFSET, seed = vec_id) injected in the read pass — the
    operator must recover those pairs. Fixed-seed planes + seeded noise ⇒
    fixture oracle; cosine rounded so the hash compare is stable across
    BLAS reduction orders."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def inject(df: pd.DataFrame) -> pd.DataFrame:
        src = df[df["vec_id"] % 10 == 0]
        dup_rows = []
        for vid, emb in zip(src["vec_id"], src["embedding"]):
            v = np.asarray(emb, dtype=np.float64)
            noise = np.random.default_rng(int(vid)).normal(0, 0.02, len(v))
            dup_rows.append({"vec_id": int(vid) + EMB_DUP_OFFSET,
                             "embedding": v + noise})
        return pd.concat([df, pd.DataFrame(dup_rows)], ignore_index=True)

    ds = ds.map_batches(inject, batch_format="pandas")
    pairs = dd.embedding_near_dup(ds, vec_col="embedding", id_col="vec_id",
                                  threshold=0.9)
    if pairs.empty:
        return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                             "id_b": pd.Series([], dtype=np.int64),
                             "cosine": pd.Series([], dtype=np.float64)})
    pairs["cosine"] = rnd(pairs["cosine"], 6)
    return pairs.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def q_semantic_dedup_embeddings(sf_dir: str):
    """SemDeDup semantic dedup (stages/similarity.semantic_dedup): k-means
    clusters then greedy cosine leader dedup inside each cluster. Same
    injection as embedding_dedup (the synthetic table has no near-dups):
    every 10th vector gets a seeded perturbed copy the operator must fold
    onto its source. Deterministic (seeded k-means, id-ordered leader
    scan) => fixture oracle."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def inject(df: pd.DataFrame) -> pd.DataFrame:
        src = df[df["vec_id"] % 10 == 0]
        dup_rows = []
        for vid, emb in zip(src["vec_id"], src["embedding"]):
            v = np.asarray(emb, dtype=np.float64)
            noise = np.random.default_rng(int(vid)).normal(0, 0.02, len(v))
            dup_rows.append({"vec_id": int(vid) + EMB_DUP_OFFSET,
                             "embedding": v + noise})
        return pd.concat([df, pd.DataFrame(dup_rows)], ignore_index=True)

    ds = ds.map_batches(inject, batch_format="pandas")
    out = sim.semantic_dedup(ds, k=8, tau=0.95, iters=5, seed=0)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["keep"] = df["keep"].astype(bool)
        return df

    return out.map_batches(fin, batch_format="pandas")


def q_embedding_norms(sf_dir: str):
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        V = np.stack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
        return pd.DataFrame({"vec_id": df["vec_id"],
                             "l2_norm": rnd(np.linalg.norm(V, axis=1), 4)})

    return ds.map_batches(f, batch_format="pandas")


def q_similarity_topk_embeddings(sf_dir: str):
    """Exact cosine top-10 to the embedding of vec_id=0 (broadcast query)."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    # expression filter => predicate pushdown at the scan, no per-row UDF
    q = emb.filter(expr="vec_id == 0").to_pandas()["embedding"].iloc[0]
    out = sim.brute_force_topk(emb, np.asarray(q, dtype=np.float64), k=10,
                               exclude_ids={0})
    out = out.drop(columns=["query_idx"])
    out["cosine"] = rnd(out["cosine"], 6)
    out["vec_id"] = out["vec_id"].astype("int64")
    return out.reset_index(drop=True)


def q_ann_ivf_embeddings(sf_dir: str):
    """IVF-bucketed approximate top-10 (rows-only; recall tested in pytest)."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    sample = emb.limit(4).to_pandas()
    queries = np.stack([np.asarray(v, dtype=np.float64)
                        for v in sample["embedding"]])
    code = sim.train_ivf_codebook(emb, n_cells=16)
    out = sim.ivf_topk(emb, queries, code, k=10, nprobe=4)
    out["cosine"] = rnd(out["cosine"], 6)
    return out


def q_ann_pq_embeddings(sf_dir: str):
    """Product-quantization ANN with exact re-rank (Jegou et al. 2011):
    32x-compressed coded scan -> ADC shortlist -> exact cosine top-10.
    The 100-TB embedding path (recall 1.0 at rerank_factor=4 on this
    corpus, pinned in pytest)."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    sample = emb.limit(4).to_pandas()
    queries = np.stack([np.asarray(v, dtype=np.float64)
                        for v in sample["embedding"]])
    books = sim.train_pq_codebooks(emb, m=16, ks=256)
    codes = sim.pq_encode(emb, books)
    out = sim.pq_topk_rerank(emb, codes, queries, books, k=10,
                             rerank_factor=4)
    out["cosine"] = rnd(out["cosine"], 6)
    return out


# ------------------------------------------------------------ series (rows-only)

def _series_events(sf_dir: str, checks):
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    out = series_mod.apply_series_checks(ds, "user_id", ["ts", "event_id"],
                                         "value", checks, keep_status=False)
    return out.select_columns(["event_id"] +
                              [f"{c['name']}_code" for c in checks])


def q_matrix_profile_events(sf_dir: str):
    """Matrix-profile discord check per user series (functions/matprof:
    STOMP self-join, Yeh 2016 / Zhu 2016): flags subsequences whose
    nearest-neighbor distance is a robust-z outlier of the profile —
    shape anomalies that window statistics miss because each point is
    locally in-band. Deterministic (no RNG) => fixture oracle; brute-
    force definitional parity pinned in tests/test_matprof.py."""
    return _series_events(sf_dir, [{"name": "mpf",
                                    "kernel": "matrix_profile",
                                    "params": {"m": 16, "threshold": 6.0}}])


def q_changepoint_events(sf_dir: str):
    """Optimal multiple-changepoint audit per user series
    (functions/changepoint: exact PELT, Killick 2012, BIC penalty with
    a level-shift-immune first-difference noise estimate) — recovers
    WHERE a source's level changed after the fact, complementing the
    sequential CUSUM kernel that raises WHILE drift accumulates. Exact
    optimality pinned against a full O(n²) DP in tests/test_changepoint.
    Deterministic => fixture oracle."""
    return _series_events(sf_dir, [{"name": "cp", "kernel": "changepoint",
                                    "params": {"min_size": 5}}])


def q_ema_check_events(sf_dir: str):
    return _series_events(sf_dir, [{"name": "ema", "kernel": "ema",
                                    "params": {"N": 10, "UL": EV_UL, "LL": EV_LL,
                                               "warning_stages": EV_WS}}])


def q_macd_check_events(sf_dir: str):
    return _series_events(sf_dir, [{"name": "macd", "kernel": "macd",
                                    "params": {"period1": 5, "period2": 15,
                                               "UL": 30, "LL": -30,
                                               "warning_stages": [0.5]}}])


def q_cusum_events(sf_dir: str):
    """Two-sided CUSUM drift scorer (Page 1954; functions/rolling.
    cusum_check) — beyond the reference's scorer set, the classic
    change-point detector the drift checks lacked. No-reset prefix-scan
    form => pure window-SQL oracle."""
    return _series_events(sf_dir, [{"name": "cusum", "kernel": "cusum",
                                    "params": {"UL": EV_UL, "LL": EV_LL,
                                               "k": 0.25, "h": 2.0}}])


def q_cusum_reset_events(sf_dir: str):
    """CUSUM with post-alarm restart (functions/rolling.cusum_reset_check)
    — the self-restarting chart; sequential per series, recursive-CTE
    oracle."""
    return _series_events(sf_dir, [{"name": "cusumr", "kernel": "cusum_reset",
                                    "params": {"UL": EV_UL, "LL": EV_LL,
                                               "k": 0.25, "h": 2.0}}])


def q_hampel_events(sf_dir: str):
    return _series_events(sf_dir, [{"name": "hp", "kernel": "hampel",
                                    "params": {"W": 5, "K": 1.4826, "n_sigmas": 3}}])


def q_percentile_events(sf_dir: str):
    return _series_events(sf_dir, [{"name": "pct", "kernel": "percentile",
                                    "params": {"buff_size": 30, "lo": 2, "hi": 98}}])


def q_cumulative_events(sf_dir: str):
    return _series_events(sf_dir, [{"name": "cum", "kernel": "cumulative",
                                    "params": {"decay": 0.05, "averaging": 5,
                                               "warning_stages": [0.5]}}])


def q_linear_fit_events(sf_dir: str):
    return _series_events(sf_dir, [{"name": "lf", "kernel": "linear_fit",
                                    "params": {"N": 15, "UL": 20, "LL": -20,
                                               "confidence_norm": 1000,
                                               "warning_stages": [0.5]}}])


def q_filtering_events(sf_dir: str):
    return _series_events(sf_dir, [{"name": "flt", "kernel": "filtering",
                                    "params": {"filter_order": 3,
                                               "cutoff_frequency": 0.4, "mode": 0,
                                               "UL": EV_UL, "LL": EV_LL,
                                               "warning_stages": EV_WS}}])


def q_ema_percentile_events(sf_dir: str):
    return _series_events(sf_dir, [{"name": "ep", "kernel": "ema_percentile",
                                    "params": {"percentile": 95, "window": 50,
                                               "start_on": 10, "period": 10}}])


def q_rrcf_events(sf_dir: str):
    """Robust random cut forest sketch per user series (from-scratch RRCF,
    stages/rrcf.py; rows-only — randomized sketch, seeded)."""
    return _series_events(sf_dir, [{"name": "rr", "kernel": "rrcf",
                                    "params": {"num_trees": 8, "tree_size": 32,
                                               "threshold": 12.0, "seed": 42}}])


def q_trend_classification_events(sf_dir: str):
    return _series_events(sf_dir, [{"name": "tc",
                                    "kernel": "trend_classification",
                                    "params": {"N": 20, "averaging": 3,
                                               "prediction_conv": 5,
                                               "warning_stages": [0.5],
                                               "amp_scale": 50.0}}])


def q_trend_mlp_events(sf_dir: str):
    """Trend classification with the reference's LEARNED classifier — the
    seeded numpy MLP trained on synthetic ramps (stages/trend.py,
    trend_classification.py:154-193); deterministic ⇒ fixture oracle."""
    return _series_events(sf_dir, [{"name": "tm",
                                    "kernel": "trend_classification",
                                    "params": {"N": 20, "averaging": 3,
                                               "prediction_conv": 5,
                                               "warning_stages": [0.5],
                                               "amp_scale": 50.0,
                                               "num_samples": 1500,
                                               "train_noise": 0.01,
                                               "seed": 0}}])


def q_repair_events(sf_dir: str):
    """LastNAverage suggested-value repair of border-check Errors
    (normalization.py semantics; rows-only — the repaired value feeds back
    into the normalization memory, an order-dependent recurrence)."""
    from ..stages import normalize as norm_mod
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    ds = ds.map_batches(
        lambda t: border_stage(t, "value", EV_UL, EV_LL, [], prefix="bc"),
        batch_format="pyarrow")
    out = norm_mod.apply_repair(ds, "user_id", ["ts", "event_id"], "value",
                                "bc_code", N=5)
    return out.select_columns(["event_id", "bc_code", "suggested_value"])


def q_percent_score_events(sf_dir: str):
    """Windowed PercentScore meta-signal over border+welford verdicts per
    user (combination.py:178-218; rows-only — trailing event-time window)."""
    from ..stages import normalize as norm_mod
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    ds = ds.map_batches(
        lambda t: border_stage(t, "value", EV_UL, EV_LL, EV_WS, prefix="bc"),
        batch_format="pyarrow")
    ds = series_mod.apply_series_checks(
        ds, "user_id", ["ts", "event_id"], "value",
        [{"name": "wf", "kernel": "welford",
          "params": {"X": WF_X, "N": WF_N, "warning_stages": []}}],
        keep_status=False)
    out = norm_mod.apply_percent_score(ds, "user_id", ["ts", "event_id"],
                                       ["bc_code", "wf_code"], "ts",
                                       interval=3600.0, data_interval=60.0)
    return out.select_columns(["event_id", "percent_score"])


def q_feature_construction_events(sf_dir: str):
    """Sliding-window feature vectors (averages+shifts+time features) per
    user series — the §2.3 feature builder, intended semantics (rows-only)."""
    from ..stages import features as feat_mod
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    cfg = feat_mod.FeatureConfig(
        n_features=1, averages=[[2, 5]], shifts=[[1, 2]],
        periodic_averages=[[(2, [3])]], time_features=["hour", "weekday"])
    out = feat_mod.apply_feature_construction(
        ds, "user_id", ["ts", "event_id"], ["value"], "ts", cfg)
    keep = ["event_id"] + [f"fv{j}" for j in range(8)] + ["fv_valid"]
    return out.select_columns(keep)


def q_iforest_events(sf_dir: str):
    """Isolation-forest scoring of (value, hour-of-day) feature rows — model
    fit once on a driver-side sample, scored by an actor pool (rows-only;
    determinism pinned by seed)."""
    from ..stages import iforest as if_mod
    ds = _read(sf_dir, "events", ["event_id", "ts", "value"])

    def featurize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_id": df["event_id"], "value": df["value"],
                             "hour": df["ts"].dt.hour.astype("float64")})

    feats = ds.map_batches(featurize, batch_format="pandas")
    model = if_mod.fit_from_dataset(feats, ["value", "hour"],
                                    sample_rows=2048, n_trees=50,
                                    max_samples=256, seed=42)
    out = if_mod.score_stage(feats, model, ["value", "hour"], concurrency=2)
    return out.select_columns(["event_id", "if_code", "if_score"])


def q_pca_iforest_events(sf_dir: str):
    """PCA(1) projection then isolation forest (pca.py semantics, rows-only)."""
    from ..stages import iforest as if_mod
    ds = _read(sf_dir, "events", ["event_id", "ts", "value"])

    def featurize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_id": df["event_id"], "value": df["value"],
                             "hour": df["ts"].dt.hour.astype("float64")})

    feats = ds.map_batches(featurize, batch_format="pandas")
    df = feats.limit(2048).to_pandas()
    X = df[["value", "hour"]].to_numpy(dtype=np.float64)
    X = X[~np.isnan(X).any(axis=1)]
    pca, forest = if_mod.fit_pca_iforest(X, n_components=1, n_trees=50,
                                         max_samples=256, seed=42)
    out = if_mod.pca_score_stage(feats, pca, forest, ["value", "hour"],
                                 concurrency=2)
    return out.select_columns(["event_id", "pca_code", "pca_score"])


def q_forecast_band_events(sf_dir: str):
    """Nearest-timestamp (as-of) forecast-band check: band table from the
    trailing-window naive forecast, broadcast join, vectorized lookup
    (fb_prophet.py:132-145 semantics without Prophet; rows-only)."""
    from ..stages import asof as asof_mod
    ds = _read(sf_dir, "events", ["event_id", "ts", "value"])
    forecast = asof_mod.naive_forecast(ds, window_s=21600.0, X=4.0)
    out = asof_mod.forecast_band_check(ds, forecast)
    return out.select_columns(["event_id", "fb_code"])


def q_autoencoder_events(sf_dir: str):
    """Linear-autoencoder reconstruction-error check with adaptive
    exp-weighted threshold (gan.py mechanics, PCA codec; rows-only)."""
    from ..stages import autoencoder as ae_mod
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    train = ds.limit(2048).to_pandas()["value"].to_numpy(dtype=np.float64)
    model = ae_mod.LinearAutoencoder(N_shifts=3, N_latent=2).fit(
        train[~np.isnan(train)])
    kernel = ae_mod.make_autoencoder_kernel(model, K=3.0, len_window=50)
    out = series_mod.apply_series_checks(
        ds, "user_id", ["ts", "event_id"], "value",
        [{"name": "ae", "kernel": kernel, "params": {}}], keep_status=False)
    return out.select_columns(["event_id", "ae_code"])


def q_gan_autoencoder_events(sf_dir: str):
    """GAN-parity check: numpy MLP autoencoder with the reference's layer
    stack (gan.py:296-325), reconstruction error + exp-weighted adaptive
    threshold (gan.py:151-175). Seeded fit on a head sample, scored
    per-series; deterministic ⇒ fixture oracle."""
    from ..stages import autoencoder as ae_mod
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    train = ds.limit(2048).to_pandas()["value"].to_numpy(dtype=np.float64)
    model = ae_mod.MLPAutoencoder(N_shifts=9, N_latent=3).fit(
        train[~np.isnan(train)])
    kernel = ae_mod.make_autoencoder_kernel(model, K=1.5, len_window=100)
    out = series_mod.apply_series_checks(
        ds, "user_id", ["ts", "event_id"], "value",
        [{"name": "gan", "kernel": kernel, "params": {}}], keep_status=False)
    return out.select_columns(["event_id", "gan_code"])


def q_seasonal_band_events(sf_dir: str):
    """Seasonal-decomposition forecast-band check: one distributed training
    pass (OLS trend + daily per-hour seasonal residual ± X·std band,
    fb_prophet.py:16-199 mechanics), nearest-grid-point as-of match
    (DuckDB-oracled: closed-form replay in SQL)."""
    from ..stages import asof as asof_mod
    ds = _read(sf_dir, "events", ["event_id", "ts", "value"])
    forecast = asof_mod.seasonal_forecast(ds, X=4.0)
    out = asof_mod.forecast_band_check(ds, forecast, prefix="szn")
    return out.select_columns(["event_id", "szn_code"])


def q_asof_join_events(sf_dir: str):
    """Distributed as-of join (large right side — no broadcast): each
    'error' event matched to the most recent 'signup' event with
    ``signup.ts <= error.ts`` by the same user. One co-partitioning
    shuffle (tag + union + groupby(user_id)), vectorized searchsorted per
    group (stages/asof.asof_join); oracle = DuckDB ``ASOF JOIN``."""
    from ..stages import asof as asof_mod
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type",
                                  "value"])
    left = ev.filter(expr="event_type == 'error'").drop_columns(["event_type"])
    right = ev.filter(expr="event_type == 'signup'").drop_columns(["event_type"])
    out = asof_mod.asof_join(left, right, key="user_id", ts_col="ts",
                             left_cols=["event_id", "value"],
                             right_cols=["value"], suffix="_signup",
                             lag_col="lag_s",
                             left_types={"event_id": pa.int64(),
                                         "value": pa.float64()},
                             right_types={"value": pa.float64()})

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"].astype(np.int64),
            "user_id": df["user_id"].astype(np.int64),
            "value": rnd(df["value"], 4),
            "signup_value": rnd(df["value_signup"], 4),
            "lag_s": rnd(df["lag_s"], 3),
        })

    return out.map_batches(fin, batch_format="pandas")


def q_stream_validation_events(sf_dir: str):
    """Streaming micro-batch validation (sources/streaming.StreamRunner —
    the Kafka-loop equivalent): the events table is replayed as 4 message
    CSVs polled one at a time; BorderCheck + global Welford grade each
    micro-batch with warm-started state, so the collected verdicts equal a
    batch run over the full history (DuckDB-oracled). event_id rides the
    message ``labelInfo`` passthrough column."""
    import glob
    import shutil
    import tempfile

    from ..sources.streaming import StreamRunner

    df = (_read(sf_dir, "events", ["event_id", "ts", "value"])
          .to_pandas().sort_values("ts").reset_index(drop=True))
    sec = (df["ts"] - pd.Timestamp(0)).dt.total_seconds()
    msgs = pd.DataFrame({"timestamp": sec, "ftr_vector": df["value"],
                         "labelInfo": df["event_id"]})
    topic = tempfile.mkdtemp(prefix="adr_stream_topic_")
    staged = tempfile.mkdtemp(prefix="adr_stream_staged_")
    out = tempfile.mkdtemp(prefix="adr_stream_out_")
    try:
        n_files = 4
        step = (len(msgs) + n_files - 1) // n_files
        for i in range(n_files):
            msgs.iloc[i * step:(i + 1) * step].to_csv(
                os.path.join(topic, f"batch-{i:04d}.csv"), index=False,
                float_format="%.6f")
        conf = {"anomaly_detection_alg": ["BorderCheck()", "Welford()"],
                "anomaly_detection_conf": [
                    {"input_vector_size": 1, "UL": EV_UL, "LL": EV_LL,
                     "warning_stages": list(EV_WS)},
                    {"N": WF_N, "X": WF_X, "warning_stages": []}]}
        runner = StreamRunner(conf, staged, out, state_rows=4 * WF_N)
        for f in sorted(os.listdir(topic)):  # one poll per producer batch
            os.link(os.path.join(topic, f), os.path.join(staged, f))
            runner.poll_once()
        parts = [pd.read_parquet(p) for p in
                 sorted(glob.glob(os.path.join(out, "poll=*")))]
        got = pd.concat(parts, ignore_index=True)
        got = got[~got["__warm__"]]
        return pd.DataFrame({
            "event_id": got["labelInfo"].astype(np.int64),
            "sbc_code": got["a0_bordercheck_code"].astype(np.int8),
            "swf_code": got["a1_welford_code"].astype(np.int8),
        }).sort_values("event_id").reset_index(drop=True)
    finally:
        for d in (topic, staged, out):
            shutil.rmtree(d, ignore_errors=True)


def q_eval_f1_events(sf_dir: str):
    """Labelled-evaluation harness (pipelines/evaluate.py; reference
    Test.py + AnomalyDetectorWrapper.py intent): ground-truth label =
    border rule (value outside [LL, UL]), predictor = per-user windowed
    Welford; returns the one-row confusion table with precision/recall/F1
    (DuckDB-oracled)."""
    from .evaluate import confusion_counts
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def lab(t: pa.Table) -> pa.Table:
        v = t["value"]
        y = pc.and_(pc.invert(pc.is_nan(pc.fill_null(v, 0.0))),
                    pc.or_(pc.greater(v, EV_UL), pc.less(v, EV_LL)))
        return t.append_column("label", pc.fill_null(y, False))

    ds = ds.map_batches(lab, batch_format="pyarrow")
    ds = series_mod.apply_series_checks(
        ds, "user_id", ["ts", "event_id"], "value",
        [{"name": "wf", "kernel": "welford",
          "params": {"X": WF_X, "N": WF_N, "warning_stages": []}}],
        keep_status=False)
    m = confusion_counts(ds, ["wf_code"], "label")
    return pd.DataFrame([m])


def q_reference_config_borders(sf_dir: str):
    """Run a reference-schema JSON config (BorderCheck) through the config
    compatibility layer over the events table (rows-only)."""
    from .config import run_reference_config
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    conf = {"anomaly_detection_alg": ["BorderCheck()"],
            "anomaly_detection_conf": [{
                "input_vector_size": 1, "UL": EV_UL, "LL": EV_LL,
                "warning_stages": list(EV_WS)}]}
    out = run_reference_config(conf, ds=ds, key_col="user_id",
                               value_col="value")
    return out.select_columns(["event_id", "a0_bordercheck_code"])


def q_clustering_events(sf_dir: str):
    """DBSCAN-core distance check (clustering.py semantics, rows-only)."""
    import ray as _ray

    from ..stages import iforest as if_mod
    ds = _read(sf_dir, "events", ["event_id", "value"])
    sample = ds.limit(512).to_pandas()
    X = sample[["value"]].to_numpy(dtype=np.float64)
    X = X[~np.isnan(X).any(axis=1)]
    model = if_mod.DBSCANCoreModel(eps=5.0, min_samples=4, treshold=25.0).fit(X)
    model_ref = _ray.put(model)
    out = ds.map_batches(if_mod.ClusteringScore,
                         fn_constructor_kwargs={"model_ref": model_ref,
                                                "feature_cols": ["value"]},
                         batch_format="pyarrow", batch_size=8192,
                         concurrency=2, num_cpus=1)
    return out.select_columns(["event_id", "cl_code"])


# ------------------------------------------------------------ clip table

_CLIP_N = {"0.001": 1200, "0.01": 3000, "0.1": 8000}


def _clip_table_path(sf_dir: str) -> str:
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    n = _CLIP_N.get(sf, 1200)
    path = f"/tmp/adr_clips/sf{sf}"
    from .. import synth
    synth.write_clip_table(path, seed=42, n=n, P=16, rows_per_file=1024)
    return path


_IMG_N = {"0.001": 400, "0.01": 1000, "0.1": 4000}


def _image_table_path(sf_dir: str) -> str:
    """Deterministic PNG image table (idempotent /tmp cache, like the clip
    table): one row per image, seed = row index — independent of
    partitioning, so any parallelism yields identical bytes."""
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    n = _IMG_N.get(sf, 400)
    path = f"/tmp/adr_imgs/sf{sf}"
    done = os.path.join(path, "_done")
    if not os.path.exists(done):
        import shutil
        shutil.rmtree(path, ignore_errors=True)
        from .. import image as img

        def gen(b: pd.DataFrame) -> pd.DataFrame:
            ids, payloads = [], []
            for i in b["id"]:
                ids.append(f"img{int(i):06d}")
                payloads.append(img.encode_png(img.synth_image(seed=int(i))))
            return pd.DataFrame({"img_id": ids, "image": payloads})

        rd.range(n).map_batches(gen, batch_size=128,
                                batch_format="pandas").write_parquet(path)
        open(done, "w").close()
    return path


def q_image_decode_features(sf_dir: str):
    """REAL PNG decode over the deterministic image table (stdlib codec,
    image.py — no PIL): dimensions + Rec.601 mean luma per image via the
    ImageDecode actor pool, payload-aware small batches. Deterministic
    => fixture oracle."""
    from ..stages.multimodal import ImageDecode
    from ..stages.sizing import pool_size
    path = _image_table_path(sf_dir)
    ds = rd.read_parquet(path)
    out = ds.map_batches(ImageDecode,
                         fn_constructor_kwargs={"bytes_col": "image"},
                         batch_format="pyarrow", batch_size=64,
                         concurrency=pool_size(0), num_cpus=1)

    def fin(t: pa.Table) -> pa.Table:
        return t.set_column(t.schema.get_field_index("mean_luma"),
                            "mean_luma", pa.array(rnd(t["mean_luma"].to_numpy(
                                zero_copy_only=False), 4)))

    return (out.map_batches(fin, batch_format="pyarrow")
            .select_columns(["img_id", "height", "width", "channels",
                             "mean_luma"]))


def q_expectations_orders(sf_dir: str):
    """Declarative constraint suite over orders (stages/expectations.py):
    schema dtype, not-null, range (with a GE-style 'mostly' tolerance),
    value-set, full-match regex, string length, key uniqueness, and a
    broadcast referential check against customer — all row-local checks
    compiled into ONE vectorized Arrow pass, partial counts folded
    cardinality-aware. Summary is fully D-oracled (counts + pass/fail)."""
    from ..stages import expectations as ex
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderstatus",
                    "o_totalprice", "o_orderpriority"])
    cust = _read(sf_dir, "customer",
                 ["c_custkey"]).to_pandas()["c_custkey"].to_numpy()
    suite = [
        {"check": "dtype", "column": "o_orderkey", "type": "int64"},
        {"check": "not_null", "column": "o_custkey"},
        {"check": "in_range", "column": "o_totalprice",
         "min": 900.0, "max": 200000.0, "mostly": 0.95},
        {"check": "in_set", "column": "o_orderstatus",
         "values": ["O", "F"]},
        {"check": "regex", "column": "o_orderpriority",
         "pattern": "[1-5]-[A-Z]+"},
        {"check": "str_len_between", "column": "o_orderstatus",
         "min": 1, "max": 1},
        {"check": "unique", "column": "o_orderkey"},
        {"check": "referential", "column": "o_custkey", "ref": cust},
    ]
    return ex.run_expectations(orders, suite)


def q_expectations_by_status(sf_dir: str):
    """Per-GROUP constraint verdicts (run_expectations_by) — the
    declarative form of the flagship's per-partition pass/fail: the same
    suite graded independently per o_orderstatus group, one streaming pass
    of per-batch per-group partials. D-oracled (GROUP BY CASE sums)."""
    from ..stages import expectations as ex
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderstatus",
                    "o_totalprice"])
    suite = [
        {"check": "not_null", "column": "o_custkey"},
        {"check": "in_range", "column": "o_totalprice",
         "min": 900.0, "max": 200000.0, "mostly": 0.95},
        {"check": "unique", "column": "o_orderkey"},
    ]
    return ex.run_expectations_by(orders, suite, by="o_orderstatus")


def q_profile_events(sf_dir: str):
    """Single-pass column profiler (stages/stats.profile_table — the
    engine's `describe`) over events' numeric columns: counts, null/NaN
    accounting, min/max/mean/std from merged Welford partials. D-oracled
    against SQL aggregates."""
    from ..stages.stats import profile_table
    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])
    return profile_table(ds).drop(columns=["min_str", "max_str"])


def q_expectations_events_order(sf_dir: str):
    """Ordered per-key monotonicity checks (non_decreasing) over events:
    event time must not regress per user (passes, 0 violations) and the
    gauge value graded as a counter (fails — real descent counts). One
    series shuffle per check; D-oracled via SQL LAG windows."""
    from ..stages import expectations as ex
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    suite = [
        {"check": "non_decreasing", "column": "ts", "by": "user_id",
         "order_by": ["ts", "event_id"]},
        {"check": "non_decreasing", "column": "value", "by": "user_id",
         "order_by": ["ts", "event_id"], "mostly": 0.3},
    ]
    return ex.run_expectations(ds, suite)


def q_expectations_lineitem(sf_dir: str):
    """Cross-column invariants (col_compare) over lineitem: unit price
    floor (extendedprice >= 1000×quantity, with tolerance) and the
    discount-vs-tax comparison — plus range/null basics. D-oracled."""
    from ..stages import expectations as ex
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_quantity", "l_extendedprice",
                "l_discount", "l_tax"])
    suite = [
        {"check": "not_null", "column": "l_orderkey"},
        {"check": "in_range", "column": "l_quantity", "min": 1, "max": 50},
        {"check": "in_range", "column": "l_discount",
         "min": 0.0, "max": 0.1},
        {"check": "col_compare", "column": "l_extendedprice", "op": ">=",
         "other": "l_quantity", "scale": 1000, "mostly": 0.7},
        {"check": "col_compare", "column": "l_discount", "op": "<=",
         "other": "l_tax"},
    ]
    return ex.run_expectations(li, suite)


CLIP_SUITE = [
    # the north-star input contract (BASELINE.json input_hint) as a
    # declarative suite: each check catches one injected synth defect class
    {"check": "dtype", "column": "sr_hz", "type": "int32"},
    {"check": "regex", "column": "clip_id", "pattern": "clip-[0-9]{9}"},
    {"check": "unique", "column": "clip_id"},                 # dup
    {"check": "not_null", "column": "sr_hz"},                 # null_meta
    {"check": "in_set", "column": "sr_hz",
     "values": [8000, 16000, 22050, 44100]},                  # sr_range
    {"check": "in_range", "column": "dur_ms",
     "min": 200, "max": 15000},                               # dur_outlier
    {"check": "in_set", "column": "codec",
     "values": ["pcm_s16le", "flac", "opus", "mp3", "amr"]},
    {"check": "not_null", "column": "transcript"},            # missing (None)
    {"check": "str_len_between", "column": "transcript",
     "min": 1},                                               # missing ("")
]


def q_expectations_clips(sf_dir: str):
    """The declarative suite over the north-star clip table: metadata-only
    pruned read (bytes never leave storage), every injected defect class
    caught by its constraint. Deterministic synth => fixture oracle;
    ground-truth parity pinned in tests/test_expectations.py."""
    from ..stages import expectations as ex
    path = _clip_table_path(sf_dir)
    ds = rd.read_parquet(path, columns=["clip_id", "sr_hz", "dur_ms",
                                        "codec", "transcript"])
    return ex.run_expectations(ds, CLIP_SUITE)


_JPEG_N = {"0.001": 200, "0.01": 500, "0.1": 2000}


def _jpeg_table_path(sf_dir: str) -> str:
    """Deterministic JPEG image table: per-row quality / subsampling /
    grayscale mix so the decoder's full surface (4:4:4/4:2:2/4:2:0, gray,
    restart markers) is exercised distributed. Seed = row index —
    partitioning-invariant bytes, same pattern as the PNG table."""
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    n = _JPEG_N.get(sf, 200)
    path = f"/tmp/adr_jpegs/sf{sf}"
    done = os.path.join(path, "_done")
    if not os.path.exists(done):
        import shutil
        shutil.rmtree(path, ignore_errors=True)
        from .. import image as img
        from .. import jpeg

        def gen(b: pd.DataFrame) -> pd.DataFrame:
            ids, payloads = [], []
            subs = ["444", "422", "420"]
            for i in b["id"]:
                i = int(i)
                ids.append(f"jpg{i:06d}")
                a = img.synth_image(seed=i, channels=1 if i % 5 == 4 else 3)
                payloads.append(jpeg.encode_jpeg(
                    a[:, :, 0] if i % 5 == 4 else a,
                    quality=70 + (i * 7) % 30, subsample=subs[i % 3],
                    restart_interval=4 if i % 7 == 0 else 0))
            return pd.DataFrame({"img_id": ids, "image": payloads})

        rd.range(n).map_batches(gen, batch_size=64,
                                batch_format="pandas").write_parquet(path)
        open(done, "w").close()
    return path


def q_jpeg_decode_features(sf_dir: str):
    """REAL baseline-JPEG decode over the deterministic JPEG table
    (stdlib+numpy codec, jpeg.py — no libjpeg/PIL): dimensions + Rec.601
    mean luma per image via the same ImageDecode actor pool as the PNG
    path. Deterministic => fixture oracle."""
    from ..stages.multimodal import ImageDecode
    from ..stages.sizing import pool_size
    path = _jpeg_table_path(sf_dir)
    ds = rd.read_parquet(path)
    out = ds.map_batches(ImageDecode,
                         fn_constructor_kwargs={"bytes_col": "image"},
                         batch_format="pyarrow", batch_size=64,
                         concurrency=pool_size(0), num_cpus=1)

    def fin(t: pa.Table) -> pa.Table:
        return t.set_column(t.schema.get_field_index("mean_luma"),
                            "mean_luma", pa.array(rnd(t["mean_luma"].to_numpy(
                                zero_copy_only=False), 4)))

    return (out.map_batches(fin, batch_format="pyarrow")
            .select_columns(["img_id", "height", "width", "channels",
                             "mean_luma"]))


def _webp_table_path(sf_dir: str) -> str:
    """Deterministic lossless-WebP image table (VP8L encoder from
    webp.py): per-row RGB / RGBA-with-alpha / grayscale mix. Seed = row
    index — partitioning-invariant bytes, same pattern as the PNG/JPEG
    tables."""
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    n = _JPEG_N.get(sf, 200)
    path = f"/tmp/adr_webps/sf{sf}"
    done = os.path.join(path, "_done")
    if not os.path.exists(done):
        import shutil
        shutil.rmtree(path, ignore_errors=True)
        from .. import image as img
        from .. import webp

        def gen(b: pd.DataFrame) -> pd.DataFrame:
            ids, payloads = [], []
            for i in b["id"]:
                i = int(i)
                ids.append(f"webp{i:06d}")
                a = img.synth_image(seed=i, channels=1 if i % 5 == 4 else 3)
                if i % 3 == 0 and a.shape[2] == 3:  # translucent variant
                    alpha = np.full(a.shape[:2] + (1,), 200, dtype=np.uint8)
                    a = np.concatenate([a, alpha], axis=2)
                payloads.append(webp.encode_webp_lossless(
                    a[:, :, 0] if i % 5 == 4 else a))
            return pd.DataFrame({"img_id": ids, "image": payloads})

        rd.range(n).map_batches(gen, batch_size=64,
                                batch_format="pandas").write_parquet(path)
        open(done, "w").close()
    return path


def q_webp_decode_features(sf_dir: str):
    """REAL lossless-WebP (VP8L) decode over the deterministic WebP table
    (stdlib+numpy codec, webp.py — no libwebp): dimensions + Rec.601 mean
    luma per image via the same ImageDecode actor pool as the PNG/JPEG
    paths. Deterministic => fixture oracle."""
    from ..stages.multimodal import ImageDecode
    from ..stages.sizing import pool_size
    path = _webp_table_path(sf_dir)
    ds = rd.read_parquet(path)
    out = ds.map_batches(ImageDecode,
                         fn_constructor_kwargs={"bytes_col": "image"},
                         batch_format="pyarrow", batch_size=64,
                         concurrency=pool_size(0), num_cpus=1)

    def fin(t: pa.Table) -> pa.Table:
        return t.set_column(t.schema.get_field_index("mean_luma"),
                            "mean_luma", pa.array(rnd(t["mean_luma"].to_numpy(
                                zero_copy_only=False), 4)))

    return (out.map_batches(fin, batch_format="pyarrow")
            .select_columns(["img_id", "height", "width", "channels",
                             "mean_luma"]))


_VIDEO_N = {"0.001": 40, "0.01": 100, "0.1": 400}


def _video_table_path(sf_dir: str) -> str:
    """Deterministic MJPEG/AVI video table (video.py writer over jpeg.py
    frames): per-row frame count / fps / size mix. Seed = row index."""
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    n = _VIDEO_N.get(sf, 40)
    path = f"/tmp/adr_videos/sf{sf}"
    done = os.path.join(path, "_done")
    if not os.path.exists(done):
        import shutil
        shutil.rmtree(path, ignore_errors=True)
        from .. import image as img
        from .. import jpeg, video

        def gen(b: pd.DataFrame) -> pd.DataFrame:
            ids, payloads = [], []
            for i in b["id"]:
                i = int(i)
                ids.append(f"vid{i:06d}")
                nf = 4 + i % 5
                frames = [jpeg.encode_jpeg(
                    img.synth_image(seed=1000 * i + k), quality=85)
                    for k in range(nf)]
                payloads.append(video.encode_avi_mjpeg(
                    frames, fps=5 + i % 20))
            return pd.DataFrame({"vid_id": ids, "video": payloads})

        rd.range(n).map_batches(gen, batch_size=16,
                                batch_format="pandas").write_parquet(path)
        open(done, "w").close()
    return path


def q_video_frame_features(sf_dir: str):
    """REAL MJPEG/AVI frame sampling + decode over the deterministic video
    table (video.py container + jpeg.py frames): per-sampled-frame
    dimensions, timestamp and Rec.601 mean luma via the VideoFrameSample
    actor pool. Deterministic => fixture oracle."""
    from ..stages.multimodal import VideoFrameSample
    from ..stages.sizing import pool_size
    path = _video_table_path(sf_dir)
    ds = rd.read_parquet(path)
    out = ds.map_batches(VideoFrameSample,
                         fn_constructor_kwargs={"bytes_col": "video",
                                                "id_col": "vid_id",
                                                "n_frames": 3},
                         batch_format="pyarrow", batch_size=16,
                         concurrency=pool_size(0), num_cpus=1)

    def fin(t: pa.Table) -> pa.Table:
        return t.set_column(t.schema.get_field_index("mean_luma"),
                            "mean_luma", pa.array(rnd(t["mean_luma"].to_numpy(
                                zero_copy_only=False), 4)))

    return out.map_batches(fin, batch_format="pyarrow")


def q_clip_validation_verdicts(sf_dir: str):
    """Flagship pipeline per-partition verdicts on the deterministic clip
    table scaled to the sf (rows-only; ground truth tested in pytest)."""
    from .validate import ValidateConfig, run_validation
    path = _clip_table_path(sf_dir)
    out = os.path.join("/tmp/adr_out", os.path.basename(path))
    res = run_validation(path, out, ValidateConfig(seed=42, P=16), resume=False)
    return res["verdicts"]


def q_clip_audio_features(sf_dir: str):
    """Decoded audio features over the clip table (real WAV decode)."""
    from ..stages.multimodal import audio_features
    from ..sources.clips import read_clips
    path = _clip_table_path(sf_dir)
    ds = read_clips(path, columns=["clip_id", "bytes"])
    out = audio_features(ds)  # decode-heavy: auto pool sizing
    return out.select_columns(["clip_id", "rms", "peak", "audio_dur_s", "n_samples"])


def q_clip_spectral_features(sf_dir: str):
    """STFT spectral descriptors + VAD + clipping + blind SNR (spectral
    noise-floor, physics-pinned in test_audio_ops) + 4-valued
    audio-quality verdict per clip (stages/audio_ops.SpectralFeatures;
    ONE stft per clip feeds both kernels; deterministic => fixture
    oracle)."""
    from ..sources.clips import read_clips
    from ..stages import audio_ops as ao
    path = _clip_table_path(sf_dir)
    ds = read_clips(path, columns=["clip_id", "bytes"])
    out = ao.spectral_feature_table(ds)
    return out.select_columns(
        ["clip_id", "zcr", "centroid_hz", "bandwidth_hz", "rolloff_hz",
         "flatness", "speech_ratio", "clipping_ratio", "snr_db",
         "n_segments", "aq_code"])


def q_clip_mel_features(sf_dir: str):
    """Per-clip MFCC summaries in long form (stages/audio_ops.MelFeatures:
    Hann STFT power -> HTK mel filterbank -> log -> orthonormal DCT-II) —
    the speech front-end features over the clip table; deterministic per
    clip => fixture oracle."""
    from ..sources.clips import read_clips
    from ..stages import audio_ops as ao
    from ..stages.sizing import pool_size
    path = _clip_table_path(sf_dir)
    ds = read_clips(path, columns=["clip_id", "bytes"])
    return ds.map_batches(ao.MelFeatures,
                          fn_constructor_kwargs={},
                          batch_format="pyarrow", batch_size=64,
                          concurrency=pool_size(0), num_cpus=1)


def q_clip_augment_stats(sf_dir: str):
    """Speech-training augmentation (stages/audio_ops.AugmentClips):
    3 speed-perturbed + gain-jittered + SNR-controlled-noise variants per
    clip, seeded from md5(clip_id, variant) so any run/partitioning emits
    identical audio; one decode feeds all variants. Stats-only output
    here (emit_bytes=False skips the payload copy); deterministic =>
    fixture oracle."""
    from ..sources.clips import read_clips
    from ..stages import audio_ops as ao
    path = _clip_table_path(sf_dir)
    ds = read_clips(path, columns=["clip_id", "bytes"])
    return ao.augment_clips(ds)


def q_clip_specaugment_stats(sf_dir: str):
    """SpecAugment policy stats (stages/audio_ops.SpecAugmentClips):
    decode -> log-mel -> seeded time/freq masks (Park et al. 2019); mask
    draws keyed by md5(clip_id) so any run/partitioning is identical =>
    fixture oracle."""
    from ..sources.clips import read_clips
    from ..stages import audio_ops as ao
    path = _clip_table_path(sf_dir)
    ds = read_clips(path, columns=["clip_id", "bytes"])
    return ao.specaugment_clips(ds)


def q_clip_trim_stats(sf_dir: str):
    """VAD silence trim stats (stages/audio_ops.TrimSilence): lead/trail
    silence removed at -40 dB below peak frame RMS with 50 ms context
    pads; deterministic per clip => fixture oracle."""
    from ..sources.clips import read_clips
    from ..stages import audio_ops as ao
    path = _clip_table_path(sf_dir)
    ds = read_clips(path, columns=["clip_id", "bytes"])
    return ao.trim_silence(ds)


def q_clip_speaker_clusters(sf_dir: str):
    """Pseudo-speaker clustering — the audio analogue of semantic doc
    clustering: clip-level MFCC statistics embedding (mean++std, 26-dim,
    stages/audio_ops.MfccEmbedding) -> distributed Lloyd's k-means
    (stages/similarity.kmeans_fit, k=6) -> assignment pass. The feature
    table (tiny vs payloads) is materialized ONCE so the k-means
    iterations never re-decode audio. Seeded deterministic => fixture
    oracle."""
    from ..sources.clips import read_clips
    from ..stages import audio_ops as ao
    path = _clip_table_path(sf_dir)
    ds = read_clips(path, columns=["clip_id", "bytes"])
    feats = ao.mfcc_embedding_table(ds).materialize()
    C = sim.kmeans_fit(feats, k=6, iters=4, id_col="cid", seed=0)
    out = sim.kmeans_assign(feats, C, id_col="clip_id")

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["dist"] = rnd(df["dist"], 6)
        return df

    return out.map_batches(fin, batch_format="pandas")


def q_clip_dvector_speakers(sf_dir: str):
    """Learned speaker grouping over clip audio (stages/dvector): sample
    clips by deterministic hash slice -> train a seeded numpy frame-MLP
    on the driver (each sampled clip its own class, the label-free
    d-vector trick) -> actor-pool embed every clip (penultimate layer
    mean-pooled, L2-normalized) -> distributed k-means. Exists because
    the MFCC-stats embedding saturates cosine on narrowband audio
    (different-speaker p50 cosine 0.906 measured); the rate-normalized
    d-vector drops it to ~-0.04 with 0.73 nearest-neighbor speaker
    accuracy on the 200-clip test corpus (pinned in tests/test_audio_ops).
    Deterministic at any CPU count => fixture oracle."""
    from ..sources.clips import read_clips
    from ..stages import dvector as dvm
    path = _clip_table_path(sf_dir)
    ds = read_clips(path, columns=["clip_id", "bytes"])
    w = dvm.train_dvector(ds, n_train=48, epochs=30, seed=0)
    feats = dvm.dvector_embedding_table(ds, w).materialize()
    C = sim.kmeans_fit(feats, k=12, iters=4, id_col="cid", seed=0)
    out = sim.kmeans_assign(feats, C, id_col="clip_id")

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["dist"] = rnd(df["dist"], 6)
        return df

    return out.map_batches(fin, batch_format="pandas")


def q_clip_declip_stats(sf_dir: str):
    """Declip repair audit per clip (stages/audio_ops.declip: cubic
    reconstruction of clipped runs from their unclipped neighbors — the
    audio counterpart of the reference's LastNAverage value repair):
    clipping ratio before/after and samples repaired. >20 dB SNR
    recovery pinned on hard-clipped sines in test_audio_ops.
    Deterministic => fixture oracle."""
    from ..sources.clips import read_clips
    from ..stages import audio_ops as ao
    path = _clip_table_path(sf_dir)
    ds = read_clips(path, columns=["clip_id", "bytes"])
    # 0.45 FS: the synth tones peak ~0.5, so the fixture exercises real
    # runs + repairs (at 0.999 the corpus has zero clipped samples and
    # the oracle would pin only schema)
    return ao.declip_table(ds, full_scale=0.45)


def q_clip_denoise_stats(sf_dir: str):
    """SNR-gated Wiener denoise audit per clip
    (stages/audio_ops.DenoiseStats over the denoise_wiener kernel:
    decision-directed a-priori-SNR Wiener gain, Ephraim & Malah 1984):
    blind SNR before/after, processed flag, residual-energy delta. Only
    clips under the blind-SNR threshold are processed — the kernel's
    processing floor hurts clean audio (pinned in test_audio_ops).
    Deterministic => fixture oracle."""
    from ..sources.clips import read_clips
    from ..stages import audio_ops as ao
    path = _clip_table_path(sf_dir)
    ds = read_clips(path, columns=["clip_id", "bytes"])
    return ao.denoise_table(ds, below_snr_db=10.0)


def q_clip_tempo_features(sf_dir: str):
    """Tempo / rhythm features per clip (stages/audio_ops.TempoFeatures:
    spectral-flux onset envelope with a -60 dB relative floor ->
    autocorrelation tempo, Ellis 2007). The synth corpus is steady
    tones, so the honest output is NaN bpm nearly everywhere — the
    fixture pins exactly that (the gates are the product; a tempo
    estimator that hallucinates BPM on non-rhythmic audio poisons any
    corpus-level music/speech routing built on it). Physics (click
    tracks at known BPM recovered within 1 BPM) is pinned in
    tests/test_audio_ops. Deterministic => fixture oracle."""
    from ..sources.clips import read_clips
    from ..stages import audio_ops as ao
    path = _clip_table_path(sf_dir)
    ds = read_clips(path, columns=["clip_id", "bytes"])
    return ao.tempo_table(ds)


def q_clip_stretch_stats(sf_dir: str):
    """WSOLA time-stretch audit per clip
    (stages/audio_ops.StretchStats over the time_stretch kernel,
    Verhelst & Roelands 1993): per rate, achieved duration ratio and f0
    before/after — pitch preservation is the property that separates
    WSOLA from resampling, pinned in test_audio_ops. Deterministic =>
    fixture oracle."""
    from ..sources.clips import read_clips
    from ..stages import audio_ops as ao
    path = _clip_table_path(sf_dir)
    ds = read_clips(path, columns=["clip_id", "bytes"])
    return ao.stretch_table(ds, rates=(0.9, 1.1))


def q_clip_codec_stats(sf_dir: str):
    """Telephone-codec robustness-augmentation audit per clip
    (stages/audio_ops.CodecStats: 300-3400 Hz band-limit -> 8 kHz ->
    G.711 mu-law round-trip -> back): post-codec SNR and energy ratio.
    Band physics (voice band survives, out-of-band dies, mu-law SNR
    ~38 dB) pinned in test_audio_ops. Deterministic => fixture
    oracle."""
    from ..sources.clips import read_clips
    from ..stages import audio_ops as ao
    path = _clip_table_path(sf_dir)
    ds = read_clips(path, columns=["clip_id", "bytes"])
    return ao.codec_table(ds)


def q_clip_pitch_features(sf_dir: str):
    """Fundamental-frequency track per clip (stages/audio_ops.pitch_f0:
    FFT autocorrelation + parabolic peak refinement, actor pool). The
    synthetic corpus has an exact known fundamental per clip
    (200 + (idx % 37)·13 Hz), so the estimator is tested against
    physics, not against a copy of itself (test_audio_ops). Deterministic
    => fixture oracle."""
    from ..sources.clips import read_clips
    from ..stages import audio_ops as ao
    path = _clip_table_path(sf_dir)
    ds = read_clips(path, columns=["clip_id", "bytes"])
    return ao.pitch_table(ds)


def q_clip_profile_store(sf_dir: str):
    """Incrementally-maintained column profile of the clip table's
    metadata (pipelines/profile_store): per-file mergeable partials keyed
    by (path, size, rows) fingerprints; this call scans only files the
    store hasn't seen (second run scans ZERO files) and the merged output
    is bit-equal to a full profile_table rescan (test_profile_store).
    Payload bytes are excluded at the read. Deterministic => fixture
    oracle."""
    from . import profile_store as ps
    path = _clip_table_path(sf_dir)
    sf = os.path.basename(os.path.normpath(sf_dir))
    store = f"/tmp/adr_profile_store/{sf}"
    ps.update_profile_store(path, store,
                            columns=["clip_id", "sr_hz", "dur_ms",
                                     "codec", "transcript",
                                     "partition_id"])
    return ps.merged_profile(store)


def q_clip_expectations_incremental(sf_dir: str):
    """Expectations over the clip table via the incremental per-file
    verdict store (pipelines/profile_store.update_expectation_store):
    only files the store hasn't fingerprinted re-validate (zero on a
    second run), merged summary bit-equal to a full run_expectations
    (test_profile_store). Covers row-local kinds plus the maintained
    table-level ones — exact unique from per-file value-count partials
    and per-group non_decreasing with cross-file boundary stitching.
    Deterministic => fixture oracle."""
    from . import profile_store as ps
    path = _clip_table_path(sf_dir)
    sf = os.path.basename(os.path.normpath(sf_dir))
    store = f"/tmp/adr_exp_store/{sf}"
    suite = [
        {"check": "not_null", "column": "sr_hz"},
        {"check": "in_range", "column": "sr_hz", "min": 8000,
         "max": 48000, "mostly": 0.9},
        {"check": "in_range", "column": "dur_ms", "min": 200,
         "max": 15000, "mostly": 0.9},
        {"check": "in_set", "column": "codec",
         "values": ["pcm_s16le", "flac", "opus", "mp3", "amr"]},
        {"check": "regex", "column": "clip_id",
         "pattern": r"clip-\d{9}"},
        {"check": "unique", "column": "clip_id"},
        {"check": "non_decreasing", "column": "dur_ms", "by": "codec",
         "order_by": "clip_id", "mostly": 0.4},
    ]
    ps.update_expectation_store(path, store, suite)
    return ps.merged_expectations(store)


def q_clip_loudness_stats(sf_dir: str):
    """Integrated LUFS per clip (stages/audio_ops.gated_loudness: full
    ITU-R BS.1770-4 — parametric K-weighting biquads validated against
    the spec's 48 kHz tables, 400 ms blocks at 75% overlap, -0.691
    offset, absolute then relative gate) + the normalization gain to
    -23 LUFS. Gating means silence padding can't drag the estimate down
    (pinned in test_audio_ops). Deterministic => fixture oracle."""
    from ..sources.clips import read_clips
    from ..stages import audio_ops as ao
    path = _clip_table_path(sf_dir)
    ds = read_clips(path, columns=["clip_id", "bytes"])
    return ao.loudness_table(ds)


def q_clip_speaking_rate(sf_dir: str):
    """Transcript↔audio speaking-rate check over clip METADATA only
    (stages/checks.speaking_rate_stage) — the read prunes to
    (clip_id, dur_ms, transcript); the 2.4 GiB payload column never
    leaves storage. Deterministic => fixture oracle."""
    from ..sources.clips import read_clips
    from ..stages.checks import speaking_rate_stage
    path = _clip_table_path(sf_dir)
    ds = read_clips(path, columns=["clip_id", "dur_ms", "transcript"])
    out = ds.map_batches(speaking_rate_stage, batch_format="pyarrow")
    return out.select_columns(["clip_id", "sr_code", "chars_per_sec",
                               "words_per_min"])


def q_clip_mfcc_delta(sf_dir: str):
    """Delta / delta-delta MFCC dynamics + per-clip CMVN
    (stages/audio_ops.MfccDeltaFeatures: HTK regression deltas over the
    static MFCC matrix, cepstral mean-variance normalization inside the
    actor) — the articulation-dynamics features a speech pipeline ships
    alongside the statics; deterministic per clip => fixture oracle."""
    from ..sources.clips import read_clips
    from ..stages import audio_ops as ao
    from ..stages.sizing import pool_size
    path = _clip_table_path(sf_dir)
    ds = read_clips(path, columns=["clip_id", "bytes"])
    return ds.map_batches(ao.MfccDeltaFeatures,
                          fn_constructor_kwargs={},
                          batch_format="pyarrow", batch_size=64,
                          concurrency=pool_size(0), num_cpus=1)


def q_audio_fingerprint_dedup(sf_dir: str):
    """Content-duplicate groups by phase/gain-invariant acoustic
    fingerprint (Haitsma-Kalker band-sign bits): (fp, cnt, keep_id) for
    groups of >1 distinct content match."""
    from ..sources.clips import read_clips
    from ..stages import audio_ops as ao
    path = _clip_table_path(sf_dir)
    ds = read_clips(path, columns=["clip_id", "bytes"])
    return ao.fingerprint_dedup(ds)


def q_clip_segment_stats(sf_dir: str):
    """Fixed-window segmentation (1 s chunks) of every clip — per-clip
    segment count + chunked ms via partial counts then a key groupby
    (payload bytes never leave the decode stage)."""
    from ..sources.clips import read_clips
    from ..stages import audio_ops as ao
    path = _clip_table_path(sf_dir)
    ds = read_clips(path, columns=["clip_id", "bytes"])
    segs = ao.segment_clips(ds, seg_ms=1000, min_ms=200,
                            emit_bytes=False)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("clip_id", as_index=False).agg(
            n_segs=("seg_idx", "size"), seg_ms=("seg_dur_ms", "sum"))

    from ..functions.fold import fold_partials
    # per-clip grain is corpus-scaled: as_dataset keeps the merged fold a
    # stream in both fold regimes (driver footprint bounded by threshold)
    return fold_partials(segs.map_batches(partial, batch_format="pandas"),
                         "clip_id", {"n_segs": "sum", "seg_ms": "sum"},
                         as_dataset=True)


def q_audio_prep_segments(sf_dir: str):
    """Training-data prep pipeline (quality gate -> resample 16k -> 1s
    segments -> partitioned parquet): per-partition prep metrics."""
    import tempfile

    from .audio_prep import AudioPrepConfig, run_audio_prep
    path = _clip_table_path(sf_dir)
    out = os.path.join(tempfile.gettempdir(), "adr_prep",
                       os.path.basename(path))
    cfg = AudioPrepConfig(P=16, target_sr=16000, seg_ms=1000,
                          max_flatness=0.5, min_speech=0.01)
    res = run_audio_prep(path, out, cfg, resume=False)
    m = res["metrics"].copy()
    for c in ("clips", "kept", "segments", "drop_quality", "drop_decode"):
        m[c] = m[c].astype("int64")
    m["partition_id"] = m["partition_id"].astype("int64")
    return m.sort_values("partition_id").reset_index(drop=True)


def q_clip_stream_replay(sf_dir: str):
    """Continuous clip validation replayed over two arrival waves: per-poll
    summary (rows, violations, drifted). Cross-poll duplicate ledger and
    cumulative drift state are exercised; wall times excluded so the
    result is deterministic."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from .. import synth
    from .clip_stream import ClipStreamValidator
    from .validate import ValidateConfig

    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    n = _CLIP_N.get(sf, 1200)
    base = os.path.join(tempfile.gettempdir(), "adr_clip_stream", f"sf{sf}")
    watch, out = os.path.join(base, "watch"), os.path.join(base, "out")
    for d in (watch, out):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
    cut = n // 2
    pq.write_table(synth.generate_batch(42, np.arange(0, cut), 16),
                   os.path.join(watch, "wave1.parquet"), compression="none")
    v = ClipStreamValidator(watch, out, ValidateConfig(seed=42, P=16),
                            drift_min_rows=256)
    r1 = v.poll_once()
    pq.write_table(synth.generate_batch(42, np.arange(cut, n), 16),
                   os.path.join(watch, "wave2.parquet"), compression="none")
    r2 = v.poll_once()
    rows = []
    for k, r in (("wave1", r1), ("wave2", r2)):
        rows.append({"wave": k, "rows": int(r["rows"]),
                     "violations": int(r["violations"]),
                     "drifted": bool(r["drifted"])})
    return pd.DataFrame(rows)


def q_clip_resample_stats(sf_dir: str):
    """Rate-normalization to 16 kHz (linear resample): per-clip output
    sample count (bytes re-encode skipped — stats only)."""
    from ..sources.clips import read_clips
    from ..stages import audio_ops as ao
    path = _clip_table_path(sf_dir)
    ds = read_clips(path, columns=["clip_id", "bytes"])
    out = ao.resample_clips(ds, target_sr=16000,
                            emit_bytes=False)
    return out.select_columns(["clip_id", "n_samples_rs"])


# ---------------------------------------------- round-4 validation audits

def q_moments_events(sf_dir: str):
    """Grouped higher-moment distribution profile — skewness + excess
    kurtosis per event_type (the shape checks behind "has this column's
    distribution gone heavy-tailed/asymmetric?", the third/fourth-moment
    companions of grouped_stats_events). Two passes, both mergeable:
    pass 1 folds (n, Σx) to the per-type mean (cardinality-bounded,
    broadcast); pass 2 folds CENTRAL power sums Σd², Σd³, Σd⁴ about that
    mean — raw third/fourth moments cancel catastrophically (E[x⁴] ≈
    μ⁴ for tight distributions), central partials are exact-stable and
    still associative because μ is fixed before the pass. Population
    formulas: g1 = m3/m2^1.5, g2 = m4/m2² − 3; the oracle recomputes
    the identical closed form about its own avg() (μ agrees to ulps;
    differences vanish at 6 dp)."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def p1(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=["value"])
        t = pd.DataFrame({"event_type": d["event_type"],
                          "s": d["value"].to_numpy(np.float64), "n": 1.0})
        return t.groupby("event_type", as_index=False).sum()

    m1 = _fold(ds.map_batches(p1, batch_format="pandas"),
               ["event_type"], {"s": "sum", "n": "sum"})
    mu = dict(zip(m1["event_type"].astype(str),
                  m1["s"].to_numpy(np.float64) / m1["n"].to_numpy(np.float64)))
    mu_ref = ray.put(mu)

    def p2(df: pd.DataFrame) -> pd.DataFrame:
        mm = ray.get(mu_ref)
        d = df.dropna(subset=["value"])
        dev = (d["value"].to_numpy(np.float64)
               - d["event_type"].astype(str).map(mm).to_numpy(np.float64))
        t = pd.DataFrame({"event_type": d["event_type"],
                          "d2": dev * dev, "d3": dev ** 3, "d4": dev ** 4})
        return t.groupby("event_type", as_index=False).sum()

    m2 = _fold(ds.map_batches(p2, batch_format="pandas"),
               ["event_type"], {"d2": "sum", "d3": "sum", "d4": "sum"})
    m = m1.merge(m2, on="event_type")
    n = m["n"].to_numpy(np.float64)
    m2c = m["d2"].to_numpy(np.float64) / n
    with np.errstate(invalid="ignore", divide="ignore"):
        skew = np.where(m2c > 0, (m["d3"].to_numpy(np.float64) / n)
                        / m2c ** 1.5, np.nan)
        kurt = np.where(m2c > 0, (m["d4"].to_numpy(np.float64) / n)
                        / (m2c * m2c) - 3.0, np.nan)
    out = pd.DataFrame({"event_type": m["event_type"],
                        "n": n.astype(np.int64),
                        "skewness": rnd(skew, 6),
                        "kurtosis": rnd(kurt, 6)})
    return out.sort_values("event_type").reset_index(drop=True)


def q_ntile_events(sf_dir: str):
    """Per-user NTILE(4) quartile bucketing over value — the windowed
    binning behind per-entity quota/quantile assignment. Order-dependent
    per key, so it rides the series partitioning contract
    (groupby(user).map_groups, one user per task): sort by
    (value, event_id) — the deterministic tiebreak the oracle's window
    ORDER BY mirrors — then assign SQL NTILE semantics exactly: with
    n = q·k + r, the first r buckets get q+1 rows, the rest q."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])
    K = 4

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.dropna(subset=["value"])
        g = g.sort_values(["value", "event_id"], kind="stable")
        n = len(g)
        if n == 0:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "user_id": pd.Series([], dtype="int64"),
                                 "tile": pd.Series([], dtype="int64")})
        q, r = divmod(n, K)
        i = np.arange(n)
        if q == 0:
            tile = i + 1
        else:
            b = r * (q + 1)
            tile = np.where(i < b, i // (q + 1), r + (i - b) // q) + 1
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(np.int64),
                             "user_id": g["user_id"].to_numpy(np.int64),
                             "tile": tile.astype(np.int64)})

    # corpus-scaled output: stays a Dataset (one row per event must never
    # land on the driver; canonical ordering is comparer-side)
    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def q_reconcile_orders_lineitem(sf_dir: str):
    """Cross-table reconciliation — the classic warehouse integrity
    check: does each order's header total equal the sum of its line
    items (extendedprice·(1−discount)·(1+tax))? Lineitem folds to
    per-order partial sums which feed the two-regime stats_apply
    (broadcast dict below the group-count threshold, co-partitioned
    join-apply above it — orderkey is FACT-scaled, so the dict must not
    be the only regime at 10^9 orders); the orders stream applies the
    comparison vectorized either way. Orders with no line items
    reconcile as False with NULL totals. Money sums are decimal-exact at 6 dp (2 dp inputs), so
    round-6 output and the 0.0100005 tolerance (never within 5e-7 of a
    representable 6 dp diff) are float-association-proof by
    construction."""
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount", "l_tax"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = (df["l_extendedprice"].to_numpy(np.float64)
             * (1.0 - df["l_discount"].to_numpy(np.float64))
             * (1.0 + df["l_tax"].to_numpy(np.float64)))
        out = pd.DataFrame({"l_orderkey": df["l_orderkey"], "t": t})
        return out.groupby("l_orderkey", as_index=False).sum()

    from ..stages.stats_apply import group_stats_apply
    totals = _fold(li.map_batches(partial, batch_format="pandas"),
                   ["l_orderkey"], {"t": "sum"},
                   as_dataset=True).map_batches(
        lambda df: df.rename(columns={"l_orderkey": "o_orderkey"}),
        batch_format="pandas")

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def kernel(v, lt):
        diff = v - lt
        ok = np.where(np.isnan(np.asarray(lt, dtype=np.float64)), False,
                      np.abs(diff) <= 0.0100005)
        return {"lineitem_total": rnd(pd.Series(
                    np.broadcast_to(np.asarray(lt, dtype=np.float64),
                                    np.shape(v))), 6),
                "price_diff": rnd(pd.Series(diff), 6),
                "recon_ok": np.broadcast_to(ok, np.shape(v)).astype(bool)}

    return group_stats_apply(orders, totals, "o_orderkey", ["t"],
                             ["o_orderkey", "o_totalprice"], kernel,
                             value_col="o_totalprice")


def _rule_audit(ds, rules, n_rows_col="n"):
    """Shared shape for the rule-audit queries: ``rules`` maps rule name
    → vectorized pandas predicate (True = PASSES). One map_batches emits
    len(rules) count rows per batch; the fold is rule-cardinality
    bounded. Nulls fail (a rule a row can't be checked against is a
    violation, matching the SQL count(*) − count(*) FILTER (cond) form
    where NULL cond doesn't count as pass)."""
    names = list(rules)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for name in names:
            ok = rules[name](df)
            ok = np.asarray(ok.fillna(False) if hasattr(ok, "fillna") else ok,
                            dtype=bool)
            rows.append({"rule": name, "n_checked": float(len(df)),
                         "n_violations": float(len(df) - int(ok.sum()))})
        return pd.DataFrame(rows)

    m = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["rule"], {"n_checked": "sum", "n_violations": "sum"})
    m["n_checked"] = m["n_checked"].astype("int64")
    m["n_violations"] = m["n_violations"].astype("int64")
    m["violation_rate"] = rnd(m["n_violations"] / m["n_checked"], 6)
    return m.sort_values("rule").reset_index(drop=True)


def q_format_audit_customer(sf_dir: str):
    """Format-conformance audit over the customer dimension — the
    schema-validation layer's string/domain rules: name pattern
    (compiled regex, vectorized str.fullmatch), market-segment domain
    membership, and account-balance bounds. One shuffle-free pass of
    per-batch per-rule counts; output is one row per rule with checked /
    violation counts and the rate. The balance rules have real
    violations in the test data (negative acctbals exist) so the audit
    path is exercised, not vacuous."""
    import re
    ds = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment",
                                    "c_acctbal"])
    name_re = re.compile(r"Customer#[0-9]{9}")
    SEGMENTS = {"AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
                "MACHINERY"}
    rules = {
        "name_format": lambda df: df["c_name"].str.fullmatch(name_re),
        "segment_known": lambda df: df["c_mktsegment"].isin(SEGMENTS),
        "acctbal_nonneg": lambda df: df["c_acctbal"] >= 0,
        "acctbal_in_range": lambda df: df["c_acctbal"].between(-1000.0,
                                                               10000.0),
        "custkey_positive": lambda df: df["c_custkey"] >= 0,
    }
    return _rule_audit(ds, rules)


def q_cast_audit_events(sf_dir: str):
    """Castability / parse audit over the events stream — the
    semi-structured half of the schema-validation layer: is props valid
    JSON, does props.k parse as an integer, is it in domain, is the
    event_type known, is ts inside the load window? JSON parsing is a
    genuinely per-item kernel (stdlib json.loads inside the batch — the
    same per-item-parse exemption as the media decoders); every other
    rule is vectorized. Same one-pass rule-count fold as the customer
    audit. Mirrors DuckDB json_valid / json_extract_string + TRY_CAST
    semantics: missing key, non-integer k, or invalid JSON all fail the
    k rules; bools are not integers."""
    import json
    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value",
                                  "props"])
    TYPES = {"click", "error", "purchase", "signup", "view"}
    TS_LO = np.datetime64("2024-01-01T00:00:00")
    TS_HI = np.datetime64("2026-01-01T00:00:00")

    def parse_k(props: pd.Series):
        """(json_ok, k_int) per row; k_int None unless an integer key."""
        ok = np.zeros(len(props), dtype=bool)
        ks = np.full(len(props), np.nan)
        for i, s in enumerate(props.to_numpy()):
            if s is None:
                continue
            try:
                v = json.loads(s)
            except (ValueError, TypeError):
                continue
            ok[i] = True
            if isinstance(v, dict):
                k = v.get("k")
                if isinstance(k, int) and not isinstance(k, bool):
                    ks[i] = float(k)
        return ok, ks

    # one parse per batch, shared by the three k-rules (the strong df ref
    # in the memo pins id(df) so it can't be recycled between batches)
    _memo: dict = {}

    def parsed(df):
        if _memo.get("df") is not df:
            _memo["df"] = df
            _memo["val"] = parse_k(df["props"])
        return _memo["val"]

    def json_valid(df):
        return parsed(df)[0]

    def k_is_int(df):
        return ~np.isnan(parsed(df)[1])

    def k_in_domain(df):
        ks = parsed(df)[1]
        with np.errstate(invalid="ignore"):
            return ~np.isnan(ks) & (ks >= 0) & (ks <= 89)

    rules = {
        "value_present": lambda df: df["value"].notna()
        & ~np.isnan(df["value"].to_numpy(np.float64)),
        "props_json_valid": json_valid,
        "props_k_integer": k_is_int,
        "props_k_in_domain": k_in_domain,
        "event_type_known": lambda df: df["event_type"].isin(TYPES),
        "ts_in_window": lambda df: (df["ts"].to_numpy("datetime64[us]")
                                    >= TS_LO)
        & (df["ts"].to_numpy("datetime64[us]") < TS_HI),
    }
    return _rule_audit(ds, rules)


def q_assoc_rules_events(sf_dir: str):
    """Association rules over per-user event-type baskets (the
    market-basket support/confidence/lift triple, Agrawal 1993) — which
    behaviours co-occur in the same user beyond chance? Per-batch
    partials dedupe (user, type) locally and fold with max (presence is
    idempotent), so the exchange is bounded by users × distinct types,
    never raw events; the pair expansion runs on the folded
    presence table (types² × users bitcounts, vectorized). The oracle
    recomputes the identical ratios from a DISTINCT self-join."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    TYPES = ["click", "error", "purchase", "signup", "view"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        u = df.drop_duplicates(["user_id", "event_type"])
        out = pd.DataFrame({"user_id": u["user_id"]})
        for t in TYPES:
            out[t] = (u["event_type"] == t).astype(np.int64)
        return out.groupby("user_id", as_index=False).max()

    m = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["user_id"], {t: "max" for t in TYPES})
    P = m[TYPES].to_numpy(np.float64)  # (users, types) presence
    nu = float(len(m))
    cnt = P.sum(axis=0)                # per-type user counts
    both = P.T @ P                     # (types, types) co-occurrence
    rows = []
    for i, a in enumerate(TYPES):
        for j, b in enumerate(TYPES):
            if i == j or cnt[i] == 0 or cnt[j] == 0:
                continue
            cab = both[i, j]
            rows.append({
                "ante": a, "cons": b, "n_both": int(cab),
                "support": float(cab / nu),
                "confidence": float(cab / cnt[i]),
                "lift": float((cab / cnt[i]) / (cnt[j] / nu))})
    out = pd.DataFrame(rows)
    for c in ["support", "confidence", "lift"]:
        out[c] = rnd(out[c], 6)
    return out.sort_values(["ante", "cons"]).reset_index(drop=True)


def q_transition_matrix_events(sf_dir: str):
    """First-order Markov transition profile of the event stream: counts
    and row-normalized probabilities of (prev_type → next_type) over each
    user's (ts, event_id)-ordered sequence — the behavioural-drift
    baseline (a shifted transition matrix is a sequence-level anomaly the
    per-record scorers can't see). Per-user pair counting rides the
    series contract (groupby(user).map_groups); the type² count fold is
    tiny. Probabilities are per-prev_type across all users; the oracle
    mirrors with a lag() window over the same deterministic order."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        t = g["event_type"].to_numpy()
        if len(t) < 2:
            return pd.DataFrame({"prev_type": [], "next_type": [],
                                 "n": []})
        out = pd.DataFrame({"prev_type": t[:-1], "next_type": t[1:],
                            "n": 1.0})
        return out.groupby(["prev_type", "next_type"],
                           as_index=False).sum()

    m = _fold(ds.groupby("user_id").map_groups(per_user,
                                               batch_format="pandas"),
              ["prev_type", "next_type"], {"n": "sum"})
    tot = m.groupby("prev_type")["n"].transform("sum")
    out = pd.DataFrame({"prev_type": m["prev_type"],
                        "next_type": m["next_type"],
                        "n": m["n"].astype(np.int64),
                        "prob": rnd(m["n"] / tot, 6)})
    return out.sort_values(["prev_type", "next_type"]).reset_index(drop=True)


def q_auc_events(sf_dir: str):
    """Exact ROC-AUC of `value` as a ranking score for error events —
    the threshold-free evaluation companion of eval_f1 (Mann-Whitney U
    with midrank tie handling). Per-batch partials fold per-VALUE
    (n_pos, n_neg) counts — the exchange is bounded by score
    cardinality, not rows (for truly continuous scores at corpus scale
    the fold auto-spills to its Ray groupby regime; binning first is
    the standard approximation if even distinct-score cardinality is
    too high). Driver finishes with one sorted cumulative sweep:
    AUC = Σ_v n_pos(v)·(n_neg(<v) + ½·n_neg(=v)) / (P·N). All terms
    are half-integers — exact in float64, association-order-proof."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=["value"])
        y = (d["event_type"] == "error").astype(np.int64)
        t = pd.DataFrame({"value": d["value"].to_numpy(np.float64),
                          "p": y, "q": 1 - y})
        return t.groupby("value", as_index=False).sum()

    m = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["value"], {"p": "sum", "q": "sum"})
    m = m.sort_values("value", kind="mergesort").reset_index(drop=True)
    p = m["p"].to_numpy(np.float64)
    q = m["q"].to_numpy(np.float64)
    below = np.concatenate([[0.0], np.cumsum(q)[:-1]])
    P, N = p.sum(), q.sum()
    auc = float((p * (below + 0.5 * q)).sum() / (P * N))
    return pd.DataFrame({"n_pos": [np.int64(P)], "n_neg": [np.int64(N)],
                         "auc": rnd([auc], 6)})


def q_bigram_topk_documents(sf_dir: str):
    """Exact corpus-wide top-20 word bigrams — the phrase-level
    companion of vocab_documents (n-gram statistics drive both dedup
    shingles and boilerplate detection). Per-batch vectorized bigram
    counting folds (bigram → n) partials; cardinality is vocabulary²-
    bounded and the fold auto-spills to its Ray groupby regime past the
    driver threshold. Tokenization is exactly SQL string_split(text,
    ' ') — single-space split, empties preserved — so the oracle's
    lateral unnest reproduces the counts bit-for-bit. Deterministic
    (n DESC, w1, w2) tie-break."""
    ds = _read(sf_dir, "documents", ["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        c: Counter = Counter()
        for s in df["text"].to_numpy():
            if not isinstance(s, str):
                continue
            w = s.split(" ")
            c.update(zip(w[:-1], w[1:]))
        if not c:
            return pd.DataFrame({"w1": [], "w2": [], "n": []})
        ks = list(c.keys())
        return pd.DataFrame({"w1": [k[0] for k in ks],
                             "w2": [k[1] for k in ks],
                             "n": [float(c[k]) for k in ks]})

    m = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["w1", "w2"], {"n": "sum"})
    m["n"] = m["n"].astype("int64")
    m = m.sort_values(["n", "w1", "w2"], ascending=[False, True, True],
                      kind="mergesort")
    return m.head(20).reset_index(drop=True)


def q_weighted_sample_documents(sf_dir: str):
    """Deterministic weighted sample WITHOUT replacement, k=50, weight =
    n_chars (Efraimidis–Spirakis A-Res, IPL 2006): key = −ln(u)/w with u
    a per-doc hash-uniform; the global k smallest keys are exactly a
    w-proportional sample. No RNG: u comes from a 2-round
    xorshift-multiply of doc_id whose 32-bit constants keep the SQL
    twin inside HUGEINT (numpy uint64 wraps natively; bit-for-bit
    parity pinned in tests). Each batch emits only its LOCAL k smallest
    keys (the brute_force_topk candidate contract), so the driver merge
    sees ≤ batches×k rows regardless of corpus size."""
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    K = 50

    def h64(v: np.ndarray) -> np.ndarray:
        z = v.astype(np.uint64)
        z ^= z >> np.uint64(33)
        z *= np.uint64(0xFF51AFD7)
        z ^= z >> np.uint64(29)
        z *= np.uint64(0xC4CEB9FE)
        return z ^ (z >> np.uint64(32))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["n_chars"] > 0]
        if d.empty:
            return pd.DataFrame({"doc_id": [], "w": [], "es_key": []})
        with np.errstate(over="ignore"):
            h = h64(d["doc_id"].to_numpy(np.int64).view(np.uint64))
        u = (h.astype(np.float64) + 0.5) / 18446744073709551616.0
        w = d["n_chars"].to_numpy(np.float64)
        key = -np.log(u) / w
        k = min(K, len(d))
        sel = np.argpartition(key, k - 1)[:k]
        return pd.DataFrame({"doc_id": d["doc_id"].to_numpy(np.int64)[sel],
                             "w": d["n_chars"].to_numpy(np.int64)[sel],
                             "es_key": key[sel]})

    cand = (ds.map_batches(local_topk, batch_format="pandas")).to_pandas()
    cand = cand.sort_values(["es_key", "doc_id"], kind="mergesort").head(K)
    cand["es_key"] = rnd(cand["es_key"], 9)
    cand["doc_id"] = cand["doc_id"].astype("int64")
    cand["w"] = cand["w"].astype("int64")
    return cand.reset_index(drop=True)


def q_tfidf_topk_documents(sf_dir: str):
    """Corpus keyword extraction: top-5 terms per source by TF-IDF
    (tf = term count within the source, idf = ln(#sources / #sources
    containing the term)) — the classic distinctive-vocabulary profile.
    One fold of (source, word, n) partials (vocabulary × source
    bounded, auto-spilling); df/idf and the per-source rank run on the
    folded table. SQL-identical single-space tokenization;
    (tfidf DESC, word ASC) tie-break."""
    ds = _read(sf_dir, "documents", ["source", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        out = []
        for src, grp in df.groupby("source"):
            c: Counter = Counter()
            for s in grp["text"].to_numpy():
                if isinstance(s, str):
                    c.update(s.split(" "))
            out.extend({"source": src, "word": w, "n": float(v)}
                       for w, v in c.items())
        return pd.DataFrame(out)

    m = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["source", "word"], {"n": "sum"})
    ns = m["source"].nunique()
    df_w = m.groupby("word")["source"].nunique()
    idf = np.log(ns / m["word"].map(df_w).to_numpy(np.float64))
    m = m.assign(tfidf=m["n"].to_numpy(np.float64) * idf)
    m = m.sort_values(["source", "tfidf", "word"],
                      ascending=[True, False, True], kind="mergesort")
    top = m.groupby("source", as_index=False).head(5)
    return pd.DataFrame({"source": top["source"], "word": top["word"],
                         "tf": top["n"].astype(np.int64),
                         "tfidf": rnd(top["tfidf"], 6)}).reset_index(drop=True)


def q_lift_table_events(sf_dir: str):
    """Decile gain/lift table of `value` as a score for error events —
    the business-facing companion of auc_events (how concentrated are
    the errors in the top score deciles?). Reuses the AUC exchange
    shape: per-distinct-value (rows, pos) count partials fold once
    (score-cardinality bounded), then ONE driver sweep assigns each
    distinct value the decile of its LAST row, descending score
    (decile = ceil(10·cum/total) — the closed form the oracle mirrors;
    no row-level global sort anywhere). Emits per-decile rows, errors,
    rate, and cumulative lift."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=["value"])
        y = (d["event_type"] == "error").astype(np.int64)
        t = pd.DataFrame({"value": d["value"].to_numpy(np.float64),
                          "rows": 1.0, "pos": y.astype(np.float64)})
        return t.groupby("value", as_index=False).sum()

    m = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["value"], {"rows": "sum", "pos": "sum"})
    m = m.sort_values("value", ascending=False,
                      kind="mergesort").reset_index(drop=True)
    rows = m["rows"].to_numpy(np.float64)
    pos = m["pos"].to_numpy(np.float64)
    total = rows.sum()
    base = pos.sum() / total
    cum = np.cumsum(rows)
    decile = np.ceil(10.0 * cum / total).astype(np.int64)
    g = pd.DataFrame({"decile": decile, "rows": rows, "pos": pos}) \
        .groupby("decile", as_index=False).sum().sort_values("decile")
    cum_pos = np.cumsum(g["pos"].to_numpy())
    cum_rows = np.cumsum(g["rows"].to_numpy())
    return pd.DataFrame({
        "decile": g["decile"].astype("int64"),
        "n": g["rows"].astype("int64"),
        "n_pos": g["pos"].astype("int64"),
        "rate": rnd(g["pos"].to_numpy() / g["rows"].to_numpy(), 6),
        "cum_lift": rnd((cum_pos / cum_rows) / base, 6),
    }).reset_index(drop=True)


def q_hourly_profile_events(sf_dir: str):
    """Seasonal baseline profile: p50/p90/p99 of value per hour-of-day —
    the per-slot band a seasonal anomaly monitor alarms against (the
    batch twin of the forecast/seasonal band scorers). One slim
    (hour, value) groupby with per-group vectorized np.quantile (linear
    interpolation ≡ DuckDB quantile_cont, the winsorize_events
    precedent); 24-row output."""
    ds = _read(sf_dir, "events", ["ts", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=["value"])
        return pd.DataFrame({
            "hour": d["ts"].dt.hour.astype(np.int64),
            "value": d["value"].to_numpy(np.float64)})

    def grp(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy(np.float64)
        return pd.DataFrame({
            "hour": [int(g["hour"].iloc[0])],
            "n": [np.int64(len(v))],
            "p50": [float(np.quantile(v, 0.50))],
            "p90": [float(np.quantile(v, 0.90))],
            "p99": [float(np.quantile(v, 0.99))]})

    out = (ds.map_batches(prep, batch_format="pandas")
             .groupby("hour").map_groups(grp, batch_format="pandas")
             .to_pandas())
    out["hour"] = out["hour"].astype("int64")
    out["n"] = out["n"].astype("int64")
    for c in ["p50", "p90", "p99"]:
        out[c] = rnd(out[c], 6)
    return out.sort_values("hour").reset_index(drop=True)


def q_cube_events(sf_dir: str):
    """Full CUBE lattice over (event_type, user bucket): counts + value
    sums for all four grouping sets — the OLAP companion of
    rollup_events (rollup walks one hierarchy; CUBE materializes every
    margin). ONE fold at the finest grain; the coarser grouping sets are
    exact re-aggregations of that bounded table on the driver (sums are
    associative), so the raw stream is read once and nothing shuffles
    per grouping set. NULL marks the rolled-up dimension (SQL CUBE
    convention, emitted as the string 'ALL' to keep the hash contract
    null-free)."""
    ds = _read(sf_dir, "events", ["event_type", "user_id", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=["value"])
        t = pd.DataFrame({
            "event_type": d["event_type"],
            "user_bucket": (d["user_id"].to_numpy(np.int64) % 10),
            "s": d["value"].to_numpy(np.float64), "n": 1.0})
        return t.groupby(["event_type", "user_bucket"],
                         as_index=False).sum()

    m = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["event_type", "user_bucket"], {"s": "sum", "n": "sum"})
    m["user_bucket"] = m["user_bucket"].astype(str)
    sets = []
    sets.append(m[["event_type", "user_bucket", "s", "n"]])
    a = m.groupby("event_type", as_index=False)[["s", "n"]].sum()
    a["user_bucket"] = "ALL"
    sets.append(a)
    b = m.groupby("user_bucket", as_index=False)[["s", "n"]].sum()
    b["event_type"] = "ALL"
    sets.append(b)
    t = pd.DataFrame({"event_type": ["ALL"], "user_bucket": ["ALL"],
                      "s": [m["s"].sum()], "n": [m["n"].sum()]})
    sets.append(t)
    out = pd.concat(sets, ignore_index=True)
    res = pd.DataFrame({
        "event_type": out["event_type"],
        "user_bucket": out["user_bucket"],
        "n": out["n"].astype("int64"),
        "sum_value": rnd(out["s"], 4)})
    return res.sort_values(["event_type", "user_bucket"],
                           kind="mergesort").reset_index(drop=True)


def q_lof_ivf_embeddings(sf_dir: str):
    """IVF-bucketed LOF — the scale path promised by lof_embeddings'
    contract: candidate neighbours restricted to the point's coarse
    k-means cell, exact dense LOF per cell via ONE groupby shuffle
    (stages/similarity.lof_scores_ivf). No broadcast reference matrix,
    no O(n) driver state; boundary-straddling neighbourhoods are the
    documented IVF approximation. Deterministic => fixture oracle."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = sim.lof_scores_ivf(ds, k=10, n_cells=8, as_dataset=True)
    return out.map_batches(lambda df: df.assign(lof=rnd(df["lof"], 6)),
                           batch_format="pandas")


def q_clip_bandwidth_check(sf_dir: str):
    """Effective-bandwidth audit over the clip table — catches
    upsampled-from-lower-rate / band-limited-codec clips whose claimed
    sr_hz the metadata drift checks would happily pass (only the
    spectrum knows). Actor-pool decode (stages/audio_ops.BandwidthCheck);
    deterministic => fixture oracle. NOTE: the synth corpus is genuinely
    band-limited tonal content (median top-half-band energy is exactly
    0), so the audit truthfully warns on most of it; discrimination
    between real broadband and band-limited-then-upsampled material is
    pinned in tests/test_audio_ops.py::test_bandwidth_check_flags_
    upsampled_clip."""
    from ..sources.clips import read_clips
    from ..stages import audio_ops as ao
    path = _clip_table_path(sf_dir)
    ds = read_clips(path, columns=["clip_id", "bytes"])
    out = ao.bandwidth_table(ds)
    return out.select_columns(["clip_id", "eff_bw_hz", "bw_ratio",
                               "hf_energy_ratio", "bw_code", "bw_status"])


def q_rfm_customers(sf_dir: str):
    """RFM segmentation over the orders fact — recency (days since last
    order vs the corpus max date), frequency (order count), monetary
    (total spend) per customer, each quintile-scored 1-5 (5 = best) —
    the classic customer-value operator. Per-batch per-customer partials
    fold once (customer-cardinality bounded); quintiles are SQL NTILE
    semantics over the folded aggregate table with deterministic
    (metric, custkey) tie-break, which the oracle's window mirrors
    exactly. Recency uses integer epoch-day diffs — no float order
    risk."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate",
                                  "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ep = ((df["o_orderdate"] - pd.Timestamp(0))
              // pd.Timedelta("1D")).astype("int64")
        t = pd.DataFrame({"o_custkey": df["o_custkey"],
                          "last_day": ep, "n": 1.0,
                          "spend": df["o_totalprice"].to_numpy(np.float64)})
        return t.groupby("o_custkey", as_index=False).agg(
            last_day=("last_day", "max"), n=("n", "sum"),
            spend=("spend", "sum"))

    m = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["o_custkey"], {"last_day": "max", "n": "sum",
                              "spend": "sum"})
    max_day = int(m["last_day"].max())
    m = m.assign(recency_days=(max_day - m["last_day"]).astype(np.int64),
                 frequency=m["n"].astype(np.int64),
                 monetary=rnd(m["spend"], 2))

    def ntile5(keys: np.ndarray, ids: np.ndarray) -> np.ndarray:
        """SQL NTILE(5) over ascending (key, custkey) order, returned as
        a 1-5 score with 5 = smallest key (negate keys for largest-is-
        best metrics)."""
        order = np.lexsort((ids, keys))
        n = len(ids)
        q, r = divmod(n, 5)
        i = np.arange(n)
        if q == 0:
            tile = i + 1
        else:
            b = r * (q + 1)
            tile = np.where(i < b, i // (q + 1), r + (i - b) // q) + 1
        out = np.empty(n, dtype=np.int64)
        out[order] = 6 - tile  # tile 1 = best key -> score 5
        return out

    ids = m["o_custkey"].to_numpy(np.int64)
    r_s = ntile5(m["recency_days"].to_numpy(np.int64), ids)
    f_s = ntile5(-m["frequency"].to_numpy(np.int64), ids)
    mo_s = ntile5(-m["monetary"].to_numpy(np.float64), ids)
    out = pd.DataFrame({
        "o_custkey": ids, "recency_days": m["recency_days"],
        "frequency": m["frequency"], "monetary": m["monetary"],
        "r_score": r_s, "f_score": f_s, "m_score": mo_s})
    return out.sort_values("o_custkey").reset_index(drop=True)


def q_expectations_conditional(sf_dir: str):
    """Conditional (row-condition) expectations — the Great-Expectations
    ``row_condition`` idiom: each check's denominator and violation
    candidates are only the rows matching its ``when`` clause (purchase
    values must be in range, error events must carry valid-JSON props,
    click values non-null). One streaming pass, per-spec scope counts
    folded alongside the violation counts."""
    from ..stages.expectations import run_expectations
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value",
                                  "props", "user_id"])
    suite = [
        {"check": "in_range", "column": "value", "min": 0.0, "max": 200.0,
         "when": {"column": "event_type", "op": "==", "value": "purchase"},
         "mostly": 0.9},
        {"check": "regex", "column": "props", "pattern": r"^\{.*\}$",
         "when": {"column": "event_type", "op": "in",
                  "values": ["error", "signup"]}},
        {"check": "not_null", "column": "value",
         "when": {"column": "user_id", "op": "<", "value": 50}},
        {"check": "in_range", "column": "value", "min": 0.0, "max": 500.0},
    ]
    return run_expectations(ds, suite)


def q_theilsen_events(sf_dir: str):
    """Per-user Theil–Sen robust trend: the MEDIAN of all pairwise
    slopes (y_j−y_i)/(x_j−x_i) — the 29%-breakdown companion of
    regression_events' OLS (one wild outlier drags an OLS slope; the
    pairwise-slope median shrugs it off). Per-user pairwise expansion is
    vectorized inside groupby(user).map_groups (series contract: one
    user's rows per task; pairs are n_u² locally and never shuffle);
    x is centered epoch-days, the regression_events precision recipe.
    The oracle recomputes the identical slope set via a per-user
    self-join + quantile_cont(0.5)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.dropna(subset=["value"])
        if len(g) < 2:
            return pd.DataFrame({"user_id": [], "n": [],
                                 "ts_slope_per_day": []})
        x = (g["ts"].to_numpy("datetime64[us]").astype(np.int64)
             / 86400e6 - 20000.0)
        y = g["value"].to_numpy(np.float64)
        i, j = np.triu_indices(len(g), k=1)
        dx = x[j] - x[i]
        ok = dx != 0.0
        if not ok.any():
            return pd.DataFrame({"user_id": [], "n": [],
                                 "ts_slope_per_day": []})
        slopes = (y[j] - y[i])[ok] / dx[ok]
        return pd.DataFrame({
            "user_id": [np.int64(g["user_id"].iloc[0])],
            "n": [np.int64(len(g))],
            "ts_slope_per_day": [float(np.quantile(slopes, 0.5))]})

    out = (ds.groupby("user_id")
             .map_groups(per_user, batch_format="pandas")).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    out["n"] = out["n"].astype("int64")
    out["ts_slope_per_day"] = rnd(out["ts_slope_per_day"], 6)
    return out.sort_values("user_id").reset_index(drop=True)


def q_spearman_events(sf_dir: str):
    """Per-type Spearman rank correlation between value and hour-of-day —
    the monotone-association companion of corr_events' Pearson (rank
    correlation survives nonlinear but monotone relationships and
    outliers). Midranks (average over ties) computed vectorized inside
    groupby(type).map_groups — one type's rows per task, the series
    contract — then Pearson on the ranks; the oracle builds the same
    midranks from row_number windows averaged per tied value."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def midrank(v: np.ndarray) -> np.ndarray:
        order = np.argsort(v, kind="mergesort")
        ranks = np.empty(len(v), dtype=np.float64)
        sv = v[order]
        # average rank over tie runs (1-based)
        i = 0
        pos = np.arange(1, len(v) + 1, dtype=np.float64)
        while i < len(sv):
            j = i
            while j + 1 < len(sv) and sv[j + 1] == sv[i]:
                j += 1
            ranks[order[i:j + 1]] = pos[i:j + 1].mean()
            i = j + 1
        return ranks

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        g = g.dropna(subset=["value"])
        v = g["value"].to_numpy(np.float64)
        h = g["ts"].dt.hour.to_numpy(np.float64)
        n = len(g)
        if n < 2:
            return pd.DataFrame({"event_type": [], "n": [],
                                 "spearman": []})
        rv, rh = midrank(v), midrank(h)
        cov = (rv * rh).sum() - rv.sum() * rh.sum() / n
        va = (rv * rv).sum() - rv.sum() ** 2 / n
        vb = (rh * rh).sum() - rh.sum() ** 2 / n
        if va <= 0 or vb <= 0:
            return pd.DataFrame({"event_type": [], "n": [],
                                 "spearman": []})
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n": [np.int64(n)],
            "spearman": rnd([cov / np.sqrt(va * vb)], 6)})

    out = (ds.groupby("event_type")
             .map_groups(per_type, batch_format="pandas")).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def q_wow_change_events(sf_dir: str):
    """Window-over-window change alerting: hourly event counts with the
    percent change vs the previous hour and an alert flag past ±50% —
    the ops-monitor companion of events_hourly (absolute levels don't
    page anyone; rate-of-change does). One bounded hourly fold; the lag
    sweep runs on the folded 720-row frame."""
    ds = _read(sf_dir, "events", ["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = df["ts"].dt.floor("h")
        return pd.DataFrame({"hour_ts": h, "n": 1.0}).groupby(
            "hour_ts", as_index=False).sum()

    m = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["hour_ts"], {"n": "sum"})
    m = m.sort_values("hour_ts", kind="mergesort").reset_index(drop=True)
    n = m["n"].to_numpy(np.float64)
    prev = np.concatenate([[np.nan], n[:-1]])
    with np.errstate(invalid="ignore", divide="ignore"):
        pct = (n - prev) / prev
    alert = np.where(np.isnan(pct), False, np.abs(pct) > 0.5)
    return pd.DataFrame({
        "hour_ts": m["hour_ts"],
        "n": n.astype(np.int64),
        "pct_change": rnd(pct, 6),
        "alert": alert.astype(bool)})


def q_cohort_retention_events(sf_dir: str):
    """Cohort retention triangle: users grouped by first-seen day, counted
    by distinct activity-day offset — the standard product-retention
    operator. Two bounded folds: per-user first day (min fold), then
    (cohort_day, offset) distinct-user counts with the first-day table
    broadcast; no raw-row shuffle anywhere. Integer epoch-day arithmetic
    — exact."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def p1(df: pd.DataFrame) -> pd.DataFrame:
        day = ((df["ts"] - pd.Timestamp(0))
               // pd.Timedelta("1D")).astype("int64")
        return pd.DataFrame({"user_id": df["user_id"],
                             "first_day": day}).groupby(
            "user_id", as_index=False).min()

    first = _fold(ds.map_batches(p1, batch_format="pandas"),
                  ["user_id"], {"first_day": "min"})
    f_ref = ray.put(dict(zip(first["user_id"].to_numpy(np.int64),
                             first["first_day"].to_numpy(np.int64))))

    def p2(df: pd.DataFrame) -> pd.DataFrame:
        f = ray.get(f_ref)
        day = ((df["ts"] - pd.Timestamp(0))
               // pd.Timedelta("1D")).astype("int64")
        fd = df["user_id"].map(f).astype("int64")
        t = pd.DataFrame({"cohort_day": fd, "offset_days": day - fd,
                          "user_id": df["user_id"], "one": 1.0})
        return t.drop_duplicates(["cohort_day", "offset_days", "user_id"])

    # per-batch nunique partials are NOT mergeable for users spanning
    # batches, so fold PRESENCE at (cohort, offset, user) grain (max is
    # idempotent), then count rows per (cohort, offset)
    m = _fold(ds.map_batches(p2, batch_format="pandas"),
              ["cohort_day", "offset_days", "user_id"], {"one": "max"})
    m = (m.groupby(["cohort_day", "offset_days"], as_index=False)
          .agg(n_users=("user_id", "size")))
    return pd.DataFrame({
        "cohort_day": m["cohort_day"].astype("int64"),
        "offset_days": m["offset_days"].astype("int64"),
        "n_users": m["n_users"].astype("int64"),
    }).sort_values(["cohort_day", "offset_days"]).reset_index(drop=True)


def q_mahalanobis_embeddings(sf_dir: str):
    """Global-covariance outlier score per embedding: squared Mahalanobis
    distance d² = (x−μ)ᵀ Σ⁻¹ (x−μ) — the parametric complement of LOF
    (LOF sees local density, Mahalanobis sees departure from the global
    correlated ellipsoid). ONE streaming pass of (XᵀX, colsum, n)
    partials → dim²-float driver merge (the covariance_embeddings
    shape), Σ ridge-regularized and inverted ONCE on the driver, (μ,
    Σ⁻¹) broadcast for the vectorized scoring pass. The scored table
    streams out as a Dataset — one row per corpus vector must never
    land on the driver; canonical ordering is comparer-side, per repo
    convention. Deterministic => fixture oracle; top-score recovery
    pinned in unit tests."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        return pd.DataFrame({"xtx": [(X.T @ X).tobytes()],
                             "s": [X.sum(axis=0).tobytes()],
                             "n": [len(X)]})

    p = emb.map_batches(partial, batch_format="pandas").to_pandas()
    d = len(np.frombuffer(p["s"].iloc[0]))
    xtx = np.sum([np.frombuffer(b).reshape(d, d) for b in p["xtx"]], axis=0)
    s = np.sum([np.frombuffer(b) for b in p["s"]], axis=0)
    n = int(p["n"].sum())
    mu = s / n
    cov = (xtx - np.outer(s, s) / n) / (n - 1)
    cov += np.eye(d) * 1e-9 * np.trace(cov) / d  # ridge: invertibility
    prec = np.linalg.inv(cov)
    ref = ray.put((mu, prec))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        m, P = ray.get(ref)
        X = np.stack(df["embedding"].to_numpy()).astype(np.float64) - m
        d2 = np.einsum("ij,jk,ik->i", X, P, X)
        return pd.DataFrame({"vec_id": df["vec_id"].astype(np.int64),
                             "maha_sq": rnd(np.maximum(d2, 0.0), 6)})

    return emb.map_batches(score, batch_format="pandas")


def q_clip_audio_audit(sf_dir: str):
    """Fused audio-integrity audit over the clip table — ONE decode per
    clip feeds mains-hum probing, click/pop detection, VAD speech
    fraction, and the cross-modal transcript↔speech verdict (the
    violation class the synth table actually plants: clips with speech
    but an empty/NULL transcript are caught HERE from the audio itself,
    not from metadata like speaking_rate). Deterministic => fixture
    oracle."""
    from ..sources.clips import read_clips
    from ..stages import audio_ops as ao
    path = _clip_table_path(sf_dir)
    ds = read_clips(path, columns=["clip_id", "bytes", "transcript"])
    out = ao.audio_audit_table(ds)
    return out.select_columns(["clip_id", "speech_ratio", "rms_db",
                               "n_chars", "hum_db_50", "hum_db_60",
                               "n_clicks", "clicks_per_sec",
                               "audit_code", "audit_status"])


def q_lof_embeddings(sf_dir: str):
    """Local Outlier Factor (Breunig 2000, density-ratio outlierness)
    over the embeddings table, k=10 Euclidean — see
    stages/similarity.lof_scores for the three-pass shape and the
    auto-dispatch scale contract (exact below exact_max_rows, IVF-cell
    kernel above). Deterministic (exact-k neighbours, (distance, id)
    tie-break), so fixture-oracled like the other seeded model
    scorers."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = sim.lof_scores(ds, k=10, as_dataset=True)
    return out.map_batches(lambda df: df.assign(lof=rnd(df["lof"], 6)),
                           batch_format="pandas")


def q_welch_ttest_events(sf_dir: str):
    """Per-type Welch's two-sample t drift test between the first and
    second half of the table's time range (A/B periods split at the
    integer epoch-microsecond midpoint — exact, no float boundary).
    The classical companion of drift_events_psi: PSI sees distribution
    shape, Welch sees mean shift with unequal variances. Two bounded
    folds: global (min,max) epoch-us, then (type, period) raw moments
    (n, Σx, Σx²) — both mergeable, no raw-row shuffle. Variances use
    the raw-moment form to pin float parity with the SQL oracle."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def p_range(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({"k": [0], "lo": [us.min()], "hi": [us.max()]})

    r = _fold(ds.map_batches(p_range, batch_format="pandas"),
              ["k"], {"lo": "min", "hi": "max"})
    mid = (int(r["lo"].iloc[0]) + int(r["hi"].iloc[0])) // 2

    def p_mom(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["value"].notna()]
        v = df["value"].to_numpy(np.float64)
        keep = ~np.isnan(v)
        df, v = df[keep], v[keep]
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        per = np.where(us < mid, "a", "b")
        t = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                          "period": per, "n": 1.0, "s": v, "ss": v * v})
        return t.groupby(["event_type", "period"], as_index=False).sum()

    m = _fold(ds.map_batches(p_mom, batch_format="pandas"),
              ["event_type", "period"], {"n": "sum", "s": "sum", "ss": "sum"})
    w = m.pivot(index="event_type", columns="period",
                values=["n", "s", "ss"])
    out = []
    for et in sorted(w.index):
        na, nb = w.loc[et, ("n", "a")], w.loc[et, ("n", "b")]
        if not (na >= 2 and nb >= 2):
            continue
        sa, sb = w.loc[et, ("s", "a")], w.loc[et, ("s", "b")]
        ssa, ssb = w.loc[et, ("ss", "a")], w.loc[et, ("ss", "b")]
        ma, mb = sa / na, sb / nb
        va = (ssa - sa * sa / na) / (na - 1)
        vb = (ssb - sb * sb / nb) / (nb - 1)
        se2 = va / na + vb / nb
        if se2 <= 0:
            continue
        t_stat = (ma - mb) / np.sqrt(se2)
        dof = se2 * se2 / ((va / na) ** 2 / (na - 1)
                           + (vb / nb) ** 2 / (nb - 1))
        out.append((et, np.int64(na), np.int64(nb),
                    rnd(ma, 6), rnd(mb, 6), rnd(t_stat, 6), rnd(dof, 6)))
    return pd.DataFrame(out, columns=[
        "event_type", "n_a", "n_b", "mean_a", "mean_b", "t_stat", "dof"])


def q_cramers_v_events(sf_dir: str):
    """Cramér's V association between event_type and hour-of-day — the
    normalized-χ² companion of mutual_information_events (V is bounded
    [0,1] and comparable across tables; MI is not). ONE bounded fold at
    (type, hour) grain → ≤ 5×24 contingency on the driver; χ² includes
    the empty cells (o=0 contributes e), expected counts from the full
    row×col grid."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({"event_type": df["event_type"],
                          "h": df["ts"].dt.hour.astype("int64"), "o": 1.0})
        return t.groupby(["event_type", "h"], as_index=False).sum()

    c = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["event_type", "h"], {"o": "sum"})
    grid = c.pivot(index="event_type", columns="h", values="o").fillna(0.0)
    o = grid.to_numpy(np.float64)
    n = o.sum()
    rt = o.sum(axis=1, keepdims=True)
    ct = o.sum(axis=0, keepdims=True)
    e = rt * ct / n
    chi2 = ((o - e) ** 2 / e).sum()
    k = min(o.shape[0], o.shape[1]) - 1
    v = np.sqrt(chi2 / (n * k)) if k > 0 else np.nan
    return pd.DataFrame({
        "n": [np.int64(n)], "n_rows_ct": [np.int64(o.shape[0])],
        "n_cols_ct": [np.int64(o.shape[1])],
        "chi2": rnd([chi2], 6), "cramers_v": rnd([v], 6)})


def q_hbos_events(sf_dir: str):
    """HBOS outlier score per event (Goldstein & Dengel 2012): sum of
    negative log densities over independent per-feature histograms —
    value in 10 equal-width global bins, hour-of-day in 24 bins. The
    histogram-lookup complement of zscore (HBOS sees multimodal shape;
    z sees one Gaussian). One (min,max) fold + one bounded bin-count
    fold, then a vectorized map-side lookup against the broadcast bin
    tables — shuffle-free scoring. Bin index uses the identical float
    expression ``floor((v - lo) * 10 / (hi - lo))`` engine- and
    oracle-side so the integer bins are bit-agreed."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "value"])

    def p_range(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].dropna()
        v = v[~np.isnan(v)]
        if not len(v):
            return pd.DataFrame({"k": [], "lo": [], "hi": []})
        return pd.DataFrame({"k": [0], "lo": [v.min()], "hi": [v.max()]})

    r = _fold(ds.map_batches(p_range, batch_format="pandas"),
              ["k"], {"lo": "min", "hi": "max"})
    lo, hi = float(r["lo"].iloc[0]), float(r["hi"].iloc[0])
    span = hi - lo

    def bins(df: pd.DataFrame):
        v = df["value"].to_numpy(np.float64)
        ok = ~np.isnan(v)
        vb = np.floor((v - lo) * 10.0 / span)
        vb = np.clip(vb, 0, 9).astype(np.int64)
        hb = df["ts"].dt.hour.to_numpy(np.int64)
        return v, ok, vb, hb

    def p_cnt(df: pd.DataFrame) -> pd.DataFrame:
        _, ok, vb, hb = bins(df)
        a = pd.DataFrame({"feat": "v", "b": vb[ok], "cnt": 1.0})
        b = pd.DataFrame({"feat": "h", "b": hb, "cnt": 1.0})
        return (pd.concat([a, b])
                .groupby(["feat", "b"], as_index=False).sum())

    m = _fold(ds.map_batches(p_cnt, batch_format="pandas"),
              ["feat", "b"], {"cnt": "sum"})
    vc = dict(zip(m[m["feat"] == "v"]["b"], m[m["feat"] == "v"]["cnt"]))
    hc = dict(zip(m[m["feat"] == "h"]["b"], m[m["feat"] == "h"]["cnt"]))
    n_val = float(sum(vc.values()))
    n_all = float(sum(hc.values()))
    v_tab = np.array([vc.get(i, 0.0) for i in range(10)])
    h_tab = np.array([hc.get(i, 0.0) for i in range(24)])
    refs = ray.put((v_tab, h_tab, n_val, n_all))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        vt, ht, nv, na = ray.get(refs)
        v, ok, vb, hb = bins(df)
        s_h = -(np.log(ht[hb]) - np.log(na))
        s_v = np.where(ok, -(np.log(vt[np.clip(vb, 0, 9)]) - np.log(nv)),
                       np.nan)
        return pd.DataFrame({"event_id": df["event_id"],
                             "hbos": rnd(s_v + s_h, 6)})

    # per-event output stays a Dataset — never driver-materialized
    return ds.map_batches(score, batch_format="pandas")


def q_attribution_events(sf_dir: str):
    """First-/last-touch conversion attribution: each 'purchase' event is
    credited to the user's first (resp. most recent) non-purchase event
    type strictly earlier in (ts, event_id) order — the marketing-
    attribution companion of funnel_events. Per-user sweep inside
    groupby(user).map_groups (one user's bounded series per task, the
    series contract), emitting per-model per-type partial counts that
    fold to the final frame; purchases with no prior touch are dropped
    by both sides."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        et = g["event_type"].to_numpy()
        np_mask = et != "purchase"
        idx = np.arange(len(g))
        last_np = np.maximum.accumulate(np.where(np_mask, idx, -1))
        prev_last = np.concatenate([[-1], last_np[:-1]])
        p = idx[~np_mask]
        credited = p[prev_last[p] >= 0]
        if not len(credited):
            return pd.DataFrame({"model": [], "event_type": [],
                                 "n_conversions": []})
        lt_types, lt_counts = np.unique(et[prev_last[credited]],
                                        return_counts=True)
        ft_type = et[idx[np_mask][0]]
        t = pd.DataFrame({
            "model": ["last_touch"] * len(lt_types) + ["first_touch"],
            "event_type": list(lt_types) + [ft_type],
            "n_conversions": list(lt_counts.astype(np.float64))
                             + [float(len(credited))]})
        return t.groupby(["model", "event_type"], as_index=False).sum()

    m = _fold(ds.groupby("user_id").map_groups(
        per_user, batch_format="pandas"),
        ["model", "event_type"], {"n_conversions": "sum"})
    m["n_conversions"] = m["n_conversions"].astype("int64")
    return (m.sort_values(["model", "event_type"])
             .reset_index(drop=True))


def q_clip_reverb_stats(sf_dir: str):
    """Reverb augmentation + blind RT60 audit in one decode
    (stages/audio_ops.ReverbClips): each clip is convolved with a
    deterministic synthetic room impulse response (planted RT60 cycles
    0.2-0.8 s by clip-id hash, decaying-noise RIR per Schroeder), then
    the ISO-3382-style -5..-35 dB decay fit reads the RT60 back from the
    wet signal — the augmentation and the audit validate each other end
    to end on the distributed path (recovery + partition-invariance
    pinned in test_audio_ops). Deterministic => fixture oracle."""
    from ..sources.clips import read_clips
    from ..stages import audio_ops as ao
    path = _clip_table_path(sf_dir)
    ds = read_clips(path, columns=["clip_id", "bytes"])
    return ao.reverb_table(ds)


def q_clip_hygiene_check(sf_dir: str):
    """Signal-hygiene audit per clip (stages/audio_ops.HygieneCheck):
    DC offset, subsonic (<20 Hz) rumble share, crest factor, flat-top
    ratio, and a 4-valued verdict in the reference's grading idiom —
    the capture-chain checks the spectral/loudness stages don't cover.
    Planted-defect physics (DC bias, 8 Hz rumble, hard limiting) pinned
    in test_audio_ops. Deterministic => fixture oracle."""
    from ..sources.clips import read_clips
    from ..stages import audio_ops as ao
    path = _clip_table_path(sf_dir)
    ds = read_clips(path, columns=["clip_id", "bytes"])
    return ao.hygiene_table(ds)


def q_clip_wow_flutter(sf_dir: str):
    """Wow & flutter audit per clip (stages/audio_ops.WowFlutterCheck):
    slow periodic pitch modulation from warped media / tape transports /
    bad resamplers — framewise ACF f0 track, cents deviation, modulation
    spectrum with the analysis window's sinc rolloff divided out. The
    pitch-STABILITY companion of clip_pitch_features (which reports one
    static f0). Planted-vibrato physics pinned in test_audio_ops.
    Deterministic => fixture oracle."""
    from ..sources.clips import read_clips
    from ..stages import audio_ops as ao
    path = _clip_table_path(sf_dir)
    ds = read_clips(path, columns=["clip_id", "bytes"])
    return ao.wow_flutter_table(ds)


def q_order_priority_check(sf_dir: str):
    """TPC-H Q4-shaped EXISTS semi-join: of the orders placed in a fixed
    quarter, how many (per priority) had any line item shipped more than
    60 days after the order date. Ray shape: lineitem collapses to a slim
    per-orderkey max-shipdate (per-batch partial max -> native groupby
    Max over int64 epoch-us — ONE exchange of 16-byte rows), the orders
    side is window-pruned at the scan, and the two slim keyed sets meet
    in a co-partitioned hash join; the late predicate and the priority
    count fold never touch raw line items."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({
            "l_orderkey": df["l_orderkey"],
            "ship_us": df["l_shipdate"].to_numpy("datetime64[us]")
                        .astype(np.int64)})
        return t.groupby("l_orderkey", as_index=False).max()

    from ray.data.aggregate import Max
    ship = (li.map_batches(pre, batch_format="pandas")
            .groupby("l_orderkey")
            .aggregate(Max(on="ship_us", alias_name="max_ship_us")))

    lo, hi = np.datetime64("1996-01-01"), np.datetime64("1996-04-01")
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])
    win = orders.map_batches(
        lambda df: df[(df["o_orderdate"].to_numpy() >= lo)
                      & (df["o_orderdate"].to_numpy() < hi)],
        batch_format="pandas")
    j = win.join(ship, join_type="inner", num_partitions=8,
                 on=("o_orderkey",), right_on=("l_orderkey",))
    late_us = np.int64(60 * 86400) * np.int64(1_000_000)

    def post(df: pd.DataFrame) -> pd.DataFrame:
        od_us = df["o_orderdate"].to_numpy("datetime64[us]").astype(np.int64)
        late = df["max_ship_us"].to_numpy(np.int64) > od_us + late_us
        return pd.DataFrame({"o_orderpriority": df["o_orderpriority"],
                             "n_orders": 1.0,
                             "n_late": late.astype(np.float64)}).groupby(
            "o_orderpriority", as_index=False).sum()

    m = _fold(j.map_batches(post, batch_format="pandas"),
              ["o_orderpriority"], {"n_orders": "sum", "n_late": "sum"})
    m["n_orders"] = m["n_orders"].astype("int64")
    m["n_late"] = m["n_late"].astype("int64")
    return m.sort_values("o_orderpriority").reset_index(drop=True)


def q_promo_revenue_lineitem(sf_dir: str):
    """TPC-H Q14-shaped conditional-aggregate join: the share of a
    quarter's discounted revenue coming from PROMO-type parts. The part
    dimension collapses to the promo keyset broadcast ONCE via ray.put
    (bounded-dimension contract — parts are SF x 200k keys, the keyset
    is a few MB of int64 at warehouse scale), so the lineitem fact scan
    is join-free and shuffle-free: one scalar (promo_rev, total_rev, n)
    fold. Revenue sums round at 2 dp and the share at 6 dp — float-fold
    noise is ~1e-9 of the half-ulp at these magnitudes."""
    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    promo_ref = ray.put(
        set(part.loc[part["p_type"] == "PROMO", "p_partkey"].tolist()))
    lo, hi = np.datetime64("1996-03-01"), np.datetime64("1996-06-01")
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["l_shipdate"].to_numpy() >= lo)
                & (df["l_shipdate"].to_numpy() < hi)]
        rev = (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy()
        isp = df["l_partkey"].isin(ray.get(promo_ref)).to_numpy()
        return pd.DataFrame({"k": [0], "promo_rev": [rev[isp].sum()],
                             "total_rev": [rev.sum()],
                             "n_items": [float(len(df))]})

    m = _fold(li.map_batches(partial, batch_format="pandas"),
              ["k"], {"promo_rev": "sum", "total_rev": "sum",
                      "n_items": "sum"})
    pr, tr = float(m["promo_rev"].iloc[0]), float(m["total_rev"].iloc[0])
    return pd.DataFrame({
        "n_items": [np.int64(m["n_items"].iloc[0])],
        "promo_rev": rnd([pr], 2), "total_rev": rnd([tr], 2),
        "promo_share_pct": rnd([100.0 * pr / tr], 6)})


def q_top_supplier_by_nation(sf_dir: str):
    """TPC-H Q15-shaped argmax join-back: each nation's top supplier(s)
    by lifetime discounted revenue, ties kept. The fact scan folds to
    per-suppkey revenue partials (bounded by the supplier dimension —
    SF x 10k rows — so the fold output is driver-safe by the
    bounded-dimension contract); the supplier and nation dimensions join
    on the driver and the per-nation max compares revenue AFTER the 2 dp
    round so the tie predicate operates on grid-exact doubles in both
    engines."""
    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_extendedprice", "l_discount"])

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_suppkey": df["l_suppkey"],
            "revenue": (df["l_extendedprice"]
                        * (1 - df["l_discount"])).to_numpy(),
        }).groupby("l_suppkey", as_index=False).sum()

    tot = _fold(li.map_batches(pre, batch_format="pandas"),
                ["l_suppkey"], {"revenue": "sum"})
    sup = _read(sf_dir, "supplier",
                ["s_suppkey", "s_name", "s_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    t = tot.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
    t = t.merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    t["revenue"] = rnd(t["revenue"], 2)
    mx = t.groupby("s_nationkey")["revenue"].transform("max")
    out = t.loc[t["revenue"] == mx,
                ["n_name", "s_suppkey", "s_name", "revenue"]]
    return out.sort_values(["n_name", "s_suppkey"]).reset_index(drop=True)


def q_burstiness_events(sf_dir: str):
    """Per-user inter-arrival statistics: mean gap, coefficient of
    variation, and the Goh-Barabási burstiness B = (σ−μ)/(σ+μ) over
    consecutive event gaps in (ts, event_id) order (B→−1 periodic,
    0 Poisson, →1 bursty). The behavioural-cadence companion of
    heartbeat_gaps (which thresholds single gaps). Per-user vectorized
    sweep inside groupby(user).map_groups — one bounded series per task,
    the series contract; gaps are exact int64 microsecond diffs divided
    by the same 1e6 constant as the SQL oracle, and σ uses the
    population raw-moment form both sides."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        gaps = np.diff(us) / 1e6
        n = len(gaps)
        if n < 2:
            return pd.DataFrame({"user_id": [], "n_gaps": [],
                                 "mean_gap_s": [], "cv": [],
                                 "burstiness": []})
        s, ss = gaps.sum(), (gaps * gaps).sum()
        mu = s / n
        sd = np.sqrt((ss - s * s / n) / n)
        return pd.DataFrame({
            "user_id": [g["user_id"].iloc[0]], "n_gaps": [np.int64(n)],
            "mean_gap_s": rnd([mu], 6), "cv": rnd([sd / mu], 6),
            "burstiness": rnd([(sd - mu) / (sd + mu)], 6)})

    def fix_types(df: pd.DataFrame) -> pd.DataFrame:
        df["n_gaps"] = df["n_gaps"].astype("int64")
        return df

    # per-user output stays a Dataset — entity count is corpus-scaled
    return (ds.groupby("user_id").map_groups(per_user,
                                             batch_format="pandas")
            .map_batches(fix_types, batch_format="pandas"))


def q_anova_hour_events(sf_dir: str):
    """Per-type one-way ANOVA across hour-of-day groups: F statistic and
    effect size η² = SSB/(SSB+SSW) — the numeric seasonality-strength
    companion of cramers_v (which sees only categorical association).
    ONE bounded fold at (type, hour) grain of (n, Σx, Σx²); between/
    within sums of squares form on the ≤ types×24 driver frame with the
    identical grouped-raw-moment expressions as the SQL oracle."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        ok = ~np.isnan(v)
        t = pd.DataFrame({"event_type": df["event_type"].to_numpy()[ok],
                          "h": df["ts"].dt.hour.to_numpy(np.int64)[ok],
                          "n": 1.0, "s": v[ok], "ss": v[ok] * v[ok]})
        return t.groupby(["event_type", "h"], as_index=False).sum()

    c = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["event_type", "h"], {"n": "sum", "s": "sum", "ss": "sum"})
    out = []
    for et, g in c.groupby("event_type"):
        n, k = g["n"].sum(), len(g)
        if k < 2 or n <= k:
            continue
        gm = g["s"].sum() / n
        mh = g["s"] / g["n"]
        ssb = (g["n"] * (mh - gm) * (mh - gm)).sum()
        ssw = (g["ss"] - g["s"] * g["s"] / g["n"]).sum()
        f = (ssb / (k - 1)) / (ssw / (n - k))
        out.append((et, np.int64(n), np.int64(k),
                    rnd(f, 6), rnd(ssb / (ssb + ssw), 6)))
    return pd.DataFrame(out, columns=[
        "event_type", "n", "n_hours", "f_stat", "eta_sq"]).sort_values(
        "event_type").reset_index(drop=True)


def q_audience_overlap_events(sf_dir: str):
    """Audience-overlap Jaccard between every event-type pair: of the
    users who do A and the users who do B, what fraction do both. ONE
    slim (user_id, event_type) shuffle: per-batch distinct pairs →
    groupby(user).map_groups dedupes within the user and expands to at
    most C(T,2) pair rows + T presence rows per user (T = #types, tiny)
    → one bounded count fold. Never materializes a per-type user set on
    the driver — the per-user expansion bounds memory by types², not
    users."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = sorted(set(g["event_type"]))
        rows = [("__n", t, 1.0) for t in ts]
        rows += [(a, b, 1.0) for i, a in enumerate(ts) for b in ts[i + 1:]]
        return pd.DataFrame(rows, columns=["a", "b", "cnt"])

    m = _fold(ds.map_batches(pre, batch_format="pandas")
              .groupby("user_id").map_groups(per_user,
                                             batch_format="pandas"),
              ["a", "b"], {"cnt": "sum"})
    n_of = dict(zip(m.loc[m["a"] == "__n", "b"],
                    m.loc[m["a"] == "__n", "cnt"]))
    p = m[m["a"] != "__n"].copy()
    p["n_a"] = p["a"].map(n_of).astype("int64")
    p["n_b"] = p["b"].map(n_of).astype("int64")
    p["n_both"] = p["cnt"].astype("int64")
    p["jaccard"] = rnd(p["n_both"] / (p["n_a"] + p["n_b"] - p["n_both"]), 6)
    return (p.rename(columns={"a": "type_a", "b": "type_b"})
            [["type_a", "type_b", "n_a", "n_b", "n_both", "jaccard"]]
            .sort_values(["type_a", "type_b"]).reset_index(drop=True))


def q_class_separability_embeddings(sf_dir: str):
    """Embedding-space class-separability audit (Fisher-style): per-label
    centroid norm, within-class mean-square scatter, distance to the
    grand centroid, and the overall between/within Fisher ratio — the
    label-quality check a training pipeline runs before trusting an
    embedding column. ONE pass: per-batch partials of (n, Σx per dim,
    Σ‖x‖²) per label fold to a labels×(dim+2) driver frame (bounded by
    the label vocabulary, not corpus size); all geometry happens on the
    folded moments."""
    ds = _read(sf_dir, "embeddings", ["embedding", "label"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"label": pd.Series([], dtype="int64"),
                                 "n": [], "ss": []})
        X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        lab = df["label"].to_numpy()
        out = []
        for lv in np.unique(lab):
            sub = X[lab == lv]
            row = {"label": int(lv), "n": float(len(sub)),
                   "ss": float((sub * sub).sum())}
            s = sub.sum(axis=0)
            row.update({f"s{j}": s[j] for j in range(X.shape[1])})
            out.append(row)
        return pd.DataFrame(out)

    p0 = ds.map_batches(partial, batch_format="pandas")
    dim_cols = [c for c in p0.schema().names if c.startswith("s")
                and c != "ss"]
    m = _fold(p0, ["label"], {c: "sum" for c in ["n", "ss"] + dim_cols})
    dim = len(dim_cols)
    S = m[dim_cols].to_numpy(np.float64)
    n = m["n"].to_numpy(np.float64)
    N = n.sum()
    mu = S / n[:, None]
    grand = S.sum(axis=0) / N
    within = (m["ss"].to_numpy(np.float64)
              - (S * S).sum(axis=1) / n) / (n * dim)
    d2 = ((mu - grand) ** 2).sum(axis=1)
    between_ms = float((n * d2).sum() / (N * dim))
    pooled_within = float((n * within).sum() / N)
    out = pd.DataFrame({
        "label": m["label"].astype("int64"),
        "n": n.astype("int64"),
        "centroid_norm": rnd(np.sqrt((mu * mu).sum(axis=1)), 6),
        "within_ms": rnd(within, 6),
        "dist_to_grand": rnd(np.sqrt(d2), 6),
        "fisher_overall": rnd(np.full(len(n), between_ms / pooled_within),
                              6)})
    return out.sort_values("label").reset_index(drop=True)


def q_seasonal_decompose_events(sf_dir: str):
    """Two-way additive seasonal decomposition of value on (day-of-week,
    hour-of-day): grand mean + dow effect + hour effect vs the observed
    cell mean, residual reported per cell — the model-fit companion of
    anova_hour (one factor) and cube (raw lattice). ONE bounded fold at
    (dow, hour) grain of (n, Σx); all effects derive from the ≤ 7×24
    driver frame with the identical marginal-mean expressions as the
    SQL oracle."""
    ds = _read(sf_dir, "events", ["ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        ok = ~np.isnan(v)
        t = pd.DataFrame({"dow": df["ts"].dt.dayofweek.to_numpy(np.int64)[ok],
                          "h": df["ts"].dt.hour.to_numpy(np.int64)[ok],
                          "n": 1.0, "s": v[ok]})
        return t.groupby(["dow", "h"], as_index=False).sum()

    c = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["dow", "h"], {"n": "sum", "s": "sum"})
    N, S = c["n"].sum(), c["s"].sum()
    grand = S / N
    dm = c.groupby("dow").agg(n=("n", "sum"), s=("s", "sum"))
    hm = c.groupby("h").agg(n=("n", "sum"), s=("s", "sum"))
    dow_eff = (dm["s"] / dm["n"] - grand).to_dict()
    hour_eff = (hm["s"] / hm["n"] - grand).to_dict()
    cell = c["s"] / c["n"]
    fit = grand + c["dow"].map(dow_eff) + c["h"].map(hour_eff)
    out = pd.DataFrame({
        "dow": c["dow"].astype("int64"), "hour": c["h"].astype("int64"),
        "n": c["n"].astype("int64"),
        "cell_mean": rnd(cell, 6), "additive_fit": rnd(fit, 6),
        "residual": rnd(cell - fit, 6)})
    return out.sort_values(["dow", "hour"]).reset_index(drop=True)


def q_columnar_roundtrip_events(sf_dir: str):
    """ORC + Arrow-IPC source/sink conformance (sources/columnar): the
    events table is written to both formats (one file per block, flat
    resumable layout + manifest), read back with column pruning to just
    (event_type, value), and aggregated per type — the per-format rows
    must agree with the parquet truth, which is exactly what the oracle
    recomputes. Exercises the full write→read→prune→fold path of both
    formats on every gate run."""
    import shutil
    from ..sources import columnar as cs
    sf = os.path.basename(os.path.normpath(sf_dir))
    base = f"/tmp/adr_columnar/{sf}"
    ds = _read(sf_dir, "events", ["event_type", "value"])
    out = []
    for fmt in ("orc", "ipc"):
        d = os.path.join(base, fmt)
        shutil.rmtree(d, ignore_errors=True)
        man = cs.write_columnar(ds, d, fmt=fmt)
        back = (cs.read_orc(d, columns=["event_type", "value"])
                if fmt == "orc"
                else cs.read_ipc(d, columns=["event_type", "value"]))

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            v = df["value"].to_numpy(np.float64)
            ok = ~np.isnan(v)
            return pd.DataFrame({
                "event_type": df["event_type"].to_numpy()[ok],
                "n": 1.0, "s": v[ok]}).groupby(
                "event_type", as_index=False).sum()

        m = _fold(back.map_batches(partial, batch_format="pandas"),
                  ["event_type"], {"n": "sum", "s": "sum"})
        m.insert(0, "fmt", fmt)
        del man  # manifest↔row-count equality is pinned in test_columnar
        out.append(m)
    r = pd.concat(out, ignore_index=True)
    r["n"] = r["n"].astype("int64")
    r["sum_value"] = rnd(r.pop("s"), 6)
    return (r[["fmt", "event_type", "n", "sum_value"]]
            .sort_values(["fmt", "event_type"]).reset_index(drop=True))


def q_cdc_compact_events(sf_dir: str):
    """CDC changelog compaction (dedup-keep-latest): the events stream
    read as a change log of (user, event_type) entity state — keep each
    entity's most recent row by (ts, event_id). The upsert-materialize
    step every warehouse ingest runs. Two-phase argmax: per-batch
    keep-last collapses the shuffle to ≤ one row per (entity, batch),
    then one keyed map_groups picks the global latest — no global sort,
    and the survivor row passes through bit-exact (no recomputed
    values)."""
    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        return df.groupby(["user_id", "event_type"], as_index=False).tail(1)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["ts", "event_id"], kind="mergesort").tail(
            1)[["user_id", "event_type", "event_id", "ts", "value"]]

    # compacted output stays a Dataset — entity count is corpus-scaled
    return (ds.map_batches(partial, batch_format="pandas")
            .groupby(["user_id", "event_type"])
            .map_groups(merge, batch_format="pandas"))


def q_float_anomaly_audit(sf_dir: str):
    """IEEE-float hygiene audit of the events value column: NaN / ±inf /
    subnormal / integer-valued counts and shares — the numeric-payload
    conformance check a validation engine runs before trusting
    aggregates (a subnormal or inf burst is a classic upstream-sensor
    failure signature). ONE shuffle-free scalar fold; the subnormal
    predicate (0 < |x| < 2^-1022) and integer-valued predicate
    (floor(x) = x on finite values) are expressed identically in the
    SQL oracle."""
    ds = _read(sf_dir, "events", ["value"])
    tiny = 2.0 ** -1022

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        present = ~pd.isna(df["value"]).to_numpy()
        nan = present & np.isnan(v)
        inf = np.isinf(v)
        fin = present & ~nan & ~inf
        sub = fin & (np.abs(v) < tiny) & (v != 0.0)
        with np.errstate(invalid="ignore"):
            iv = fin & (np.floor(v) == v)
        return pd.DataFrame({
            "k": [0], "n": [float(len(v))],
            "n_null": [float((~present).sum())],
            "n_nan": [float(nan.sum())], "n_inf": [float(inf.sum())],
            "n_subnormal": [float(sub.sum())],
            "n_integer": [float(iv.sum())], "n_finite": [float(fin.sum())]})

    m = _fold(ds.map_batches(partial, batch_format="pandas"), ["k"],
              {c: "sum" for c in ["n", "n_null", "n_nan", "n_inf",
                                  "n_subnormal", "n_integer", "n_finite"]})
    r = m.iloc[0]
    out = pd.DataFrame({c: [np.int64(r[c])] for c in
                        ["n", "n_null", "n_nan", "n_inf", "n_subnormal",
                         "n_integer", "n_finite"]})
    out["frac_integer"] = rnd([r["n_integer"] / r["n_finite"]]
                              if r["n_finite"] else [np.nan], 6)
    return out


def q_pmi_collocations_documents(sf_dir: str):
    """Top-20 collocations by pointwise mutual information with minimum
    support 5 — the association-strength companion of bigram_topk (raw
    counts rank glue words; PMI ranks genuinely bound pairs).
    Tokenization is exactly SQL string_split(text, ' '); unigram and
    bigram count partials fold in ONE pass each (vocabulary-bounded);
    the PMI expression ln((cab/Nb) / ((ca/Nu) * (cb/Nu))) is written
    identically engine- and oracle-side so the doubles — and therefore
    the (pmi DESC, w1, w2) order — agree bit-for-bit."""
    ds = _read(sf_dir, "documents", ["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        uni: Counter = Counter()
        bi: Counter = Counter()
        for s in df["text"].to_numpy():
            if not isinstance(s, str):
                continue
            w = s.split(" ")
            uni.update(w)
            bi.update(zip(w[:-1], w[1:]))
        rows = [("u", k, "", float(v)) for k, v in uni.items()]
        rows += [("b", k[0], k[1], float(v)) for k, v in bi.items()]
        return pd.DataFrame(rows, columns=["kind", "w1", "w2", "n"])

    m = _fold(ds.map_batches(partial, batch_format="pandas"),
              ["kind", "w1", "w2"], {"n": "sum"})
    u = m[m["kind"] == "u"].set_index("w1")["n"]
    b = m[m["kind"] == "b"].copy()
    nu, nb = float(u.sum()), float(b["n"].sum())
    b = b[b["n"] >= 5.0]
    ca = b["w1"].map(u).to_numpy(np.float64)
    cb = b["w2"].map(u).to_numpy(np.float64)
    cab = b["n"].to_numpy(np.float64)
    b["pmi"] = np.log((cab / nb) / ((ca / nu) * (cb / nu)))
    b = b.sort_values(["pmi", "w1", "w2"], ascending=[False, True, True],
                      kind="mergesort").head(20)
    return pd.DataFrame({
        "w1": b["w1"].to_numpy(), "w2": b["w2"].to_numpy(),
        "n_pair": b["n"].astype("int64").to_numpy(),
        "pmi": rnd(b["pmi"].to_numpy(), 6)}).reset_index(drop=True)


def q_pca_variance_embeddings(sf_dir: str):
    """PCA spectrum audit of the embedding column: eigenvalues of the
    full 64×64 sample covariance (same ONE-pass (XᵀX, Σx, n) fold as
    covariance_embeddings, corpus-size-independent driver merge),
    reported as explained-variance ratio, cumulative ratio, and the
    participation ratio (effective dimensionality (Σλ)²/Σλ² — a
    collapsed embedding space shows eff_dim ≪ dim). Deterministic
    (numpy eigh on the folded matrix) => fixture oracle; spectrum
    properties (ratios sum to 1, isotropy of the synth generator) are
    pinned in test_similarity_iforest."""
    emb = _read(sf_dir, "embeddings", ["embedding"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"xtx": [], "s": [], "n": []})
        X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        return pd.DataFrame({"xtx": [(X.T @ X).tobytes()],
                             "s": [X.sum(axis=0).tobytes()],
                             "n": [len(X)]})

    p = emb.map_batches(partial, batch_format="pandas").to_pandas()
    d = len(np.frombuffer(p["s"].iloc[0]))
    xtx = np.sum([np.frombuffer(b).reshape(d, d) for b in p["xtx"]],
                 axis=0)
    s = np.sum([np.frombuffer(b) for b in p["s"]], axis=0)
    n = int(p["n"].sum())
    cov = (xtx - np.outer(s, s) / n) / (n - 1)
    lam = np.linalg.eigvalsh(cov)[::-1]
    lam = np.maximum(lam, 0.0)
    tot = lam.sum()
    ratio = lam / tot
    eff = float(tot * tot / (lam * lam).sum())
    return pd.DataFrame({
        "rank": np.arange(1, d + 1, dtype=np.int64),
        "eigenvalue": rnd(lam, 6),
        "var_ratio": rnd(ratio, 6),
        "cum_ratio": rnd(np.cumsum(ratio), 6),
        "eff_dim": rnd(np.full(d, eff), 4)})


def q_pca_project_embeddings(sf_dir: str):
    """PCA dimensionality-reduction TRANSFORM: project every embedding
    onto the top-8 principal components — the write-path companion of
    pca_variance_embeddings (which only reports the spectrum). Same
    one-pass (XᵀX, Σx, n) fold; the eigenbasis and mean broadcast once
    via ray.put and the projection is one matmul per batch — the
    fit-small/transform-everything pattern every embedding compactor
    at 100 TB needs. Eigenvector sign is pinned (largest-|component|
    coordinate made positive) so the fixture is orientation-stable;
    streaming Dataset output (corpus-scaled rows)."""
    K = 8
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"xtx": [], "s": [], "n": []})
        X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        return pd.DataFrame({"xtx": [(X.T @ X).tobytes()],
                             "s": [X.sum(axis=0).tobytes()],
                             "n": [len(X)]})

    p = emb.map_batches(partial, batch_format="pandas").to_pandas()
    d = len(np.frombuffer(p["s"].iloc[0]))
    xtx = np.sum([np.frombuffer(b).reshape(d, d) for b in p["xtx"]],
                 axis=0)
    s = np.sum([np.frombuffer(b) for b in p["s"]], axis=0)
    n = int(p["n"].sum())
    mean = s / n
    cov = (xtx - np.outer(s, s) / n) / (n - 1)
    lam, vec = np.linalg.eigh(cov)
    order = np.argsort(lam)[::-1][:K]
    W = vec[:, order]
    # orientation pin: flip each PC so its largest-|x| coordinate is +
    flip = np.sign(W[np.argmax(np.abs(W), axis=0),
                     np.arange(W.shape[1])])
    W = W * np.where(flip == 0.0, 1.0, flip)[None, :]
    mean_ref, w_ref = ray.put(mean), ray.put(W)

    def project(df: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        Z = rnd((X - ray.get(mean_ref)[None, :]) @ ray.get(w_ref), 6)
        out = {"vec_id": df["vec_id"].to_numpy(np.int64)}
        for j in range(Z.shape[1]):      # wide pc0..pc7: the gate's
            out[f"pc{j}"] = Z[:, j]      # canon can't sort list cells
        return pd.DataFrame(out)

    return emb.map_batches(project, batch_format="pandas")


def q_encoding_audit_documents(sf_dir: str):
    """Text-encoding conformance audit: documents containing C0 control
    characters (excluding tab/newline/CR), U+FFFD replacement chars
    (mojibake fingerprint), zero-width characters, any non-ASCII, and
    NFC-instability (text != unicodedata NFC) — the ingest checks a text
    corpus needs before tokenization. ONE shuffle-free scalar fold of
    per-batch vectorized regex counts (patterns compiled once per task);
    predicates mirror the oracle's regexp_matches / nfc_normalize
    exactly."""
    ds = _read(sf_dir, "documents", ["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        import unicodedata
        s = df["text"].dropna().astype(str)
        ctrl = s.str.contains("[\x00-\x08\x0b\x0c\x0e-\x1f]", regex=True)
        repl = s.str.contains("�", regex=False)
        zw = s.str.contains("[​‌‍﻿]", regex=True)
        nonascii = s.str.contains("[^\x00-\x7f]", regex=True)
        nfc = np.fromiter((unicodedata.normalize("NFC", x) != x
                           for x in s), dtype=bool, count=len(s))
        return pd.DataFrame({
            "k": [0], "n_docs": [float(len(df))],
            "n_text": [float(len(s))],
            "n_control": [float(ctrl.sum())],
            "n_replacement": [float(repl.sum())],
            "n_zero_width": [float(zw.sum())],
            "n_non_ascii": [float(nonascii.sum())],
            "n_nfc_unstable": [float(nfc.sum())]})

    cols = ["n_docs", "n_text", "n_control", "n_replacement",
            "n_zero_width", "n_non_ascii", "n_nfc_unstable"]
    m = _fold(ds.map_batches(partial, batch_format="pandas"), ["k"],
              {c: "sum" for c in cols})
    r = m.iloc[0]
    out = pd.DataFrame({c: [np.int64(r[c])] for c in cols})
    out["frac_non_ascii"] = rnd([r["n_non_ascii"] / r["n_text"]]
                                if r["n_text"] else [np.nan], 6)
    return out


def q_tukey_outliers_events(sf_dir: str):
    """Tukey-fence outlier audit per event type: Q1/Q3, the 1.5·IQR
    fences, and how many values fall outside each — the nonparametric
    complement of zscore (fences don't assume normality). Two passes:
    exact per-type quartiles via a slim (type, value) groupby
    (np.quantile linear ≡ DuckDB quantile_cont, the winsorize
    precedent), then a shuffle-free map-side count against the
    broadcast fence table."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=["value"])
        return pd.DataFrame({"event_type": d["event_type"].to_numpy(),
                             "value": d["value"].to_numpy(np.float64)})

    def grp(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy(np.float64)
        q1, q3 = float(np.quantile(v, 0.25)), float(np.quantile(v, 0.75))
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "q1": [q1], "q3": [q3]})

    fences = (ds.map_batches(prep, batch_format="pandas")
              .groupby("event_type").map_groups(grp,
                                                batch_format="pandas")
              .to_pandas())
    fences["lo"] = fences["q1"] - 1.5 * (fences["q3"] - fences["q1"])
    fences["hi"] = fences["q3"] + 1.5 * (fences["q3"] - fences["q1"])
    ref = ray.put(fences.set_index("event_type")[["lo", "hi"]])

    def count(df: pd.DataFrame) -> pd.DataFrame:
        f = ray.get(ref)
        d = df.dropna(subset=["value"])
        v = d["value"].to_numpy(np.float64)
        lo = d["event_type"].map(f["lo"]).to_numpy(np.float64)
        hi = d["event_type"].map(f["hi"]).to_numpy(np.float64)
        return pd.DataFrame({
            "event_type": d["event_type"].to_numpy(), "n": 1.0,
            "n_low": (v < lo).astype(np.float64),
            "n_high": (v > hi).astype(np.float64)}).groupby(
            "event_type", as_index=False).sum()

    m = _fold(ds.map_batches(count, batch_format="pandas"),
              ["event_type"], {"n": "sum", "n_low": "sum",
                               "n_high": "sum"})
    out = fences.merge(m, on="event_type")
    for c in ["n", "n_low", "n_high"]:
        out[c] = out[c].astype("int64")
    for c in ["q1", "q3", "lo", "hi"]:
        out[c] = rnd(out[c], 6)
    return (out[["event_type", "n", "q1", "q3", "lo", "hi",
                 "n_low", "n_high"]]
            .sort_values("event_type").reset_index(drop=True))


def q_runs_test_events(sf_dir: str):
    """Wald–Wolfowitz runs test per user: is the sign sequence of
    (value − user median) random in (ts, event_id) order, or does it
    streak (stuck sensor) / alternate (oscillation)? The randomness
    audit the mean/variance monitors can't see. Per-user vectorized
    sweep in groupby(user).map_groups (bounded series contract); exact
    closed forms for E[R] and Var[R]; users with n1 < 5 or n2 < 5 are
    dropped by both sides (normal approximation invalid)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.dropna(subset=["value"]).sort_values(
            ["ts", "event_id"], kind="mergesort")
        v = g["value"].to_numpy(np.float64)
        med = float(np.quantile(v, 0.5)) if len(v) else np.nan
        s = v[v != med] > med
        n1, n2 = int(s.sum()), int((~s).sum())
        if n1 < 5 or n2 < 5:
            return pd.DataFrame({"user_id": [], "n_runs": [],
                                 "n_above": [], "n_below": [], "z": []})
        r = 1 + int((s[1:] != s[:-1]).sum())
        n = n1 + n2
        er = 1.0 + 2.0 * n1 * n2 / n
        vr = (2.0 * n1 * n2 * (2.0 * n1 * n2 - n)
              / (n * n * (n - 1.0)))
        return pd.DataFrame({
            "user_id": [g["user_id"].iloc[0]],
            "n_runs": [np.int64(r)], "n_above": [np.int64(n1)],
            "n_below": [np.int64(n2)],
            "z": rnd([(r - er) / np.sqrt(vr)], 6)})

    def fix(df: pd.DataFrame) -> pd.DataFrame:
        for c in ["n_runs", "n_above", "n_below"]:
            df[c] = df[c].astype("int64")
        return df

    return (ds.groupby("user_id").map_groups(per_user,
                                             batch_format="pandas")
            .map_batches(fix, batch_format="pandas"))


def q_cardinality_profile_orders(sf_dir: str):
    """Referential-cardinality profile: the distribution of line-item
    counts per order, plus orders with NO lines — the fan-out audit that
    referential existence checks can't see (a 1:N relation whose N
    drifts is an upstream bug even when every key resolves). Lineitem
    folds to per-order counts (slim native groupby), the count-of-counts
    is a second tiny fold, and zero-line orders come from an anti-join
    of the orders keyset against the per-order count table (two-regime
    via the fold helper, no driver keyset at scale — gate sizes use the
    broadcast regime)."""
    li = _read(sf_dir, "lineitem", ["l_orderkey"])

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        t = df.groupby("l_orderkey", as_index=False).size()
        return t.rename(columns={"size": "n_lines"}).astype(
            {"n_lines": "float64"})

    per_order = _fold(li.map_batches(pre, batch_format="pandas"),
                      ["l_orderkey"], {"n_lines": "sum"})
    dist = (per_order.groupby("n_lines").size()
            .rename("n_orders").reset_index())
    with_lines = ray.put(frozenset(per_order["l_orderkey"].tolist()))
    orders = _read(sf_dir, "orders", ["o_orderkey"])

    def zero(df: pd.DataFrame) -> pd.DataFrame:
        k = ray.get(with_lines)
        return pd.DataFrame({
            "k": [0],
            "n": [float((~df["o_orderkey"].isin(k)).sum())]})

    z = _fold(orders.map_batches(zero, batch_format="pandas"),
              ["k"], {"n": "sum"})
    rows = [(np.int64(0), np.int64(z["n"].iloc[0]))] + [
        (np.int64(r["n_lines"]), np.int64(r["n_orders"]))
        for _, r in dist.iterrows()]
    out = pd.DataFrame(rows, columns=["n_lines", "n_orders"])
    out = out[out["n_orders"] > 0]
    return out.sort_values("n_lines").reset_index(drop=True)


def q_monthly_revenue_lineitem(sf_dir: str):
    """Monthly discounted-revenue trend with month-over-month percent
    change — the business-calendar companion of wow_change (hourly) over
    the warehouse fact table. ONE bounded fold at month grain (≤ ~84
    cells for the 7-year range); the MoM change derives on the driver
    with the identical lag expression as the window oracle. Revenue is
    summed EXACTLY in integer 10⁻⁴-dollar units (cents(price) ×
    percent(1−discount), both 2-dp inputs) — a float fold of thousands
    of ~1e7 terms lands on .xx5 rounding boundaries often enough to
    flip a month (observed at sf0.001), integer sums never do."""
    li = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_extendedprice", "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(df["l_extendedprice"].to_numpy(np.float64)
                         * 100.0).astype(np.int64)
        pct = np.round((1.0 - df["l_discount"].to_numpy(np.float64))
                       * 100.0).astype(np.int64)
        ym = (df["l_shipdate"].dt.year * 100
              + df["l_shipdate"].dt.month).to_numpy(np.int64)
        return pd.DataFrame({"ym": ym, "rev_1e4": cents * pct,
                             "n_items": 1.0}).groupby(
            "ym", as_index=False).sum()

    m = _fold(li.map_batches(partial, batch_format="pandas"),
              ["ym"], {"rev_1e4": "sum", "n_items": "sum"})
    m = m.sort_values("ym").reset_index(drop=True)
    m["revenue"] = rnd(m.pop("rev_1e4") / 10000.0, 2)
    prev = m["revenue"].shift(1)
    m["mom_pct"] = rnd(100.0 * (m["revenue"] - prev) / prev, 6)
    m["n_items"] = m["n_items"].astype("int64")
    return m[["ym", "n_items", "revenue", "mom_pct"]]


def q_wasserstein_drift_events(sf_dir: str):
    """Grid-Wasserstein (W1) drift per event type between the first and
    second half of the table's time range — the magnitude-aware companion
    of drift_events_psi: PSI is scale-free and saturates on disjoint
    supports, W1 reports the actual mass-transport distance in value
    units, so "mean shifted by 0.3" and "mean shifted by 30" grade
    differently. Distributions are quantized on a 20-cell equal-width
    global grid — the scale path: exact W1 needs per-type sorted values
    (an all-to-all sort per scalar at 10^12 rows), while the grid version
    is two bounded mergeable folds (epoch+value range, then
    (type, period, bin) counts) and a ≤ types×2×20 driver table. W1 =
    Σ|cdf_a − cdf_b| × cell width over the first B−1 cells (the last
    cell's term is exactly 0: integer cumulative counts equal n). Bin
    expression identical engine- and oracle-side."""
    B = 20
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def p_range(df: pd.DataFrame) -> pd.DataFrame:
        # ts range is emitted UNCONDITIONALLY (the oracle's time-range
        # CTE is unfiltered, so an all-NaN-value batch must still widen
        # lo_us/hi_us); only the value lo/hi needs the NaN guard —
        # fold_partials' pandas min/max skips the NaN placeholders.
        if not len(df):
            return pd.DataFrame({"k": [], "lo_us": [], "hi_us": [],
                                 "lo": [], "hi": []})
        v = df["value"].to_numpy(np.float64)
        keep = ~np.isnan(v)
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        vlo = v[keep].min() if keep.any() else np.nan
        vhi = v[keep].max() if keep.any() else np.nan
        return pd.DataFrame({"k": [0], "lo_us": [us.min()],
                             "hi_us": [us.max()],
                             "lo": [vlo], "hi": [vhi]})

    r = _fold(ds.map_batches(p_range, batch_format="pandas"),
              ["k"], {"lo_us": "min", "hi_us": "max",
                      "lo": "min", "hi": "max"})
    mid = (int(r["lo_us"].iloc[0]) + int(r["hi_us"].iloc[0])) // 2
    lo, hi = float(r["lo"].iloc[0]), float(r["hi"].iloc[0])
    span = hi - lo

    def p_bins(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        keep = ~np.isnan(v)
        df, v = df[keep], v[keep]
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        per = np.where(us < mid, "a", "b")
        if span > 0:
            b = np.clip(np.floor((v - lo) * float(B) / span), 0, B - 1)
        else:
            b = np.zeros(len(v))
        t = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                          "period": per, "bin": b.astype(np.int64),
                          "n": 1.0})
        return t.groupby(["event_type", "period", "bin"],
                         as_index=False).sum()

    c = _fold(ds.map_batches(p_bins, batch_format="pandas"),
              ["event_type", "period", "bin"], {"n": "sum"})
    out = []
    for et in sorted(c["event_type"].unique()):
        g = c[c["event_type"] == et]
        cnt = {}
        for per in ("a", "b"):
            h = np.zeros(B, dtype=np.int64)
            gp = g[g["period"] == per]
            h[gp["bin"].to_numpy(np.int64)] = gp["n"].to_numpy(np.int64)
            cnt[per] = h
        na, nb = int(cnt["a"].sum()), int(cnt["b"].sum())
        if na == 0 or nb == 0:
            continue
        ca = np.cumsum(cnt["a"]).astype(np.float64) / na
        cb = np.cumsum(cnt["b"]).astype(np.float64) / nb
        s = float(np.abs(ca[:B - 1] - cb[:B - 1]).sum())
        out.append((et, np.int64(na), np.int64(nb),
                    rnd(s * span / B, 6)))
    return pd.DataFrame(out, columns=["event_type", "n_a", "n_b", "w1"])


def q_jsd_drift_events(sf_dir: str):
    """Jensen-Shannon divergence per event type between the first and
    second half of the time range, on the same 20-cell equal-width grid
    as wasserstein_drift_events — the bounded symmetric companion (JSD
    ∈ [0, ln 2] never saturates to ∞ on disjoint supports the way PSI's
    log-ratio does with its epsilon floor). Same two bounded mergeable
    folds; the per-bin p·ln(2p/(p+q)) expression is written identically
    engine- and oracle-side (0·ln 0 terms are dropped by the p>0 filter
    both sides)."""
    B = 20
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def p_range(df: pd.DataFrame) -> pd.DataFrame:
        # ts range is emitted UNCONDITIONALLY (the oracle's time-range
        # CTE is unfiltered, so an all-NaN-value batch must still widen
        # lo_us/hi_us); only the value lo/hi needs the NaN guard —
        # fold_partials' pandas min/max skips the NaN placeholders.
        if not len(df):
            return pd.DataFrame({"k": [], "lo_us": [], "hi_us": [],
                                 "lo": [], "hi": []})
        v = df["value"].to_numpy(np.float64)
        keep = ~np.isnan(v)
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        vlo = v[keep].min() if keep.any() else np.nan
        vhi = v[keep].max() if keep.any() else np.nan
        return pd.DataFrame({"k": [0], "lo_us": [us.min()],
                             "hi_us": [us.max()],
                             "lo": [vlo], "hi": [vhi]})

    r = _fold(ds.map_batches(p_range, batch_format="pandas"),
              ["k"], {"lo_us": "min", "hi_us": "max",
                      "lo": "min", "hi": "max"})
    mid = (int(r["lo_us"].iloc[0]) + int(r["hi_us"].iloc[0])) // 2
    lo, hi = float(r["lo"].iloc[0]), float(r["hi"].iloc[0])
    span = hi - lo

    def p_bins(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        keep = ~np.isnan(v)
        df, v = df[keep], v[keep]
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        per = np.where(us < mid, "a", "b")
        if span > 0:
            b = np.clip(np.floor((v - lo) * float(B) / span), 0, B - 1)
        else:
            b = np.zeros(len(v))
        t = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                          "period": per, "bin": b.astype(np.int64),
                          "n": 1.0})
        return t.groupby(["event_type", "period", "bin"],
                         as_index=False).sum()

    c = _fold(ds.map_batches(p_bins, batch_format="pandas"),
              ["event_type", "period", "bin"], {"n": "sum"})
    out = []
    for et in sorted(c["event_type"].unique()):
        g = c[c["event_type"] == et]
        cnt = {}
        for per in ("a", "b"):
            h = np.zeros(B, dtype=np.int64)
            gp = g[g["period"] == per]
            h[gp["bin"].to_numpy(np.int64)] = gp["n"].to_numpy(np.int64)
            cnt[per] = h
        na, nb = int(cnt["a"].sum()), int(cnt["b"].sum())
        if na == 0 or nb == 0:
            continue
        p = cnt["a"].astype(np.float64) / na
        q = cnt["b"].astype(np.float64) / nb
        m = p + q
        pm = p > 0
        qm = q > 0
        jsd = 0.5 * float(np.sum(p[pm] * np.log(2.0 * p[pm] / m[pm]))) \
            + 0.5 * float(np.sum(q[qm] * np.log(2.0 * q[qm] / m[qm])))
        out.append((et, np.int64(na), np.int64(nb), rnd(jsd, 6)))
    return pd.DataFrame(out, columns=["event_type", "n_a", "n_b", "jsd"])


def q_volume_shipping_nations(sf_dir: str):
    """TPC-H Q7-shaped bi-directional nation-pair trade flow: discounted
    revenue by (supplier nation, customer nation, ship year) for the
    NATION_3<->NATION_8 pair, 1996-1997 (nations chosen to hold suppliers at every test scale). Ray shape: supplier and customer
    nation keys become dense-array broadcast lookups (ray.put once);
    lineitem pre-filters to the two supplier nations AT THE SCAN (the
    pair predicate halves again post-join) and pre-reduces to
    (orderkey, s_nat, year, revenue) before the single co-partitioned
    join with orders; the pair filter + year grouping fold driver-side
    (<= 2x2x#years tiny rows)."""
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    cusd = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    pair = nat.set_index("n_name").loc[["NATION_3", "NATION_8"],
                                       "n_nationkey"].to_numpy(np.int64)
    n1, n2 = int(pair[0]), int(pair[1])
    nat_name = dict(zip(nat["n_nationkey"], nat["n_name"]))

    sup_nat = np.full(int(sup["s_suppkey"].max()) + 1, -1, dtype=np.int64)
    sup_nat[sup["s_suppkey"].to_numpy()] = sup["s_nationkey"].to_numpy()
    cus_nat = np.full(int(cusd["c_custkey"].max()) + 1, -1, dtype=np.int64)
    cus_nat[cusd["c_custkey"].to_numpy()] = cusd["c_nationkey"].to_numpy()
    sup_ref, cus_ref = ray.put(sup_nat), ray.put(cus_nat)

    lo, hi = np.datetime64("1996-01-01"), np.datetime64("1998-01-01")
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                "l_shipdate"])

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        sn = ray.get(sup_ref)
        s_nat = sn[df["l_suppkey"].to_numpy()]
        m = ((df["l_shipdate"].to_numpy() >= lo)
             & (df["l_shipdate"].to_numpy() < hi)
             & ((s_nat == n1) | (s_nat == n2)))
        df = df[m]
        # revenue folds EXACTLY in integer 1e-4-dollar units (cents x
        # percent) — year-pair grain sums thousands of ~1e7 terms, the
        # shape that flipped a .xx5 round boundary at month grain
        cents = np.round(df["l_extendedprice"].to_numpy(np.float64)
                         * 100.0).astype(np.int64)
        pct = np.round((1.0 - df["l_discount"].to_numpy(np.float64))
                       * 100.0).astype(np.int64)
        return (pd.DataFrame({
            "l_orderkey": df["l_orderkey"],
            "s_nat": s_nat[m],
            "year": df["l_shipdate"].dt.year.to_numpy(np.int64),
            "rev_1e4": cents * pct,
        }).groupby(["l_orderkey", "s_nat", "year"], as_index=False).sum())

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    # 8 partitions at test scale: a hash partition left empty by a tiny
    # pre-filtered side yields a schema-less block Arrow's join rejects;
    # at warehouse scale this dial rises with the slim side's row count
    j = li.map_batches(pre, batch_format="pandas").join(
        orders, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",))

    def post(df: pd.DataFrame) -> pd.DataFrame:
        cn = ray.get(cus_ref)
        c_nat = cn[df["o_custkey"].to_numpy()]
        s_nat = df["s_nat"].to_numpy()
        m = ((s_nat == n1) & (c_nat == n2)) | ((s_nat == n2) & (c_nat == n1))
        return (pd.DataFrame({"s_nat": s_nat[m], "c_nat": c_nat[m],
                              "year": df["year"].to_numpy()[m],
                              "rev_1e4": df["rev_1e4"].to_numpy()[m]})
                .groupby(["s_nat", "c_nat", "year"], as_index=False).sum())

    m = _fold(j.map_batches(post, batch_format="pandas"),
              ["s_nat", "c_nat", "year"], {"rev_1e4": "sum"})
    m["supp_nation"] = m.pop("s_nat").map(nat_name)
    m["cust_nation"] = m.pop("c_nat").map(nat_name)
    m["revenue"] = rnd(m.pop("rev_1e4") / 10000.0, 2)
    return (m[["supp_nation", "cust_nation", "year", "revenue"]]
            .sort_values(["supp_nation", "cust_nation", "year"])
            .reset_index(drop=True))


def q_returned_item_report(sf_dir: str):
    """TPC-H Q10-shaped returned-item loss report: the 20 customers who
    lost the most revenue to returned ('R') line items against orders
    placed in 1996Q1. Ray shape: orders window-prunes at the scan,
    lineitem filters returnflag='R' and pre-reduces per orderkey, the
    two slim sides meet in ONE co-partitioned join, and the per-custkey
    revenue fold is bounded by the customer dimension (the
    bounded-dimension contract, as Q15's supplier fold); customer +
    nation names attach on the driver to the folded table. Top-20
    ordering compares revenue AFTER the 2 dp round with a custkey
    tie-break, so both engines cut the same deterministic prefix."""
    lo, hi = np.datetime64("1996-01-01"), np.datetime64("1996-04-01")
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    win = orders.map_batches(
        lambda df: df.loc[(df["o_orderdate"].to_numpy() >= lo)
                          & (df["o_orderdate"].to_numpy() < hi),
                          ["o_orderkey", "o_custkey"]],
        batch_format="pandas")
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_extendedprice",
                "l_discount"])

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_returnflag"].to_numpy() == "R"]
        # exact integer 1e-4-dollar units (cents x percent), as
        # volume_shipping_nations: the per-customer sum is exact, so the
        # 2 dp round and the top-20 cut cannot flip on a .xx5 boundary
        # from float association order
        cents = np.round(df["l_extendedprice"].to_numpy(np.float64)
                         * 100.0).astype(np.int64)
        pct = np.round((1.0 - df["l_discount"].to_numpy(np.float64))
                       * 100.0).astype(np.int64)
        return (pd.DataFrame({
            "l_orderkey": df["l_orderkey"],
            "rev_1e4": cents * pct})
                .groupby("l_orderkey", as_index=False).sum())

    j = li.map_batches(pre, batch_format="pandas").join(
        win, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",))

    def post(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_custkey", as_index=False)["rev_1e4"].sum()

    per_cust = _fold(j.map_batches(post, batch_format="pandas"),
                     ["o_custkey"], {"rev_1e4": "sum"})
    per_cust["revenue"] = per_cust.pop("rev_1e4") / 10000.0
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_nationkey",
                  "c_acctbal"]).to_pandas()
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    t = per_cust.merge(cust, left_on="o_custkey", right_on="c_custkey")
    t = t.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    t["revenue"] = rnd(t["revenue"], 2)
    t["c_acctbal"] = rnd(t["c_acctbal"], 2)
    t = t.sort_values(["revenue", "c_custkey"],
                      ascending=[False, True]).head(20)
    return t[["c_custkey", "c_name", "n_name", "c_acctbal",
              "revenue"]].reset_index(drop=True)


def q_bracket_revenue_part(sf_dir: str):
    """TPC-H Q19-shaped OR-bracket conditional revenue: discounted
    revenue per (brand, size-range, quantity-range) bracket over three
    disjunctive branches. Ray shape: part's (brand id, size) attributes
    become two dense broadcast arrays (ray.put once — the
    bounded-dimension contract), so the lineitem fact scan evaluates all
    three bracket predicates vectorized with NO join and NO shuffle;
    one <= 3-row scalar fold. The reference pattern this generalizes is
    the multi-branch CASE filter; revenue rounds at 2 dp."""
    part = _read(sf_dir, "part",
                 ["p_partkey", "p_brand", "p_size"]).to_pandas()
    npart = int(part["p_partkey"].max()) + 1
    brand_of = np.full(npart, -1, dtype=np.int64)
    brands = ["Brand#1", "Brand#2", "Brand#3"]
    bmap = {b: i for i, b in enumerate(brands)}
    brand_of[part["p_partkey"].to_numpy()] = (
        part["p_brand"].map(bmap).fillna(-1).to_numpy(np.int64))
    size_of = np.zeros(npart, dtype=np.int64)
    size_of[part["p_partkey"].to_numpy()] = part["p_size"].to_numpy()
    brand_ref, size_ref = ray.put(brand_of), ray.put(size_of)
    # (brand idx, size_max, qty_lo, qty_hi) per bracket
    brackets = [(0, 5, 1.0, 11.0), (1, 10, 10.0, 20.0), (2, 15, 20.0, 30.0)]
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(brand_ref)[df["l_partkey"].to_numpy()]
        s = ray.get(size_ref)[df["l_partkey"].to_numpy()]
        q = df["l_quantity"].to_numpy(np.float64)
        # exact integer 1e-4-dollar units: bracket grain sums thousands
        # of ~1e7 terms (the .xx5-boundary shape; see monthly_revenue)
        cents = np.round(df["l_extendedprice"].to_numpy(np.float64)
                         * 100.0).astype(np.int64)
        pct = np.round((1.0 - df["l_discount"].to_numpy(np.float64))
                       * 100.0).astype(np.int64)
        rev = cents * pct
        rows = []
        for bi, smax, qlo, qhi in brackets:
            m = (b == bi) & (s >= 1) & (s <= smax) & (q >= qlo) & (q <= qhi)
            rows.append((bi, int(rev[m].sum()), float(m.sum())))
        return pd.DataFrame(rows, columns=["bracket", "rev_1e4", "n_items"])

    m = _fold(li.map_batches(partial, batch_format="pandas"),
              ["bracket"], {"rev_1e4": "sum", "n_items": "sum"})
    m = m.sort_values("bracket").reset_index(drop=True)
    m["p_brand"] = [brands[int(i)] for i in m["bracket"]]
    m["n_items"] = m["n_items"].astype("int64")
    m["revenue"] = rnd(m.pop("rev_1e4") / 10000.0, 2)
    return m[["p_brand", "n_items", "revenue"]]


def q_sales_opportunity_customers(sf_dir: str):
    """TPC-H Q22-shaped sales-opportunity anti-join: per market segment,
    the count and total balance of customers whose account balance
    exceeds the global mean POSITIVE balance and who placed no order in
    the recent window (2000-01-01 on — the synth data gives every
    customer SOME order, so the classical never-ordered predicate is
    vacuous; the recency-lapse variant keeps the identical shape
    non-empty). Ray shape: one scalar (sum, n) fold pins the global
    mean; window-pruned orders collapse to their distinct custkey set
    (slim per-batch unique partials folded under the bounded-dimension
    contract) broadcast via ray.put; the customer scan then applies
    both predicates map-side and folds per segment — no raw-row shuffle
    anywhere. The balance threshold compares raw doubles with the
    identical expression in SQL; per-segment balance totals round at
    2 dp."""
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_acctbal", "c_mktsegment"])

    def p_avg(df: pd.DataFrame) -> pd.DataFrame:
        v = df["c_acctbal"].to_numpy(np.float64)
        v = v[v > 0.0]
        return pd.DataFrame({"k": [0], "s": [v.sum()],
                             "n": [float(len(v))]})

    r = _fold(cust.map_batches(p_avg, batch_format="pandas"),
              ["k"], {"s": "sum", "n": "sum"})
    thresh = float(r["s"].iloc[0]) / float(r["n"].iloc[0])

    recent = np.datetime64("2000-01-01")
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def p_keys(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["o_orderdate"].to_numpy() >= recent]
        return pd.DataFrame({"o_custkey": df["o_custkey"].unique(),
                             "one": 1.0})

    with_orders = _fold(orders.map_batches(p_keys, batch_format="pandas"),
                        ["o_custkey"], {"one": "max"})
    keys_ref = ray.put(frozenset(with_orders["o_custkey"].tolist()))

    def post(df: pd.DataFrame) -> pd.DataFrame:
        k = ray.get(keys_ref)
        m = (df["c_acctbal"].to_numpy(np.float64) > thresh) \
            & ~df["c_custkey"].isin(k).to_numpy()
        df = df[m]
        return pd.DataFrame({"c_mktsegment": df["c_mktsegment"],
                             "n_cust": 1.0,
                             "total_acctbal": df["c_acctbal"].to_numpy()}
                            ).groupby("c_mktsegment", as_index=False).sum()

    m = _fold(cust.map_batches(post, batch_format="pandas"),
              ["c_mktsegment"], {"n_cust": "sum", "total_acctbal": "sum"})
    m["n_cust"] = m["n_cust"].astype("int64")
    m["total_acctbal"] = rnd(m["total_acctbal"], 2)
    return (m[["c_mktsegment", "n_cust", "total_acctbal"]]
            .sort_values("c_mktsegment").reset_index(drop=True))


def q_fuzzy_match_parts(sf_dir: str):
    """Jaro-Winkler fuzzy self-match over distinct part names — the
    record-linkage primitive (typo-tolerant entity matching) next to
    editdist_dedup's Levenshtein verify. Ray shape: the distinct-name
    fold is bounded by the part-name vocabulary (adjective x noun — the
    bounded-dimension contract); the vocab² candidate pair table then
    scores DISTRIBUTED via map_batches (for unbounded name sets the
    pair table would come from a blocking key instead — first-token /
    LSH — the editdist_dedup bounded-candidate contract). JW is
    fuzz-pinned bit-exact to DuckDB's jaro_winkler_similarity, so the
    0.85 threshold cuts identically both sides; scores round at 6 dp."""
    ds = _read(sf_dir, "part", ["p_name"])

    def p_names(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"p_name": df["p_name"].unique(), "one": 1.0})

    names = sorted(_fold(ds.map_batches(p_names, batch_format="pandas"),
                         ["p_name"], {"one": "max"})["p_name"].tolist())
    pairs = [(a, b) for i, a in enumerate(names) for b in names[i + 1:]]
    pair_ds = rd.from_pandas(pd.DataFrame(pairs,
                                          columns=["name_a", "name_b"]))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        jw = np.array([tx.jaro_winkler(a, b)
                       for a, b in zip(df["name_a"], df["name_b"])])
        keep = jw >= 0.85
        out = df[keep].copy()
        out["jw"] = rnd(jw[keep], 6)
        return out

    out = pair_ds.map_batches(score, batch_format="pandas").to_pandas()
    return (out.sort_values(["name_a", "name_b"])
            .reset_index(drop=True))


def q_survival_users_events(sf_dir: str):
    """Kaplan-Meier time-to-first-purchase per user, administratively
    right-censored at a 24 h budget from the user's first event — the
    survival-analysis member of the retention family (cohort_retention
    counts presence; KM handles censoring correctly: censored users
    leave the risk set without counting as events). ONE mergeable
    per-user (first event, first purchase) min-fold bounded by the user
    dimension (no-purchase sentinel = int64 max, min-mergeable by
    construction); the KM product runs on the driver over distinct
    offsets. Offsets are exact integer µs; the engine's running product
    and the oracle's exp(Σ ln) agree well inside the 6 dp round."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    SENT = np.int64(2**62)

    def p_range(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        is_p = df["event_type"].to_numpy() == "purchase"
        return (pd.DataFrame({"user_id": df["user_id"], "f": us,
                              "fp": np.where(is_p, us, SENT)})
                .groupby("user_id", as_index=False)
                .agg({"f": "min", "fp": "min"}))

    u = _fold(ds.map_batches(p_range, batch_format="pandas"),
              ["user_id"], {"f": "min", "fp": "min"})
    day_us = np.int64(86_400) * np.int64(1_000_000)
    off = u["fp"].to_numpy(np.int64) - u["f"].to_numpy(np.int64)
    event = (u["fp"].to_numpy(np.int64) != SENT) & (off < day_us)
    life = np.where(event, off, day_us)
    t = (pd.DataFrame({"life_us": life, "d": event.astype(np.int64),
                       "a": 1})
         .groupby("life_us", as_index=False).sum()
         .sort_values("life_us").reset_index(drop=True))
    total = int(t["a"].sum())
    before = np.concatenate([[0], np.cumsum(t["a"].to_numpy())[:-1]])
    n_risk = total - before
    surv = np.cumprod(1.0 - t["d"].to_numpy(np.float64) / n_risk)
    keep = t["d"].to_numpy() > 0
    return pd.DataFrame({
        "t_hours": rnd(t["life_us"].to_numpy(np.float64)[keep]
                       / 3_600_000_000.0, 6),
        "n_risk": n_risk[keep].astype(np.int64),
        "n_events": t["d"].to_numpy(np.int64)[keep],
        "survival": rnd(surv[keep], 6)})


def q_calibration_events(sf_dir: str):
    """Calibration / reliability-diagram audit of `value` as an error
    score: min-max-normalized score vs the (event_type=='error') label
    in 10 equal-width bins — per-bin count, mean score (confidence) and
    positive fraction (accuracy), plus the overall Brier score and base
    rate (repeated per row, the pca_variance pattern). The calibration
    companion of auc_events: AUC grades RANKING, the reliability curve
    grades whether the score's magnitude means what it says. Two
    bounded mergeable folds (global score range, then <=10 bin rows per
    batch); every expression written identically in SQL."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def p_range(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return pd.DataFrame({"k": [], "lo": [], "hi": []})
        return pd.DataFrame({"k": [0], "lo": [v.min()], "hi": [v.max()]})

    r = _fold(ds.map_batches(p_range, batch_format="pandas"),
              ["k"], {"lo": "min", "hi": "max"})
    lo, hi = float(r["lo"].iloc[0]), float(r["hi"].iloc[0])

    def p_bins(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        keep = ~np.isnan(v)
        df, v = df[keep], v[keep]
        sc = (v - lo) / (hi - lo)
        y = (df["event_type"].to_numpy() == "error").astype(np.float64)
        b = np.clip(np.floor(sc * 10.0), 0, 9).astype(np.int64)
        e = sc - y
        return (pd.DataFrame({"bin": b, "n": 1.0, "ss": sc, "sy": y,
                              "se2": e * e})
                .groupby("bin", as_index=False).sum())

    g = _fold(ds.map_batches(p_bins, batch_format="pandas"),
              ["bin"], {"n": "sum", "ss": "sum", "sy": "sum",
                        "se2": "sum"})
    g = g.sort_values("bin").reset_index(drop=True)
    n_tot = float(g["n"].sum())
    brier = float(g["se2"].sum()) / n_tot
    base = float(g["sy"].sum()) / n_tot
    return pd.DataFrame({
        "bin": g["bin"].astype("int64"),
        "n": g["n"].astype("int64"),
        "avg_score": rnd(g["ss"] / g["n"], 6),
        "frac_pos": rnd(g["sy"] / g["n"], 6),
        "brier": rnd(np.full(len(g), brier), 6),
        "base_rate": rnd(np.full(len(g), base), 6)})


def q_new_users_daily_events(sf_dir: str):
    """Daily new-user counts with a running cumulative total — the
    classic "running distinct" that a naive engine computes with a
    per-day distinct scan. Ray shape: running COUNT DISTINCT over time
    reduces exactly to first-seen grain — one mergeable (user → min
    epoch-day) fold bounded by the user dimension, then a tiny per-day
    count + driver cumsum over the bounded day range. No per-day
    rescans, no distinct-set shuffle."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def p_first(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["ts"].to_numpy("datetime64[us]").astype(np.int64)
               // (np.int64(86_400) * np.int64(1_000_000)))
        return (pd.DataFrame({"user_id": df["user_id"], "day": day})
                .groupby("user_id", as_index=False).min())

    first = _fold(ds.map_batches(p_first, batch_format="pandas"),
                  ["user_id"], {"day": "min"})
    c = (first.groupby("day").size().rename("new_users").reset_index()
         .sort_values("day").reset_index(drop=True))
    out = pd.DataFrame({
        "day": pd.to_datetime(c["day"].to_numpy(np.int64), unit="D"),
        "new_users": c["new_users"].astype("int64"),
        "cum_users": c["new_users"].cumsum().astype("int64")})
    return out


def q_clip_qc_scorecard(sf_dir: str):
    """Per-partition QC scorecard from the FUSED audit battery
    (stages/audio_ops.FullAudit): cross-modal transcript consistency,
    mains hum, clicks, DC/rumble hygiene, effective bandwidth,
    wow/flutter, and blind-RT60 reverberation — all off ONE decode per clip (running these as
    separate pipelines re-pays the decode + framing per audit; fused
    measured 2-3x the throughput at equal pool size, interleaved A/B).
    The audit stream folds to
    one row per partition (verdict + per-audit flag counts, all exact
    integers) — the audio-payload twin of the flagship's metadata
    verdicts. Deterministic => fixture oracle."""
    from ..sources.clips import read_clips
    from ..stages import audio_ops as ao
    path = _clip_table_path(sf_dir)
    ds = read_clips(path, columns=["clip_id", "partition_id", "bytes",
                                   "transcript"])
    audit = ao.full_audit_table(ds)
    flag_cols = ["xm_flag", "hum_flag", "click_flag", "hy_flag",
                 "bw_flag", "wf_flag", "rv_flag"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qc = df["qa_code"].to_numpy()
        out = {"partition_id": df["partition_id"], "n": 1.0,
               "n_error": (qc == -1).astype(np.float64),
               "n_warning": (qc == 0).astype(np.float64),
               "n_ok": (qc == 1).astype(np.float64),
               "n_undecodable": (qc == 2).astype(np.float64)}
        for c in flag_cols:
            out["n_" + c[:-5]] = (df[c].to_numpy() == 1).astype(np.float64)
        return pd.DataFrame(out).groupby("partition_id",
                                         as_index=False).sum()

    counts = ["n", "n_error", "n_warning", "n_ok", "n_undecodable"] + \
        ["n_" + c[:-5] for c in flag_cols]
    m = _fold(audit.map_batches(partial, batch_format="pandas"),
              ["partition_id"], {c: "sum" for c in counts})
    for c in counts:
        m[c] = m[c].astype("int64")
    return m.sort_values("partition_id").reset_index(drop=True)


def q_temporal_integrity_orders_lineitem(sf_dir: str):
    """Cross-table TEMPORAL referential audit: line items that shipped
    before their order was placed (impossible) or more than 90 days
    after (stale fulfilment), per order priority — the time-axis twin
    of referential_orders_customer (key presence) and
    reconcile_orders_lineitem (money). One co-partitioned join of the
    two fact tables; lags are EXACT integer day counts from epoch-us
    differences (dates are midnight-aligned), so counts and the max lag
    are association-order-proof."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])
    j = li.join(orders, join_type="inner", num_partitions=16,
                on=("l_orderkey",), right_on=("o_orderkey",))
    day_us = np.int64(86_400) * np.int64(1_000_000)

    def post(df: pd.DataFrame) -> pd.DataFrame:
        ship = df["l_shipdate"].to_numpy("datetime64[us]").astype(np.int64)
        od = df["o_orderdate"].to_numpy("datetime64[us]").astype(np.int64)
        lag = (ship - od) // day_us
        return pd.DataFrame({
            "o_orderpriority": df["o_orderpriority"],
            "n_items": 1.0,
            "n_early": (lag < 0).astype(np.float64),
            "n_late": (lag > 90).astype(np.float64),
            "max_lag_days": lag,
        }).groupby("o_orderpriority", as_index=False).agg(
            {"n_items": "sum", "n_early": "sum", "n_late": "sum",
             "max_lag_days": "max"})

    m = _fold(j.map_batches(post, batch_format="pandas"),
              ["o_orderpriority"],
              {"n_items": "sum", "n_early": "sum", "n_late": "sum",
               "max_lag_days": "max"})
    for c in ("n_items", "n_early", "n_late", "max_lag_days"):
        m[c] = m[c].astype("int64")
    return m.sort_values("o_orderpriority").reset_index(drop=True)


def q_order_constraint_events(sf_dir: str):
    """Event-ORDER constraint validation per user: purchases that
    precede the user's first signup (or belong to a user who never
    signed up) violate the funnel's ordering invariant — the sequence
    twin of referential checks (the key exists, but not YET). Per-user
    sweep inside groupby(user).map_groups (the series contract);
    violation predicate compares raw event timestamps against the
    user's min signup timestamp, so it is sort-stability-proof (ties at
    the same microsecond count as ordered, matching the SQL EXISTS with
    <=). Per-user output stays a Dataset — entity count is
    corpus-scaled."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        et = g["event_type"].to_numpy()
        p = et == "purchase"
        n_p = int(p.sum())
        if n_p == 0:
            return pd.DataFrame({"user_id": [], "n_purchase": [],
                                 "n_unordered": []})
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        s = us[et == "signup"]
        if len(s):
            n_un = int((us[p] < s.min()).sum())
        else:
            n_un = n_p
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]],
                             "n_purchase": [np.int64(n_p)],
                             "n_unordered": [np.int64(n_un)]})

    def fix_types(df: pd.DataFrame) -> pd.DataFrame:
        df["n_purchase"] = df["n_purchase"].astype("int64")
        df["n_unordered"] = df["n_unordered"].astype("int64")
        return df

    return (ds.groupby("user_id").map_groups(per_user,
                                             batch_format="pandas")
            .map_batches(fix_types, batch_format="pandas"))


QUERIES = {
    "row_validate_events": q_row_validate_events,
    "border_check_events": q_border_check_events,
    "grouped_stats_events": q_grouped_stats_events,
    "zscore_events": q_zscore_events,
    "robust_zscore_events": q_robust_zscore_events,
    "winsorize_events": q_winsorize_events,
    "impute_median_events": q_impute_median_events,
    "welford_window_events": q_welford_window_events,
    "welford_inf_events": q_welford_inf_events,
    "uniqueness_events": q_uniqueness_events,
    "referential_orders_customer": q_referential_orders_customer,
    "value_histogram_events": q_value_histogram_events,
    "drift_events_psi": q_drift_events_psi,
    "time_filter_events": q_time_filter_events,
    "bloom_dedup_documents": q_bloom_dedup_documents,
    "tdigest_quantiles_events": q_tdigest_quantiles_events,
    "pricing_summary": q_pricing_summary,
    "top_customers_revenue": q_top_customers_revenue,
    "user_event_paths": q_user_event_paths,
    "benford_events": q_benford_events,
    "heavy_hitters_events": q_heavy_hitters_events,
    "mode_events": q_mode_events,
    "entropy_by_source": q_entropy_by_source,
    "corr_events": q_corr_events,
    "snapshot_diff_events": q_snapshot_diff_events,
    "fd_check": q_fd_check,
    "expectations_freshness": q_expectations_freshness,
    "heartbeat_gaps_events": q_heartbeat_gaps_events,
    "chi2_drift_events": q_chi2_drift_events,
    "mutual_information_events": q_mutual_information_events,
    "percent_rank_events": q_percent_rank_events,
    "pivot_events": q_pivot_events,
    "funnel_events": q_funnel_events,
    "rollup_events": q_rollup_events,
    "events_hourly": q_events_hourly,
    "join_orders_lineitem": q_join_orders_lineitem,
    "shipping_priority": q_shipping_priority,
    "local_supplier_volume": q_local_supplier_volume,
    "skew_join_lineitem_supplier": q_skew_join_lineitem_supplier,
    "large_orders": q_large_orders,
    "anti_join_customer_orders": q_anti_join_customer_orders,
    "semi_mark_orders_customer": q_semi_mark_orders_customer,
    "sessionize_events": q_sessionize_events,
    "interval_join_events": q_interval_join_events,
    "stratified_sample_documents": q_stratified_sample_documents,
    "mixture_sample_documents": q_mixture_sample_documents,
    "doc_quality_verdicts": q_doc_quality_verdicts,
    "source_quality_report": q_source_quality_report,
    "doc_split_documents": q_doc_split_documents,
    "pack_documents": q_pack_documents,
    "top_events_per_user": q_top_events_per_user,
    "props_extract_events": q_props_extract_events,
    "sliding_window_events": q_sliding_window_events,
    "temporal_drift_events": q_temporal_drift_events,
    "approx_distinct_events": q_approx_distinct_events,
    "bpe_vocab_documents": q_bpe_vocab_documents,
    "bpe_encode_documents": q_bpe_encode_documents,
    "text_prep_documents": q_text_prep_documents,
    "covariance_embeddings": q_covariance_embeddings,
    "kmeans_embeddings": q_kmeans_embeddings,
    "equidepth_histogram_events": q_equidepth_histogram_events,
    "exact_quantiles_events": q_exact_quantiles_events,
    "refined_quantiles_norms": q_refined_quantiles_norms,
    "deterministic_shuffle_documents": q_deterministic_shuffle_documents,
    "exact_dedup_documents": q_exact_dedup_documents,
    "topk_docs_per_source": q_topk_docs_per_source,
    "fd_audit_documents": q_fd_audit_documents,
    "benford_orders": q_benford_orders,
    "disorder_audit_events": q_disorder_audit_events,
    "coverage_audit_events": q_coverage_audit_events,
    "json_props_audit_events": q_json_props_audit_events,
    "freshness_audit_events": q_freshness_audit_events,
    "independence_audit_events": q_independence_audit_events,
    "interarrival_audit_events": q_interarrival_audit_events,
    "double_fire_audit_events": q_double_fire_audit_events,
    "token_count_documents": q_token_count_documents,
    "vocab_documents": q_vocab_documents,
    "zipf_documents": q_zipf_documents,
    "text_quality_documents": q_text_quality_documents,
    "repetition_stats_documents": q_repetition_stats_documents,
    "pii_redact_documents": q_pii_redact_documents,
    "charlm_quality_documents": q_charlm_quality_documents,
    "lang_detect_documents": q_lang_detect_documents,
    "minhash_dedup_documents": q_minhash_dedup_documents,
    "ngram_jaccard_documents": q_ngram_jaccard_documents,
    "dup_spans_documents": q_dup_spans_documents,
    "contamination_documents": q_contamination_documents,
    "editdist_dedup_documents": q_editdist_dedup_documents,
    "simhash_documents": q_simhash_documents,
    "doc_fingerprints": q_doc_fingerprints,
    "embedding_norms": q_embedding_norms,
    "embedding_dedup_embeddings": q_embedding_dedup_embeddings,
    "semantic_dedup_embeddings": q_semantic_dedup_embeddings,
    "similarity_topk_embeddings": q_similarity_topk_embeddings,
    "ann_ivf_embeddings": q_ann_ivf_embeddings,
    "ann_pq_embeddings": q_ann_pq_embeddings,
    "ema_check_events": q_ema_check_events,
    "macd_check_events": q_macd_check_events,
    "cusum_events": q_cusum_events,
    "cusum_reset_events": q_cusum_reset_events,
    "hampel_events": q_hampel_events,
    "percentile_events": q_percentile_events,
    "cumulative_events": q_cumulative_events,
    "linear_fit_events": q_linear_fit_events,
    "filtering_events": q_filtering_events,
    "ema_percentile_events": q_ema_percentile_events,
    "trend_classification_events": q_trend_classification_events,
    "trend_mlp_events": q_trend_mlp_events,
    "rrcf_events": q_rrcf_events,
    "matrix_profile_events": q_matrix_profile_events,
    "changepoint_events": q_changepoint_events,
    "repair_events": q_repair_events,
    "percent_score_events": q_percent_score_events,
    "feature_construction_events": q_feature_construction_events,
    "iforest_events": q_iforest_events,
    "pca_iforest_events": q_pca_iforest_events,
    "clustering_events": q_clustering_events,
    "forecast_band_events": q_forecast_band_events,
    "seasonal_band_events": q_seasonal_band_events,
    "asof_join_events": q_asof_join_events,
    "autoencoder_events": q_autoencoder_events,
    "gan_autoencoder_events": q_gan_autoencoder_events,
    "reference_config_borders": q_reference_config_borders,
    "eval_f1_events": q_eval_f1_events,
    "stream_validation_events": q_stream_validation_events,
    "image_decode_features": q_image_decode_features,
    "jpeg_decode_features": q_jpeg_decode_features,
    "webp_decode_features": q_webp_decode_features,
    "video_frame_features": q_video_frame_features,
    "expectations_orders": q_expectations_orders,
    "expectations_clips": q_expectations_clips,
    "expectations_lineitem": q_expectations_lineitem,
    "expectations_by_status": q_expectations_by_status,
    "expectations_events_order": q_expectations_events_order,
    "profile_events": q_profile_events,
    "clip_validation_verdicts": q_clip_validation_verdicts,
    "clip_audio_features": q_clip_audio_features,
    "clip_spectral_features": q_clip_spectral_features,
    "clip_mel_features": q_clip_mel_features,
    "clip_mfcc_delta": q_clip_mfcc_delta,
    "clip_speaking_rate": q_clip_speaking_rate,
    "clip_augment_stats": q_clip_augment_stats,
    "clip_specaugment_stats": q_clip_specaugment_stats,
    "clip_trim_stats": q_clip_trim_stats,
    "clip_speaker_clusters": q_clip_speaker_clusters,
    "clip_dvector_speakers": q_clip_dvector_speakers,
    "clip_pitch_features": q_clip_pitch_features,
    "clip_loudness_stats": q_clip_loudness_stats,
    "clip_declip_stats": q_clip_declip_stats,
    "regression_events": q_regression_events,
    "gini_events": q_gini_events,
    "moments_events": q_moments_events,
    "ntile_events": q_ntile_events,
    "reconcile_orders_lineitem": q_reconcile_orders_lineitem,
    "format_audit_customer": q_format_audit_customer,
    "cast_audit_events": q_cast_audit_events,
    "lof_embeddings": q_lof_embeddings,
    "lof_ivf_embeddings": q_lof_ivf_embeddings,
    "clip_bandwidth_check": q_clip_bandwidth_check,
    "clip_audio_audit": q_clip_audio_audit,
    "mahalanobis_embeddings": q_mahalanobis_embeddings,
    "auc_events": q_auc_events,
    "weighted_sample_documents": q_weighted_sample_documents,
    "tfidf_topk_documents": q_tfidf_topk_documents,
    "lift_table_events": q_lift_table_events,
    "hourly_profile_events": q_hourly_profile_events,
    "cube_events": q_cube_events,
    "rfm_customers": q_rfm_customers,
    "lang_confusion_documents": q_lang_confusion_documents,
    "expectations_conditional": q_expectations_conditional,
    "theilsen_events": q_theilsen_events,
    "spearman_events": q_spearman_events,
    "wow_change_events": q_wow_change_events,
    "cohort_retention_events": q_cohort_retention_events,
    "bigram_topk_documents": q_bigram_topk_documents,
    "assoc_rules_events": q_assoc_rules_events,
    "transition_matrix_events": q_transition_matrix_events,
    "autocorr_events": q_autocorr_events,
    "clip_denoise_stats": q_clip_denoise_stats,
    "clip_tempo_features": q_clip_tempo_features,
    "clip_stretch_stats": q_clip_stretch_stats,
    "clip_codec_stats": q_clip_codec_stats,
    "clip_profile_store": q_clip_profile_store,
    "clip_expectations_incremental": q_clip_expectations_incremental,
    "audio_fingerprint_dedup": q_audio_fingerprint_dedup,
    "clip_segment_stats": q_clip_segment_stats,
    "audio_prep_segments": q_audio_prep_segments,
    "clip_stream_replay": q_clip_stream_replay,
    "clip_resample_stats": q_clip_resample_stats,
    "welch_ttest_events": q_welch_ttest_events,
    "wasserstein_drift_events": q_wasserstein_drift_events,
    "jsd_drift_events": q_jsd_drift_events,
    "volume_shipping_nations": q_volume_shipping_nations,
    "returned_item_report": q_returned_item_report,
    "bracket_revenue_part": q_bracket_revenue_part,
    "sales_opportunity_customers": q_sales_opportunity_customers,
    "fuzzy_match_parts": q_fuzzy_match_parts,
    "clip_wow_flutter": q_clip_wow_flutter,
    "temporal_integrity_orders_lineitem": q_temporal_integrity_orders_lineitem,
    "clip_qc_scorecard": q_clip_qc_scorecard,
    "new_users_daily_events": q_new_users_daily_events,
    "pca_project_embeddings": q_pca_project_embeddings,
    "calibration_events": q_calibration_events,
    "survival_users_events": q_survival_users_events,
    "order_constraint_events": q_order_constraint_events,
    "cramers_v_events": q_cramers_v_events,
    "hbos_events": q_hbos_events,
    "attribution_events": q_attribution_events,
    "order_priority_check": q_order_priority_check,
    "promo_revenue_lineitem": q_promo_revenue_lineitem,
    "top_supplier_by_nation": q_top_supplier_by_nation,
    "burstiness_events": q_burstiness_events,
    "anova_hour_events": q_anova_hour_events,
    "clip_reverb_stats": q_clip_reverb_stats,
    "clip_hygiene_check": q_clip_hygiene_check,
    "columnar_roundtrip_events": q_columnar_roundtrip_events,
    "cdc_compact_events": q_cdc_compact_events,
    "float_anomaly_audit": q_float_anomaly_audit,
    "pmi_collocations_documents": q_pmi_collocations_documents,
    "pca_variance_embeddings": q_pca_variance_embeddings,
    "encoding_audit_documents": q_encoding_audit_documents,
    "tukey_outliers_events": q_tukey_outliers_events,
    "runs_test_events": q_runs_test_events,
    "cardinality_profile_orders": q_cardinality_profile_orders,
    "monthly_revenue_lineitem": q_monthly_revenue_lineitem,
    "audience_overlap_events": q_audience_overlap_events,
    "class_separability_embeddings": q_class_separability_embeddings,
    "seasonal_decompose_events": q_seasonal_decompose_events,
}
