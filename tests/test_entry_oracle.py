"""Local replica of the driver's correctness gate: run each queries() entry
at sf0.01 and compare against oracle_sql() via DuckDB — row count, schema
(column names), and order-insensitive values."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as e
    return e


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd
    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(got: pd.DataFrame, want: pd.DataFrame, name: str):
    assert sorted(got.columns) == sorted(want.columns), \
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    g, w = canon(got), canon(want)
    for c in g.columns:
        gv, wv = g[c], w[c]
        if pd.api.types.is_float_dtype(gv) or pd.api.types.is_float_dtype(wv):
            np.testing.assert_allclose(
                gv.to_numpy(dtype=np.float64), wv.to_numpy(dtype=np.float64),
                rtol=1e-9, atol=1e-9, err_msg=f"{name}.{c}")
        else:
            mism = (gv.astype(str).to_numpy() != wv.astype(str).to_numpy())
            assert not mism.any(), \
                f"{name}.{c}: {mism.sum()} mismatches, e.g. {gv[mism].head(3).tolist()} vs {wv[mism].head(3).tolist()}"


def oracle_names():
    import __ray_entry__ as e
    return sorted(e.oracle_sql())


@pytest.mark.parametrize("name", [
    "row_validate_events", "border_check_events", "grouped_stats_events",
    "welford_window_events", "welford_inf_events", "uniqueness_events",
    "referential_orders_customer", "value_histogram_events",
    "pricing_summary", "top_customers_revenue", "events_hourly",
    "exact_dedup_documents", "ngram_jaccard_documents",
    "token_count_documents",
    "text_quality_documents", "embedding_norms", "similarity_topk_embeddings",
    "feature_construction_events", "time_filter_events",
    "bloom_dedup_documents", "percentile_events", "linear_fit_events",
    "hampel_events", "asof_join_events", "join_orders_lineitem",
    "sessionize_events", "interval_join_events",
    "stratified_sample_documents", "top_events_per_user",
    "props_extract_events", "sliding_window_events",
    "deterministic_shuffle_documents", "skew_join_lineitem_supplier",
    "exact_quantiles_events", "temporal_drift_events",
    "refined_quantiles_norms", "expectations_orders",
    "anti_join_customer_orders", "semi_mark_orders_customer",
    "expectations_lineitem",
    "expectations_by_status", "expectations_events_order",
    "profile_events",
    "dup_spans_documents", "editdist_dedup_documents", "cusum_events",
    "large_orders", "doc_split_documents", "contamination_documents",
    "zscore_events", "robust_zscore_events", "winsorize_events",
    "impute_median_events",
    "cusum_reset_events", "source_quality_report",
    "doc_quality_verdicts", "covariance_embeddings",
    "equidepth_histogram_events", "rollup_events", "funnel_events",
    "pivot_events", "percent_rank_events", "user_event_paths",
    "benford_events", "heavy_hitters_events", "mode_events",
    "entropy_by_source", "corr_events", "snapshot_diff_events",
    "fd_check", "mutual_information_events", "expectations_freshness",
    "heartbeat_gaps_events", "chi2_drift_events",
    "moments_events", "ntile_events", "reconcile_orders_lineitem",
    "format_audit_customer", "cast_audit_events", "assoc_rules_events",
    "transition_matrix_events", "auc_events", "bigram_topk_documents",
    "weighted_sample_documents", "tfidf_topk_documents",
    "lift_table_events", "hourly_profile_events", "cube_events",
    "rfm_customers", "expectations_conditional", "theilsen_events",
    "spearman_events", "wow_change_events", "cohort_retention_events",
    "welch_ttest_events", "cramers_v_events", "hbos_events",
    "attribution_events", "order_priority_check",
    "promo_revenue_lineitem", "top_supplier_by_nation",
    "burstiness_events", "anova_hour_events",
    "audience_overlap_events", "class_separability_embeddings",
    "seasonal_decompose_events", "columnar_roundtrip_events",
    "cdc_compact_events", "float_anomaly_audit",
    "pmi_collocations_documents", "encoding_audit_documents",
    "tukey_outliers_events", "runs_test_events",
    "cardinality_profile_orders", "monthly_revenue_lineitem",
])
def test_query_vs_oracle(name, entrymod, con):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    got = to_df(q(SF_DIR))
    want = con.sql(sql).df()
    compare(got, want, name)


def test_oracle_keys_subset_of_queries(entrymod):
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert o <= q, o - q


def test_rows_only_queries_run(entrymod):
    """Non-SQL queries must at least run and return stable non-empty output
    at small scale (the driver's weaker rows-only check)."""
    q = entrymod.queries()
    for name in ["drift_events_psi", "lang_detect_documents",
                 "minhash_dedup_documents", "simhash_documents",
                 "doc_fingerprints", "ann_ivf_embeddings", "ema_check_events",
                 "macd_check_events",
                 "cumulative_events", "filtering_events",
                 "ema_percentile_events", "repair_events",
                 "percent_score_events",
                 "iforest_events", "pca_iforest_events", "clustering_events",
                 "forecast_band_events", "autoencoder_events",
                 "reference_config_borders", "tdigest_quantiles_events",
                 "trend_classification_events", "rrcf_events",
                 "matrix_profile_events", "changepoint_events"]:
        df = to_df(q[name]("/root/testdata/sf0.001"))
        assert df is not None and len(df.columns) > 0, name


def test_entry_runs(entrymod):
    df = to_df(entrymod.entry())
    assert len(df) == 1000  # sf0.001 events
    assert {"event_id", "status_code", "anomaly_score"} <= set(df.columns)


def test_every_query_oracle_backed_except_documented(entrymod):
    """The coverage contract: every queries() entry carries a hard oracle
    (SQL or frozen fixture) except the ONE documented rows-only case —
    the t-digest, whose estimates are legitimately run-varying under
    preserve_order=False (fixtures.py module doc). A new query landing
    without an oracle fails here loudly instead of silently degrading
    the driver gate to rows-only."""
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert q - o == {"tdigest_quantiles_events"}, sorted(q - o)
