"""Driver contract for the Ray-Data-native validation engine.

``entry()`` runs the flagship validation chain over the sf0.001 events
table; ``queries()`` exposes every implemented operator/pipeline
(SURVEY.md §2 + training-data ops); ``oracle_sql()`` gives the DuckDB
equivalent for each SQL-expressible query (same output column names —
the driver hash-compares values after sorting columns by name).

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from anomaly_detection_ray.pipelines.queries import (EV_LL, EV_UL, QUERIES,
                                                     WF_N, WF_X)


def entry() -> Any:
    """Flagship: validate the sf0.001 events stream — row validation,
    border check, per-user windowed Welford — OR-combined; returns the
    per-event verdict table (violations + flags)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from anomaly_detection_ray.pipelines import queries as q
    from anomaly_detection_ray.stages import row_validate as rv
    from anomaly_detection_ray.stages import series as series_mod
    from anomaly_detection_ray.stages.checks import border_stage
    from anomaly_detection_ray.stages.combination import combine_stage

    sf_dir = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type", "value"])
    ds = ds.map_batches(rv.validate_events, batch_format="pyarrow")
    ds = ds.map_batches(
        lambda t: border_stage(t, "value", q.EV_UL, q.EV_LL, q.EV_WS, prefix="bc"),
        batch_format="pyarrow")
    # shed status strings before the series shuffle — codes are all the
    # downstream combine needs, and the groupby ships every column
    ds = ds.select_columns(["event_id", "ts", "user_id", "event_type", "value",
                            "rv_code", "bc_code"])
    ds = series_mod.apply_series_checks(
        ds, "user_id", ["ts", "event_id"], "value",
        [{"name": "wf", "kernel": "welford",
          "params": {"X": q.WF_X, "N": q.WF_N, "warning_stages": []}}],
        valid_col="rv_code", keep_status=False)

    def combine(t: pa.Table) -> pa.Table:
        return combine_stage(t, ["rv_code", "bc_code", "wf_code"], mode="or")

    out = ds.map_batches(combine, batch_format="pyarrow")
    return out.select_columns(["event_id", "user_id", "event_type", "value",
                               "rv_code", "bc_code", "wf_code", "status_code",
                               "anomaly_score"])


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles (ANSI SQL over the pre-registered table views).
    Rows-only queries (recurrences, sketches, clip table) are omitted —
    their correctness is pinned by the golden/parity pytest suite."""
    border_status = """
      CASE WHEN value IS NULL OR isnan(value) THEN 'Undefined'
           WHEN vn > 1 THEN 'Error: measurement above upper limit'
           WHEN vn < -1 THEN 'Error: measurement below lower limit'
           WHEN vn > 0.9 THEN 'Warning1: measurement close to upper limit.'
           WHEN vn < -0.9 THEN 'Warning1: measurement close to lower limit.'
           WHEN vn > 0.7 THEN 'Warning0: measurement close to upper limit.'
           WHEN vn < -0.7 THEN 'Warning0: measurement close to lower limit.'
           ELSE 'OK' END
    """
    mid = (EV_UL + EV_LL) / 2.0
    rng = EV_UL - EV_LL
    punct_class = "[.,!?;:\"''()\\[\\]{}-]"
    return {
        "row_validate_events": """
            SELECT event_id,
                   CAST(CASE WHEN value IS NULL OR isnan(value) OR ts IS NULL
                             THEN 2 ELSE 1 END AS TINYINT) AS rv_code
            FROM events
        """,
        "border_check_events": f"""
            WITH b AS (SELECT event_id, value,
                              2*(value - {mid})/{rng} AS vn FROM events)
            SELECT event_id,
                   CAST(CASE WHEN value IS NULL OR isnan(value) THEN 2
                             WHEN vn > 1 OR vn < -1 THEN -1
                             WHEN abs(vn) > 0.7 THEN 0 ELSE 1 END AS TINYINT) AS bc_code,
                   {border_status} AS bc_status
            FROM b
        """,
        "grouped_stats_events": """
            SELECT event_type, CAST(count(value) AS BIGINT) AS n,
                   round(avg(value), 4) AS mean,
                   round(stddev_pop(value), 4) AS std,
                   round(stddev_samp(value), 4) AS std_sample,
                   round(min(value), 4) AS min,
                   round(max(value), 4) AS max
            FROM events GROUP BY event_type
        """,
        "welford_window_events": f"""
            WITH v AS (SELECT event_id, user_id, ts, value FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)),
            w AS (SELECT event_id, value,
                    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
                    AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN {WF_N} PRECEDING AND 1 PRECEDING) AS m,
                    STDDEV_SAMP(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN {WF_N} PRECEDING AND 1 PRECEDING) AS s
                  FROM v)
            SELECT event_id,
                   CAST(CASE WHEN rn <= {WF_N} THEN 2
                             WHEN value > m + {WF_X}*s OR value < m - {WF_X}*s THEN -1
                             ELSE 1 END AS TINYINT) AS wf_code
            FROM w
        """,
        "welford_inf_events": f"""
            WITH v AS (SELECT event_id, user_id, ts, value FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)),
            w AS (SELECT event_id, value,
                    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
                    AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m,
                    STDDEV_POP(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS s
                  FROM v)
            SELECT event_id,
                   CAST(CASE WHEN rn <= 2 THEN 2
                             WHEN value > m + {WF_X}*s OR value < m - {WF_X}*s THEN -1
                             ELSE 1 END AS TINYINT) AS wf_code
            FROM w
        """,
        "percentile_events": """
            -- trailing-buffer percentile check (intended Percentile
            -- semantics): window of 30 values ending at current (growing
            -- during warm-up, exactly like the kernel's prefix), Error when
            -- the current value falls outside [p2, p98] of its own window
            WITH v AS (SELECT event_id, user_id, ts, value FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)),
            w AS (SELECT event_id, value,
                    quantile_cont(value, 0.02) OVER win AS p_lo,
                    quantile_cont(value, 0.98) OVER win AS p_hi
                  FROM v
                  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN 29 PRECEDING AND CURRENT ROW))
            SELECT event_id,
                   CAST(CASE WHEN value < p_lo OR value > p_hi THEN -1
                             ELSE 1 END AS TINYINT) AS pct_code
            FROM w
            UNION ALL
            SELECT event_id, CAST(2 AS TINYINT) AS pct_code FROM events
            WHERE value IS NULL OR isnan(value)
        """,
        "linear_fit_events": """
            -- rolling OLS slope over the last 15 values, graded vs UL=20 /
            -- LL=-20 with warning stage 0.5; Undefined during warm-up
            -- (first 15 records) and when SSR/value > confidence_norm=1000
            WITH v AS (SELECT event_id, user_id, ts, value FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)),
            r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id) AS rn
                  FROM v),
            w AS (SELECT event_id, value, rn,
                    regr_slope(value, rn) OVER win AS slope,
                    regr_syy(value, rn) OVER win AS syy,
                    regr_sxx(value, rn) OVER win AS sxx
                  FROM r
                  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN 14 PRECEDING AND CURRENT ROW)),
            g AS (SELECT event_id, value, rn, slope,
                         slope / 20.0 AS vn,
                         (syy - slope*slope*sxx) / value AS fit_q
                  FROM w)
            SELECT event_id,
                   CAST(CASE WHEN rn <= 15 THEN 2
                             WHEN fit_q > 1000 THEN 2
                             WHEN vn > 1 OR vn < -1 THEN -1
                             WHEN abs(vn) > 0.5 THEN 0
                             ELSE 1 END AS TINYINT) AS lf_code
            FROM g
            UNION ALL
            SELECT event_id, CAST(2 AS TINYINT) AS lf_code FROM events
            WHERE value IS NULL OR isnan(value)
        """,
        "hampel_events": """
            -- centered-window (2W+1=11) median/MAD outlier check grading the
            -- reference's off-center point memory[W+1] (hampel.py:79-96):
            -- for the window ending at the current row, the graded value is
            -- the one 4 rows back; Undefined for the first 11 records
            WITH v AS (SELECT event_id, user_id, ts, value FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)),
            w AS (SELECT event_id, value,
                    ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS rn,
                    list(value) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS BETWEEN 10 PRECEDING
                                      AND CURRENT ROW) AS l
                  FROM v),
            m AS (SELECT event_id, rn, l[7] AS pt,
                         list_aggregate(l, 'median') AS med,
                         list_aggregate(list_transform(l,
                             x -> abs(x - list_aggregate(l, 'median'))),
                             'median') AS mad
                  FROM w)
            SELECT event_id,
                   CAST(CASE WHEN rn <= 11 THEN 2
                             WHEN abs(pt - med) > 3 * (1.4826 * mad) THEN -1
                             ELSE 1 END AS TINYINT) AS hp_code
            FROM m
            UNION ALL
            SELECT event_id, CAST(2 AS TINYINT) AS hp_code FROM events
            WHERE value IS NULL OR isnan(value)
        """,
        "uniqueness_events": """
            SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_events
            FROM events GROUP BY user_id, event_type HAVING count(*) > 1
        """,
        "referential_orders_customer": """
            SELECT o.o_orderkey, o.o_custkey
            FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_custkey IS NULL
        """,
        "time_filter_events": """
            SELECT event_id FROM events
            WHERE abs(extract('epoch' FROM CAST(ts AS TIME)) - 43200) < 7200
        """,
        "value_histogram_events": """
            SELECT event_type,
                   LEAST(CAST(floor(value/50) AS BIGINT), 10) AS bin,
                   CAST(count(*) AS BIGINT) AS n
            FROM events WHERE value IS NOT NULL AND NOT isnan(value)
            GROUP BY event_type, LEAST(CAST(floor(value/50) AS BIGINT), 10)
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice*(1-l_discount)), 2) AS sum_disc_price,
                   round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)), 2) AS sum_charge,
                   round(sum(l_quantity)/count(*), 4) AS avg_qty,
                   round(sum(l_extendedprice)/count(*), 4) AS avg_price,
                   round(sum(l_discount)/count(*), 6) AS avg_disc,
                   CAST(count(*) AS BIGINT) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_customers_revenue": """
            SELECT o.o_custkey, c.c_name,
                   round(sum(o.o_totalprice), 2) AS revenue,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY o.o_custkey, c.c_name
            ORDER BY sum(o.o_totalprice) DESC, o.o_custkey
            LIMIT 10
        """,
        "events_hourly": """
            SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
                   event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   round(sum(value)/count(*), 6) AS avg_value
            FROM events
            GROUP BY date_trunc('hour', ts), event_type
        """,
        "bloom_dedup_documents": """
            SELECT md5(text) AS text_hash, CAST(count(*) AS BIGINT) AS cnt
            FROM (SELECT coalesce(text, '') AS text FROM documents)
            GROUP BY md5(text) HAVING count(*) >= 2
        """,
        "exact_dedup_documents": """
            SELECT md5(text) AS text_hash,
                   CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
                   CAST(count(*) AS BIGINT) AS n_dups
            FROM documents GROUP BY md5(text)
        """,
        "token_count_documents": """
            SELECT doc_id,
                   CAST(CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                             ELSE len(string_split_regex(trim(text), '\\s+'))
                        END AS BIGINT) AS n_tokens
            FROM documents
        """,
        "text_quality_documents": f"""
            WITH t AS (SELECT doc_id, coalesce(text, '') AS s FROM documents)
            SELECT doc_id,
                   CAST(length(s) AS BIGINT) AS n_chars,
                   CAST(CASE WHEN trim(s) = '' THEN 0
                             ELSE len(string_split_regex(trim(s), '\\s+'))
                        END AS BIGINT) AS n_tokens,
                   CAST(length(s) - length(regexp_replace(s, '{punct_class}', '', 'g')) AS BIGINT) AS n_punct,
                   CAST(length(s) - length(regexp_replace(s, '[0-9]', '', 'g')) AS BIGINT) AS n_digits
            FROM t
        """,
        "feature_construction_events": """
            -- fv layout: raw, avg2, avg5, periodic(2,[3]), lag1, lag2, then
            -- time features in the reference's fixed check order: weekday
            -- (python Monday=0), hour; memory_size = 5
            WITH w AS (
              SELECT event_id, value, ts,
                ROW_NUMBER() OVER win AS rn,
                AVG(value) OVER (win ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS avg2,
                AVG(value) OVER (win ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS avg5,
                LAG(value, 1) OVER win AS lag1,
                LAG(value, 2) OVER win AS lag2,
                LAG(value, 4) OVER win AS lag4
              FROM events
              WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT event_id,
              CASE WHEN rn >= 5 THEN value END AS fv0,
              CASE WHEN rn >= 5 THEN avg2 END AS fv1,
              CASE WHEN rn >= 5 THEN avg5 END AS fv2,
              CASE WHEN rn >= 5 THEN (value + lag2 + lag4) / 3 END AS fv3,
              CASE WHEN rn >= 5 THEN lag1 END AS fv4,
              CASE WHEN rn >= 5 THEN lag2 END AS fv5,
              CASE WHEN rn >= 5 THEN CAST((dayofweek(ts) + 6) % 7 AS DOUBLE) END AS fv6,
              CASE WHEN rn >= 5 THEN CAST(hour(ts) AS DOUBLE) END AS fv7,
              rn >= 5 AS fv_valid
            FROM w
        """,
        "embedding_norms": """
            SELECT vec_id,
                   round(sqrt(list_sum(list_transform(embedding,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm
            FROM embeddings
        """,
        "similarity_topk_embeddings": """
            -- cosine in DOUBLE via unnest (list_cosine_similarity computes in
            -- float32, which diverges from the engine's float64 kernels)
            WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
            pe AS (SELECT vec_id, unnest(embedding) AS x,
                          generate_subscripts(embedding, 1) AS i
                   FROM embeddings WHERE vec_id <> 0),
            pq AS (SELECT unnest(qe) AS y, generate_subscripts(qe, 1) AS i FROM q),
            d AS (SELECT vec_id, sum(x*y) AS dot, sum(x*x) AS nx
                  FROM pe JOIN pq USING (i) GROUP BY vec_id),
            nq AS (SELECT sum(y*y) AS ny FROM pq)
            SELECT vec_id,
                   round(dot / (sqrt(nx) * sqrt(ny)), 6) AS cosine
            FROM d, nq
            ORDER BY dot / (sqrt(nx) * sqrt(ny)) DESC, vec_id
            LIMIT 10
        """,
    }
