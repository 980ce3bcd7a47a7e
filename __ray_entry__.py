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

from anomaly_detection_ray.pipelines.queries import QUERIES


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
    """DuckDB oracles (see anomaly_detection_ray/oracle_sql.py). SQL-
    expressible queries get real ANSI-SQL; seeded model scorers get fixture
    oracles (fixtures.py writes independently-computed expected parquet at
    call time, the SQL reads it). Approximate sketches (t-digest, IVF-ANN)
    stay rows-only — their accuracy is pinned in pytest instead."""
    from anomaly_detection_ray.oracle_sql import oracle_sql as _sql
    return _sql()
