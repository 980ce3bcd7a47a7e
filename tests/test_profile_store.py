"""Incremental per-file profile store: merged output must equal a full
profile_table rescan, and updates must touch only new/changed files."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from anomaly_detection_ray.pipelines import profile_store as ps
from anomaly_detection_ray.stages.stats import profile_table


def _write(dirp, name, start, n, seed=0):
    rng = np.random.default_rng(seed + start)
    t = pa.table({
        "k": pa.array(np.arange(start, start + n), type=pa.int64()),
        "x": pa.array(np.where(rng.random(n) < 0.1, np.nan,
                               rng.normal(50, 10, n)), type=pa.float64()),
        "s": pa.array([f"v{i % 7}" if i % 11 else None
                       for i in range(start, start + n)],
                      type=pa.string()),
    })
    pq.write_table(t, os.path.join(dirp, name))


@pytest.fixture()
def data_dir(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    for i in range(3):
        _write(str(d), f"part-{i}.parquet", i * 100, 100)
    return str(d)


def test_merged_equals_full_rescan(ray_session, data_dir, tmp_path):
    store = str(tmp_path / "store")
    res = ps.update_profile_store(data_dir, store)
    assert res == {"n_files": 3, "n_profiled": 3, "n_reused": 0,
                   "n_dropped": 0}
    got = ps.merged_profile(store)
    want = profile_table(rd.read_parquet(data_dir))
    pd.testing.assert_frame_equal(got, want)


def test_incremental_touches_only_new_files(ray_session, data_dir,
                                            tmp_path):
    store = str(tmp_path / "store")
    ps.update_profile_store(data_dir, store)

    _write(data_dir, "part-3.parquet", 300, 50)
    res = ps.update_profile_store(data_dir, store)
    assert res["n_profiled"] == 1 and res["n_reused"] == 3
    pd.testing.assert_frame_equal(
        ps.merged_profile(store),
        profile_table(rd.read_parquet(data_dir)))

    # changed file (different row count) is re-profiled
    _write(data_dir, "part-1.parquet", 100, 120)
    res = ps.update_profile_store(data_dir, store)
    assert res["n_profiled"] == 1 and res["n_reused"] == 3
    pd.testing.assert_frame_equal(
        ps.merged_profile(store),
        profile_table(rd.read_parquet(data_dir)))

    # deleted file drops out of the merge
    os.remove(os.path.join(data_dir, "part-0.parquet"))
    res = ps.update_profile_store(data_dir, store)
    assert res["n_dropped"] == 1 and res["n_profiled"] == 0
    pd.testing.assert_frame_equal(
        ps.merged_profile(store),
        profile_table(rd.read_parquet(data_dir)))


def test_noop_update_profiles_nothing(ray_session, data_dir, tmp_path):
    store = str(tmp_path / "store")
    ps.update_profile_store(data_dir, store)
    res = ps.update_profile_store(data_dir, store)
    assert res["n_profiled"] == 0 and res["n_reused"] == 3


def test_incremental_expectations(ray_session, data_dir, tmp_path):
    """Row-local verdicts maintained per file: merged summary equals a
    full run_expectations, only new files re-validate, and a suite
    change rebuilds the store."""
    from anomaly_detection_ray.stages.expectations import run_expectations

    store = str(tmp_path / "store")
    suite = [
        {"check": "not_null", "column": "s"},
        {"check": "in_range", "column": "x", "min": 0.0, "max": 100.0,
         "mostly": 0.95},
    ]
    res = ps.update_expectation_store(data_dir, store, suite)
    assert res["n_validated"] == 3
    got = ps.merged_expectations(store)
    want = run_expectations(rd.read_parquet(data_dir), suite)
    pd.testing.assert_frame_equal(got, want)

    _write(data_dir, "part-9.parquet", 900, 80)
    res = ps.update_expectation_store(data_dir, store, suite)
    assert res["n_validated"] == 1 and res["n_reused"] == 3
    pd.testing.assert_frame_equal(
        ps.merged_expectations(store),
        run_expectations(rd.read_parquet(data_dir), suite))

    # suite change invalidates: everything re-validates
    suite2 = [{"check": "not_null", "column": "x"}]
    res = ps.update_expectation_store(data_dir, store, suite2)
    assert res["n_validated"] == 4
    pd.testing.assert_frame_equal(
        ps.merged_expectations(store),
        run_expectations(rd.read_parquet(data_dir), suite2))

    # graded / schema kinds are rejected with guidance
    with pytest.raises(ValueError, match="run_expectations"):
        ps.update_expectation_store(
            data_dir, store,
            [{"check": "dtype", "column": "k", "type": "int64"}])


def test_incremental_unique_approx(ray_session, data_dir, tmp_path):
    """Approx unique joins the incremental store: per-file HLL registers
    merge across files; result equals a full run_expectations approx run
    (same hash stream, same estimator), and only new files re-validate."""
    from anomaly_detection_ray.stages.expectations import run_expectations

    store = str(tmp_path / "store")
    suite = [
        {"check": "not_null", "column": "s"},
        {"check": "unique", "column": "k", "approx": True,
         "mostly": 0.98},
        {"check": "unique", "column": "s", "approx": True, "mostly": 0.5},
    ]
    res = ps.update_expectation_store(data_dir, store, suite)
    assert res["n_validated"] == 3
    got = ps.merged_expectations(store)
    want = run_expectations(rd.read_parquet(data_dir), suite)
    pd.testing.assert_frame_equal(got, want)
    g = got.set_index(["check_name", "column_name"])
    assert g.loc[("unique", "k"), "passed"]          # k is unique
    assert not g.loc[("unique", "s"), "passed"]      # 7 distinct values

    _write(data_dir, "part-7.parquet", 700, 60)
    res = ps.update_expectation_store(data_dir, store, suite)
    assert res["n_validated"] == 1 and res["n_reused"] == 3
    pd.testing.assert_frame_equal(
        ps.merged_expectations(store),
        run_expectations(rd.read_parquet(data_dir), suite))

    # `mostly` is merge-time only: tightening it revalidates nothing
    suite3 = [dict(s) for s in suite]
    suite3[1]["mostly"] = 0.5
    res = ps.update_expectation_store(data_dir, store, suite3)
    assert res["n_validated"] == 0 and res["n_reused"] == 4
    pd.testing.assert_frame_equal(
        ps.merged_expectations(store),
        run_expectations(rd.read_parquet(data_dir), suite3))


def _write_ts(dirp, name, ks, seed=0):
    """Grouped time-series file: k (order), g (group), ts (event time),
    val (noisy walk with NaNs) — the table-level-kind fixture."""
    ks = np.asarray(ks, dtype=np.int64)
    rng = np.random.default_rng(seed + int(ks[0]))
    val = rng.normal(0.1, 1.0, len(ks)).cumsum()
    val = np.where(rng.random(len(ks)) < 0.1, np.nan, val)
    t = pa.table({
        "k": pa.array(ks, type=pa.int64()),
        "g": pa.array([f"g{int(i) % 3}" for i in ks], type=pa.string()),
        "ts": pa.array(pd.to_datetime(ks * 60, unit="s")),
        "val": pa.array(val, type=pa.float64()),
    })
    pq.write_table(t, os.path.join(dirp, name))


@pytest.fixture()
def ts_dir(tmp_path):
    d = tmp_path / "ts_data"
    d.mkdir()
    for i in range(3):  # disjoint, append-only k ranges
        _write_ts(str(d), f"part-{i}.parquet",
                  np.arange(i * 100, (i + 1) * 100))
    return str(d)


def test_incremental_table_level_kinds(ray_session, ts_dir, tmp_path):
    """Exact unique, freshness, and non_decreasing maintained per file:
    merged summary equals a full run_expectations rescan; only new files
    revalidate; merge-time as_of changes revalidate nothing."""
    from anomaly_detection_ray.stages.expectations import run_expectations

    store = str(tmp_path / "store")
    suite = [
        {"check": "unique", "column": "k"},
        {"check": "unique", "column": "g", "mostly": 0.5},
        {"check": "freshness", "column": "ts", "by": "g",
         "as_of": "1970-01-01T06:00:00", "max_lag_s": 3600.0},
        {"check": "non_decreasing", "column": "val", "by": "g",
         "order_by": "k"},
    ]
    res = ps.update_expectation_store(ts_dir, store, suite)
    assert res["n_validated"] == 3
    got = ps.merged_expectations(store)
    want = run_expectations(rd.read_parquet(ts_dir), suite)
    pd.testing.assert_frame_equal(got, want)
    g = got.set_index(["check_name", "column_name"])
    assert g.loc[("unique", "k"), "passed"]
    assert int(g.loc[("unique", "g"), "violations"]) == 300 - 3
    # groups run to ts = 299*60 s < 6h - 1h cutoff → all three stale
    assert int(g.loc[("freshness", "ts by g"), "violations"]) == 3
    assert int(g.loc[("non_decreasing", "val"), "violations"]) > 0

    # append-only growth: one new file revalidates, parity holds
    _write_ts(ts_dir, "part-3.parquet", np.arange(300, 370))
    res = ps.update_expectation_store(ts_dir, store, suite)
    assert res["n_validated"] == 1 and res["n_reused"] == 3
    pd.testing.assert_frame_equal(
        ps.merged_expectations(store),
        run_expectations(rd.read_parquet(ts_dir), suite))

    # scheduler tick: new as_of is merge-time only — zero files rescan,
    # verdict still moves
    suite2 = [dict(s) for s in suite]
    suite2[2] = {**suite2[2], "as_of": "1970-01-01T05:10:00"}
    res = ps.update_expectation_store(ts_dir, store, suite2)
    assert res["n_validated"] == 0 and res["n_reused"] == 4
    got2 = ps.merged_expectations(store)
    pd.testing.assert_frame_equal(
        got2, run_expectations(rd.read_parquet(ts_dir), suite2))
    g2 = got2.set_index(["check_name", "column_name"])
    assert int(g2.loc[("freshness", "ts by g"), "violations"]) == 0

    # multi-column order_by needs a full-order rescan: rejected
    with pytest.raises(ValueError, match="single order_by"):
        ps.update_expectation_store(ts_dir, store, [
            {"check": "non_decreasing", "column": "val", "by": "g",
             "order_by": ["k", "ts"]}])


def test_incremental_nd_overlapping_files(ray_session, tmp_path):
    """Files whose per-group order ranges interleave force the exact
    per-group recompute path — merged output still equals a rescan."""
    from anomaly_detection_ray.stages.expectations import run_expectations

    d = tmp_path / "ov_data"
    d.mkdir()
    _write_ts(str(d), "even.parquet", np.arange(0, 200, 2))
    _write_ts(str(d), "odd.parquet", np.arange(1, 200, 2))
    _write_ts(str(d), "tail.parquet", np.arange(200, 260))  # disjoint

    store = str(tmp_path / "store")
    suite = [{"check": "non_decreasing", "column": "val", "by": "g",
              "order_by": "k"}]
    ps.update_expectation_store(str(d), store, suite)
    want = run_expectations(rd.read_parquet(str(d)), suite)
    pd.testing.assert_frame_equal(ps.merged_expectations(store), want)
    # Ray-regime fold (groupby over the partials) + per-group recompute
    pd.testing.assert_frame_equal(
        ps.merged_expectations(store, fold_rows=1), want)


def test_exact_unique_ray_fold_regime(ray_session, ts_dir, tmp_path):
    """Past the row threshold the exact-unique and freshness merges
    stream through Ray groupbys instead of driver pandas folds —
    identical verdicts in both regimes."""
    from anomaly_detection_ray.stages.expectations import run_expectations

    store = str(tmp_path / "store")
    suite = [{"check": "not_null", "column": "val", "mostly": 0.5},
             {"check": "unique", "column": "k"},
             {"check": "unique", "column": "g", "mostly": 0.5},
             {"check": "unique", "column": "k", "approx": True,
              "mostly": 0.98},
             {"check": "freshness", "column": "ts", "by": "g",
              "as_of": "1970-01-01T05:10:00", "max_lag_s": 3600.0},
             {"check": "non_decreasing", "column": "val", "by": "g",
              "order_by": "k"}]
    ps.update_expectation_store(ts_dir, store, suite)
    want = run_expectations(rd.read_parquet(ts_dir), suite)
    pd.testing.assert_frame_equal(
        ps.merged_expectations(store, fold_rows=1), want)
    pd.testing.assert_frame_equal(ps.merged_expectations(store), want)


def test_cli_expect_store_mode(ray_session, ts_dir, tmp_path, capsys):
    """--expect-store: scheduler-tick CLI — first run validates all
    files, a second run with one new file revalidates only it, exit code
    reflects the merged verdict."""
    import json

    from anomaly_detection_ray.__main__ import main

    suite_path = str(tmp_path / "suite.json")
    with open(suite_path, "w") as f:
        json.dump([
            {"check": "unique", "column": "k"},
            {"check": "freshness", "column": "ts", "by": "g",
             "as_of": "1970-01-01T05:10:00", "max_lag_s": 3600.0},
            {"check": "non_decreasing", "column": "val", "by": "g",
             "order_by": "k", "mostly": 0.3},
        ], f)
    store = str(tmp_path / "store")
    rc = main(["--expect-suite", suite_path, "--data", ts_dir,
               "--expect-store", store])
    out = capsys.readouterr().out
    assert rc == 0 and "validated 3 new/changed files" in out
    assert "non_decreasing" in out and "freshness" in out

    _write_ts(ts_dir, "part-9.parquet", np.arange(300, 340))
    rc = main(["--expect-suite", suite_path, "--data", ts_dir,
               "--expect-store", store])
    out = capsys.readouterr().out
    assert "validated 1 new/changed files, 3 reused" in out

    # incompatible flags are a usage error
    assert main(["--expect-suite", suite_path, "--data", ts_dir,
                 "--expect-store", store, "--out", str(tmp_path / "x")]
                ) == 2


def test_orphan_partials_overwritten(ray_session, ts_dir, tmp_path):
    """Crash-safety: partials written before a crash that never reached
    the manifest commit are garbage with no manifest entry — the next
    update must replace them (content-keyed names + todo cleanup), never
    merge them."""
    from anomaly_detection_ray.pipelines.profile_store import (
        _partial_name)
    from anomaly_detection_ray.stages.expectations import run_expectations

    store = str(tmp_path / "store")
    part_dir = os.path.join(store, "exp_partials")
    os.makedirs(part_dir)
    # fake orphan state for a file the (empty) manifest has never seen
    garbage = pa.table({"key": pa.array(["bogus"], pa.string()),
                        "n": pa.array([10**9], pa.int64()),
                        "v": pa.array([10**9], pa.int64()),
                        "reg": pa.array([None], pa.binary())})
    pq.write_table(garbage, os.path.join(
        part_dir, _partial_name("part-0.parquet")))

    suite = [{"check": "unique", "column": "k"},
             {"check": "not_null", "column": "val"}]
    ps.update_expectation_store(ts_dir, store, suite)
    pd.testing.assert_frame_equal(
        ps.merged_expectations(store),
        run_expectations(rd.read_parquet(ts_dir), suite))

def test_merge_time_variants_share_state(ray_session, ts_dir, tmp_path):
    """Two specs differing only in merge-time fields (same _sig_key) must
    fan out ONCE: state rows are per-sig, so appending them per variant
    double-counted n/v in the merge (spurious verdict flips)."""
    from anomaly_detection_ray.stages.expectations import run_expectations

    store = str(tmp_path / "store")
    suite = [
        {"check": "unique", "column": "k", "approx": True, "mostly": 0.99},
        {"check": "unique", "column": "k", "approx": True, "mostly": 0.5},
        {"check": "unique", "column": "k", "mostly": 0.99},
        {"check": "unique", "column": "k", "mostly": 0.5},
        {"check": "not_null", "column": "val", "mostly": 0.99},
        {"check": "not_null", "column": "val", "mostly": 0.5},
        {"check": "freshness", "column": "ts", "by": "g",
         "as_of": "1970-01-01T05:10:00", "max_lag_s": 3600.0},
        {"check": "freshness", "column": "ts", "by": "g",
         "as_of": "1970-01-01T06:00:00", "max_lag_s": 3600.0},
        {"check": "non_decreasing", "column": "val", "by": "g",
         "order_by": "k", "mostly": 0.99},
        {"check": "non_decreasing", "column": "val", "by": "g",
         "order_by": "k", "mostly": 0.3},
    ]
    ps.update_expectation_store(ts_dir, store, suite)
    got = ps.merged_expectations(store)
    want = run_expectations(rd.read_parquet(ts_dir), suite)
    pd.testing.assert_frame_equal(got, want)
    # k IS unique: the strict variant must pass (the double-count bug
    # made violations = n_rows - 1 per extra variant and flipped this)
    g = got.reset_index()
    row = g[(g.check_name == "unique") & (g.column_name == "k")]
    assert row["passed"].all() and (row["violations"] == 0).all()

    # adding a merge-time-only variant later revalidates nothing
    suite2 = [*suite,
              {"check": "not_null", "column": "val", "mostly": 0.7}]
    res = ps.update_expectation_store(ts_dir, store, suite2)
    assert res["n_validated"] == 0
    pd.testing.assert_frame_equal(
        ps.merged_expectations(store),
        run_expectations(rd.read_parquet(ts_dir), suite2))


def test_nd_null_order_keys_force_recompute(ray_session, tmp_path):
    """Null order_by values make per-file ob ranges NaN: every range
    comparison is False, which silently treated interleaved files as
    disjoint — they must defer to the exact recompute instead."""
    from anomaly_detection_ray.stages.expectations import run_expectations

    d = tmp_path / "nd_null"
    d.mkdir()

    def _write_nulls(name, ks, null_at):
        ks = np.asarray(ks, dtype=np.float64)
        val = np.arange(len(ks), dtype=np.float64)
        val[::3] -= 5.0          # descents to count
        k = ks.copy()
        if null_at is not None:
            k[null_at] = np.nan
        t = pa.table({
            "k": pa.array(k, type=pa.float64()),
            "g": pa.array([f"g{int(i) % 2}" for i in ks],
                          type=pa.string()),
            "val": pa.array(val, type=pa.float64()),
        })
        pq.write_table(t, os.path.join(str(d), name))

    # one null order key in one file; ranges otherwise overlap the
    # second file so both fold paths are exercised
    _write_nulls("a.parquet", np.arange(0, 100), null_at=7)
    _write_nulls("b.parquet", np.arange(50, 150), null_at=None)

    store = str(tmp_path / "store")
    suite = [{"check": "non_decreasing", "column": "val", "by": "g",
              "order_by": "k"}]
    ps.update_expectation_store(str(d), store, suite)
    want = run_expectations(rd.read_parquet(str(d)), suite)
    pd.testing.assert_frame_equal(ps.merged_expectations(store), want)
    pd.testing.assert_frame_equal(
        ps.merged_expectations(store, fold_rows=1), want)

def test_merged_profile_ray_fold_regime(ray_session, data_dir, tmp_path,
                                        monkeypatch):
    """Past fold_files live files the profile merge streams through a Ray
    read with per-block pre-merge: output equals the driver regime (and
    the full rescan), and the DRIVER performs zero per-file parquet
    reads — O(blocks) rows come back, not O(files)."""
    store = str(tmp_path / "store")
    ps.update_profile_store(data_dir, store)
    want = ps.merged_profile(store)                     # driver regime
    pd.testing.assert_frame_equal(
        want, profile_table(rd.read_parquet(data_dir)))

    reads = []
    real = pq.read_table
    monkeypatch.setattr(ps.pq, "read_table",
                        lambda *a, **k: reads.append(a) or real(*a, **k))
    got = ps.merged_profile(store, fold_files=1)        # forced Ray regime
    pd.testing.assert_frame_equal(got, want)
    assert reads == []  # partial reads happened in Ray tasks, not here


def test_nd_recompute_fans_out_as_ray_tasks(ray_session, tmp_path,
                                            monkeypatch):
    """Interleaved-group non_decreasing recomputes run as Ray tasks: the
    driver process never reads input files during the merge, and the
    verdict still equals a full rescan."""
    from anomaly_detection_ray.stages.expectations import run_expectations

    d = tmp_path / "ov"
    d.mkdir()
    _write_ts(str(d), "even.parquet", np.arange(0, 200, 2))
    _write_ts(str(d), "odd.parquet", np.arange(1, 200, 2))
    store = str(tmp_path / "store")
    suite = [{"check": "non_decreasing", "column": "val", "by": "g",
              "order_by": "k"}]
    ps.update_expectation_store(str(d), store, suite)
    want = run_expectations(rd.read_parquet(str(d)), suite)

    driver_input_reads = []
    real = pq.read_table
    def spy(path, *a, **k):
        if str(path).startswith(str(d)):
            driver_input_reads.append(path)
        return real(path, *a, **k)
    monkeypatch.setattr(ps.pq, "read_table", spy)
    pd.testing.assert_frame_equal(ps.merged_expectations(store), want)
    assert driver_input_reads == []
