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

    # table-level kinds are rejected with guidance
    with pytest.raises(ValueError, match="row-local"):
        ps.update_expectation_store(
            data_dir, store, [{"check": "unique", "column": "k"}])


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

    # exact unique still rejected
    with pytest.raises(ValueError, match="row-local"):
        ps.update_expectation_store(
            data_dir, store, [{"check": "unique", "column": "k"}])
