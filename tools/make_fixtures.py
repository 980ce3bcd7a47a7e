"""Freeze expected results for the fixture-oracled queries (fixtures.py).

For each query in FIXTURE_QUERIES and each scale-factor dir, run the query
once (live Ray execution) and write the result to fixtures/<name>.parquet
with a ``_fx_rows`` discriminator column (= events row count of the sf).
Re-running overwrites; the committed parquet is the expectation the driver's
correctness gate compares the next live run against.

Usage: python tools/make_fixtures.py [--only name[,name...]] [sf_dir ...]
(default: all FIXTURE_QUERIES over sf0.001 sf0.01; --only regenerates just
the named fixtures so committed expectations for other queries stay frozen)
"""

from __future__ import annotations

import os
import sys

import pandas as pd
import pyarrow.parquet as pq


def main():
    argv = sys.argv[1:]
    only = None
    if argv and argv[0] == "--only":
        only = set(argv[1].split(","))
        argv = argv[2:]
    sf_dirs = argv or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from anomaly_detection_ray import fixtures
    from anomaly_detection_ray.pipelines.queries import QUERIES
    from tools.oracle_check import to_df

    os.makedirs(fixtures.FIXTURE_DIR, exist_ok=True)
    names = [n for n in fixtures.FIXTURE_QUERIES if only is None or n in only]
    for name in names:
        parts = []
        for sf_dir in sf_dirs:
            n_events = pq.read_metadata(
                os.path.join(sf_dir, "events.parquet")).num_rows
            df = to_df(QUERIES[name](sf_dir)).copy()
            df["_fx_rows"] = n_events
            parts.append(df)
            print(f"{name:32s} {os.path.basename(sf_dir):8s} rows={len(df)}")
        out = pd.concat(parts, ignore_index=True)
        out.to_parquet(fixtures.fixture_path(name), index=False)
    ray.shutdown()


if __name__ == "__main__":
    main()
