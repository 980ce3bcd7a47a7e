"""CLI entry point — the engine's counterpart of the reference's
``python main.py -f -c <config>.json`` (/root/reference/main.py:74-138):

    python -m anomaly_detection_ray -c welford.json --data stream.csv \
        --out /tmp/verdicts [--key-col user_id] [--format parquet|csv|json] \
        [--violations-only] [--num-cpus N]

Loads the reference-schema JSON config, runs the configured scorer chain
over the message CSV/JSON (or the config's own ``file_name``), writes the
verdict table (optionally violations only — the reference's
``send_ok=False`` gate), and prints a per-status summary. Owns its Ray
session (guarded — safe under an outer ray.init as well).

Second mode — declarative constraint suites over any parquet table
(stages/expectations.py):

    python -m anomaly_detection_ray --expect-suite suite.json \
        --data table_dir/ [--out violations_dir] [--num-cpus N]

Prints the per-check summary; exit code 1 if any check failed; with
``--out`` writes the rows violating any row-local check. With
``--expect-store DIR`` the suite is maintained incrementally
(pipelines/profile_store): each invocation re-validates only new/changed
parquet files and summarises from the merged per-file state — the
scheduler-tick mode for a growing table.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m anomaly_detection_ray",
        description="Run a reference-schema validation config over a "
                    "message stream (batch replay, main.py -f mode).")
    p.add_argument("-c", "--config",
                   help="reference-schema JSON config path")
    p.add_argument("--expect-suite", default=None,
                   help="JSON constraint-suite path (stages/expectations "
                        "check specs); --data must be a parquet table. "
                        "Alternative mode to -c: prints the summary and, "
                        "with --out, writes rows violating any check")
    p.add_argument("--expect-by", default=None, metavar="COLUMN",
                   help="grade the --expect-suite per group of this column "
                        "(per-partition verdicts; row sink unavailable)")
    p.add_argument("--expect-store", default=None, metavar="DIR",
                   help="maintain the --expect-suite incrementally in this "
                        "store directory: only new/changed parquet files "
                        "under --data re-validate (scheduler-tick mode); "
                        "summary comes from the merged per-file state")
    p.add_argument("--data", default=None,
                   help="message CSV/JSON (default: the config's file_name)")
    p.add_argument("--out", default=None,
                   help="verdict output directory (omit to just print the summary)")
    p.add_argument("--format", default="parquet",
                   choices=["parquet", "csv", "json"])
    p.add_argument("--violations-only", action="store_true",
                   help="drop OK rows before writing (KafkaOutput send_ok=False)")
    p.add_argument("--key-col", default=None,
                   help="series key column for data-parallel ordered scoring "
                        "(default: one global stream, reference semantics)")
    p.add_argument("--report", default=None, metavar="RUN_DIR",
                   help="re-render _report.md/.json/.html from a finished "
                        "--validate-clips output directory (reads only the "
                        "manifest + violations; no revalidation)")
    p.add_argument("--validate-clips", default=None, metavar="TABLE",
                   help="flagship clip-table validation over this "
                        "Parquet/Lance dir (the `ray job submit` "
                        "entrypoint shape: `ray job submit -- python -m "
                        "anomaly_detection_ray --validate-clips <table> "
                        "--out <dir>`); --out is the checkpointed output "
                        "dir. Exit 1 if any partition failed")
    p.add_argument("--resume", action="store_true",
                   help="with --validate-clips: skip partitions already "
                        "completed under the same config hash")
    p.add_argument("--partitions", type=int, default=16,
                   help="with --validate-clips: partition count (P)")
    p.add_argument("--seed", type=int, default=42,
                   help="with --validate-clips: reference-signal seed")
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)
    n_modes = sum(x is not None for x in
                  (args.config, args.expect_suite, args.validate_clips,
                   args.report))
    if n_modes != 1:
        p.error("exactly one of -c/--config, --expect-suite, "
                "--validate-clips or --report is required")

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    if args.report:
        from anomaly_detection_ray.pipelines.report import (
            write_html_report, write_report)
        md = write_report(args.report)
        html = write_html_report(args.report)
        print(f"re-rendered {md} and {html}")
        return 0
    if args.validate_clips:
        return _validate_clips_mode(args)
    if args.expect_suite:
        return _expect_mode(args)

    from anomaly_detection_ray.pipelines.config import run_reference_config
    ds = run_reference_config(args.config, data_path=args.data,
                              key_col=args.key_col)
    # two consumers (sink + summary): materialize once so the scorer chain
    # doesn't execute twice (pinned blocks spill if large)
    ds = ds.materialize()

    import pandas as pd

    code_cols = [c for c in ds.schema().names if c.endswith("_code")]
    if args.out:
        from anomaly_detection_ray.sources.messages import write_verdicts
        write_verdicts(ds, args.out, fmt=args.format,
                       violations_only=args.violations_only)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in code_cols:
            vc = df[c].value_counts()
            rows.extend({"check": c, "code": int(k), "n": int(v)}
                        for k, v in vc.items())
        return pd.DataFrame(rows, columns=["check", "code", "n"])

    summary = (ds.map_batches(partial, batch_format="pandas").to_pandas()
               .groupby(["check", "code"], as_index=False)["n"].sum()
               .sort_values(["check", "code"]))
    names = {1: "OK", 0: "Warning", -1: "Error", 2: "Undefined"}
    for check, g in summary.groupby("check"):
        parts = ", ".join(f"{names.get(c, c)}={n}"
                          for c, n in zip(g["code"], g["n"]))
        print(f"{check}: {parts}")
    if args.out:
        print(f"verdicts written to {args.out}")
    return 0


def _validate_clips_mode(args) -> int:
    """Flagship clip-table validation as a job entrypoint: per-partition
    verdict summary to stdout, violations + manifest under --out, exit 1
    on any failed partition. On a real cluster this is the command a
    `ray job submit` wraps; the pipeline itself is cluster-agnostic
    (partition pushdown, checkpointed resume, streaming execution)."""
    if not args.out:
        sys.stderr.write("--validate-clips needs --out <dir>\n")
        return 2
    from anomaly_detection_ray.pipelines.validate import (ValidateConfig,
                                                          run_validation)
    cfg = ValidateConfig(seed=args.seed, P=args.partitions)
    res = run_validation(args.validate_clips, args.out, cfg,
                         resume=args.resume)
    v = res["verdicts"]
    print(v.to_string(index=False))
    n_failed = int((~v["pass"]).sum()) if len(v) else 0
    from anomaly_detection_ray.pipelines.report import (write_html_report,
                                                        write_report)
    write_report(args.out)
    write_html_report(args.out)
    print(f"{len(v)} partitions, {n_failed} failed; violations + manifest "
          f"+ _report.md/.html under {args.out}")
    return 1 if n_failed else 0


def _expect_mode(args) -> int:
    """Constraint-suite mode: summary to stdout, optional violating-row
    sink (rows failing ANY row-local check — the send_ok=False shape)."""
    import json

    import ray.data as rd

    from anomaly_detection_ray.stages import expectations as ex

    if not args.data:
        sys.stderr.write("--expect-suite needs --data <parquet path>\n")
        return 2
    with open(args.expect_suite) as f:
        suite = json.load(f)
    if args.expect_store:
        if args.expect_by or args.out:
            sys.stderr.write("--expect-store is a table-level summary "
                             "mode: drop --expect-by/--out\n")
            return 2
        from anomaly_detection_ray.pipelines import profile_store as ps
        res = ps.update_expectation_store(args.data, args.expect_store,
                                          suite)
        print(f"validated {res['n_validated']} new/changed files, "
              f"{res['n_reused']} reused, {res['n_dropped']} dropped")
        summary = ps.merged_expectations(args.expect_store)
        print(summary.to_string(index=False))
        return 1 if int((~summary["passed"]).sum()) else 0
    ds = rd.read_parquet(args.data)
    if args.expect_by:
        summary = ex.run_expectations_by(ds, suite, by=args.expect_by)
        print(summary.to_string(index=False))
        return 1 if int((~summary["passed"]).sum()) else 0
    summary = ex.run_expectations(ds, suite)
    print(summary.to_string(index=False))
    failed = int((~summary["passed"]).sum())
    if args.out:
        flagged = ex.flag_violations(ds, suite)
        flags = [c for c in flagged.schema().names if c.endswith("__bad")]

        def any_bad(t):
            import pyarrow.compute as pc
            mask = None
            for c in flags:
                m = pc.fill_null(t[c], False)
                mask = m if mask is None else pc.or_(mask, m)
            return t.filter(mask) if mask is not None else t.slice(0, 0)

        flagged.map_batches(any_bad, batch_format="pyarrow").write_parquet(
            args.out)
        print(f"violating rows written to {args.out}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
