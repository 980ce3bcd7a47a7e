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
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m anomaly_detection_ray",
        description="Run a reference-schema validation config over a "
                    "message stream (batch replay, main.py -f mode).")
    p.add_argument("-c", "--config", required=True,
                   help="reference-schema JSON config path")
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
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

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


if __name__ == "__main__":
    sys.exit(main())
