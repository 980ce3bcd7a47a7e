"""Human-readable validation report — the batch analog of the reference's
live visualization sink (/root/reference/src/visualization.py plots scores
as they stream; a batch engine renders the finished run instead).

``write_report(out_dir)`` reads the run's ``_manifest.json`` plus the
violations parquet and writes ``_report.md`` (markdown: run summary,
per-partition verdict table, violation breakdown by check and by status
string, codec skew table, text-bar histograms) and ``_report.json``
(machine-readable summary for dashboards).

Scale shape: the manifest is O(partitions); violation aggregates are
computed distributed (per-batch partial counts -> tiny driver fold), and
only ``sample_n`` example rows are ever collected, so the report stays
O(partitions + distinct status strings) no matter the corpus size.
"""

from __future__ import annotations

import json
import os

import pandas as pd


def _bar(frac: float, width: int = 30) -> str:
    n = int(round(max(0.0, min(1.0, frac)) * width))
    return "#" * n + "." * (width - n)


def _violation_aggregates(viol_dir: str, sample_n: int) -> dict:
    """Distributed aggregates over the violations parquet: counts by check
    and status string, by codec, plus a small example sample."""
    import ray.data as rd
    ds = rd.read_parquet(viol_dir)
    status_cols = [c for c in ds.schema().names if c.endswith("_status")]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in status_cols:
            vc = df.loc[df[c] != "OK", c].value_counts()
            rows.extend({"kind": "status", "key": f"{c[:-7]}: {s}", "n": int(k)}
                        for s, k in vc.items())
        vc = df["codec"].value_counts()
        rows.extend({"kind": "codec", "key": str(s), "n": int(k)}
                    for s, k in vc.items())
        rows.append({"kind": "total", "key": "violations", "n": len(df)})
        return pd.DataFrame(rows, columns=["kind", "key", "n"])

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    agg = (parts.groupby(["kind", "key"], as_index=False)["n"].sum()
           if len(parts) else pd.DataFrame(columns=["kind", "key", "n"]))
    sample_cols = [c for c in ("clip_id", "status_code", "anomaly_score",
                               "partition_id") if c in ds.schema().names]
    sample = ds.select_columns(sample_cols).limit(sample_n).to_pandas()
    return {"agg": agg, "sample": sample}


def write_report(out_dir: str, sample_n: int = 10) -> str:
    """Render ``_report.md`` + ``_report.json`` for a finished validation
    run directory. Returns the markdown path."""
    manifest_path = os.path.join(out_dir, "_manifest.json")
    with open(manifest_path) as f:
        manifest = json.load(f)
    parts = manifest.get("partitions", {})
    rows_total = sum(e.get("rows", 0) for e in parts.values())
    viol_total = sum(e.get("violations", 0) for e in parts.values())
    n_pass = sum(1 for e in parts.values() if e.get("pass"))
    drifted = sorted(int(p) for p, e in parts.items() if e.get("drifted"))

    # per-check error totals from the manifest metrics (no data read)
    check_totals: dict[str, int] = {}
    for e in parts.values():
        for k, v in e.get("metrics", {}).items():
            check_totals[k] = check_totals.get(k, 0) + int(v)

    viol_dir = os.path.join(out_dir, "violations")
    have_viol = os.path.isdir(viol_dir) and any(
        f for _, _, fs in os.walk(viol_dir) for f in fs)
    detail = (_violation_aggregates(viol_dir, sample_n)
              if have_viol else {"agg": pd.DataFrame(columns=["kind", "key", "n"]),
                                 "sample": pd.DataFrame()})
    agg = detail["agg"]

    lines = ["# Validation report", ""]
    lines.append(f"- input rows: **{rows_total:,}**")
    lines.append(f"- violations: **{viol_total:,}** "
                 f"({viol_total / rows_total:.2%})" if rows_total else
                 "- violations: 0")
    lines.append(f"- partitions: {len(parts)} ({n_pass} pass, "
                 f"{len(parts) - n_pass} fail)")
    lines.append(f"- drifted partitions: {drifted or 'none'}")
    if manifest.get("hll_estimate") is not None:
        lines.append(f"- distinct clip_id (HLL): "
                     f"{manifest['hll_estimate']:,.0f}")
    if manifest.get("clips_per_sec"):
        lines.append(f"- throughput: {manifest['clips_per_sec']:,.0f} clips/s")
    lines.append("")

    lines.append("## Violations by check")
    lines.append("")
    lines.append("| check counter | n | share of rows |")
    lines.append("|---|---|---|")
    for k in sorted(check_totals):
        n = check_totals[k]
        if n == 0:
            continue
        frac = n / rows_total if rows_total else 0.0
        lines.append(f"| {k} | {n:,} | `{_bar(frac if frac < 1 else 1.0)}` "
                     f"{frac:.2%} |")
    lines.append("")

    st = agg[agg["kind"] == "status"].sort_values("n", ascending=False)
    if len(st):
        lines.append("## Violation status strings")
        lines.append("")
        lines.append("| status | n |")
        lines.append("|---|---|")
        for _, r in st.head(25).iterrows():
            lines.append(f"| {r['key']} | {int(r['n']):,} |")
        lines.append("")

    cd = agg[agg["kind"] == "codec"].sort_values("n", ascending=False)
    if len(cd):
        total_v = int(cd["n"].sum())
        lines.append("## Violations by codec")
        lines.append("")
        lines.append("| codec | n | share |")
        lines.append("|---|---|---|")
        for _, r in cd.iterrows():
            frac = int(r["n"]) / total_v if total_v else 0.0
            lines.append(f"| {r['key']} | {int(r['n']):,} | "
                         f"`{_bar(frac)}` {frac:.1%} |")
        lines.append("")

    lines.append("## Per-partition verdicts")
    lines.append("")
    lines.append("| partition | rows | violations | pass | drifted |")
    lines.append("|---|---|---|---|---|")
    for p in sorted(parts, key=int):
        e = parts[p]
        lines.append(f"| {p} | {e.get('rows', 0):,} | "
                     f"{e.get('violations', 0):,} | "
                     f"{'yes' if e.get('pass') else 'NO'} | "
                     f"{'YES' if e.get('drifted') else 'no'} |")
    lines.append("")

    if len(detail["sample"]):
        lines.append(f"## Example violations (first {sample_n})")
        lines.append("")
        lines.append("```")
        lines.append(detail["sample"].to_string(index=False))
        lines.append("```")
        lines.append("")

    md_path = os.path.join(out_dir, "_report.md")
    with open(md_path, "w") as f:
        f.write("\n".join(lines))

    summary = {
        "rows": rows_total,
        "violations": viol_total,
        "partitions": len(parts),
        "partitions_pass": n_pass,
        "drifted_partitions": drifted,
        "check_totals": {k: v for k, v in sorted(check_totals.items()) if v},
        "status_counts": {r["key"]: int(r["n"]) for _, r in st.iterrows()}
        if len(st) else {},
    }
    with open(os.path.join(out_dir, "_report.json"), "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    return md_path
