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


def _svg_bar_chart(parts: dict, width: int = 640, height: int = 220) -> str:
    """Single-series SVG bar chart: violations per partition. Mark spec:
    thin bars, 4px rounded DATA end anchored to the baseline, 2px surface
    gaps, recessive grid, selective direct label (max bar only), native
    hover tooltip per bar via <title> plus a full-height hit target."""
    order = sorted(parts, key=int)
    vals = [int(parts[p].get("violations", 0)) for p in order]
    vmax = max(vals) if vals else 0
    pad_l, pad_r, pad_t, pad_b = 44, 12, 16, 34
    plot_w, plot_h = width - pad_l - pad_r, height - pad_t - pad_b
    n = max(len(order), 1)
    slot = plot_w / n
    bar_w = max(4.0, min(28.0, slot - 2.0))  # 2px surface gap between bars
    imax = vals.index(vmax) if vals and vmax > 0 else -1

    def y(v: float) -> float:
        return pad_t + plot_h * (1.0 - (v / vmax if vmax else 0.0))

    svg = [f'<svg viewBox="0 0 {width} {height}" role="img" '
           f'aria-label="Violations per partition" '
           f'preserveAspectRatio="xMidYMid meet">']
    # recessive horizontal grid + muted y labels at 0 / mid / max
    for gv in sorted({0, vmax // 2, vmax}):
        gy = y(gv)
        svg.append(f'<line x1="{pad_l}" y1="{gy:.1f}" x2="{width - pad_r}" '
                   f'y2="{gy:.1f}" class="grid"/>')
        svg.append(f'<text x="{pad_l - 6}" y="{gy + 4:.1f}" '
                   f'class="axis" text-anchor="end">{gv}</text>')
    for i, p in enumerate(order):
        v = vals[i]
        cx = pad_l + slot * (i + 0.5)
        x0 = cx - bar_w / 2
        top, base = y(v), pad_t + plot_h
        h = base - top
        r = min(4.0, h, bar_w / 2)
        e = parts[p]
        tip = (f"partition {p}: {v:,} violations / "
               f"{int(e.get('rows', 0)):,} rows"
               + ("; DRIFTED" if e.get("drifted") else ""))
        if h > 0:
            # rounded top (data end), square base (anchored)
            d = (f"M{x0:.1f},{base:.1f} V{top + r:.1f} "
                 f"Q{x0:.1f},{top:.1f} {x0 + r:.1f},{top:.1f} "
                 f"H{x0 + bar_w - r:.1f} "
                 f"Q{x0 + bar_w:.1f},{top:.1f} "
                 f"{x0 + bar_w:.1f},{top + r:.1f} V{base:.1f} Z")
            svg.append(f'<path class="bar" d="{d}"/>')
        if i == imax:  # selective direct label: max bar only
            svg.append(f'<text x="{cx:.1f}" y="{top - 5:.1f}" class="lbl" '
                       f'text-anchor="middle">{v:,}</text>')
        svg.append(f'<text x="{cx:.1f}" y="{height - pad_b + 16}" '
                   f'class="axis" text-anchor="middle">{p}</text>')
        # hover hit target: full plot height, full slot width (> mark)
        svg.append(f'<rect class="hit" x="{pad_l + slot * i:.1f}" '
                   f'y="{pad_t}" width="{slot:.1f}" height="{plot_h}">'
                   f'<title>{tip}</title></rect>')
    svg.append(f'<text x="{pad_l}" y="{height - pad_b + 30}" class="axis">'
               f'partition</text>')
    svg.append("</svg>")
    return "".join(svg)


def write_html_report(out_dir: str) -> str:
    """Render ``_report.html`` — the self-contained visual analog of the
    reference's live matplotlib sink (visualization.py) for a batch run:
    hero stat tiles, a violations-per-partition bar chart (single series,
    hover tooltips, light/dark from one set of role tokens, palette
    validated with the six-checks script), status chips with icon+label
    (never color alone), and the full per-partition table as the
    accessible table view. Pure stdlib; reads only _manifest.json —
    O(partitions) like the markdown report."""
    with open(os.path.join(out_dir, "_manifest.json")) as f:
        manifest = json.load(f)
    parts = manifest.get("partitions", {})
    rows_total = sum(e.get("rows", 0) for e in parts.values())
    viol_total = sum(e.get("violations", 0) for e in parts.values())
    n_pass = sum(1 for e in parts.values() if e.get("pass"))
    n_drift = sum(1 for e in parts.values() if e.get("drifted"))
    pct = f"{viol_total / rows_total:.2%}" if rows_total else "0%"

    def chip(kind: str) -> str:
        # status colors are reserved + always icon-and-label
        icon, word = {"pass": ("✓", "pass"),
                      "fail": ("✕", "fail"),
                      "drift": ("!", "drift")}[kind]
        return (f'<span class="chip chip-{kind}">'
                f'<span class="ic">{icon}</span>{word}</span>')

    trs = []
    for p in sorted(parts, key=int):
        e = parts[p]
        status = chip("pass") if e.get("pass") else chip("fail")
        if e.get("drifted"):
            status += " " + chip("drift")
        trs.append(f"<tr><td>{p}</td><td>{e.get('rows', 0):,}</td>"
                   f"<td>{e.get('violations', 0):,}</td>"
                   f"<td>{status}</td></tr>")

    html = f"""<!doctype html><html><head><meta charset="utf-8">
<title>Validation report</title><style>
.viz-root {{ color-scheme: light;
  --surface-1:#fcfcfb; --text-primary:#0b0b0b; --text-secondary:#52514e;
  --series-1:#2a78d6; --grid:#e4e3df;
  --st-good:#0ca30c; --st-warning:#fab219; --st-critical:#d03b3b;
  font: 14px/1.45 system-ui, sans-serif; background: var(--surface-1);
  color: var(--text-primary); max-width: 720px; margin: 2rem auto;
  padding: 0 1rem; }}
@media (prefers-color-scheme: dark) {{
  :root:where(:not([data-theme="light"])) .viz-root {{ color-scheme: dark;
    --surface-1:#1a1a19; --text-primary:#ffffff;
    --text-secondary:#c3c2b7; --series-1:#3987e5; --grid:#33322f; }} }}
:root[data-theme="dark"] .viz-root {{ color-scheme: dark;
  --surface-1:#1a1a19; --text-primary:#ffffff; --text-secondary:#c3c2b7;
  --series-1:#3987e5; --grid:#33322f; }}
h1 {{ font-size: 1.25rem; }}  h2 {{ font-size: 1rem; margin-top: 1.6rem; }}
.tiles {{ display:flex; gap:12px; flex-wrap:wrap; }}
.tile {{ border:1px solid var(--grid); border-radius:8px;
  padding:10px 14px; min-width:120px; }}
.tile .v {{ font-size:1.4rem; font-weight:600; }}
.tile .k {{ color:var(--text-secondary); font-size:.8rem; }}
svg {{ width:100%; height:auto; display:block; }}
.bar {{ fill: var(--series-1); }}
.grid {{ stroke: var(--grid); stroke-width:1; }}
.axis {{ fill: var(--text-secondary); font-size:11px; }}
.lbl {{ fill: var(--text-primary); font-size:11px; font-weight:600; }}
.hit {{ fill: transparent; }}
.hit:hover {{ fill: color-mix(in srgb, var(--series-1) 14%, transparent); }}
table {{ border-collapse: collapse; width:100%; }}
td, th {{ border-bottom:1px solid var(--grid); padding:6px 8px;
  text-align:left; }}
th {{ color: var(--text-secondary); font-weight:600; }}
.chip {{ border-radius:10px; padding:1px 8px; font-size:.78rem;
  color:#fff; white-space:nowrap; }}
.chip .ic {{ margin-right:4px; }}
.chip-pass {{ background: var(--st-good); }}
.chip-fail {{ background: var(--st-critical); }}
.chip-drift {{ background: var(--st-warning); color:#0b0b0b; }}
</style></head><body class="viz-root">
<h1>Validation report</h1>
<div class="tiles">
<div class="tile"><div class="v">{rows_total:,}</div><div class="k">rows validated</div></div>
<div class="tile"><div class="v">{viol_total:,}</div><div class="k">violations ({pct})</div></div>
<div class="tile"><div class="v">{n_pass}/{len(parts)}</div><div class="k">partitions pass</div></div>
<div class="tile"><div class="v">{n_drift}</div><div class="k">drifted partitions</div></div>
</div>
<h2>Violations per partition</h2>
{_svg_bar_chart(parts)}
<h2>Per-partition verdicts</h2>
<table><tr><th>partition</th><th>rows</th><th>violations</th>
<th>status</th></tr>
{''.join(trs)}
</table>
</body></html>"""
    path = os.path.join(out_dir, "_report.html")
    with open(path, "w") as f:
        f.write(html)
    return path
