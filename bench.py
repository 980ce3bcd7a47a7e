#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) with ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "clips_per_sec": ...}

``--scaling``: runs the clip-validation headline twice in fresh processes
(num_cpus=8 then 32) on the same input and reports both throughputs plus
scaling efficiency (BASELINE.md protocol).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
CLIP_N = int(os.environ.get("ADR_CLIP_N", "20000"))


def _warm_cache(d=None):
    """Pull input files into the OS page cache so timings measure the engine,
    not the disk (both scaling runs must see identical I/O conditions)."""
    for name in os.listdir(d or SF_DIR):
        p = os.path.join(d or SF_DIR, name)
        if os.path.isfile(p):
            with open(p, "rb") as f:
                while f.read(1 << 22):
                    pass


def _consume(res) -> int:
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    if isinstance(res, rd.Dataset):
        return res.materialize().count()
    if isinstance(res, (pd.DataFrame, pa.Table)):
        return len(res)
    return 0


def run_headline() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from anomaly_detection_ray import synth
    from anomaly_detection_ray.pipelines import queries as q
    from anomaly_detection_ray.pipelines.validate import (ValidateConfig,
                                                          run_validation)

    sf_name = os.path.basename(os.path.normpath(SF_DIR))
    _warm_cache()

    # clip table: generation is NOT timed (cached on disk, deterministic)
    clip_path = f"/tmp/adr_bench_clips/{sf_name}_{CLIP_N}"
    synth.write_clip_table(clip_path, seed=42, n=CLIP_N, P=16, rows_per_file=1024)
    _warm_cache(clip_path)

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        n = _consume(out) if out is not None else 0
        timings[name] = round(time.perf_counter() - t0, 3)
        rows[name] = n

    import __ray_entry__ as entrymod
    Q = entrymod.queries()

    # untimed warm-up: pay worker start + parquet metadata once, not inside
    # the first timed query
    import ray.data as rd
    rd.read_parquet(f"{SF_DIR}/events.parquet").map_batches(
        lambda t: t, batch_format="pyarrow").materialize()

    only_clips = os.environ.get("ADR_BENCH_ONLY_CLIPS") == "1"
    if not only_clips:
        timed("events_validation", lambda: _entry_chain(SF_DIR))
    if not only_clips:
        timed("grouped_stats_events", lambda: Q["grouped_stats_events"](SF_DIR))
        timed("welford_window_events", lambda: Q["welford_window_events"](SF_DIR))
        timed("pricing_summary", lambda: Q["pricing_summary"](SF_DIR))
        timed("top_customers_revenue", lambda: Q["top_customers_revenue"](SF_DIR))
        timed("events_hourly", lambda: Q["events_hourly"](SF_DIR))
        timed("exact_dedup_documents", lambda: Q["exact_dedup_documents"](SF_DIR))
        timed("minhash_dedup_documents", lambda: Q["minhash_dedup_documents"](SF_DIR))
        timed("text_quality_documents", lambda: Q["text_quality_documents"](SF_DIR))
        timed("lang_detect_documents", lambda: Q["lang_detect_documents"](SF_DIR))
        timed("similarity_topk_embeddings", lambda: Q["similarity_topk_embeddings"](SF_DIR))
        timed("ann_ivf_embeddings", lambda: Q["ann_ivf_embeddings"](SF_DIR))

    t0 = time.perf_counter()
    res = run_validation(clip_path, f"/tmp/adr_bench_out/{sf_name}_{NUM_CPUS}",
                         ValidateConfig(seed=42, P=16,
                                        fidelity_concurrency=max(2, NUM_CPUS - 2),
                                        fidelity_batch_size=128),
                         resume=False)
    timings["clip_validation"] = round(time.perf_counter() - t0, 3)
    clips_per_sec = CLIP_N / timings["clip_validation"]

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline pipelines wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_name,
        "num_cpus": NUM_CPUS,
        "clip_rows": CLIP_N,
        "clips_per_sec": round(clips_per_sec, 2),
    }
    ray.shutdown()
    return out


def _entry_chain(sf_dir):
    """entry()-equivalent on an arbitrary sf dir."""
    import pyarrow as pa
    import ray.data as rd

    from anomaly_detection_ray.pipelines import queries as q
    from anomaly_detection_ray.stages import row_validate as rv
    from anomaly_detection_ray.stages import series as series_mod
    from anomaly_detection_ray.stages.checks import border_stage
    from anomaly_detection_ray.stages.combination import combine_stage

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])
    ds = ds.map_batches(rv.validate_events, batch_format="pyarrow")
    ds = ds.map_batches(
        lambda t: border_stage(t, "value", q.EV_UL, q.EV_LL, q.EV_WS, prefix="bc"),
        batch_format="pyarrow")
    ds = ds.select_columns(["event_id", "ts", "user_id", "value",
                            "rv_code", "bc_code"])
    ds = series_mod.apply_series_checks(
        ds, "user_id", ["ts", "event_id"], "value",
        [{"name": "wf", "kernel": "welford",
          "params": {"X": q.WF_X, "N": q.WF_N, "warning_stages": []}}],
        valid_col="rv_code", keep_status=False)
    return ds.map_batches(
        lambda t: combine_stage(t, ["rv_code", "bc_code", "wf_code"], mode="or"),
        batch_format="pyarrow")


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        # scaling verdict is about the flagship pipeline: use a clip count
        # where per-clip compute dominates the fixed per-run overhead, and
        # skip the small sf-table queries
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   ADR_CLIP_N=os.environ.get("ADR_SCALING_CLIP_N", "300000"),
                   ADR_BENCH_ONLY_CLIPS="1")
        out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                             env=env, capture_output=True, text=True, check=True)
        return json.loads(out.stdout.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = run(lo)
    r_hi = run(hi)
    cps_lo = r_lo["clips_per_sec"]
    cps_hi = r_hi["clips_per_sec"]
    eff = (cps_hi / cps_lo) / (hi / lo)
    # total-headline efficiency as a secondary signal
    eff_total = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": "scaling efficiency (clips/sec, 8 -> 32 cpus)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "clips_per_sec_8": cps_lo,
        "clips_per_sec_32": cps_hi,
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "total_headline_efficiency": round(eff_total, 3),
        "sf": r_lo["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_headline()))
