"""The flagship clip-table validation pipeline (north rule, SURVEY.md §3
"Our lifecycle").

Two passes, both streaming:

Pass A (narrow — metadata columns only, bytes never read):
    - exact duplicate clip_ids (partial counts → groupby sum → broadcast set)
    - HLL distinct estimate (metrics)
    - dataset-level Welford stats for dur_ms (mergeable partials, driver fold)
    - per-codec salted grouped stats (two-level merge; metrics)
    - per-partition KS/PSI drift verdicts vs leave-one-out global

Pass B (full — streams bytes exactly once):
    row_validate → border(sr_hz) → byte-length consistency → transcript
    presence/equality → broadcast-Welford z-check on dur_ms → PCM decode +
    SNR fidelity (actor pool) → duplicate flag (broadcast set) → OR-combine
    → violations written as partition-keyed parquet + per-partition metrics.

Resume: completed partitions (manifest, same config hash) are excluded at
the READ via partition_id pushdown; outputs are partition-named so reruns
are idempotent.
"""

from __future__ import annotations

import os
import time
from dataclasses import asdict, dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..functions.grading import ERROR_CODE, UNDEFINED_CODE
from ..sources.clips import META_COLUMNS, read_clips
from ..stages.sizing import pool_size
from ..stages import checks as ck
from ..stages import drift as drift_mod
from ..stages import stats as stats_mod
from ..stages import uniqueness as uniq_mod
from ..stages.combination import combine_stage
from ..stages.row_validate import validate_clips
from . import checkpoint as ckpt

CODE_COLS = ["rv_code", "bc_code", "cc_code", "tc_code", "wf_code", "fid_code", "uq_code"]


@dataclass
class ValidateConfig:
    seed: int = 42
    P: int = 16
    sr_UL: float = 48000.0
    sr_LL: float = 8000.0
    sr_warning_stages: tuple = (0.7, 0.9)
    welford_X: float = 4.0
    welford_warning_stages: tuple = (0.7, 0.9)
    snr_threshold: float = 30.0
    check_transcript_content: bool = True
    fidelity_concurrency: int = 4
    fidelity_batch_size: int = 64
    meta_batch_size: int = 8192
    n_salts: int = 8
    drift: dict = field(default_factory=dict)


def run_pass_a(meta_ds, cfg: ValidateConfig) -> dict:
    """Narrow aggregation pass: ONE streaming execution over the metadata
    columns computes every dataset-level statistic at once — each batch emits
    one composite partial (Welford tuples, salted per-codec tuples, HLL
    registers, drift histograms, sorted clip_id hashes), folded on the
    driver. The fold is O(#batches x small) except the id-hash arrays,
    which are O(rows x 8B) — fine to ~1e9 rows; past that flip to
    ``run_pass_a_shuffle`` whose duplicate confirmation is a key shuffle.

    Duplicate detection is by 64-bit id hash (same hash is re-derived
    row-locally in the flag stage); collisions are ~1e-12 at sandbox scale —
    the shuffle path confirms exactly and is the trillion-row mode.

    Resume scope note: on a resumed run the metadata pass only reads the
    remaining partitions, so duplicate PAIRS that straddle a completed and a
    remaining partition are not re-flagged (same behavior as the original
    multi-pass design; a full-table dup audit = run with resume=False or
    call run_pass_a over the unfiltered read)."""
    import pickle

    drift_cols = cfg.drift.get("columns") or drift_mod.DEFAULT_EDGES
    n_salts = cfg.n_salts

    def composite_partial(t: pa.Table) -> pa.Table:
        from ..functions.sketches import HyperLogLog
        ids = t["clip_id"].to_pandas()
        idh = pd.util.hash_pandas_object(ids, index=False).to_numpy(np.uint64)
        hll = HyperLogLog(14)
        hll.add_hashes(idh)
        dur_t = stats_mod.welford_partial_batch(t, "dur_ms")
        codec_t = stats_mod.welford_partial_batch(t, "dur_ms", "codec",
                                                  n_salts=n_salts)
        hist_t = drift_mod._hist_partial_batch(t, drift_cols, "partition_id")
        payload = pickle.dumps({
            "idh": np.sort(idh),
            "hll": hll.registers.tobytes(),
            "dur": dur_t.to_pydict(),
            "codec": codec_t.to_pydict(),
            "hist": hist_t.to_pydict(),
        })
        return pa.table({"payload": pa.array([payload], type=pa.binary())})

    from ..functions.sketches import HyperLogLog, WelfordPartial
    dur_acc = WelfordPartial()
    hll_acc = HyperLogLog(14)
    codec_rows: list[pd.DataFrame] = []
    hist_rows: list[pd.DataFrame] = []
    hash_chunks: list[np.ndarray] = []
    parts = meta_ds.map_batches(composite_partial, batch_format="pyarrow")
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=256):
        for buf in b["payload"].to_pylist():
            p = pickle.loads(buf)
            hash_chunks.append(p["idh"])
            other = HyperLogLog(14)
            other.registers = np.frombuffer(p["hll"], dtype=np.uint8).copy()
            hll_acc = hll_acc.merge(other)
            d = p["dur"]
            for i in range(len(d["n"])):
                dur_acc = dur_acc.merge(WelfordPartial(
                    int(d["n"][i]), d["mean"][i], d["M2"][i], d["min"][i], d["max"][i]))
            codec_rows.append(pd.DataFrame(p["codec"]))
            hist_rows.append(pd.DataFrame(p["hist"]))

    # exact duplicate hashes (driver fold of sorted per-batch hash arrays)
    all_h = np.concatenate(hash_chunks) if hash_chunks else np.array([], np.uint64)
    uniq, counts = np.unique(all_h, return_counts=True)
    dup_hashes = uniq[counts > 1]
    dup_counts = pd.DataFrame({"clip_id_hash": dup_hashes.astype(np.int64),
                               "cnt": counts[counts > 1].astype(np.int64)})

    # two-level salted codec merge (level 1 happened per batch per salt)
    codec_stats = _fold_welford_keyed(pd.concat(codec_rows, ignore_index=True)) \
        if codec_rows else pd.DataFrame()

    hist = pd.concat(hist_rows, ignore_index=True)
    merged_hist = (hist.groupby(["partition_id", "column"], as_index=False,
                                sort=False)
                   .agg(counts=("counts", lambda s: np.sum(
                       np.stack([np.asarray(c) for c in s]), axis=0))))
    drift_df = drift_mod.grade_drift(merged_hist,
                                     **{k: v for k, v in cfg.drift.items()
                                        if k != "columns"})
    return {
        "dup_hashes": dup_hashes,
        "dup_counts": dup_counts,
        "hll_estimate": hll_acc.estimate(),
        "dur_stats": dur_acc,
        "codec_stats": codec_stats,
        "drift": drift_df,
    }


def _fold_welford_keyed(df: pd.DataFrame) -> pd.DataFrame:
    from ..functions.sketches import WelfordPartial
    out = []
    for k, g in df.groupby("key", sort=True):
        acc = WelfordPartial()
        for _, r in g.iterrows():
            acc = acc.merge(WelfordPartial(int(r["n"]), r["mean"], r["M2"],
                                           r["min"], r["max"]))
        out.append({"key": k, "n": acc.n, "mean": acc.mean, "std": acc.std,
                    "std_sample": acc.std_sample, "min": acc.min, "max": acc.max})
    return pd.DataFrame(out)


def run_pass_a_shuffle(meta_ds, cfg: ValidateConfig) -> dict:
    """Multi-execution variant with shuffle-confirmed duplicates (the
    trillion-row path; each stage is an independent Ray execution)."""
    dup_df = uniq_mod.find_duplicate_keys(meta_ds, "clip_id")
    hll_est = uniq_mod.estimate_unique(meta_ds, "clip_id")
    dur_stats = stats_mod.global_welford(meta_ds, "dur_ms")
    codec_stats = stats_mod.grouped_welford(meta_ds, "dur_ms", "codec",
                                            n_salts=cfg.n_salts)
    drift_df = drift_mod.partition_drift(meta_ds, **cfg.drift)
    ids = dup_df["clip_id"]
    dup_hashes = pd.util.hash_pandas_object(
        ids, index=False).to_numpy(np.uint64) if len(ids) else np.array([], np.uint64)
    return {
        "dup_hashes": np.sort(dup_hashes),
        "dup_counts": dup_df,
        "hll_estimate": hll_est,
        "dur_stats": dur_stats,
        "codec_stats": codec_stats,
        "drift": drift_df,
    }


def build_pass_b(full_ds, cfg: ValidateConfig, pass_a: dict):
    """Wire the per-row check chain onto the full Dataset (lazy)."""
    dup_ref = ray.put(np.sort(np.asarray(pass_a["dup_hashes"], dtype=np.uint64)))
    dur_mean = pass_a["dur_stats"].mean
    dur_std = pass_a["dur_stats"].std

    ds = full_ds.map_batches(validate_clips, batch_format="pyarrow")
    ds = ds.map_batches(
        lambda t: ck.border_stage(t, "sr_hz", cfg.sr_UL, cfg.sr_LL,
                                  list(cfg.sr_warning_stages), prefix="bc"),
        batch_format="pyarrow")
    ds = ds.map_batches(ck.consistency_stage, batch_format="pyarrow")
    ds = ds.map_batches(
        lambda t: ck.transcript_stage(
            t, seed=cfg.seed if cfg.check_transcript_content else None),
        batch_format="pyarrow")
    ds = ds.map_batches(
        lambda t: ck.zscore_stage(t, "dur_ms", dur_mean, dur_std, cfg.welford_X,
                                  list(cfg.welford_warning_stages), prefix="wf"),
        batch_format="pyarrow")
    ds = ds.map_batches(
        ck.FidelityCheck,
        fn_constructor_kwargs={"seed": cfg.seed, "snr_threshold": cfg.snr_threshold},
        batch_format="pyarrow",
        batch_size=cfg.fidelity_batch_size,
        concurrency=pool_size(cfg.fidelity_concurrency),
        num_cpus=1)

    def dup_flag(t: pa.Table) -> pa.Table:
        return ck.flag_duplicate_hashes_stage(t, ray.get(dup_ref))

    ds = ds.map_batches(dup_flag, batch_format="pyarrow")
    ds = ds.map_batches(lambda t: combine_stage(t, CODE_COLS, mode="or"),
                        batch_format="pyarrow")
    # drop the audio payload + transcript before anything downstream consumes
    # the verdict table twice — the slim table is ~1% of the input bytes
    slim_cols = [c for c in ["clip_id", "partition_id", "sr_hz", "dur_ms",
                             "codec", "status_code", "anomaly_score", "snr_db",
                             "rv_reason", "bc_status", "cc_status", "tc_status",
                             "wf_status", "fid_status", "uq_status"] + CODE_COLS]
    ds = ds.map_batches(
        lambda t: t.select([c for c in slim_cols if c in t.column_names]),
        batch_format="pyarrow")
    return ds


def partition_metrics(verdict_ds) -> pd.DataFrame:
    """Per-partition violation counts via per-batch partials + small groupby."""
    def batch_counts(t: pa.Table) -> pa.Table:
        parts = t["partition_id"].to_numpy(zero_copy_only=False)
        rows = []
        for p in np.unique(parts):
            m = parts == p
            row = {"partition_id": int(p), "rows": int(m.sum())}
            for c in CODE_COLS + ["status_code"]:
                codes = t[c].to_numpy(zero_copy_only=False)[m]
                row[f"{c}_errors"] = int((codes == ERROR_CODE).sum())
                row[f"{c}_undefined"] = int((codes == UNDEFINED_CODE).sum())
            rows.append(row)
        return pa.Table.from_pylist(rows)

    partials = verdict_ds.map_batches(batch_counts, batch_format="pyarrow")
    df = partials.to_pandas()
    if df.empty:
        return df
    return df.groupby("partition_id", as_index=False).sum()


def run_validation(path: str, out_dir: str, cfg: ValidateConfig | None = None,
                   resume: bool = True) -> dict:
    """End-to-end run. Returns {verdicts, metrics, violations_path, ...}."""
    cfg = cfg or ValidateConfig()
    cfg_hash = ckpt.config_hash(asdict(cfg))
    manifest = ckpt.load_manifest(out_dir) if resume else {"partitions": {}, "config_hash": None}
    done = ckpt.completed_partitions(manifest, cfg_hash)
    todo = [p for p in range(cfg.P) if p not in done]
    t0 = time.time()

    result = {"config_hash": cfg_hash, "skipped_partitions": sorted(done),
              "out_dir": out_dir}
    if not todo:
        result.update({"verdicts": pd.DataFrame(
            [{"partition_id": int(p), **e} for p, e in manifest["partitions"].items()]),
            "rows": 0, "wall_sec": 0.0})
        return result

    partitions_filter = todo if done else None  # avoid a no-op filter
    meta_ds = read_clips(path, columns=META_COLUMNS, partitions=partitions_filter)
    pass_a = run_pass_a(meta_ds, cfg)

    full_ds = read_clips(path, partitions=partitions_filter)
    # one streaming execution of the heavy pass; the slim verdict table
    # (no audio payload) is pinned once and feeds both sinks below
    verdict_ds = build_pass_b(full_ds, cfg, pass_a).materialize()

    viol_path = os.path.join(out_dir, "violations")
    violations = verdict_ds.map_batches(
        lambda t: t.filter(pc.equal(t["status_code"], ERROR_CODE)),
        batch_format="pyarrow")
    os.makedirs(viol_path, exist_ok=True)
    violations.write_parquet(viol_path, partition_cols=["partition_id"])

    metrics = partition_metrics(verdict_ds)
    drift_df = pass_a["drift"]
    drift_fail = set(drift_df.loc[drift_df["drift_code"] == ERROR_CODE, "partition_id"])

    wall = time.time() - t0
    total_rows = int(metrics["rows"].sum()) if not metrics.empty else 0
    verdict_rows = []
    for _, r in metrics.iterrows():
        pid = int(r["partition_id"])
        has_error = int(r["status_code_errors"]) > 0
        drifted = pid in drift_fail
        entry = {
            "done": True,
            "pass": not (has_error or drifted),
            "rows": int(r["rows"]),
            "violations": int(r["status_code_errors"]),
            "drifted": bool(drifted),
            "metrics": {c: int(r[c]) for c in r.index
                        if c.endswith("_errors") or c.endswith("_undefined")},
            "lineage": {"input": str(path), "config_hash": cfg_hash},
        }
        manifest["partitions"][str(pid)] = entry
        verdict_rows.append({"partition_id": pid, **{k: v for k, v in entry.items()
                                                    if k not in ("metrics", "lineage")}})
    manifest["config_hash"] = cfg_hash
    manifest["hll_estimate"] = pass_a["hll_estimate"]
    manifest["clips_per_sec"] = total_rows / wall if wall > 0 else None
    ckpt.save_manifest(out_dir, manifest)

    result.update({
        "verdicts": pd.DataFrame(verdict_rows).sort_values("partition_id").reset_index(drop=True),
        "metrics": metrics,
        "drift": drift_df,
        "pass_a": {k: pass_a[k] for k in ("hll_estimate", "dup_counts", "codec_stats")},
        "rows": total_rows,
        "wall_sec": wall,
        "clips_per_sec": total_rows / wall if wall > 0 else None,
        "violations_path": viol_path,
    })
    return result
