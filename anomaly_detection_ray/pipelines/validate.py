"""The flagship clip-table validation pipeline (north rule, SURVEY.md §3
"Our lifecycle").

Two passes, both streaming:

Pass A (narrow — metadata columns only, bytes never read):
    ONE streaming execution computes every small dataset-level statistic as
    mergeable per-batch partials (HLL registers, Welford tuples, salted
    per-codec tuples, drift histograms) folded on the driver — these are
    O(#batches x small), never O(rows). Duplicate clip_id detection is
    row-cardinality work and picks its path by table size:
      - driver fold (small inputs): per-(partition, hash) counts fold on the
        driver — O(distinct ids) driver memory, fastest below
        ``driver_fold_max_rows``;
      - shuffle (the at-scale DEFAULT; chosen automatically when the row
        estimate exceeds the threshold or is unknown): per-batch hash-count
        partials are written straight to per-partition parquet (no shuffle —
        blocks split by value at the write), then a key shuffle over the
        READ-BACK confirms global counts. Nothing is pinned in the object
        store and the hash files double as the resume ledger.
    Either way the per-partition id-hash counts are PERSISTED under
    ``out_dir/id_hashes/partition_id=<p>/`` so a resumed run still detects
    duplicate pairs that straddle completed and remaining partitions.

Pass B (full — streams bytes exactly once, ONE execution, no materialize):
    row_validate → border(sr_hz) → byte-length consistency → transcript
    presence/equality (vectorized regeneration) → broadcast-Welford z-check
    on dur_ms → PCM decode + SNR fidelity (actor pool) → duplicate flag
    (broadcast hash set; map-side per-partition dup files past the
    broadcast cap — see build_pass_b) → OR-combine → slim projection → per-batch metric
    partials to an accumulator actor (side output; idempotent under task
    retry via a content key) → violations filter → partition-keyed parquet
    write (the single consumer that drives the stream).
"""

from __future__ import annotations

import hashlib
import os
import shutil
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
from ..stages.sizing import decode_pool_size, pool_size
from ..stages import checks as ck
from ..stages import drift as drift_mod
from ..stages import stats as stats_mod
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
    # optional (lo_db, hi_db) gated-loudness gate, graded inside the SAME
    # fidelity decode (no extra pass over payloads); None = off (default
    # flagship output unchanged). Config-hashed => resume-invalidating.
    loudness_bounds: tuple | None = None
    # optional (max_dc, max_sub20) signal-hygiene gate, also graded
    # inside the SAME fidelity decode; None = off. Config-hashed =>
    # resume-invalidating.
    hygiene_limits: tuple | None = None
    # 0 = auto: sizing.decode_pool_size() (cpus - max(3, cpus/4))
    fidelity_concurrency: int = 0
    fidelity_batch_size: int = 128
    meta_batch_size: int = 8192
    n_salts: int = 8
    drift: dict = field(default_factory=dict)
    # duplicate-detection path: "auto" picks driver fold below
    # driver_fold_max_rows and the shuffle otherwise (unknown size => shuffle)
    pass_a_mode: str = "auto"
    driver_fold_max_rows: int = 20_000_000
    # pass-B duplicate FLAG regime (shuffle dup_mode only): at most this
    # many confirmed duplicate hashes ride a ray.put broadcast (8 B each —
    # 40 MB default cap); past it the dup set stays a Dataset and the flag
    # becomes a left-outer hash join of the slim verdict stream against it,
    # so an adversarially dup-heavy table never produces an unbounded
    # broadcast (0 forces the join regime in tests)
    dup_flag_broadcast_max: int = 5_000_000
    # additive declarative checks (stages/expectations.py row-local specs,
    # e.g. {"check": "in_set", "column": "codec", "values": [...]}) graded
    # into pass B as one more check column (ex_code/ex_status) feeding the
    # OR-combine — the same check vocabulary for flagship and ad-hoc suites
    extra_suite: tuple = ()


def _id_hashes(ids: pd.Series) -> np.ndarray:
    """The one id-hash function (pass A partials + pass B flag stage must
    agree; python hash() is salted per process — pandas siphash is not)."""
    return pd.util.hash_pandas_object(ids, index=False).to_numpy(np.uint64)


def _hash_count_partial(t: pa.Table) -> pd.DataFrame:
    """(partition_id, clip_id_hash, cnt) per batch — within-batch duplicates
    collapse here, so only distinct (partition, hash) pairs ever move."""
    df = pd.DataFrame({
        "partition_id": t["partition_id"].to_numpy(zero_copy_only=False),
        "clip_id_hash": _id_hashes(t["clip_id"].to_pandas()).astype(np.int64),
    })
    return df.groupby(["partition_id", "clip_id_hash"], as_index=False).agg(
        cnt=("clip_id_hash", "size"))


def _hash_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "id_hashes")


def _clear_partition_dirs(base: str, partitions) -> None:
    """Idempotent rerun: a re-validated partition's old output files must not
    accumulate next to the new ones."""
    for p in partitions:
        d = os.path.join(base, f"partition_id={int(p)}")
        if os.path.isdir(d):
            shutil.rmtree(d)


def _load_completed_hashes(out_dir: str, partitions) -> pd.DataFrame | None:
    """Persisted per-partition id-hash counts of COMPLETED partitions (the
    resume ledger): merged into duplicate detection so pairs straddling a
    completed and a remaining partition are still flagged."""
    frames = []
    for p in partitions:
        d = os.path.join(_hash_dir(out_dir), f"partition_id={int(p)}")
        if os.path.isdir(d):
            frames.append(pd.read_parquet(d, columns=["clip_id_hash", "cnt"]))
    return pd.concat(frames, ignore_index=True) if frames else None


def estimate_rows(path: str) -> int | None:
    """Parquet-metadata row count (no data read); None for unknown layouts."""
    try:
        import pyarrow.dataset as pads
        return pads.dataset(path, format="parquet").count_rows()
    except Exception:
        return None


def run_pass_a(meta_ds, cfg: ValidateConfig, out_dir: str | None = None,
               completed: set[int] | tuple = (), dup_mode: str = "driver") -> dict:
    """Narrow aggregation pass.

    The composite small-stats fold (HLL / Welford / codec / drift histograms)
    is always a driver fold of O(#batches x small) partials. Duplicate
    detection follows ``dup_mode``:

      - "driver": per-(partition, hash) counts ride in the same composite
        partial and fold on the driver — O(distinct ids) driver memory.
      - "shuffle": a SECOND streaming execution writes per-batch hash-count
        partials straight to the per-partition ledger (no shuffle; blocks
        split by partition value at the write), and a key shuffle over the
        read-back confirms global counts — no O(rows) driver structure and
        no object-store pin; this is the at-scale default.

    When ``out_dir`` is given the per-partition hash counts are persisted as
    the resume ledger and the counts of already-``completed`` partitions are
    merged into duplicate detection (cross-boundary pairs stay flagged).
    """
    import pickle

    drift_cols = cfg.drift.get("columns") or drift_mod.DEFAULT_EDGES
    n_salts = cfg.n_salts
    with_hashes = dup_mode == "driver"

    def composite_partial(t: pa.Table) -> pa.Table:
        from ..functions.sketches import HyperLogLog
        hll = HyperLogLog(14)
        hll.add_hashes(_id_hashes(t["clip_id"].to_pandas()))
        dur_t = stats_mod.welford_partial_batch(t, "dur_ms")
        codec_t = stats_mod.welford_partial_batch(t, "dur_ms", "codec",
                                                  n_salts=n_salts)
        hist_t = drift_mod._hist_partial_batch(t, drift_cols, "partition_id")
        payload = {
            "hll": hll.registers.tobytes(),
            "dur": dur_t.to_pydict(),
            "codec": codec_t.to_pydict(),
            "hist": hist_t.to_pydict(),
        }
        if with_hashes:
            payload["hash_counts"] = _hash_count_partial(t)
        return pa.table({"payload": pa.array([pickle.dumps(payload)],
                                             type=pa.binary())})

    from ..functions.sketches import HyperLogLog, WelfordPartial
    dur_acc = WelfordPartial()
    hll_acc = HyperLogLog(14)
    codec_rows: list[pd.DataFrame] = []
    hist_rows: list[pd.DataFrame] = []
    hc_frames: list[pd.DataFrame] = []
    parts = meta_ds.map_batches(composite_partial, batch_format="pyarrow")
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=256):
        for buf in b["payload"].to_pylist():
            p = pickle.loads(buf)
            other = HyperLogLog(14)
            other.registers = np.frombuffer(p["hll"], dtype=np.uint8).copy()
            hll_acc = hll_acc.merge(other)
            d = p["dur"]
            for i in range(len(d["n"])):
                dur_acc = dur_acc.merge(WelfordPartial(
                    int(d["n"][i]), d["mean"][i], d["M2"][i], d["min"][i], d["max"][i]))
            codec_rows.append(pd.DataFrame(p["codec"]))
            hist_rows.append(pd.DataFrame(p["hist"]))
            if with_hashes:
                hc_frames.append(p["hash_counts"])

    dup_ds = None
    dup_dir = None
    if with_hashes:
        dup_counts = _dup_driver(hc_frames, out_dir, completed)
    else:
        dups = _dup_shuffle(meta_ds, out_dir, completed)
        if dups.count() > cfg.dup_flag_broadcast_max:
            # dup-heavy table: the confirmed-dup set never lands on the
            # driver
            dup_counts = None
            if out_dir is not None:
                # ledger on disk => map-side flag regime: persist, per
                # partition, the confirmed-dup hashes present in it; pass B
                # loads only the partitions a batch touches and never
                # shuffles the (wide, fidelity-decoded) verdict stream
                dup_dir = _persist_partition_dup_flags(dups, out_dir, cfg)
            else:
                # ad-hoc Dataset input (no ledger): pass B semi-joins the
                # slim verdict stream against this Dataset instead
                dup_ds = dups
        else:
            dup_counts = _dup_frame(dups)
    dup_hashes = (np.sort(dup_counts["clip_id_hash"].to_numpy(np.int64)
                          .astype(np.uint64))
                  if dup_counts is not None else None)

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
        "dup_ds": dup_ds,
        "dup_dir": dup_dir,
        "hll_estimate": hll_acc.estimate(),
        "dur_stats": dur_acc,
        "codec_stats": codec_stats,
        "drift": drift_df,
        "dup_mode": dup_mode,
    }


def _dup_driver(hc_frames: list[pd.DataFrame], out_dir: str | None,
                completed) -> pd.DataFrame:
    """Driver fold of per-batch (partition, hash) counts + ledger write."""
    live = (pd.concat(hc_frames, ignore_index=True)
            .groupby(["partition_id", "clip_id_hash"], as_index=False)
            .agg({"cnt": "sum"})) if hc_frames else pd.DataFrame(
        {"partition_id": [], "clip_id_hash": [], "cnt": []})
    if out_dir is not None:
        _persist_hash_ledger_driver(live, out_dir)
        prior = _load_completed_hashes(out_dir, completed)
        if prior is not None:
            live = pd.concat([live[["clip_id_hash", "cnt"]], prior],
                             ignore_index=True)
    total = live.groupby("clip_id_hash", as_index=False).agg({"cnt": "sum"})
    out = total[total["cnt"] > 1].reset_index(drop=True)
    return out.astype({"clip_id_hash": np.int64, "cnt": np.int64})


def _persist_hash_ledger_driver(live: pd.DataFrame, out_dir: str) -> None:
    import pyarrow.parquet as pq
    fresh = live["partition_id"].unique()
    _clear_partition_dirs(_hash_dir(out_dir), fresh)
    for p, g in live.groupby("partition_id"):
        d = os.path.join(_hash_dir(out_dir), f"partition_id={int(p)}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.table({"clip_id_hash": g["clip_id_hash"].to_numpy(np.int64),
                      "cnt": g["cnt"].to_numpy(np.int64)}),
            os.path.join(d, "hashes.parquet"))


def _dup_shuffle(meta_ds, out_dir: str | None, completed):
    """At-scale duplicate confirmation: stream hash-count partials to the
    per-partition ledger (no shuffle — the write splits blocks by partition
    value), then key-shuffle the READ-BACK to global counts. Disk-backed, so
    nothing pins the object store and the ledger survives for resume.
    Returns a materialized (clip_id_hash, cnt>1) DATASET — the caller
    decides whether it folds to a driver frame (broadcast flag regime) or
    feeds the pass-B hash join directly."""
    partials = meta_ds.map_batches(_hash_count_partial, batch_format="pyarrow")
    if out_dir is None:
        merged = partials.groupby("clip_id_hash").sum("cnt")
    else:
        hd = _hash_dir(out_dir)
        os.makedirs(hd, exist_ok=True)
        # rerun hygiene: every non-completed ledger dir belongs to a partition
        # being (re)validated this run — clear before the fresh write
        keep = {int(c) for c in completed}
        for d in os.listdir(hd):
            if d.startswith("partition_id=") and int(d.split("=")[1]) not in keep:
                shutil.rmtree(os.path.join(hd, d))
        # write FIRST (single consumer drives the stream) ...
        partials.write_parquet(hd, partition_cols=["partition_id"])
        # ... then confirm from the read-back (covers completed partitions too)
        merged = (rd.read_parquet(hd, columns=["clip_id_hash", "cnt"])
                  .groupby("clip_id_hash").sum("cnt"))

    def keep_dups(t: pa.Table) -> pa.Table:
        if "sum(cnt)" not in t.column_names:  # empty block loses schema
            return pa.table({"clip_id_hash": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        t = t.filter(pc.greater(t["sum(cnt)"], 1))
        return pa.table({"clip_id_hash": t["clip_id_hash"].cast(pa.int64()),
                         "cnt": t["sum(cnt)"].cast(pa.int64())})

    # materialized so the caller's count() and any downstream join don't
    # re-execute the ledger read-back
    return (merged.map_batches(keep_dups, batch_format="pyarrow")
            .materialize())


def _dup_frame(dups) -> pd.DataFrame:
    """Driver frame of a (small) confirmed-duplicate Dataset."""
    df = dups.to_pandas()
    if df.empty:
        return pd.DataFrame({"clip_id_hash": pd.Series(dtype=np.int64),
                             "cnt": pd.Series(dtype=np.int64)})
    return df.astype({"clip_id_hash": np.int64, "cnt": np.int64})


def _dup_flag_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "dup_flags")


def _persist_partition_dup_flags(dups, out_dir: str,
                                 cfg: "ValidateConfig") -> str:
    """Map-side flag regime for dup-heavy tables: semi-mark the hive-
    partitioned id-hash LEDGER (one slim row per batch-distinct
    (partition, hash)) against the confirmed-dup set and write, per
    partition, the duplicate hashes PRESENT IN that partition. Pass B then
    flags map-side (checks.flag_duplicates_partitioned_stage, worker-cached
    per-partition arrays), so the verdict stream never shuffles — the only
    exchange moves 8-byte ledger keys, not status-string verdict rows, and
    the shuffle barrier leaves the fidelity-decode path entirely."""
    dup_dir = _dup_flag_dir(out_dir)
    if os.path.isdir(dup_dir):
        # dup membership is global (a fresh partition can turn a completed
        # partition's ids into duplicates): regenerate the whole map
        shutil.rmtree(dup_dir)
    os.makedirs(dup_dir, exist_ok=True)
    from ..stages.joins import semi_mark_keys

    keys = dups.map_batches(
        lambda t: pa.table({"clip_id_hash": t["clip_id_hash"].cast(pa.int64())}),
        batch_format="pyarrow")
    # hive read-back surfaces partition_id as a (string-typed) column
    ledger = rd.read_parquet(_hash_dir(out_dir),
                             columns=["clip_id_hash", "partition_id"])
    marked = semi_mark_keys(ledger, keys, on="clip_id_hash", mark="__dup",
                            num_buckets=max(16, int(cfg.P)))

    def keep_flagged(t: pa.Table) -> pa.Table:
        t = t.filter(t["__dup"])
        return pa.table({
            "clip_id_hash": t["clip_id_hash"].cast(pa.int64()),
            "partition_id": t["partition_id"].cast(pa.int64()),
        })

    (marked.map_batches(keep_flagged, batch_format="pyarrow")
     .write_parquet(dup_dir, partition_cols=["partition_id"]))
    return dup_dir


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


# --------------------------------------------------------------- pass B

# Side-output collection lives in pipelines/sidechannel.ShardedSink:
# content-key idempotent under task retries, blocking ack, sharded over
# zero-CPU actors so no single actor serializes every batch.
from .sidechannel import ShardedSink  # noqa: E402  (re-export for callers)


def _batch_metric_rows(t: pa.Table) -> list[dict]:
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
    return rows


def build_pass_b(full_ds, cfg: ValidateConfig, pass_a: dict,
                 metrics_actor=None):
    """Wire the per-row check chain onto the full Dataset (lazy). With a
    ``metrics_actor`` the chain also emits per-batch metric partials as a side
    output, so ONE downstream consumer (the violations write) drives the
    whole pipeline — no materialize, no second pass.

    The duplicate flag is three-regime: a sorted-hash-array broadcast when
    pass A folded the confirmed-dup set to the driver (``dup_hashes``); a
    MAP-SIDE flag against pass A's per-partition dup files when the set was
    too big to broadcast but the ledger is on disk (``dup_dir`` — each task
    loads only the partitions its batch touches, worker-cached, NO shuffle
    of the verdict stream); a bucketed semi-join MARK of the SLIM verdict
    stream against the dup-set Dataset only when there is no ledger
    (``dup_ds`` — ad-hoc Dataset input; joins.semi_mark_keys, one groupby
    exchange, no driver hop). The flag runs after the payload-dropping
    projection in every regime so no exchange ever moves audio bytes; the
    OR-combine and the per-record anomaly score are computed from the same
    code columns afterwards, so all regimes are value-identical."""
    dup_ds = pass_a.get("dup_ds")
    dup_dir = pass_a.get("dup_dir")
    dup_ref = (ray.put(np.sort(np.asarray(pass_a["dup_hashes"],
                                          dtype=np.uint64)))
               if dup_ds is None and dup_dir is None else None)
    dur_mean = pass_a["dur_stats"].mean
    dur_std = pass_a["dur_stats"].std

    from ..stages import expectations as expect

    ds = full_ds.map_batches(validate_clips, batch_format="pyarrow")
    # the built-in chain is a declarative GRADED suite — the same check
    # vocabulary extra_suite uses, compiled by the same function, so one
    # grammar drives flagship and ad-hoc validation alike
    flagship_suite = (
        {"check": "border", "column": "sr_hz", "UL": cfg.sr_UL,
         "LL": cfg.sr_LL, "warning_stages": list(cfg.sr_warning_stages),
         "prefix": "bc"},
        {"check": "bytes_consistency", "prefix": "cc"},
        {"check": "transcript", "prefix": "tc",
         "seed": cfg.seed if cfg.check_transcript_content else None},
        {"check": "zscore", "column": "dur_ms", "mean": dur_mean,
         "std": dur_std, "X": cfg.welford_X,
         "warning_stages": list(cfg.welford_warning_stages),
         "prefix": "wf"},
    )
    for spec in flagship_suite:
        ds = ds.map_batches(expect.compile_graded(spec),
                            batch_format="pyarrow")
    ds = ds.map_batches(
        ck.FidelityCheck,
        fn_constructor_kwargs={"seed": cfg.seed,
                               "snr_threshold": cfg.snr_threshold,
                               "loudness_bounds": cfg.loudness_bounds,
                               "hygiene_limits": cfg.hygiene_limits},
        batch_format="pyarrow",
        batch_size=cfg.fidelity_batch_size,
        concurrency=(decode_pool_size() if cfg.fidelity_concurrency == 0
                     else pool_size(cfg.fidelity_concurrency)),
        num_cpus=1)

    code_cols = list(CODE_COLS)
    if cfg.loudness_bounds:
        code_cols.append("ld_code")
    if cfg.hygiene_limits:
        code_cols.append("hy_code")
    extra_status_cols: list[str] = []
    if cfg.extra_suite:
        # declarative checks compiled ONCE, graded like any other check;
        # graded kinds (border/zscore/bytes_consistency/transcript — the
        # flagship's own vocabulary) append their own code columns
        specs = [dict(s) for s in cfg.extra_suite]
        bad = [s.get("check") for s in specs
               if s.get("check") not in expect._ROW_LOCAL | expect._GRADED]
        if bad:
            raise ValueError(
                f"extra_suite supports row-local and graded checks only; "
                f"{bad} are table/schema-level — run them via "
                "run_expectations")
        for s in [s for s in specs if s["check"] in expect._GRADED]:
            prefix = s.get("prefix")
            if not prefix or f"{prefix}_code" in code_cols:
                raise ValueError(
                    "graded extra_suite checks need a unique 'prefix' "
                    f"(got {prefix!r})")
            ds = ds.map_batches(expect.compile_graded(s),
                                batch_format="pyarrow")
            code_cols.append(f"{prefix}_code")
            extra_status_cols.append(f"{prefix}_status")
        row_specs = [s for s in specs if s["check"] in expect._ROW_LOCAL]
        if row_specs:
            compiled = [(expect._check_key(s), expect._compile_mask(s))
                        for s in row_specs]

            def suite_stage(t: pa.Table) -> pa.Table:
                any_bad = np.zeros(len(t), dtype=bool)
                status = np.full(len(t), "OK", dtype=object)
                for label, m in compiled:
                    v = m(t)
                    status[(status == "OK") & v] = f"violates {label}"
                    any_bad |= v
                return ck._append(t, "ex",
                                  np.where(any_bad, -1, 1).astype(np.int8),
                                  status)

            ds = ds.map_batches(suite_stage, batch_format="pyarrow")
            code_cols.append("ex_code")
    # drop the audio payload + transcript before the dup flag and combine —
    # the slim table is ~1% of the input bytes, so the join regime's
    # all-to-all only ever moves verdict-sized rows
    slim_cols = [c for c in ["clip_id", "partition_id", "sr_hz", "dur_ms",
                             "codec", "status_code", "anomaly_score", "snr_db",
                             "loudness_db", "dc_offset", "sub20_ratio",
                             "rv_reason", "bc_status", "cc_status", "tc_status",
                             "wf_status", "fid_status", "uq_status",
                             "ld_status", "hy_status",
                             "ex_status"] + extra_status_cols + code_cols]
    ds = ds.map_batches(
        lambda t: t.select([c for c in slim_cols if c in t.column_names]),
        batch_format="pyarrow")
    if dup_ref is not None:
        def dup_flag(t: pa.Table) -> pa.Table:
            return ck.flag_duplicate_hashes_stage(t, ray.get(dup_ref))

        ds = ds.map_batches(dup_flag, batch_format="pyarrow")
    elif dup_dir is not None:
        def dup_flag_part(t: pa.Table) -> pa.Table:
            return ck.flag_duplicates_partitioned_stage(t, dup_dir)

        ds = ds.map_batches(dup_flag_part, batch_format="pyarrow")
    else:
        from ..stages.joins import semi_mark_keys

        keys = dup_ds.map_batches(
            lambda t: pa.table(
                {"clip_id_hash": t["clip_id_hash"].cast(pa.int64())}),
            batch_format="pyarrow")

        def add_hash(t: pa.Table) -> pa.Table:
            h = _id_hashes(t["clip_id"].to_pandas())
            return t.append_column(
                "clip_id_hash", pa.array(h.astype(np.int64),
                                         type=pa.int64()))

        # bucketed semi-join MARK (tagged union + one groupby exchange —
        # NOT Dataset.join, whose CPU-holding aggregator actors starve
        # against the fidelity pool on small CPU budgets); bucket count
        # scales with P so each group stays a bounded slice of the slim
        # verdict stream
        ds = semi_mark_keys(
            ds.map_batches(add_hash, batch_format="pyarrow"), keys,
            on="clip_id_hash", mark="uq_dup",
            num_buckets=max(16, int(cfg.P)))
        ds = ds.map_batches(ck.flag_duplicates_join_stage,
                            batch_format="pyarrow")
    ds = ds.map_batches(lambda t: combine_stage(t, code_cols, mode="or"),
                        batch_format="pyarrow")
    # combine appended status_code/anomaly_score last — restore the
    # declared slim column order for a stable output schema
    ds = ds.map_batches(
        lambda t: t.select([c for c in slim_cols if c in t.column_names]),
        batch_format="pyarrow")
    if metrics_actor is not None:
        def emit_metrics(t: pa.Table) -> pa.Table:
            key = hashlib.md5(
                b"".join(s.encode() for s in t["clip_id"].to_pylist()
                         if s is not None)).digest()
            metrics_actor.add_sync(key, _batch_metric_rows(t))
            return t

        ds = ds.map_batches(emit_metrics, batch_format="pyarrow")
    return ds


def partition_metrics(verdict_ds) -> pd.DataFrame:
    """Per-partition violation counts via per-batch partials + small fold
    (standalone helper for a pre-built verdict Dataset)."""
    partials = verdict_ds.map_batches(
        lambda t: pa.Table.from_pylist(_batch_metric_rows(t)),
        batch_format="pyarrow")
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
            [{"partition_id": int(p), **{k: v for k, v in e.items()
                                         if k not in ("metrics", "lineage")}}
             for p, e in manifest["partitions"].items()]),
            "rows": 0, "wall_sec": 0.0})
        return result

    if cfg.pass_a_mode == "auto":
        est = estimate_rows(path)
        dup_mode = ("driver" if est is not None
                    and est <= cfg.driver_fold_max_rows else "shuffle")
    else:
        dup_mode = cfg.pass_a_mode

    partitions_filter = todo if done else None  # avoid a no-op filter
    meta_ds = read_clips(path, columns=META_COLUMNS, partitions=partitions_filter)
    pass_a = run_pass_a(meta_ds, cfg, out_dir=out_dir, completed=done,
                        dup_mode=dup_mode)

    full_ds = read_clips(path, partitions=partitions_filter)
    acc = ShardedSink()
    verdict_ds = build_pass_b(full_ds, cfg, pass_a, metrics_actor=acc)

    viol_path = os.path.join(out_dir, "violations")
    violations = verdict_ds.map_batches(
        lambda t: t.filter(pc.equal(t["status_code"], ERROR_CODE)),
        batch_format="pyarrow")
    os.makedirs(viol_path, exist_ok=True)
    _clear_partition_dirs(viol_path, todo)
    # the ONE consumer: drives checks + metrics side output + write
    violations.write_parquet(viol_path, partition_cols=["partition_id"])
    metrics = acc.total()
    acc.kill()

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
        "pass_a": {k: pass_a[k] for k in ("hll_estimate", "dup_counts",
                                          "codec_stats", "dup_mode")},
        "rows": total_rows,
        "wall_sec": wall,
        "clips_per_sec": total_rows / wall if wall > 0 else None,
        "violations_path": viol_path,
    })
    return result
