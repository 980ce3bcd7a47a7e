"""Document corpus curation pipeline: dedup discovery -> quality/lang gate
-> partitioned parquet, resumable per partition.

The text counterpart of audio_prep.py — the composition a 100 TB document
corpus needs before LLM training: drop exact duplicates (md5 groups) and
MinHash near-duplicates (keep each cluster's representative), gate on
language and on quality heuristics (token count, punctuation density,
stopword ratio), and write one parquet directory per partition with a
lineage manifest so a failed run resumes.

Two-pass shape (the validate.py pass-A/pass-B design):

- **Pass A (global, always runs)** — duplicate discovery. Exact victims
  from per-batch (hash, id) partials; near victims from the staged
  MinHash-LSH pipeline + connected components. It must be global
  (duplicates straddle partitions — the round-1 resume-dup-scope lesson)
  and never touches more than hashes/signatures. The drop set applies in
  one of two regimes (``drop_mode``): **broadcast** — O(duplicates) id
  array shipped once via ``ray.put``, probed per batch (right size while
  it fits a worker heap); **anti_join** — victims stay a Dataset end to
  end and are removed by the distributed groupby anti-join
  (stages/joins.anti_join_keys), the dup-heavy-corpus path where a
  driver-resident set would be tens of GB. ``auto`` switches on the
  corpus row estimate.
- **Pass B (per partition, resumable)** — curation. Partition =
  ``doc_id % P`` (deterministic; a production corpus would be stored
  partition-keyed like the clip table, turning the vectorized partition
  filter into a real scan pushdown). One ``map_batches`` applies the drop
  set + gates, emits metric partials to a side-channel actor, and streams
  survivors straight to ``write_parquet(partition_cols=...)``.

Resume mirrors validate.py: config-hashed manifest, completed partitions
skipped, partition dirs cleared before rewrite so re-runs are idempotent.
"""

from __future__ import annotations

import os
import time
from dataclasses import asdict, dataclass

import numpy as np
import pandas as pd

import ray

from ..functions import text as tx
from ..stages import dedup as dd
from . import checkpoint as ckpt


@dataclass(frozen=True)
class TextPrepConfig:
    P: int = 8
    langs: tuple = ("en",)          # () = keep every detected language
    min_tokens: int = 10
    max_punct_ratio: float = 0.3
    min_stopword_ratio: float = 0.0
    near_dup_threshold: float = 0.8  # MinHash est-jaccard; 0 disables
    batch_size: int = 2048
    concurrency: int = 0             # 0 = auto (pool_size)
    # Drop-set application regime: "broadcast" ships the victim-id array
    # via ray.put (only sane while it fits comfortably in a worker heap);
    # "anti_join" keeps victims as a Dataset and removes them with the
    # distributed groupby anti-join (corpus exchanged once — the price of
    # a drop set too large to hold on the driver); "auto" picks by the
    # corpus row estimate (victims <= rows, so rows is a safe bound).
    drop_mode: str = "auto"
    drop_broadcast_max_rows: int = 5_000_000
    # Substring-duplication gate (Lee et al. flavor, stages/dedup.
    # dup_span_stats): drop docs whose fraction of 8-token windows
    # duplicated corpus-wide exceeds this. 1.0 disables (default — one
    # extra full text pass when on). Victims ride the same drop-set
    # regimes as the exact/MinHash victims and count as drop_dup.
    max_dup_frac: float = 1.0
    # Edge count past which MinHash connected components switch from
    # driver union-find to Ray label propagation (both bit-identical;
    # lowered in tests to force the large regime).
    cc_edge_threshold: int = 200_000


# Side-channel accumulation: pipelines/sidechannel.ShardedSink — sharded
# zero-CPU actors, blocking ack, content-key idempotent under task retry.
from .sidechannel import ShardedSink  # noqa: E402


def discover_drop_ids(ds, text_col: str = "text", id_col: str = "doc_id",
                      near_dup_threshold: float = 0.8) -> set:
    """Pass A: ids to drop — exact-dup non-minimum members plus MinHash
    near-dup non-representative members. O(duplicates) on the driver."""
    victims = set()
    # victims = every member of a >=2 group except the kept (min) id:
    # ship (hash, id) only for dup groups — small by construction
    dup = (dd.exact_dedup_groups(ds, text_col=text_col, id_col=id_col)
           .filter(expr="n_dups > 1").to_pandas())
    # an all-empty-blocks filter result loses its columns in to_pandas
    dup_hashes = set(dup["text_hash"]) if "text_hash" in dup else set()
    if dup_hashes:
        h_ref = ray.put(dup_hashes)

        def members(df: pd.DataFrame) -> pd.DataFrame:
            hs = ray.get(h_ref)
            th = dd.md5_hex(df[text_col].fillna(""))
            m = th.isin(hs)
            return pd.DataFrame({id_col: df.loc[m.to_numpy(), id_col],
                                 "h": th[m]})

        mem = ds.map_batches(members, batch_format="pandas").to_pandas()
        keep = mem.groupby("h")[id_col].min()
        victims |= set(mem[id_col]) - set(keep)
    if near_dup_threshold > 0:
        clusters = dd.minhash_dedup(ds, text_col=text_col, id_col=id_col,
                                    threshold=near_dup_threshold)
        victims |= set(clusters[id_col])  # non-representative members
    return victims


def run_text_prep(path: str, out_dir: str,
                  cfg: TextPrepConfig | None = None,
                  resume: bool = True) -> dict:
    """End-to-end curation run. Returns {metrics, docs_path, ...}."""
    import ray.data as rd

    cfg = cfg or TextPrepConfig()
    cfg_hash = ckpt.config_hash(asdict(cfg))
    manifest, done, todo = ckpt.begin_partitioned_run(
        out_dir, cfg_hash, cfg.P, resume, data_subdir="docs")
    t0 = time.time()

    docs_path = os.path.join(out_dir, "docs")
    result = {"config_hash": cfg_hash, "skipped_partitions": sorted(done),
              "docs_path": docs_path, "out_dir": out_dir}
    METRIC_KEYS = ["docs", "kept", "drop_dup", "drop_lang", "drop_quality"]
    if not todo:
        result.update({"metrics": pd.DataFrame(
            [{"partition_id": int(p), **e["metrics"]}
             for p, e in manifest["partitions"].items()])
            [["partition_id", *METRIC_KEYS]], "wall_sec": 0.0})
        return result

    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    # pass A: global drop set (dup scope must span ALL partitions even on
    # a resumed run — recomputed each run, deterministic and cheap)
    mode = cfg.drop_mode
    if mode == "auto":
        from .validate import estimate_rows
        est = estimate_rows(path)
        mode = ("broadcast" if est is not None
                and est <= cfg.drop_broadcast_max_rows else "anti_join")
    vic_pid_counts: dict[int, int] = {}
    span_victims = None
    if cfg.max_dup_frac < 1.0:
        import pyarrow.compute as _pc
        spans = dd.dup_span_stats(ds, text_col="text", id_col="doc_id")
        span_victims = spans.map_batches(
            lambda t: t.filter(_pc.field("dup_frac")
                               > cfg.max_dup_frac).select(["doc_id"]),
            batch_format="pyarrow")
    if mode == "broadcast":
        drop_ids = discover_drop_ids(
            ds, near_dup_threshold=cfg.near_dup_threshold)
        if span_victims is not None:
            drop_ids |= set(span_victims.to_pandas()["doc_id"]
                            .astype(np.int64))
        drop_ref = ray.put(np.array(sorted(drop_ids), dtype=np.int64))
    else:
        # victims stay a Dataset end to end: distributed exact-victim
        # groups unioned with minhash cluster members, distinct by id,
        # removed via the distributed groupby anti-join — no driver set,
        # no O(duplicates) broadcast.
        import pyarrow as pa

        def pin_ids(t: pa.Table) -> pa.Table:
            # upstream groupby stages can emit EMPTY blocks with no
            # columns (ray 2.49 wart) — normalize every block to a typed
            # (doc_id) schema so the union/groupby/anti-join below never
            # see schema drift
            ids = (t["doc_id"].to_numpy(zero_copy_only=False)
                   if "doc_id" in t.column_names else [])
            return pa.table({"doc_id": pa.array(np.asarray(ids, np.int64),
                                                type=pa.int64())})

        victims = dd.exact_dedup_victims(ds).map_batches(
            pin_ids, batch_format="pyarrow")
        if cfg.near_dup_threshold > 0:
            # clusters stay a Dataset end to end (pair dedup and CC run
            # as Ray groupbys) — no O(near-dup pairs) driver frame
            clusters = dd.minhash_dedup(
                ds, threshold=cfg.near_dup_threshold, as_dataset=True,
                cc_edge_threshold=cfg.cc_edge_threshold)
            victims = victims.union(
                clusters.map_batches(pin_ids, batch_format="pyarrow"))
        if span_victims is not None:
            victims = victims.union(
                span_victims.map_batches(pin_ids, batch_format="pyarrow"))
        victims = (victims.groupby("doc_id")
                   .map_groups(lambda g: g.head(1), batch_format="pandas")
                   .map_batches(pin_ids, batch_format="pyarrow"))
        # per-partition victim counts (P-row aggregate) so the metrics
        # frame still reports docs/drop_dup as the broadcast regime does
        vic_pid = victims.map_batches(
            lambda df: (df.assign(partition_id=df["doc_id"]
                                  .to_numpy(np.int64) % cfg.P)
                        .groupby("partition_id", as_index=False)
                        .agg(n=("doc_id", "size"))),
            batch_format="pandas").to_pandas()
        if len(vic_pid):
            vic_pid = vic_pid.groupby("partition_id", as_index=False).agg(
                n=("n", "sum"))
            vic_pid_counts = dict(zip(vic_pid["partition_id"].astype(int),
                                      vic_pid["n"].astype(int)))
        from ..stages.joins import anti_join_keys
        ds = anti_join_keys(ds, victims, "doc_id")
        drop_ref = ray.put(np.array([], dtype=np.int64))

    acc = ShardedSink()
    cfg_d = asdict(cfg)
    todo_arr = np.array(todo, dtype=np.int64)

    def curate(df: pd.DataFrame) -> pd.DataFrame:
        pid = (df["doc_id"].to_numpy(np.int64) % cfg_d["P"])
        df = df.loc[np.isin(pid, todo_arr)].copy()
        if not len(df):
            return pd.DataFrame(columns=["doc_id", "partition_id", "text",
                                         "lang", "n_tokens"])
        pid = df["doc_id"].to_numpy(np.int64) % cfg_d["P"]
        drop = ray.get(drop_ref)
        is_dup = np.isin(df["doc_id"].to_numpy(np.int64), drop)
        lang = np.asarray(tx.detect_language(df["text"]))
        lang_ok = (np.ones(len(df), dtype=bool) if not cfg_d["langs"]
                   else np.isin(lang, list(cfg_d["langs"])))
        q = tx.quality_features(df["text"])
        q_ok = ((q["n_tokens"] >= cfg_d["min_tokens"])
                & (q["punct_ratio"] <= cfg_d["max_punct_ratio"])
                & (q["stopword_ratio"] >= cfg_d["min_stopword_ratio"]))
        keep = ~is_dup & lang_ok & q_ok
        stats: dict[int, dict] = {}
        for p in np.unique(pid):
            m = pid == p
            stats[int(p)] = {
                "docs": int(m.sum()),
                "kept": int((m & keep).sum()),
                "drop_dup": int((m & is_dup).sum()),
                "drop_lang": int((m & ~is_dup & ~lang_ok).sum()),
                "drop_quality": int((m & ~is_dup & lang_ok & ~q_ok).sum()),
            }
        # blocking sharded ack + content key: can't lose the race with
        # the driver's total(), and a retried task re-adds idempotently
        import hashlib
        key = hashlib.md5(df["doc_id"].to_numpy(np.int64).tobytes()).digest()
        acc.add_sync(key, [{"partition_id": p, **e}
                           for p, e in stats.items()])
        out = df.loc[keep, ["doc_id", "text"]].copy()
        out.insert(1, "partition_id", pid[keep].astype(np.int32))
        out["lang"] = lang[keep]
        out["n_tokens"] = q["n_tokens"][keep].astype(np.int64)
        return out

    survivors = ds.map_batches(curate, batch_format="pandas",
                               batch_size=cfg.batch_size)
    survivors.write_parquet(docs_path, partition_cols=["partition_id"])
    metrics = acc.total()
    acc.kill()
    if vic_pid_counts:  # anti_join regime: victims never reached curate —
        # fold their per-partition counts back into docs/drop_dup
        rows = {int(r["partition_id"]): dict(r)
                for _, r in metrics.iterrows()}
        for pid, n in vic_pid_counts.items():
            if pid not in todo:
                continue
            e = rows.setdefault(pid, {"partition_id": pid, "docs": 0,
                                      "kept": 0, "drop_dup": 0,
                                      "drop_lang": 0, "drop_quality": 0})
            e["docs"] += n
            e["drop_dup"] += n
        metrics = (pd.DataFrame(sorted(rows.values(),
                                       key=lambda e: e["partition_id"]))
                   [["partition_id", *METRIC_KEYS]])

    ckpt.finish_partitioned_run(out_dir, manifest, cfg_hash, metrics, todo,
                                METRIC_KEYS, path)
    result.update({"metrics": metrics, "wall_sec": time.time() - t0})
    return result
