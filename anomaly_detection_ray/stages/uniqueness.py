"""clip_id uniqueness — candidate sketching + exact confirmation.

Scale design (SURVEY.md §7.3 step 5): duplicates are rare (~0.5%), so the
engine never shuffles full rows by clip_id. Instead:

 1. per-batch partial counts: one (clip_id, cnt) row per distinct id per
    batch — batches are already mostly unique, so partials ≈ input rows ONLY
    for pathological data; for normal data the groupby that follows moves
    key+count pairs, not rows;
 2. ``groupby(clip_id).sum(cnt) > 1`` confirms exact duplicates (hash shuffle
    over the id+count pairs);
 3. the confirmed-duplicate id set (tiny) is broadcast via ``ray.put`` and
    flagged row-locally in the main pass (stages/checks.flag_duplicates_stage).

HLL gives the cheap distinct estimate (metrics + early-exit: if
|HLL - rowcount| < tolerance the exact pass can be skipped entirely —
``estimate_unique``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..functions.sketches import BloomFilter
from .stats import hll_column


def _batch_id_counts(t: pa.Table, key_col: str) -> pa.Table:
    vc = t[key_col].value_counts()
    return pa.table({key_col: vc.field("values"),
                     "cnt": pc.cast(vc.field("counts"), pa.int64())})


def find_duplicate_keys(ds, key_col: str = "clip_id") -> pd.DataFrame:
    """Exact duplicate keys and their total counts (small result)."""
    partials = ds.map_batches(lambda t: _batch_id_counts(t, key_col),
                              batch_format="pyarrow")
    merged = partials.groupby(key_col).sum("cnt")
    # vectorized Arrow filter (no per-row UDF; the column name "sum(cnt)"
    # can't go through the expression parser)
    dups = merged.map_batches(
        lambda t: t.filter(pc.greater(t["sum(cnt)"], 1)),
        batch_format="pyarrow")
    df = dups.to_pandas()
    if "sum(cnt)" not in df.columns:  # empty result loses schema
        return pd.DataFrame({key_col: pd.Series(dtype=object),
                             "cnt": pd.Series(dtype="int64")})
    return df.rename(columns={"sum(cnt)": "cnt"})


def estimate_unique(ds, key_col: str = "clip_id", p: int = 14) -> float:
    return hll_column(ds, key_col, p=p).estimate()


@ray.remote(num_cpus=0.25)
class BloomShard:
    """One shard of the shared membership index — the reference architecture
    note's 'raw actor for a shared mutable index' case (north star: 'Bloom-
    filter clip_id uniqueness'). Each shard owns the Bloom bits for one hash
    range; ``add_and_check`` returns which of the incoming hashes were
    *possibly seen before* (Bloom false positives included, no false
    negatives — exact confirmation happens downstream)."""

    def __init__(self, n_bits: int = 1 << 22, k: int = 4):
        self.bloom = BloomFilter(n_bits=n_bits, k=k)

    def add_and_check(self, hashes: np.ndarray) -> np.ndarray:
        seen = self.bloom.contains_hashes(hashes)
        # duplicates WITHIN the incoming chunk also count as seen-again
        _, first_idx = np.unique(hashes, return_index=True)
        within_dup = np.ones(len(hashes), dtype=bool)
        within_dup[first_idx] = False
        self.bloom.add_hashes(hashes)
        return seen | within_dup


def bloom_dedup_candidates(ds, key_col: str = "clip_id", n_shards: int = 8,
                           n_bits: int = 1 << 22) -> pd.DataFrame:
    """Two-phase exact dedup with a Bloom candidate pre-filter.

    Phase 1 streams id hashes through ``n_shards`` Bloom actors (sharded by
    hash range, so shards never coordinate); only ids the Bloom has 'seen
    before' become candidates — for mostly-unique data that's ~duplicates +
    false positives, a tiny fraction of rows. Phase 2 exactly counts the
    candidate ids only (driver fold here; a groupby at cluster scale).
    Returns (key, cnt>=2) rows. Unlike the hash-only single-pass path this
    keeps the REAL id strings without ever moving all of them.

    When to prefer which: every phase-1 batch blocks on ``ray.get`` of up to
    ``n_shards`` actor round-trips, so at high parallelism the shards become
    the serialization point (~n_shards x RPC latency per batch) — this path
    pays off only when the id strings are large/expensive to move and dups
    are rare. For pure duplicate *counting* use the single-pass hash
    partials fold (``validate.run_pass_a`` / ``pass_a_shuffle``), which is
    shard-free and faster; this stage is the shared-mutable-index pattern
    for when real id strings must come out without an all-ids shuffle.
    """
    shards = [BloomShard.remote(n_bits=n_bits) for _ in range(n_shards)]

    def phase1(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[key_col].astype(str)
        h = pd.util.hash_pandas_object(ids, index=False).to_numpy(np.uint64)
        shard_of = (h % n_shards).astype(np.int64)
        maybe = np.zeros(len(df), dtype=bool)
        futures, slots = [], []
        for s in range(n_shards):
            m = shard_of == s
            if m.any():
                futures.append(shards[s].add_and_check.remote(h[m]))
                slots.append(m)
        for m, got in zip(slots, ray.get(futures)):
            maybe[m] = got
        return pd.DataFrame({key_col: ids[maybe]})

    candidates = ds.map_batches(phase1, batch_format="pandas",
                                concurrency=n_shards).to_pandas()
    if candidates.empty:
        # typed empty frame: untyped [] columns default to object and
        # coerce to float downstream, which breaks dtype parity with the
        # oracle's VARCHAR/BIGINT schema on 0-row results
        return pd.DataFrame({key_col: pd.Series([], dtype=object),
                             "cnt": pd.Series([], dtype="int64")})
    # exact confirm: count candidate ids in the original dataset
    cand_set = set(candidates[key_col])
    cand_ref = ray.put(cand_set)

    def count_cands(df: pd.DataFrame) -> pd.DataFrame:
        cs = ray.get(cand_ref)
        sub = df[df[key_col].astype(str).isin(cs)]
        return (sub.groupby(key_col, as_index=False)
                .agg(cnt=(key_col, "size")))

    counts = (ds.map_batches(count_cands, batch_format="pandas").to_pandas()
              .groupby(key_col, as_index=False).agg({"cnt": "sum"}))
    out = counts[counts["cnt"] >= 2].reset_index(drop=True)
    out["cnt"] = out["cnt"].astype("int64")
    return out
