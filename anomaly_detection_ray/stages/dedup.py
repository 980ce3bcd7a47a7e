"""Deduplication operators for training-data pipelines.

 - exact_dedup: content-hash (md5) partition + per-group first — the only
   full shuffle, and it moves (hash, id) pairs after per-batch hashing.
 - minhash_lsh_dedup: shingle → MinHash → LSH band bucketing → candidate
   pairs inside buckets → exact-Jaccard verification → connected components
   (stages/cc.py: driver union-find while the verified pair list is small,
   Ray label propagation past the edge threshold — dup-heavy corpora).
 - simhash_dedup: 64-bit SimHash, banded into 4×16-bit keys so any pair
   within Hamming distance 3 shares ≥1 band bucket; verified by Hamming.
 - embedding near-dup: cosine over normalized vectors, bucketed by random
   hyperplane LSH; exact cosine verification inside buckets.

Scale notes: signatures/hashes are computed batch-parallel in map_batches;
only (key, id, signature) rows ever shuffle; verification happens per
bucket group. Candidate-pair lists are assumed small (near-dup rate ≪ 1).
Over-full Hamming buckets split recursively on sub-bands of their
remaining bits (_pigeonhole_pairs — exact, no recall loss); over-full
cosine buckets verify exactly in bounded matmul tiles. Only quadratic
pair OUTPUT inside near-identical mega-groups truncates, and the dropped
count is reported (sentinel rows folded to a total, surfaced via
``with_report=True`` and a logger warning) — never silent.
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..functions import text as tx
from ..functions.fold import fold_partials
from .sizing import pool_size


def md5_hex(texts: pd.Series) -> pd.Series:
    return texts.fillna("").map(lambda s: hashlib.md5(s.encode()).hexdigest())


def exact_dedup_groups(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(text_hash, keep id, dup count) per distinct content — SQL-checkable."""
    def hash_batch(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "text_hash": md5_hex(df[text_col]),
            id_col: df[id_col],
        })
        # per-batch partial: min id + count per hash
        g = out.groupby("text_hash", as_index=False).agg(
            keep_id=(id_col, "min"), n_dups=(id_col, "size"))
        return g

    partials = ds.map_batches(hash_batch, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "text_hash": [g["text_hash"].iloc[0]],
            "keep_doc_id": [int(g["keep_id"].min())],
            "n_dups": [int(g["n_dups"].sum())],
        })

    return partials.groupby("text_hash").map_groups(merge, batch_format="pandas")


def exact_dedup_victims(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Victim ids (every member of a >=2 content group except the min id)
    as a DATASET — the fully distributed complement of exact_dedup for
    drop-set application by anti-join when the victim set is too large to
    broadcast. Shuffles one slim (hash, id) row per doc; groups emit
    victims only, so the output is O(duplicates) and never lands on the
    driver."""
    def hash_batch(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"text_hash": md5_hex(df[text_col]),
                             id_col: df[id_col]})

    hashed = ds.map_batches(hash_batch, batch_format="pandas")

    def victims(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({id_col: pd.Series(dtype=np.int64)})
        return g.loc[g[id_col] != g[id_col].min(), [id_col]]

    return hashed.groupby("text_hash").map_groups(victims,
                                                  batch_format="pandas")


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Survivor rows (first id per content hash)."""
    def hash_batch(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["text_hash"] = md5_hex(df[text_col])
        return df

    hashed = ds.map_batches(hash_batch, batch_format="pandas")
    return hashed.groupby("text_hash").map_groups(
        lambda g: g.sort_values(id_col).head(1), batch_format="pandas")


# ------------------------------------------------------------- MinHash LSH

def _pin_pair_schema(t):
    """Normalize a (possibly EMPTY, column-less — ray 2.49 groupby wart)
    block to the typed (id_a, id_b, est_jaccard) pair schema."""
    import pyarrow as pa

    def col(name, typ):
        if name in t.column_names:
            return t[name].cast(typ)
        return pa.array([], type=typ)

    return pa.table({"id_a": col("id_a", pa.int64()),
                     "id_b": col("id_b", pa.int64()),
                     "est_jaccard": col("est_jaccard", pa.float64())})


def _empty_pairs_ds():
    import pyarrow as pa
    import ray.data as rd
    return rd.from_arrow(pa.table(
        {"id_a": pa.array([], pa.int64()),
         "id_b": pa.array([], pa.int64()),
         "est_jaccard": pa.array([], pa.float64())}))


class MinHashSignatures:
    """text -> MinHash signature + band keys (exploded to one row per
    band). Plain task-pool map_batches callable — the only per-process
    state is the cached permutation table (``tx._minhash_params`` is
    lru-cached at module level), so an actor pool would pay spawn latency
    for nothing. ``emit_sig=False`` drops the k*8-byte signature column."""

    def __init__(self, text_col="text", id_col="doc_id", k=64, bands=16,
                 shingle_k=3, emit_sig=True):
        self.text_col, self.id_col = text_col, id_col
        self.k, self.bands, self.shingle_k = k, bands, shingle_k
        self.emit_sig = emit_sig
        tx._minhash_params(k)  # warm the permutation table once per actor

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids, band_ids, band_keys, sigs = [], [], [], []
        for i, t in zip(df[self.id_col], df[self.text_col].fillna("")):
            sh = tx.shingle_hashes(t, self.shingle_k)
            sig = tx.minhash_signature(sh, self.k)
            bh = tx.band_hashes(sig, self.bands)
            ids.extend([i] * self.bands)
            band_ids.extend(range(self.bands))
            band_keys.extend(bh.tolist())
            if self.emit_sig:
                sigs.extend([sig.tobytes()] * self.bands)
        out = {self.id_col: ids, "band_id": band_ids,
               "band_key": np.array(band_keys, dtype=np.uint64).astype(np.int64)}
        if self.emit_sig:
            out["sig"] = sigs
        return pd.DataFrame(out)


def minhash_candidate_pairs(ds, text_col="text", id_col="doc_id", k=64,
                            bands=16, shingle_k=3, max_bucket=256,
                            stage_dir: str | None = None,
                            as_dataset: bool = False):
    """Candidate pairs with MinHash-estimated Jaccard (from full signatures),
    deduped across bands.

    ONE signature computation, nothing pinned in the object store, THREE
    streaming executions (Ray execution count is the dominant cost at small
    scale; staging disk is the scale story):

    1. signature pass streams (id, band_id, band_key, sig) to a disk
       staging dir (write_parquet: spillable, resumable, a shared
       filesystem at cluster scale; sig adds k*8 B/band-row ≈ 5% of a text
       corpus — the price of not recomputing).
    2. bucket counts fold from a COLUMN-PRUNED read (band cols only, 16
       B/row) of the staging table; HOT keys (buckets holding >=2 docs — a
       tiny set for near-dup rate << 1) broadcast via ray.put. Almost
       every bucket is a singleton, and shuffling them all would mean one
       map_groups call per doc per band (~0.1 ms each, measured).
    3. pairs: read the staging table back, vectorized merge against the
       hot keys (dup-rate-sized result), shuffle those rows into buckets,
       form pairs per bucket (capped at ``max_bucket`` docs).

    Cross-band pair dedup runs through the same cardinality-aware fold
    (driver below the key threshold, Ray groupby above).
    """
    import shutil
    import tempfile

    import ray.data as rd

    sig_kwargs = dict(text_col=text_col, id_col=id_col, k=k, bands=bands,
                      shingle_k=shingle_k)
    own_stage = stage_dir is None
    if own_stage:
        stage_dir = tempfile.mkdtemp(prefix="adr_minhash_sigs_")
    try:
        ds.map_batches(MinHashSignatures(**sig_kwargs),
                       batch_format="pandas").write_parquet(stage_dir)

        def key_counts(df: pd.DataFrame) -> pd.DataFrame:
            return (df.groupby(["band_id", "band_key"], as_index=False)
                    .agg(cnt=("band_key", "size")))

        counts = fold_partials(
            rd.read_parquet(stage_dir, columns=["band_id", "band_key"])
            .map_batches(key_counts, batch_format="pandas"),
            ["band_id", "band_key"], {"cnt": "sum"})
        hot = counts[counts["cnt"] >= 2] if not counts.empty else counts
        if hot.empty:
            if as_dataset:
                return _empty_pairs_ds()
            return pd.DataFrame({"id_a": [], "id_b": [], "est_jaccard": []})
        hot_ref = ray.put(hot[["band_id", "band_key"]].reset_index(drop=True))

        def hot_rows(df: pd.DataFrame) -> pd.DataFrame:
            return df.merge(ray.get(hot_ref), on=["band_id", "band_key"])

        def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
            if len(g) < 2:
                return pd.DataFrame({"id_a": [], "id_b": [], "est_jaccard": []})
            g = g.sort_values(id_col).head(max_bucket)
            ids = g[id_col].to_numpy()
            sigs = np.stack([np.frombuffer(s, dtype=np.uint64) for s in g["sig"]])
            ia, ib = np.triu_indices(len(ids), 1)
            est = (sigs[ia] == sigs[ib]).mean(axis=1)
            return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib],
                                 "est_jaccard": est})

        pairs = (rd.read_parquet(stage_dir)
                 .map_batches(hot_rows, batch_format="pandas")
                 .groupby(["band_id", "band_key"])
                 .map_groups(bucket_pairs, batch_format="pandas"))
        if as_dataset:
            # cross-band dedup as a Ray groupby-Max: pairs never fold to a
            # driver frame (the anti-join curation regime's contract).
            # Materialize before the staging dir is removed — blocks then
            # live in the (spillable) object store.
            from ray.data.aggregate import Max
            return (pairs.map_batches(_pin_pair_schema,
                                      batch_format="pyarrow")
                    .groupby(["id_a", "id_b"])
                    .aggregate(Max("est_jaccard",
                                   alias_name="est_jaccard"))
                    .map_batches(_pin_pair_schema, batch_format="pyarrow")
                    .materialize())
        df = fold_partials(pairs, ["id_a", "id_b"], {"est_jaccard": "max"})
    finally:
        if own_stage:
            shutil.rmtree(stage_dir, ignore_errors=True)
    if df.empty:
        return df
    return df.astype({"id_a": np.int64, "id_b": np.int64})


def verify_jaccard(texts_by_id: dict, pairs: pd.DataFrame,
                   shingle_k=3) -> pd.DataFrame:
    """Exact n-gram Jaccard for candidate pairs (driver-side; pair list is
    small). Returns pairs + exact jaccard."""
    vals = []
    cache: dict = {}

    def sh(i):
        if i not in cache:
            cache[i] = tx.shingle_hashes(texts_by_id[i], shingle_k)
        return cache[i]

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        vals.append(tx.jaccard(sh(a), sh(b)))
    out = pairs.copy()
    out["jaccard"] = vals
    return out


def minhash_dedup(ds, text_col="text", id_col="doc_id", k=64, bands=16,
                  shingle_k=3, threshold=0.8, as_dataset: bool = False,
                  cc_edge_threshold: int = 200_000):
    """Full near-dup pipeline -> (id, cluster_rep) rows for docs in
    near-duplicate clusters (est_jaccard >= threshold).

    ``as_dataset=True`` keeps candidate pairs AND the cluster table as Ray
    Datasets end to end (pair dedup = Ray groupby-Max, components = the
    two-regime CC with a Dataset result): on a dup-heavy corpus nothing
    O(pairs) or O(cluster members) ever lands on the driver.
    ``cc_edge_threshold`` picks the CC regime (union-find below, Ray label
    propagation above) — both bit-identical."""
    from .cc import connected_components
    if as_dataset:
        import pyarrow as pa
        import pyarrow.compute as pc
        pairs_ds = minhash_candidate_pairs(ds, text_col, id_col, k, bands,
                                           shingle_k, as_dataset=True)
        kept = pairs_ds.map_batches(
            lambda t: t.filter(pc.greater_equal(t["est_jaccard"],
                                                threshold)),
            batch_format="pyarrow").materialize()
        if kept.count() == 0:
            return rd_empty_clusters(id_col)
        comp = connected_components(kept, "id_a", "id_b",
                                    edge_threshold=cc_edge_threshold,
                                    as_dataset=True)

        def nonrep(t: pa.Table, id_col=id_col) -> pa.Table:
            t = t.filter(pc.not_equal(t["node"], t["component"]))
            return pa.table({id_col: t["node"].cast(pa.int64()),
                             "cluster_rep": t["component"].cast(pa.int64())})

        return comp.map_batches(nonrep, batch_format="pyarrow")
    pairs = minhash_candidate_pairs(ds, text_col, id_col, k, bands, shingle_k)
    if pairs.empty:
        return pd.DataFrame({id_col: [], "cluster_rep": []})
    kept = pairs[pairs["est_jaccard"] >= threshold]
    # groups via the two-regime CC (driver union-find here, Ray label
    # propagation on a dup-heavy corpus); output keeps the historical
    # semantics: one row per NON-representative member -> its kept rep
    comp = connected_components(kept, "id_a", "id_b",
                                edge_threshold=cc_edge_threshold)
    comp = comp[comp["node"] != comp["component"]]
    return (comp.rename(columns={"node": id_col, "component": "cluster_rep"})
            .astype(np.int64).sort_values(id_col).reset_index(drop=True))


def rd_empty_clusters(id_col: str = "doc_id"):
    import pyarrow as pa
    import ray.data as rd
    return rd.from_arrow(pa.table(
        {id_col: pa.array([], pa.int64()),
         "cluster_rep": pa.array([], pa.int64())}))


# ------------------------------------------------- exact n-gram Jaccard

def ngram_jaccard_pairs(ds, text_col="text", id_col="doc_id", n=3,
                        max_df=64, threshold=0.5, stage_dir: str | None = None):
    """EXACT word-n-gram Jaccard similarity join: all pairs with
    ``|A ∩ B| / |A ∪ B| >= threshold`` where A/B are each doc's sets of
    word n-grams whose corpus document frequency is <= ``max_df``.

    The df cutoff is the standard frequency-filtering move for distributed
    set-similarity joins (cf. prefix filtering): an n-gram present in more
    than ``max_df`` docs is non-discriminative AND is exactly what makes a
    shared-shingle inverted index explode (a stopword trigram would pair
    every doc with every other). With the cutoff, every per-shingle bucket
    has at most ``max_df`` members *by construction* — no truncation cap,
    so results are exact and a DuckDB oracle applying the same cutoff
    matches bit-for-bit (unlike MinHash/SimHash, which are probabilistic
    candidate generators verified after the fact).

    Shape (reference has no such operator; this is the designed-for-100TB
    text dedup family, SURVEY.md §2.8/LLM-ops):

    1. shingle pass stages distinct ``(g, id)`` hash rows to disk parquet
       (16 B/row; spillable, resumable, shared-FS at cluster scale).
    2. df per shingle via the cardinality-aware fold of per-batch partial
       counts; the PAIRING set (df in [2, max_df]) and EXCLUDED set
       (df > max_df) are both tiny for a natural corpus and broadcast via
       ``ray.put``.
    3. pair formation: column-pruned re-read, vectorized merge against the
       pairing set, ``groupby(g).map_groups`` emits in-bucket pairs;
       intersection sizes via fold over (id_a, id_b).
    4. union sizes: only docs that appear in some pair need their filtered
       set size — that id set is pair-sized, broadcast, and sizes fold
       from a second pruned read. Nothing O(corpus) ever sits on the
       driver.
    """
    import shutil
    import tempfile

    import ray.data as rd

    own_stage = stage_dir is None
    if own_stage:
        stage_dir = tempfile.mkdtemp(prefix="adr_ngram_sh_")
    empty = pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                          "id_b": pd.Series([], dtype=np.int64),
                          "jaccard": pd.Series([], dtype=np.float64)})
    try:
        def shingle_batch(df: pd.DataFrame) -> pd.DataFrame:
            ids, gs = [], []
            for i, t in zip(df[id_col], df[text_col].fillna("")):
                h = tx.word_ngram_hashes(t, n)
                ids.extend([i] * len(h))
                gs.append(h.astype(np.int64))
            return pd.DataFrame({
                id_col: np.asarray(ids, dtype=np.int64),
                "g": (np.concatenate(gs) if gs else np.empty(0, np.int64)),
            })

        ds.map_batches(shingle_batch, batch_format="pandas").write_parquet(stage_dir)

        def g_counts(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("g", as_index=False).agg(cnt=("g", "size"))

        counts = fold_partials(
            rd.read_parquet(stage_dir, columns=["g"])
            .map_batches(g_counts, batch_format="pandas"),
            "g", {"cnt": "sum"})
        if counts.empty:
            return empty
        pairing = counts[(counts["cnt"] >= 2) & (counts["cnt"] <= max_df)]
        excluded = counts[counts["cnt"] > max_df]
        if pairing.empty:
            return empty
        pairing_ref = ray.put(pairing[["g"]].reset_index(drop=True))
        excl_ref = ray.put(excluded[["g"]].reset_index(drop=True))

        def pairing_rows(df: pd.DataFrame) -> pd.DataFrame:
            return df.merge(ray.get(pairing_ref), on="g")

        def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
            ids = np.sort(g[id_col].to_numpy())  # <= max_df by construction
            ia, ib = np.triu_indices(len(ids), 1)
            return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib], "w": 1})

        inter = fold_partials(
            rd.read_parquet(stage_dir)
            .map_batches(pairing_rows, batch_format="pandas")
            .groupby("g").map_groups(bucket_pairs, batch_format="pandas"),
            ["id_a", "id_b"], {"w": "sum"})
        if inter.empty:
            return empty

        pair_ids = np.unique(np.concatenate([inter["id_a"].to_numpy(),
                                             inter["id_b"].to_numpy()]))
        ids_ref = ray.put(pair_ids)

        def size_partial(df: pd.DataFrame) -> pd.DataFrame:
            df = df[df[id_col].isin(ray.get(ids_ref))]
            if len(df):
                df = df.merge(ray.get(excl_ref), on="g", how="left",
                              indicator=True)
                df = df[df["_merge"] == "left_only"]
            return (df.groupby(id_col, as_index=False).agg(sz=("g", "size"))
                    if len(df) else pd.DataFrame({id_col: [], "sz": []}))

        sizes = fold_partials(
            rd.read_parquet(stage_dir)
            .map_batches(size_partial, batch_format="pandas"),
            id_col, {"sz": "sum"}).set_index(id_col)["sz"]

        sa = sizes.reindex(inter["id_a"]).to_numpy(dtype=np.float64)
        sb = sizes.reindex(inter["id_b"]).to_numpy(dtype=np.float64)
        w = inter["w"].to_numpy(dtype=np.float64)
        jac = w / (sa + sb - w)
        out = pd.DataFrame({"id_a": inter["id_a"].astype(np.int64),
                            "id_b": inter["id_b"].astype(np.int64),
                            "jaccard": jac})
        out = out[out["jaccard"] >= threshold]
        return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    finally:
        if own_stage:
            shutil.rmtree(stage_dir, ignore_errors=True)


# ------------------------------------------------------------- SimHash

def simhash_table(ds, text_col="text", id_col="doc_id"):
    """Append 64-bit SimHash (as int64 bit-cast) per doc."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: df[id_col],
            "simhash": np.array([tx.simhash(t) for t in df[text_col].fillna("")],
                                dtype=np.uint64).astype(np.int64),
        })
    return ds.map_batches(f, batch_format="pandas")


def _pigeonhole_pairs(ids: np.ndarray, h: np.ndarray, bits: np.ndarray,
                      max_hamming: int, cap: int, quad_cap: int):
    """Exact Hamming<=max_hamming pairs within one LSH bucket of ANY size.

    Buckets small enough brute-force directly. Over-full buckets split
    recursively: drop bit positions constant across the group (no pair
    can differ there), partition the varying positions into
    ``max_hamming+1`` sub-bands, and recurse into each sub-band's exact-
    key groups — pigeonhole guarantees a qualifying pair matches at least
    one sub-band, and every sub-band with a varying bit strictly splits
    the group, so recursion terminates. Only near-identical mega-groups
    (fewer varying bits than sub-bands, more members than ``quad_cap``,
    where the PAIR OUTPUT itself is quadratic) truncate — and the count
    of dropped pairs is returned, never silent.

    Returns (id_a, id_b, hamming, truncated_pair_count)."""
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    out_h: list[np.ndarray] = []
    trunc = 0

    def brute(idx: np.ndarray) -> None:
        nonlocal trunc
        n = len(idx)
        if n > quad_cap:
            trunc += n * (n - 1) // 2 - quad_cap * (quad_cap - 1) // 2
            idx = idx[:quad_cap]  # ids sorted upstream -> deterministic
        ia, ib = np.triu_indices(len(idx), 1)
        d = tx.hamming64(h[idx[ia]], h[idx[ib]])
        m = d <= max_hamming
        out_a.append(ids[idx[ia[m]]])
        out_b.append(ids[idx[ib[m]]])
        out_h.append(d[m])

    def rec(idx: np.ndarray, bits: np.ndarray) -> None:
        n = len(idx)
        if n < 2:
            return
        if n <= cap:
            brute(idx)
            return
        x = h[idx]
        ones = np.array([int(((x >> np.uint64(p)) & np.uint64(1)).sum())
                         for p in bits])
        var = bits[(ones > 0) & (ones < n)]
        if len(var) < max_hamming + 1:
            brute(idx)
            return
        for sb in np.array_split(var, max_hamming + 1):
            keys = np.zeros(n, dtype=np.uint64)
            for i, p in enumerate(sb):
                keys |= ((x >> np.uint64(p)) & np.uint64(1)) << np.uint64(i)
            rest = np.setdiff1d(var, sb)
            order = np.argsort(keys, kind="stable")
            ks = keys[order]
            bounds = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1], True])
            for s, e in zip(bounds[:-1], bounds[1:]):
                if e - s >= 2:
                    rec(idx[order[s:e]], rest)

    rec(np.arange(len(ids)), bits)
    if out_a:
        return (np.concatenate(out_a), np.concatenate(out_b),
                np.concatenate(out_h), trunc)
    return (np.array([], dtype=ids.dtype), np.array([], dtype=ids.dtype),
            np.array([], dtype=np.int64), trunc)


def simhash_dedup(ds, text_col="text", id_col="doc_id", max_hamming=3,
                  cap=256, quad_cap=2048, with_report=False):
    """Near-dup pairs by SimHash: band into 4×16-bit keys (pigeonhole: any
    pair with Hamming<=3 collides in >=1 band), verify Hamming distance.

    Over-full buckets split recursively on sub-bands of their remaining
    bits (exact — see _pigeonhole_pairs) instead of being dropped; the
    only truncation left is quadratic pair output inside near-identical
    mega-groups, and its dropped-pair count is REPORTED (sentinel rows
    with id_a = id_b = -1 folded into a total; ``with_report=True``
    returns (pairs, {"truncated_pairs": n}))."""
    sh = simhash_table(ds, text_col, id_col)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        h = df["simhash"].to_numpy().astype(np.uint64)
        out = []
        for band in range(4):
            key = ((h >> np.uint64(16 * band)) & np.uint64(0xFFFF)).astype(np.int64)
            out.append(pd.DataFrame({id_col: df[id_col], "simhash": df["simhash"],
                                     "band": band, "key": key}))
        return pd.concat(out, ignore_index=True)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                              "id_b": pd.Series(dtype=np.int64),
                              "hamming": pd.Series(dtype=np.int64),
                              "trunc": pd.Series(dtype=np.int64)})
        if len(g) < 2:
            return empty
        g = g.sort_values(id_col)
        band = int(g["band"].iloc[0])
        bits = np.setdiff1d(np.arange(64),
                            np.arange(16 * band, 16 * band + 16))
        ia, ib, d, trunc = _pigeonhole_pairs(
            g[id_col].to_numpy(), g["simhash"].to_numpy().astype(np.uint64),
            bits, max_hamming, cap, quad_cap)
        out = pd.DataFrame({"id_a": ia, "id_b": ib, "hamming": d,
                            "trunc": np.zeros(len(ia), dtype=np.int64)})
        out = out.drop_duplicates(["id_a", "id_b"])  # cross-sub-band dups
        if trunc:
            out = pd.concat([out, pd.DataFrame(
                {"id_a": [-1], "id_b": [-1], "hamming": [-1],
                 "trunc": [trunc]})], ignore_index=True)
        return out

    folded = fold_partials(
        sh.map_batches(explode, batch_format="pandas")
        .groupby(["band", "key"]).map_groups(bucket_pairs, batch_format="pandas"),
        ["id_a", "id_b"], {"hamming": "min", "trunc": "sum"})
    report = {"truncated_pairs": 0}
    pairs = folded
    if not folded.empty:
        sentinel = folded["id_a"] < 0
        report["truncated_pairs"] = int(folded.loc[sentinel, "trunc"].sum())
        pairs = (folded[~sentinel].drop(columns=["trunc"])
                 .astype({"id_a": np.int64, "id_b": np.int64,
                          "hamming": np.int64}))
    else:
        pairs = folded.drop(columns=["trunc"], errors="ignore")
    if report["truncated_pairs"]:
        logging.getLogger(__name__).warning(
            "simhash_dedup: %d candidate pairs beyond quad_cap=%d in "
            "near-identical mega-groups were counted, not emitted",
            report["truncated_pairs"], quad_cap)
    return (pairs, report) if with_report else pairs


# ------------------------------------------------------------- embeddings

def embedding_near_dup(ds, vec_col="embedding", id_col="vec_id",
                       threshold=0.95, bands=8, bits_per_band=8, seed=7,
                       block=512, bucket_cap=8192, margin=0.03,
                       with_report=False):
    """Near-duplicate embedding pairs: BANDED random-hyperplane LSH, then
    exact cosine verification within buckets.

    A pair at angle θ agrees on one hyperplane with p = 1 - θ/π; banding
    (``bands`` keys of ``bits_per_band`` sign bits each, a pair is a
    candidate if ANY band matches) drives the miss rate to
    ``(1 - p^bits)^bands`` — e.g. cosine 0.98 (p≈0.96): single 16-bit key
    misses ~50%, 8×8 bands miss ~0.02%. Pair dedup across bands goes
    through the cardinality-aware fold, same as MinHash/SimHash.

    Shuffle weight (r3): buckets carry INT8-quantized unit vectors
    (dim bytes/row instead of dim×8 — an 8× lighter exchange at 10^12
    rows); in-bucket screening keeps pairs with approx cosine >=
    threshold − ``margin`` (margin covers the worst-case quantization
    error), and survivors re-rank EXACTLY against the full-precision
    vectors fetched for just the candidate ids — final cosines are
    bit-identical to a full-precision bucket verify, and the driver only
    ever holds O(candidate ids) vectors.

    Over-full buckets are screened in ``block``×``block`` matmul tiles
    (memory stays bounded, no silent drop) up to ``bucket_cap`` members;
    beyond that the dropped candidate-pair count is REPORTED via sentinel
    rows (``with_report=True`` returns (pairs, {"truncated_pairs": n}))."""

    n_planes = bands * bits_per_band

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        dim = vecs.shape[1]
        planes = np.random.default_rng(seed).normal(size=(dim, n_planes))
        signs = ((vecs @ planes) > 0).reshape(len(vecs), bands, bits_per_band)
        weights = (1 << np.arange(bits_per_band)).astype(np.int64)
        keys = signs @ weights                       # (rows, bands)
        norm = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        n = len(vecs)
        q = np.clip(np.round(norm * 127.0), -127, 127).astype(np.int8)
        vec_bytes = [v.tobytes() for v in q]
        return pd.DataFrame({
            id_col: np.repeat(df[id_col].to_numpy(), bands),
            "band": np.tile(np.arange(bands, dtype=np.int64), n),
            "key": keys.reshape(-1),
            "vec": np.repeat(np.array(vec_bytes, dtype=object), bands)})

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                              "id_b": pd.Series(dtype=np.int64),
                              "cosine": pd.Series(dtype=np.float64),
                              "trunc": pd.Series(dtype=np.int64)})
        if len(g) < 2:
            return empty
        g = g.sort_values(id_col)
        trunc = 0
        if len(g) > bucket_cap:
            n0 = len(g)
            trunc = (n0 * (n0 - 1) - bucket_cap * (bucket_cap - 1)) // 2
            g = g.head(bucket_cap)
        ids = g[id_col].to_numpy()
        V = np.stack([np.frombuffer(b, dtype=np.int8) for b in g["vec"]]
                     ).astype(np.float32)
        V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        n = len(ids)
        cut = threshold - margin
        rows_a, rows_b, rows_s = [], [], []
        for i0 in range(0, n, block):
            Vi = V[i0:i0 + block]
            for j0 in range(i0, n, block):
                S = Vi @ V[j0:j0 + block].T
                ia, ib = np.nonzero(S >= cut)
                gi, gj = ia + i0, ib + j0
                m = gi < gj  # upper triangle only
                rows_a.append(gi[m])
                rows_b.append(gj[m])
                rows_s.append(S[ia[m], ib[m]])
        gi = np.concatenate(rows_a) if rows_a else np.array([], dtype=int)
        gj = np.concatenate(rows_b) if rows_b else np.array([], dtype=int)
        sim = np.concatenate(rows_s) if rows_s else np.array([])
        out = pd.DataFrame({"id_a": ids[gi], "id_b": ids[gj], "cosine": sim,
                            "trunc": np.zeros(len(gi), dtype=np.int64)})
        if trunc:
            out = pd.concat([out, pd.DataFrame(
                {"id_a": [-1], "id_b": [-1], "cosine": [-1.0],
                 "trunc": [trunc]})], ignore_index=True)
        return out

    folded = fold_partials(
        ds.map_batches(bucket, batch_format="pandas")
        .groupby(["band", "key"]).map_groups(verify, batch_format="pandas"),
        ["id_a", "id_b"], {"cosine": "max", "trunc": "sum"})
    report = {"truncated_pairs": 0}
    pairs = folded
    if not folded.empty:
        sentinel = folded["id_a"] < 0
        report["truncated_pairs"] = int(folded.loc[sentinel, "trunc"].sum())
        pairs = (folded[~sentinel].drop(columns=["trunc"])
                 .astype({"id_a": np.int64, "id_b": np.int64}))
    else:
        pairs = folded.drop(columns=["trunc"], errors="ignore")
    if report["truncated_pairs"]:
        logging.getLogger(__name__).warning(
            "embedding_near_dup: %d candidate pairs beyond bucket_cap=%d "
            "were counted, not verified", report["truncated_pairs"],
            bucket_cap)
    # exact re-rank: fetch full-precision vectors for ONLY the candidate
    # ids (one filtered streaming pass) and recompute cosine in float64 —
    # quantization never reaches the emitted values
    if len(pairs):
        cand_ids = np.unique(np.concatenate(
            [pairs["id_a"].to_numpy(np.int64),
             pairs["id_b"].to_numpy(np.int64)]))
        ids_ref = ray.put(cand_ids)

        def fetch(df: pd.DataFrame) -> pd.DataFrame:
            keep = np.isin(df[id_col].to_numpy(np.int64), ray.get(ids_ref))
            return df.loc[keep, [id_col, vec_col]]

        vdf = ds.map_batches(fetch, batch_format="pandas").to_pandas()
        V = np.stack(vdf[vec_col].to_numpy()).astype(np.float64)
        V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        pos = {int(i): k for k, i in enumerate(vdf[id_col].to_numpy())}
        ia = np.array([pos[int(i)] for i in pairs["id_a"]], dtype=np.int64)
        ib = np.array([pos[int(i)] for i in pairs["id_b"]], dtype=np.int64)
        cos = np.einsum("ij,ij->i", V[ia], V[ib])
        pairs = pairs.assign(cosine=cos).loc[cos >= threshold]
        pairs = pairs.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return (pairs, report) if with_report else pairs


# ------------------------------------------------- duplicated substrings

def _md5_64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big",
                          signed=False)


def dup_span_stats(ds, text_col: str = "text", id_col: str = "doc_id",
                   window: int = 8, stride: int = 4,
                   stage_dir: str | None = None,
                   max_broadcast_hot: int = 2_000_000):
    """Duplicated-substring detection — the training-data hygiene pass of
    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better"), hash-windowed: slide a ``window``-token window with
    ``stride`` over each document's space-tokenization, key windows by a
    64-bit md5 of their text, count keys corpus-wide; a window is
    duplicated when its text occurs >= 2 times anywhere (across docs or
    repeated within one). Per doc: n_windows, n_dup_windows, dup_frac.
    (The reference has no corpus operators; this extends its validation
    vocabulary to LLM-corpus hygiene per the build brief.)

    100-TB shape (the MinHash staging pattern, dedup.py:137): ONE pass
    over text stages slim (key:int64, doc_id, cnt) rows to disk parquet —
    window text never leaves the batch, within-batch partials pre-reduce
    repeats, per-doc totals need no extra pass because sum(cnt) per doc
    IS n_windows (zero-window docs ride along as a cnt=0 row under key 0,
    which can never become hot). Key totals come from a native Ray
    groupby-aggregate over a column-pruned re-read; only HOT keys (total
    >= 2 — O(duplicated windows)) are collected and broadcast WHILE that
    set fits a worker heap (``max_broadcast_hot``, counted in Ray before
    collecting anything); per-doc dup counts then fold through one
    vectorized map_batches + native groupby Sum. On a dup-heavy corpus
    where the hot set itself is unbounded, the operator switches to the
    fully distributed regime — per-key grouping computes each bucket's
    total in place (no hot set ever exists, driver state O(1)) at the
    price of per-group call overhead; both regimes emit identical rows
    (pinned by test_dup_span_stats_large_regime_matches).
    """
    import shutil
    import tempfile

    import ray.data as rd
    from ray.data.aggregate import Sum

    W, S = int(window), int(stride)

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        keys: list[int] = []
        docs: list[int] = []
        cnts: list[int] = []
        for did, txt in zip(df[id_col], df[text_col].fillna("")):
            toks = txt.split(" ")
            n = len(toks)
            if n < W:
                keys.append(0)      # zero-window doc: cnt=0 under key 0
                docs.append(did)
                cnts.append(0)
                continue
            local: dict[int, int] = {}
            for p in range(0, n - W + 1, S):
                k = _md5_64(" ".join(toks[p:p + W]))
                local[k] = local.get(k, 0) + 1
            keys.extend(local)
            docs.extend([did] * len(local))
            cnts.extend(local.values())
        return pd.DataFrame({
            "key": np.array(keys, dtype=np.uint64).astype(np.int64),
            id_col: np.asarray(docs, dtype=np.int64),
            "cnt": np.asarray(cnts, dtype=np.int64)})

    own_stage = stage_dir is None
    if own_stage:
        stage_dir = tempfile.mkdtemp(prefix="adr_dup_spans_")
    try:
        ds.map_batches(emit, batch_format="pandas").write_parquet(stage_dir)
        rows = rd.read_parquet(stage_dir)

        # hot keys: total >= 2 across the corpus, filtered IN RAY before
        # anything lands on the driver (zero-window docs' key-0 cnt=0 rows
        # can never make a total hot, and contribute 0 even if a real
        # window collides with key 0)
        totals = (rd.read_parquet(stage_dir, columns=["key", "cnt"])
                  .groupby("key").aggregate(Sum(on="cnt", alias_name="tot")))
        import pyarrow.compute as pc
        hot_ds = totals.map_batches(
            lambda t: t.filter(pc.field("tot") >= 2),
            batch_format="pyarrow").materialize()

        if hot_ds.count() <= max_broadcast_hot:
            # broadcast regime: hot set fits a worker heap
            hot = hot_ds.to_pandas()
            hot_ref = ray.put(np.sort(hot["key"].to_numpy(np.int64)))

            def per_doc_partial(df: pd.DataFrame) -> pd.DataFrame:
                hk = ray.get(hot_ref)
                k = df["key"].to_numpy(np.int64)
                c = df["cnt"].to_numpy(np.int64)
                is_dup = np.zeros(len(df), dtype=np.int64)
                if len(hk):
                    pos = np.searchsorted(hk, k)
                    pos[pos == len(hk)] = 0
                    is_dup = (hk[np.clip(pos, 0, len(hk) - 1)] == k
                              ).astype(np.int64)
                out = pd.DataFrame({id_col: df[id_col].to_numpy(np.int64),
                                    "n_win": c, "n_dup": c * is_dup})
                return out.groupby(id_col, as_index=False).sum()

            marked = rows.map_batches(per_doc_partial, batch_format="pandas")
        else:
            # distributed regime: per-key grouping computes each bucket's
            # total in place — no hot set exists anywhere, driver O(1)
            def per_key(g: pd.DataFrame) -> pd.DataFrame:
                dup = g["cnt"] if int(g["cnt"].sum()) >= 2 else 0
                return pd.DataFrame({id_col: g[id_col],
                                     "n_win": g["cnt"], "n_dup": dup})

            marked = rows.groupby("key").map_groups(per_key,
                                                    batch_format="pandas")

        agg = (marked.groupby(id_col)
               .aggregate(Sum(on="n_win", alias_name="n_windows"),
                          Sum(on="n_dup", alias_name="n_dup_windows")))

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            nw = df["n_windows"].to_numpy(np.int64)
            nd = df["n_dup_windows"].to_numpy(np.int64)
            # no rounding: float64 nd/nw is IEEE-exact, so the DuckDB
            # oracle's CAST(nd AS DOUBLE)/nw is bit-identical
            frac = np.where(nw > 0, nd / np.where(nw > 0, nw, 1), 0.0)
            return pd.DataFrame({id_col: df[id_col].astype(np.int64),
                                 "n_windows": nw, "n_dup_windows": nd,
                                 "dup_frac": frac})

        # materialize before the staging dir disappears (fixed-width
        # one-row-per-doc result: object-store-resident, spillable)
        return agg.map_batches(finalize,
                               batch_format="pandas").materialize()
    finally:
        if own_stage:
            shutil.rmtree(stage_dir, ignore_errors=True)


# --------------------------------------------- edit-distance verification

def levenshtein(a: str, b: str) -> int:
    """Unit-cost Levenshtein distance (matches DuckDB's levenshtein()).
    Row-vectorized DP: the sequential insertion chain resolves exactly via
    the min-plus prefix trick cur[j] = min(cur0[j], min_{k<j}(cur0[k] +
    j - k))."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    A = np.array(list(a))
    B = np.array(list(b))
    prev = np.arange(len(B) + 1, dtype=np.int64)
    idx = np.arange(len(B) + 1, dtype=np.int64)
    for i in range(1, len(A) + 1):
        cur0 = np.empty(len(B) + 1, dtype=np.int64)
        cur0[0] = i
        np.minimum(prev[1:] + 1, prev[:-1] + (B != A[i - 1]), out=cur0[1:])
        cur = np.minimum(cur0, np.minimum.accumulate(cur0 - idx) + idx)
        prev = cur
    return int(prev[-1])


def edit_verify_pairs(ds, pairs: pd.DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> pd.DataFrame:
    """Verify near-duplicate CANDIDATE pairs by normalized character edit
    similarity ``1 - lev(a, b) / max(len)`` — the exact fuzzy-dedup
    confirmation step layered over a probabilistic or set-based candidate
    generator. Texts are fetched for only the pair ids via one filtered
    streaming pass (same bounded-candidate contract as the embedding
    re-rank above: near-dup rate ≪ 1, so the pair id set broadcasts)."""
    if not len(pairs):
        return pairs.assign(edit_sim=pd.Series(dtype=np.float64))
    cand = np.unique(np.concatenate([
        pairs["id_a"].to_numpy(np.int64), pairs["id_b"].to_numpy(np.int64)]))
    ids_ref = ray.put(cand)

    def fetch(df: pd.DataFrame) -> pd.DataFrame:
        keep = np.isin(df[id_col].to_numpy(np.int64), ray.get(ids_ref))
        return df.loc[keep, [id_col, text_col]]

    tdf = ds.map_batches(fetch, batch_format="pandas").to_pandas()
    txt = dict(zip(tdf[id_col].astype(np.int64), tdf[text_col].fillna("")))
    sims = []
    for ia, ib in zip(pairs["id_a"], pairs["id_b"]):
        a, b = txt.get(int(ia), ""), txt.get(int(ib), "")
        m = max(len(a), len(b))
        sims.append(1.0 - levenshtein(a, b) / m if m else 1.0)
    return pairs.assign(edit_sim=np.asarray(sims, dtype=np.float64))


# ------------------------------------------------------- decontamination

def contamination_stats(ds, eval_ds, text_col: str = "text",
                        id_col: str = "doc_id", window: int = 8,
                        mode: str | None = None,
                        broadcast_max_eval_docs: int = 100_000):
    """Benchmark decontamination check (the GPT-3 appendix-C / standard
    eval-leakage scan): a training document is contaminated when any of
    its ``window``-token n-grams (stride 1) appears in the evaluation
    set's n-gram inventory. Per corpus doc: n_windows, n_contaminated,
    is_contaminated.

    Two regimes (``mode``; auto-chosen by eval row count when None):

    - ``broadcast`` — the EVAL side is small by construction (benchmarks
      are thousands of docs): its md5-64 n-gram key set is built with one
      pass over ``eval_ds`` and broadcast once via ``ray.put``; the
      CORPUS side is one embarrassingly-parallel map_batches pass whose
      membership test is a vectorized searchsorted against the sorted
      key array. No shuffle at all.
    - ``semi_join`` — when the "eval set" is itself corpus-sized (e.g.
      scanning against another training corpus), the key inventory must
      never land on the driver: corpus windows shrink to slim
      (key, doc_id, cnt) rows (deduped per doc), eval keys stay a
      Dataset, and a tagged-union groupby semi-join (the anti_join_keys
      shape from stages/joins) keeps exactly the corpus window rows
      whose key appears on the eval side; a per-doc sum then a left
      merge against the per-doc window counts reproduces the broadcast
      regime's output bit-for-bit (pinned in tests/test_text_dedup.py).
      Window text never leaves a batch on either side in either regime.
    """
    W = int(window)
    if mode is None:
        mode = ("broadcast" if eval_ds.count() <= broadcast_max_eval_docs
                else "semi_join")
    if mode == "semi_join":
        return _contamination_semi_join(ds, eval_ds, text_col, id_col, W)

    def eval_keys(df: pd.DataFrame) -> pd.DataFrame:
        ks: set[int] = set()
        for txt in df[text_col].fillna(""):
            toks = txt.split(" ")
            for p in range(0, len(toks) - W + 1):
                ks.add(_md5_64(" ".join(toks[p:p + W])))
        return pd.DataFrame({"key": np.fromiter(ks, dtype=np.uint64,
                                                count=len(ks))
                             .astype(np.int64)})

    ev = eval_ds.map_batches(eval_keys, batch_format="pandas").to_pandas()
    keys = np.unique(ev["key"].to_numpy(np.int64))
    keys_ref = ray.put(keys)

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        kk = ray.get(keys_ref)
        out = {"doc_id": [], "n_windows": [], "n_contaminated": []}
        for did, txt in zip(df[id_col], df[text_col].fillna("")):
            toks = txt.split(" ")
            n = max(0, len(toks) - W + 1)
            hits = 0
            if n and len(kk):
                h = np.fromiter(
                    (_md5_64(" ".join(toks[p:p + W])) for p in range(n)),
                    dtype=np.uint64, count=n).astype(np.int64)
                pos = np.clip(np.searchsorted(kk, h), 0, len(kk) - 1)
                hits = int((kk[pos] == h).sum())
            out["doc_id"].append(did)
            out["n_windows"].append(n)
            out["n_contaminated"].append(hits)
        res = pd.DataFrame({
            id_col: np.asarray(out["doc_id"], dtype=np.int64),
            "n_windows": np.asarray(out["n_windows"], dtype=np.int64),
            "n_contaminated": np.asarray(out["n_contaminated"],
                                         dtype=np.int64)})
        res["is_contaminated"] = res["n_contaminated"] > 0
        return res

    return ds.map_batches(scan, batch_format="pandas")


def _contamination_semi_join(ds, eval_ds, text_col: str, id_col: str,
                             W: int):
    """Large-eval regime of contamination_stats: no driver-resident key
    inventory. Corpus window keys (deduped per doc, with their position
    counts) semi-join the eval key Dataset through ONE tagged-union
    groupby exchange; hit counts fold per doc and left-merge onto the
    per-doc window totals."""
    import pyarrow as pa

    def corpus_keys(df: pd.DataFrame) -> pd.DataFrame:
        ids, keys, cnts = [], [], []
        for did, txt in zip(df[id_col], df[text_col].fillna("")):
            toks = txt.split(" ")
            n = max(0, len(toks) - W + 1)
            if not n:
                continue
            h = np.fromiter(
                (_md5_64(" ".join(toks[p:p + W])) for p in range(n)),
                dtype=np.uint64, count=n).astype(np.int64)
            u, c = np.unique(h, return_counts=True)
            ids.append(np.full(len(u), int(did), dtype=np.int64))
            keys.append(u)
            cnts.append(c.astype(np.int64))
        if not ids:
            return pd.DataFrame({"key": pd.Series([], dtype=np.int64),
                                 id_col: pd.Series([], dtype=np.int64),
                                 "cnt": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"key": np.concatenate(keys),
                             id_col: np.concatenate(ids),
                             "cnt": np.concatenate(cnts)})

    def eval_keys_slim(df: pd.DataFrame) -> pd.DataFrame:
        ks: set[int] = set()
        for txt in df[text_col].fillna(""):
            toks = txt.split(" ")
            for p in range(0, len(toks) - W + 1):
                ks.add(_md5_64(" ".join(toks[p:p + W])))
        a = np.fromiter(ks, dtype=np.uint64, count=len(ks)).astype(np.int64)
        return pd.DataFrame({"key": a})

    def win_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].fillna("").str.split(" ").str.len()
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(np.int64),
            "n_windows": np.maximum(0, toks.to_numpy(np.int64) - W + 1)})

    corpus = ds.map_batches(corpus_keys, batch_format="pandas")
    evk = eval_ds.map_batches(eval_keys_slim, batch_format="pandas")

    # tagged union -> groupby key -> keep corpus rows of matched groups
    def tag_c(t: pa.Table) -> pa.Table:
        return t.append_column("__side",
                               pa.array(np.zeros(t.num_rows, dtype=np.int8)))

    def tag_e(t: pa.Table) -> pa.Table:
        n = t.num_rows if "key" in t.column_names else 0
        return pa.table({
            "key": t["key"] if n else pa.nulls(0, type=pa.int64()),
            id_col: pa.nulls(n, type=pa.int64()),
            "cnt": pa.nulls(n, type=pa.int64()),
        }).append_column("__side", pa.array(np.ones(n, dtype=np.int8)))

    both = (corpus.map_batches(tag_c, batch_format="pyarrow")
            .union(evk.map_batches(tag_e, batch_format="pyarrow")))

    def keep_matched(t: pa.Table) -> pa.Table:
        side = t["__side"].to_numpy(zero_copy_only=False)
        out = t.drop_columns(["__side"])
        return out.filter(pa.array(side == 0)) if (side == 1).any() \
            else out.slice(0, 0)

    hits = both.groupby("key").map_groups(keep_matched,
                                          batch_format="pyarrow")

    def hit_partial(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0 or id_col not in t.column_names:
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "hits": pd.Series([], dtype=np.int64)})
        df = t.select([id_col, "cnt"]).to_pandas()
        g = df.groupby(id_col, as_index=False)["cnt"].sum()
        return g.rename(columns={"cnt": "hits"})

    from ..functions.fold import fold_partials
    hit_df = fold_partials(
        hits.map_batches(hit_partial, batch_format="pyarrow"),
        [id_col], {"hits": "sum"})
    wins = fold_partials(
        ds.map_batches(win_partial, batch_format="pandas"),
        [id_col], {"n_windows": "sum"})

    out = wins.merge(hit_df, on=id_col, how="left")
    out["n_contaminated"] = out["hits"].fillna(0).astype(np.int64)
    out = out.drop(columns=["hits"])
    out[id_col] = out[id_col].astype("int64")
    out["n_windows"] = out["n_windows"].astype("int64")
    out["is_contaminated"] = out["n_contaminated"] > 0
    return out[[id_col, "n_windows", "n_contaminated", "is_contaminated"]]
