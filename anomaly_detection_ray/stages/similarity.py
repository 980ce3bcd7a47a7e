"""Similarity search over an embedding column (list<float>).

 - brute_force_topk: the exact baseline — the query matrix is broadcast via
   ``ray.put`` once; every batch does one numpy matmul and emits its LOCAL
   top-k rows, so only batches×k candidate rows return to the driver for
   the final merge (never the full score table).
 - ivf_topk: the scale path — a coarse k-means codebook (trained on a
   sample, a few Lloyd iterations, fixed seed) assigns each row to a cell;
   queries probe the ``nprobe`` nearest cells so each batch scores only the
   rows whose cell is probed. Same return contract as brute force.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd

import ray


def _as_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _normalize(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


def _hash_slice_sample(ds, sample_rows: int,
                       id_col: str | None) -> pd.DataFrame:
    """Unbiased deterministic sample for codebook/centroid training: an
    id-modulus slice over the whole dataset (every batch contributes
    ~sample_rows/total of its rows), NOT a first-blocks ``limit`` — a
    corpus sorted by source would otherwise train on one source's
    manifold. Shared by IVF/PQ/k-means trainers. Falls back to
    ``limit`` when the slice comes back empty (sparse/offset id spaces
    where ``id % mod == 0`` can match nothing)."""
    if id_col is not None and id_col in ds.schema().names:
        n_total = ds.count()  # parquet metadata, no data read
        mod = max(1, n_total // sample_rows)

        def slice_batch(df: pd.DataFrame) -> pd.DataFrame:
            return df[df[id_col].astype(np.int64) % mod == 0]

        # sort driver-side for a deterministic sample regardless of block
        # completion order
        sample = (ds.map_batches(slice_batch, batch_format="pandas")
                  .to_pandas().sort_values(id_col).head(sample_rows))
        if len(sample):
            return sample
    return ds.limit(sample_rows).to_pandas()


def brute_force_topk(ds, queries: np.ndarray, k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     exclude_ids: set | None = None) -> pd.DataFrame:
    """Exact cosine top-k for each query vector. Returns (query_idx, vec_id,
    cosine) with deterministic tie-break (higher cosine, then lower id)."""
    Q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    q_ref = ray.put(Q)
    excl = frozenset(exclude_ids or ())

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        Qm = ray.get(q_ref)
        if excl:
            df = df[~df[id_col].isin(excl)]
        if df.empty:
            return pd.DataFrame({"query_idx": [], id_col: [], "cosine": []})
        V = _normalize(_as_matrix(df[vec_col].to_numpy()))
        ids = df[id_col].to_numpy()
        sims = V @ Qm.T  # (rows, n_queries)
        out_q, out_i, out_s = [], [], []
        kk = min(k, len(ids))
        for qi in range(Qm.shape[0]):
            s = sims[:, qi]
            part = np.argpartition(-s, kk - 1)[:kk]
            out_q.extend([qi] * kk)
            out_i.extend(ids[part])
            out_s.extend(s[part])
        return pd.DataFrame({"query_idx": np.array(out_q, dtype=np.int64),
                             id_col: np.array(out_i, dtype=np.int64),
                             "cosine": out_s})

    cand = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    if cand.empty:
        return cand
    cand = cand.sort_values(["query_idx", "cosine", id_col],
                            ascending=[True, False, True])
    return (cand.groupby("query_idx", as_index=False).head(k)
            .reset_index(drop=True))


def train_ivf_codebook(ds, n_cells: int = 16, vec_col: str = "embedding",
                       sample_rows: int = 4096, iters: int = 8,
                       seed: int = 0, id_col: str | None = "vec_id") -> np.ndarray:
    """Coarse k-means codebook from a sample (driver-side Lloyd, tiny).

    The sample is the unbiased deterministic hash slice of
    ``_hash_slice_sample`` (not a first-blocks ``limit``)."""
    sample = _hash_slice_sample(ds, sample_rows, id_col)
    X = _normalize(_as_matrix(sample[vec_col].to_numpy()))
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                C[c] = X[m].mean(axis=0)
        C = _normalize(C)
    return C


def ivf_topk(ds, queries: np.ndarray, codebook: np.ndarray, k: int = 10,
             nprobe: int = 4, vec_col: str = "embedding",
             id_col: str = "vec_id") -> pd.DataFrame:
    """Approximate top-k: score only rows whose IVF cell is among the
    query's ``nprobe`` closest cells."""
    Q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    C = np.asarray(codebook, dtype=np.float64)
    probed = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    q_ref = ray.put((Q, C, probed))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        Qm, Cm, probe = ray.get(q_ref)
        V = _normalize(_as_matrix(df[vec_col].to_numpy()))
        ids = df[id_col].to_numpy()
        cells = np.argmax(V @ Cm.T, axis=1)
        out_q, out_i, out_s = [], [], []
        for qi in range(Qm.shape[0]):
            m = np.isin(cells, probe[qi])
            if not m.any():
                continue
            s = V[m] @ Qm[qi]
            sub_ids = ids[m]
            kk = min(k, len(sub_ids))
            part = np.argpartition(-s, kk - 1)[:kk]
            out_q.extend([qi] * kk)
            out_i.extend(sub_ids[part])
            out_s.extend(s[part])
        return pd.DataFrame({"query_idx": np.array(out_q, dtype=np.int64),
                             id_col: np.array(out_i, dtype=np.int64),
                             "cosine": out_s})

    cand = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    if cand.empty:
        return cand
    cand = cand.sort_values(["query_idx", "cosine", id_col],
                            ascending=[True, False, True])
    return (cand.groupby("query_idx", as_index=False).head(k)
            .reset_index(drop=True))


# --------------------------------------------------- product quantization

def train_pq_codebooks(ds, m: int = 8, ks: int = 256,
                       vec_col: str = "embedding", id_col: str = "vec_id",
                       sample_rows: int = 4096, iters: int = 10,
                       seed: int = 0) -> np.ndarray:
    """Per-subspace k-means codebooks (Jegou, Douze & Schmid 2011 product
    quantization), shape (m, ks, d/m), trained on the same unbiased hash
    sample as the IVF codebook. Vectors are L2-normalized first so the
    asymmetric-distance inner product approximates cosine.

    This is the genuine 100-TB embedding path: 64-d float32 vectors (256 B)
    compress to m uint8 codes (8 B, 32x) — the coded table fits in memory
    where the raw one cannot, and scan cost per batch is m table lookups
    per row instead of a d-wide dot product."""
    sample = _hash_slice_sample(ds, sample_rows, id_col)
    X = _normalize(_as_matrix(sample[vec_col].to_numpy()))
    n, d = X.shape
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    sub = d // m
    ks = min(ks, n)
    rng = np.random.default_rng(seed)
    books = np.empty((m, ks, sub))
    for j in range(m):
        Xj = X[:, j * sub:(j + 1) * sub]
        C = Xj[rng.choice(n, size=ks, replace=False)]
        for _ in range(iters):
            # squared-L2 assignment, vectorized: |x-c|^2 = |x|^2 -2xc + |c|^2
            d2 = (-2.0 * Xj @ C.T) + (C**2).sum(axis=1)[None, :]
            assign = np.argmin(d2, axis=1)
            for c in range(ks):
                msk = assign == c
                if msk.any():
                    C[c] = Xj[msk].mean(axis=0)
        books[j] = C
    return books


def pq_encode(ds, codebooks: np.ndarray, vec_col: str = "embedding",
              id_col: str = "vec_id"):
    """Dataset -> Dataset of (id, code list<uint8>): each batch assigns its
    normalized subvectors to the nearest centroid per subspace. Codebooks
    are broadcast once via ``ray.put``."""
    cb_ref = ray.put(np.asarray(codebooks))

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        books = ray.get(cb_ref)
        m, ks, sub = books.shape
        V = _normalize(_as_matrix(df[vec_col].to_numpy()))
        codes = np.empty((len(V), m), dtype=np.uint8)
        for j in range(m):
            Vj = V[:, j * sub:(j + 1) * sub]
            C = books[j]
            d2 = (-2.0 * Vj @ C.T) + (C**2).sum(axis=1)[None, :]
            codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "code": list(codes)})

    return ds.map_batches(encode, batch_format="pandas")


def pq_topk(codes_ds, queries: np.ndarray, codebooks: np.ndarray,
            k: int = 10, id_col: str = "vec_id") -> pd.DataFrame:
    """Asymmetric-distance top-k over the CODED table: per query a lookup
    table (m, ks) of query-subvector x centroid inner products is broadcast;
    each batch scores rows with m uint8 gathers + a sum, emits its local
    top-k. Same return contract as brute_force_topk (query_idx, id, cosine
    ~ approximated)."""
    Q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    books = np.asarray(codebooks)
    m, ks, sub = books.shape
    # LUT[q, j, c] = <Q[q, subspace j], centroid c of subspace j>
    lut = np.einsum("qjs,jcs->qjc",
                    Q.reshape(Q.shape[0], m, sub), books)
    lut_ref = ray.put(lut)

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        L = ray.get(lut_ref)
        codes = np.stack(df["code"].to_numpy()).astype(np.int64)  # (n, m)
        ids = df[id_col].to_numpy()
        out_q, out_i, out_s = [], [], []
        cols = np.arange(m)
        for qi in range(L.shape[0]):
            s = L[qi][cols[None, :], codes].sum(axis=1)  # (n,)
            kk = min(k, len(ids))
            part = np.argpartition(-s, kk - 1)[:kk]
            out_q.extend([qi] * kk)
            out_i.extend(ids[part])
            out_s.extend(s[part])
        return pd.DataFrame({"query_idx": np.array(out_q, dtype=np.int64),
                             id_col: np.array(out_i, dtype=np.int64),
                             "cosine": out_s})

    cand = codes_ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    if cand.empty:
        return cand
    cand = cand.sort_values(["query_idx", "cosine", id_col],
                            ascending=[True, False, True])
    return (cand.groupby("query_idx", as_index=False).head(k)
            .reset_index(drop=True))


def pq_topk_rerank(ds, codes_ds, queries: np.ndarray, codebooks: np.ndarray,
                   k: int = 10, rerank_factor: int = 4,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id") -> pd.DataFrame:
    """Two-stage retrieval: ADC shortlist of k*rerank_factor per query over
    the coded table, then EXACT cosine re-rank of only the shortlisted raw
    vectors (one predicate-pushdown-ish pass over ``ds`` that keeps just
    nq*k*rerank_factor rows). Standard PQ + re-rank; recall ~1.0 at small
    rerank factors while the wide scan stays on 8-32 B codes."""
    short = pq_topk(codes_ds, queries, codebooks, k=k * rerank_factor,
                    id_col=id_col)
    if short.empty:
        return short
    wanted = frozenset(short[id_col].tolist())
    w_ref = ray.put(wanted)

    def fetch(df: pd.DataFrame) -> pd.DataFrame:
        ids = ray.get(w_ref)
        return df.loc[df[id_col].isin(ids), [id_col, vec_col]]

    raw = ds.map_batches(fetch, batch_format="pandas").to_pandas()
    V = _normalize(_as_matrix(raw[vec_col].to_numpy()))
    by_id = {i: v for i, v in zip(raw[id_col].to_numpy(), V)}
    Q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    rows = []
    for qi, grp in short.groupby("query_idx"):
        ids = grp[id_col].to_numpy()
        M = np.stack([by_id[i] for i in ids])
        s = M @ Q[qi]
        order = np.lexsort((ids, -s))[:k]
        rows.append(pd.DataFrame({"query_idx": qi, id_col: ids[order],
                                  "cosine": s[order]}))
    return pd.concat(rows, ignore_index=True)


# ------------------------------------------------------- full-data k-means

def kmeans_fit(ds, k: int = 8, iters: int = 5, vec_col: str = "embedding",
               id_col: str = "vec_id", seed: int = 0) -> np.ndarray:
    """Distributed Lloyd's k-means over the FULL corpus (euclidean) — the
    first-class clustering op the sample-trained IVF codebook refines
    into: each iteration is ONE streaming pass, per-batch assignment
    (vectorized ||x-c||² via the x²-2xc+c² expansion) + per-centroid
    partial (sum-vector, count); only k×(dim+1) floats per batch reach the
    driver merge, so the pass is corpus-size-independent on the driver.
    Init = unbiased hash-sliced sample (train_ivf_codebook slice), seeded
    => fully deterministic centroids."""
    import ray as _ray

    sample = _hash_slice_sample(ds, 2048, id_col)
    if not len(sample):
        raise ValueError("kmeans_fit: empty dataset")
    X0 = _as_matrix(sample[vec_col].to_numpy())
    rng = np.random.default_rng(seed)
    # farthest-point (deterministic k-means++ flavor) init on the sample:
    # a uniform draw can put two seeds in one cluster and Lloyd then sticks
    # in the split-blob local optimum
    C = [X0[int(rng.integers(len(X0)))]]
    d2 = ((X0 - C[0]) ** 2).sum(1)
    for _ in range(min(k, len(X0)) - 1):
        C.append(X0[int(np.argmax(d2))])
        d2 = np.minimum(d2, ((X0 - C[-1]) ** 2).sum(1))
    C = np.array(C)

    for _ in range(iters):
        C_ref = _ray.put(C)

        def part(df: pd.DataFrame) -> pd.DataFrame:
            Cc = _ray.get(C_ref)
            X = _as_matrix(df[vec_col].to_numpy())
            d = (X * X).sum(1)[:, None] - 2.0 * X @ Cc.T + (Cc * Cc).sum(1)[None, :]
            a = np.argmin(d, axis=1)
            rows = []
            for c in range(len(Cc)):
                m = a == c
                if m.any():
                    rows.append({"cid": c, "n": int(m.sum()),
                                 "vsum": X[m].sum(axis=0).tobytes()})
            return pd.DataFrame(rows, columns=["cid", "n", "vsum"])

        p = ds.map_batches(part, batch_format="pandas").to_pandas()
        newC = C.copy()
        for cid, g in p.groupby("cid"):
            s = np.sum([np.frombuffer(b) for b in g["vsum"]], axis=0)
            newC[cid] = s / g["n"].sum()
        # round each iteration's centroids: float-sum low bits depend on
        # batch/block boundaries (and those on cluster size); 9 decimals is
        # ~1e3x above the noise floor and makes every downstream assignment
        # bit-identical across runs, partitionings and CPU counts
        C = np.round(newC, 9)
    return C


def kmeans_assign(ds, C: np.ndarray, vec_col: str = "embedding",
                  id_col: str = "vec_id"):
    """Final assignment pass: (id, cluster, dist rounded) per vector."""
    import ray as _ray
    C_ref = _ray.put(C)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        Cc = _ray.get(C_ref)
        X = _as_matrix(df[vec_col].to_numpy())
        d = (X * X).sum(1)[:, None] - 2.0 * X @ Cc.T + (Cc * Cc).sum(1)[None, :]
        a = np.argmin(d, axis=1)
        return pd.DataFrame({id_col: df[id_col],
                             "cluster": a.astype(np.int64),
                             "dist": np.sqrt(np.maximum(
                                 d[np.arange(len(a)), a], 0.0))})

    return ds.map_batches(assign, batch_format="pandas")


def semantic_dedup(ds, k: int = 16, tau: float = 0.95, iters: int = 5,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   seed: int = 0):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the corpus, then dedup WITHIN each
    cluster — two rows are semantic duplicates when their unit vectors'
    cosine exceeds ``tau``; a greedy leader scan in ascending-id order
    keeps the earliest row of every duplicate chain, so the verdict is
    deterministic and independent of partitioning.

    Scale shape: the quadratic work is bounded per cluster (pick k so the
    mean cluster size n/k stays fixed as the corpus grows — SemDeDup uses
    k ~ n/1000); the only all-to-all exchange is the groupby(cluster)
    shuffle of (id, vector) rows, and each k-means iteration is one
    streaming pass whose driver merge is k×(dim+1) floats. At 100 TB,
    quantize the shuffled vector to int8 (embedding_near_dup's trick) if
    the float exchange dominates; the leader scan then re-ranks in
    float64 exactly as here.

    Returns one row per input row: (id, cluster, keep, dup_of, cos_dup) —
    ``dup_of`` is the kept leader's id for dropped rows (-1 for kept),
    ``cos_dup`` the cosine to that leader (0.0 for kept), rounded so the
    value-hash is stable across BLAS reduction orders."""
    import ray as _ray

    C = kmeans_fit(ds, k=k, iters=iters, vec_col=vec_col, id_col=id_col,
                   seed=seed)
    C_ref = _ray.put(C)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        # assignment pass that KEEPS the vector (kmeans_assign drops it):
        # one read of the corpus feeds the cluster shuffle directly
        Cc = _ray.get(C_ref)
        X = _as_matrix(df[vec_col].to_numpy())
        d = (X * X).sum(1)[:, None] - 2.0 * X @ Cc.T + (Cc * Cc).sum(1)[None, :]
        return pd.DataFrame({id_col: df[id_col].astype(np.int64),
                             "cluster": np.argmin(d, 1).astype(np.int64),
                             vec_col: list(X)})

    tagged = ds.map_batches(tag, batch_format="pandas")

    def leader_scan(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        X = _normalize(_as_matrix(g[vec_col].to_numpy()[order]))
        n = len(ids)
        S = X @ X.T  # cluster-size bounded (n/k rows), float64
        keep = np.ones(n, dtype=bool)
        dup_of = np.full(n, -1, dtype=np.int64)
        cos = np.zeros(n, dtype=np.float64)
        for i in range(n):  # outer loop over kept leaders only
            if not keep[i]:
                continue
            tail = np.flatnonzero(keep[i + 1:] & (S[i, i + 1:] > tau))
            if len(tail):
                j = tail + i + 1
                keep[j] = False
                dup_of[j] = ids[i]
                cos[j] = S[i, j]
        return pd.DataFrame({id_col: ids,
                             "cluster": np.full(n, int(g["cluster"].iloc[0]),
                                                dtype=np.int64),
                             "keep": keep, "dup_of": dup_of,
                             "cos_dup": np.round(cos, 6)})

    return tagged.groupby("cluster").map_groups(leader_scan,
                                                batch_format="pandas")


# -------------------------------------------------------------- LOF

def lof_scores(ds, k: int = 10, vec_col: str = "embedding",
               id_col: str = "vec_id", mode: str | None = None,
               exact_max_rows: int = 100_000, as_dataset: bool = False):
    """Local Outlier Factor (Breunig et al., SIGMOD 2000) over an
    embedding column — the density-ratio outlier scorer the reference's
    Clustering/IsolationForest family lacks: a point is anomalous when
    its local reachability density is low relative to its neighbours'
    (LOF ≈ 1 inlier, ≫ 1 outlier).

    Three-pass exact formulation, Euclidean distance:
      1. kNN: one matmul per batch against the broadcast reference
         matrix (|x|² − 2x·r + |r|², the kmeans_assign identity);
         neighbours are exactly k with (distance, id) tie-break — the
         deterministic variant of the paper's ≥k tie set. Emits the
         slim neighbour table (id, k neighbour ids, k distances,
         k-distance) which is MATERIALIZED (n×k scalars, spillable
         blocks) so passes 2-3 don't recompute the matmul.
      2. lrd(p) = 1 / mean(reach-dist) with reach-dist(p,o) =
         max(kdist(o), d(p,o)); needs only the broadcast kdist array.
      3. LOF(p) = mean(lrd(o)) / lrd(p); needs only the broadcast lrd
         array.

    Scale contract: exact LOF is all-pairs — the reference matrix is the
    broadcast small side (ray.put once, read per task) and must fit a
    worker, and the id+vector table is driver-materialized. This is the
    SMALL regime only; ``mode`` auto-dispatches (contamination_stats
    style) to ``lof_scores_ivf`` — the 100-TB shape: per-IVF-cell dense
    kernel, one shuffle, no broadcast matrix, no O(n) driver state —
    past ``exact_max_rows`` (``mode="exact"`` / ``"ivf"`` forces a
    regime; the ivf result is cell-confined, the standard IVF
    approximation contract). The per-point state that crosses passes in
    the exact regime is O(n) scalars (kdist, lrd), not vectors."""
    import ray.data as rd  # noqa: F401  (Dataset passthrough)

    if mode is None:
        mode = "exact" if ds.count() <= exact_max_rows else "ivf"
    if mode == "ivf":
        out = lof_scores_ivf(ds, k=k, vec_col=vec_col, id_col=id_col,
                             as_dataset=as_dataset)
        if as_dataset:
            return out.drop_columns(["cell"])  # keep the exact-path schema
        return (out.drop(columns=["cell"])
                   .sort_values(id_col).reset_index(drop=True))
    if mode != "exact":
        raise ValueError(f"unknown mode {mode!r}")

    ref = ds.select_columns([id_col, vec_col]).to_pandas()
    ref = ref.sort_values(id_col).reset_index(drop=True)
    R = _as_matrix(ref[vec_col].to_numpy())
    r_ids = ref[id_col].to_numpy(np.int64)
    r_norm2 = (R * R).sum(1)
    ref_ref = ray.put((r_ids, R, r_norm2))

    def knn(df: pd.DataFrame) -> pd.DataFrame:
        rids, Rm, rn2 = ray.get(ref_ref)
        X = _as_matrix(df[vec_col].to_numpy())
        ids = df[id_col].to_numpy(np.int64)
        d2 = np.maximum((X * X).sum(1)[:, None] - 2.0 * X @ Rm.T
                        + rn2[None, :], 0.0)
        out = {"p": ids}
        kk = min(k, len(rids) - 1)  # tiny-corpus guard
        n_ids, n_ds = [], []
        for i in range(len(ids)):
            row = d2[i].copy()
            row[rids == ids[i]] = np.inf  # exclude self
            # exact-k with (distance, id) tie-break: stable lexsort
            part = (np.argpartition(row, kk)[:kk + 1]
                    if kk < len(row) - 1 else np.arange(len(row)))
            order = np.lexsort((rids[part], row[part]))[:kk]
            sel = part[order]
            n_ids.append(rids[sel].astype(np.int64))
            n_ds.append(np.sqrt(row[sel]))
        out["n_ids"] = n_ids
        out["n_dist"] = n_ds
        out["kdist"] = [d[-1] for d in n_ds]
        return pd.DataFrame(out)

    nn = ds.map_batches(knn, batch_format="pandas").materialize()

    kd = nn.select_columns(["p", "kdist"]).to_pandas()
    kd_ref = ray.put(dict(zip(kd["p"].to_numpy(np.int64),
                              kd["kdist"].to_numpy(np.float64))))

    def lrd_pass(df: pd.DataFrame) -> pd.DataFrame:
        kdist = ray.get(kd_ref)
        out_p, out_lrd = [], []
        for p, nids, nds in zip(df["p"].to_numpy(np.int64),
                                df["n_ids"], df["n_dist"]):
            nids = np.asarray(nids, dtype=np.int64)
            nds = np.asarray(nds, dtype=np.float64)
            reach = np.maximum(np.array([kdist[int(o)] for o in nids]), nds)
            m = reach.mean()
            out_p.append(p)
            out_lrd.append(np.inf if m == 0.0 else 1.0 / m)
        return pd.DataFrame({"p": out_p, "lrd": out_lrd})

    lrd = nn.map_batches(lrd_pass, batch_format="pandas").to_pandas()
    lrd_ref = ray.put(dict(zip(lrd["p"].to_numpy(np.int64),
                               lrd["lrd"].to_numpy(np.float64))))

    def lof_pass(df: pd.DataFrame) -> pd.DataFrame:
        lrd_map = ray.get(lrd_ref)
        out_p, out_lof = [], []
        for p, nids in zip(df["p"].to_numpy(np.int64), df["n_ids"]):
            num = np.array([lrd_map[int(o)] for o in np.asarray(nids)])
            own = lrd_map[int(p)]
            # duplicate-point convention (paper §4): inf/inf = 1
            if np.isinf(own):
                v = 1.0 if np.isinf(num).all() else 0.0
            else:
                v = num.mean() / own
            out_p.append(p)
            out_lof.append(v)
        return pd.DataFrame({id_col: out_p, "lof": out_lof})

    res = nn.map_batches(lof_pass, batch_format="pandas")
    if as_dataset:
        return res  # bounded by the exact_max_rows contract anyway
    out = res.to_pandas()
    out[id_col] = out[id_col].astype("int64")
    return out.sort_values(id_col).reset_index(drop=True)


def _lof_dense(ids: np.ndarray, X: np.ndarray, k: int) -> np.ndarray:
    """In-memory exact LOF over one candidate set (the per-cell kernel of
    lof_scores_ivf): same exact-k (distance, id) tie-break and
    duplicate-point conventions as the distributed three-pass version."""
    n = len(ids)
    if n <= 1:
        return np.ones(n)
    kk = min(k, n - 1)
    n2 = (X * X).sum(1)
    D2 = np.maximum(n2[:, None] - 2.0 * X @ X.T + n2[None, :], 0.0)
    D = np.sqrt(D2)
    order = np.lexsort((np.broadcast_to(ids, (n, n)),
                        D + np.where(np.eye(n, dtype=bool), np.inf, 0.0)),
                       axis=1)
    neigh = order[:, :kk]                       # (n, kk) neighbour indices
    nd = np.take_along_axis(D, neigh, axis=1)   # neighbour distances
    kdist = nd[:, -1]
    reach = np.maximum(kdist[neigh], nd)
    mreach = reach.mean(axis=1)
    with np.errstate(divide="ignore"):
        lrd = np.where(mreach == 0.0, np.inf, 1.0 / mreach)
    nl = lrd[neigh]
    lof = np.empty(n)
    for i in range(n):
        if np.isinf(lrd[i]):
            lof[i] = 1.0 if np.isinf(nl[i]).all() else 0.0
        else:
            lof[i] = nl[i].mean() / lrd[i]
    return lof


def lof_scores_ivf(ds, k: int = 10, n_cells: int = 8, iters: int = 5,
                   seed: int = 0, vec_col: str = "embedding",
                   id_col: str = "vec_id", as_dataset: bool = False):
    """The SCALE path for LOF: restrict each point's candidate
    neighbours to its IVF cell (kmeans_fit codebook, the same coarse
    quantizer the ANN path uses) and run the exact dense LOF kernel per
    cell via groupby(cell).map_groups — cell-size-bounded quadratic
    work, ONE shuffle, no broadcast reference matrix, no O(n) driver
    state. Approximation error is confined to points whose true
    neighbourhood straddles a cell boundary (the standard IVF
    contract); parity on well-separated clusters and planted-outlier
    recovery are pinned in tests."""
    C = kmeans_fit(ds, k=n_cells, iters=iters, seed=seed, vec_col=vec_col,
                   id_col=id_col)
    C_ref = ray.put(C)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        Cc = ray.get(C_ref)
        X = _as_matrix(df[vec_col].to_numpy())
        d = ((X * X).sum(1)[:, None] - 2.0 * X @ Cc.T
             + (Cc * Cc).sum(1)[None, :])
        return pd.DataFrame({id_col: df[id_col].astype(np.int64),
                             "cell": np.argmin(d, 1).astype(np.int64),
                             vec_col: list(X)})

    def cell_lof(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        X = _as_matrix(g[vec_col].to_numpy()[order])
        return pd.DataFrame({id_col: ids,
                             "cell": np.full(len(ids),
                                             int(g["cell"].iloc[0]),
                                             dtype=np.int64),
                             "lof": _lof_dense(ids, X, k)})

    res = (ds.map_batches(tag, batch_format="pandas")
             .groupby("cell").map_groups(cell_lof, batch_format="pandas"))
    if as_dataset:
        return res  # corpus-scaled: the at-scale callers stream this
    out = res.to_pandas()
    out[id_col] = out[id_col].astype("int64")
    return out.sort_values(id_col).reset_index(drop=True)
