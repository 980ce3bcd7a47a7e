"""Similarity search, isolation forest, clustering, multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(300, 24)).astype(np.float64)
    return rd.from_pandas(pd.DataFrame({"vec_id": range(300), "embedding": list(vecs)})), vecs


def test_brute_force_topk_exact(emb_ds):
    from anomaly_detection_ray.stages import similarity as sim
    ds, vecs = emb_ds
    q = vecs[0]
    got = sim.brute_force_topk(ds, q, k=10, exclude_ids={0})
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ (q / np.linalg.norm(q))
    sims[0] = -np.inf
    want = np.argsort(-sims)[:10]
    np.testing.assert_array_equal(got["vec_id"].to_numpy(), want)
    np.testing.assert_allclose(got["cosine"].to_numpy(), sims[want], rtol=1e-9)


def test_ivf_topk_recall(emb_ds):
    from anomaly_detection_ray.stages import similarity as sim
    ds, vecs = emb_ds
    q = vecs[:5]
    code = sim.train_ivf_codebook(ds, n_cells=8, sample_rows=300)
    exact = sim.brute_force_topk(ds, q, k=10)
    approx = sim.ivf_topk(ds, q, code, k=10, nprobe=4)
    recalls = []
    for qi in range(5):
        e = set(exact.loc[exact["query_idx"] == qi, "vec_id"])
        a = set(approx.loc[approx["query_idx"] == qi, "vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5  # nprobe=4/8 cells on gaussian data


def test_iforest_model():
    from anomaly_detection_ray.stages.iforest import IsolationForestModel
    rng = np.random.default_rng(3)
    X = rng.normal(0, 1, size=(500, 2))
    outliers = np.array([[8.0, 8.0], [-9.0, 7.5], [10.0, -10.0]])
    m = IsolationForestModel(n_trees=100, max_samples=128, seed=1).fit(X)
    s_in = m.scores(X)
    s_out = m.scores(outliers)
    assert s_out.min() > np.quantile(s_in, 0.99)
    assert (m.predict(outliers) == -1).all()
    # 2-D gaussian tails do cross the 0.5 'auto' threshold; bulk must not
    assert (m.predict(X) == -1).mean() < 0.35


def test_iforest_warmup_then_ok_stream(ray_session):
    """Reference unit test shape (unit_tests.py:527-548): train on constant
    data, score a constant OK stream -> all OK; a far-off stream -> Error."""
    import ray.data as rd
    from anomaly_detection_ray.stages import iforest as ifo
    rng = np.random.default_rng(0)
    train = np.column_stack([np.ones(100) + rng.normal(0, 0.05, 100)])
    model = ifo.IsolationForestModel(n_trees=50, max_samples=64, seed=2).fit(train)
    df = pd.DataFrame({"v": [1.0] * 15 + [25.0] * 5})
    out = ifo.score_stage(rd.from_pandas(df), model, ["v"], concurrency=2).to_pandas()
    assert (out["if_code"][:15] == 1).all()
    assert (out["if_code"][15:] == -1).all()


def test_clustering_golden(ray_session):
    """Clustering golden vectors (unit_tests.py:819-864): eps=0.98,
    min_samples=3, treshold=1.5."""
    import ray.data as rd
    from anomaly_detection_ray.stages.iforest import (ClusteringScore,
                                                      DBSCANCoreModel)
    train = np.array([
        [10.3, 10.44], [9.8, 11.3], [15.433, 16.4], [0, 0.2], [0.2, 0.234],
        [0.3, 0.12], [0.11, 0.0456], [0.01, 0.07996], [1.3, 0.211], [1, 1.65],
        [1.2, 1.22], [1.332, 1.03], [1.222, 1.01], [1.554, 1.44]])
    model = DBSCANCoreModel(eps=0.98, min_samples=3, treshold=1.5).fit(train)
    ok_pts = np.array([[1.0, 0.9], [0.4, 0.0], [2.554, 2.44]])
    err_pts = np.array([[3.054, 2.96], [10, 11], [-5, -1]])
    assert (model.predict_codes(ok_pts) == 1).all()
    assert (model.predict_codes(err_pts) == -1).all()
    import ray
    df = pd.DataFrame({"x": np.r_[ok_pts[:, 0], err_pts[:, 0]],
                       "y": np.r_[ok_pts[:, 1], err_pts[:, 1]]})
    out = (rd.from_pandas(df)
           .map_batches(ClusteringScore,
                        fn_constructor_kwargs={"model_ref": ray.put(model),
                                               "feature_cols": ["x", "y"]},
                        batch_format="pyarrow", concurrency=1)
           .to_pandas())
    assert list(out["cl_code"]) == [1, 1, 1, -1, -1, -1]


def test_audio_features_stage(ray_session):
    import ray.data as rd
    from anomaly_detection_ray import audio, synth
    from anomaly_detection_ray.stages.multimodal import audio_features
    t = synth.generate_table(5, 40, P=4)
    out = audio_features(rd.from_arrow(t), concurrency=2).to_pandas()
    ok = out[out["rms"].notna()]
    assert len(ok) > 30
    assert ((ok["rms"] > 0.1) & (ok["rms"] < 0.6)).mean() > 0.9


def test_image_video_stubs(ray_session):
    import ray.data as rd
    import pyarrow as pa
    from anomaly_detection_ray.stages.multimodal import ImageDecode, VideoFrameSample
    t = pa.table({"clip_id": ["a", "b"], "image": [b"\x89PNG123456", b"GIF87a123"],
                  "video": [b"\x00" * 100, b"\x01" * 50]})
    ds = rd.from_arrow(t)
    imgs = ds.map_batches(ImageDecode, fn_constructor_kwargs={
        "bytes_col": "image", "fake": "deterministic"},
        batch_format="pyarrow", concurrency=1).to_pandas()
    assert (imgs["channels"] == 3).all() and (imgs["height"] >= 64).all()
    with pytest.raises(NotImplementedError):
        ImageDecode(bytes_col="image", fake=None)(t)
    frames = ds.map_batches(VideoFrameSample, fn_constructor_kwargs={
        "bytes_col": "video", "n_frames": 4, "fake": "deterministic"},
        batch_format="pyarrow", concurrency=1).to_pandas()
    assert len(frames) == 8
    assert set(frames["frame_idx"]) == {0, 1, 2, 3}
    with pytest.raises(NotImplementedError, match="video"):
        VideoFrameSample(bytes_col="video")(t)


def test_pq_roundtrip_and_recall(emb_ds):
    """PQ codebooks/encode/ADC: coded scan recall, then exact re-rank
    recovers the brute-force result (recall 1.0 on this corpus)."""
    from anomaly_detection_ray.stages import similarity as sim
    ds, vecs = emb_ds
    q = vecs[:5]
    books = sim.train_pq_codebooks(ds, m=8, ks=64, sample_rows=300)
    assert books.shape == (8, 64, 3)  # 24-d -> 8 subspaces of 3
    codes = sim.pq_encode(ds, books)
    cdf = codes.to_pandas()
    assert len(cdf) == 300
    assert all(len(c) == 8 for c in cdf["code"])
    exact = sim.brute_force_topk(ds, q, k=10)
    approx = sim.pq_topk(codes, q, books, k=10)
    rec = np.mean([
        len(set(exact.loc[exact.query_idx == i, "vec_id"]) &
            set(approx.loc[approx.query_idx == i, "vec_id"])) / 10
        for i in range(5)])
    assert rec >= 0.4  # coded-only scan on gaussian data
    rr = sim.pq_topk_rerank(ds, codes, q, books, k=10, rerank_factor=4)
    rec_rr = np.mean([
        len(set(exact.loc[exact.query_idx == i, "vec_id"]) &
            set(rr.loc[rr.query_idx == i, "vec_id"])) / 10
        for i in range(5)])
    assert rec_rr >= 0.9
    # re-ranked cosines are EXACT for the rows it returns
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    for _, r in rr[rr.query_idx == 0].iterrows():
        want = float(norm[int(r["vec_id"])] @ norm[0])
        assert abs(r["cosine"] - want) < 1e-9


def test_kmeans_full_recovers_separated_clusters(ray_session):
    """Distributed Lloyd's on 3 well-separated Gaussian blobs: every blob
    maps to one distinct cluster id, and total inertia is near the
    generative optimum (no degenerate/empty centroids among the used k)."""
    import ray.data as rd

    from anomaly_detection_ray.stages import similarity as sim

    r = np.random.default_rng(4)
    centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    X = np.vstack([c + r.normal(0, 0.3, size=(120, 2)) for c in centers])
    ids = np.arange(len(X))
    df = pd.DataFrame({"vec_id": ids, "embedding": list(X)})
    ds = rd.from_pandas(df).repartition(5)
    C = sim.kmeans_fit(ds, k=3, iters=6, seed=1)
    out = (sim.kmeans_assign(ds, C).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    lab = out["cluster"].to_numpy()
    # each blob pure, blobs pairwise distinct
    blobs = [lab[i * 120:(i + 1) * 120] for i in range(3)]
    assert all(len(set(b)) == 1 for b in blobs)
    assert len({b[0] for b in blobs}) == 3
    assert out["dist"].mean() < 1.0  # ~E||N(0,0.3 I2)|| ≈ 0.38


def test_semantic_dedup_drops_planted_near_dups(ray_session):
    """SemDeDup leader scan: planted near-copies (cosine ~0.999) are
    dropped onto their lowest-id source; well-separated singletons are
    kept; verdicts match a sequential whole-corpus reference and are
    invariant to partitioning."""
    import ray.data as rd

    from anomaly_detection_ray.stages import similarity as sim

    r = np.random.default_rng(7)
    base = r.normal(size=(60, 16))
    rows = [{"vec_id": i, "embedding": base[i]} for i in range(60)]
    # plant 3 near-copies of sources 5, 20, 20 at big ids
    for j, src in zip((1000, 1001, 1002), (5, 20, 20)):
        rows.append({"vec_id": j,
                     "embedding": base[src] + r.normal(0, 0.01, 16)})
    df = pd.DataFrame(rows)

    def run(nparts):
        ds = rd.from_pandas(df).repartition(nparts)
        return (sim.semantic_dedup(ds, k=4, tau=0.95, iters=4, seed=0)
                .to_pandas().sort_values("vec_id").reset_index(drop=True))

    out = run(3)
    assert len(out) == 63
    planted = out[out["vec_id"] >= 1000]
    assert not planted["keep"].any()
    assert planted["dup_of"].tolist() == [5, 20, 20]
    # gaussian originals are mutually far -> all kept
    assert out[out["vec_id"] < 1000]["keep"].all()

    # sequential whole-corpus reference: same clusters, same greedy scan
    C = sim.kmeans_fit(rd.from_pandas(df), k=4, iters=4, seed=0)
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    d = ((X * X).sum(1)[:, None] - 2 * X @ C.T + (C * C).sum(1)[None, :])
    clus = np.argmin(d, 1)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    ids = df["vec_id"].to_numpy()
    keep_ref = {}
    dup_ref = {}
    for c in set(clus):
        member = np.flatnonzero(clus == c)
        member = member[np.argsort(ids[member])]
        kept: list[int] = []
        for m in member:
            hit = next((kk for kk in kept
                        if float(Xn[m] @ Xn[kk]) > 0.95), None)
            keep_ref[ids[m]] = hit is None
            dup_ref[ids[m]] = ids[hit] if hit is not None else -1
            if hit is None:
                kept.append(m)
    assert out.set_index("vec_id")["keep"].to_dict() == keep_ref
    assert out.set_index("vec_id")["dup_of"].to_dict() == dup_ref

    # partitioning invariance
    out8 = run(8)
    pd.testing.assert_frame_equal(out, out8)


def _lof_reference(X, k):
    """Definitional O(n^2) LOF (Breunig 2000) with the same exact-k
    (distance, id) tie-break as the distributed kernel — an independent
    sequential code path."""
    n = len(X)
    D = np.sqrt(np.maximum(
        ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1), 0.0))
    neigh = []
    kdist = np.zeros(n)
    for i in range(n):
        order = sorted((D[i, j], j) for j in range(n) if j != i)[:k]
        neigh.append([j for _, j in order])
        kdist[i] = order[-1][0]
    lrd = np.zeros(n)
    for i in range(n):
        reach = [max(kdist[j], D[i, j]) for j in neigh[i]]
        m = float(np.mean(reach))
        lrd[i] = np.inf if m == 0 else 1.0 / m
    lof = np.zeros(n)
    for i in range(n):
        if np.isinf(lrd[i]):
            lof[i] = 1.0 if all(np.isinf(lrd[j]) for j in neigh[i]) else 0.0
        else:
            lof[i] = float(np.mean([lrd[j] for j in neigh[i]])) / lrd[i]
    return lof


def test_lof_matches_sequential_reference(ray_session):
    import ray.data as rd

    from anomaly_detection_ray.stages.similarity import lof_scores

    rng = np.random.default_rng(11)
    X = rng.normal(size=(80, 6))
    df = pd.DataFrame({"vec_id": np.arange(80, dtype=np.int64),
                       "embedding": list(X)})
    got = lof_scores(rd.from_pandas(df).repartition(5), k=7)
    want = _lof_reference(X, 7)
    np.testing.assert_allclose(got["lof"].to_numpy(), want,
                               rtol=1e-9, atol=1e-9)


def test_lof_flags_planted_outlier(ray_session):
    """A dense unit-variance cluster plus one far point: the far point
    must carry the max LOF, and cluster points must sit near 1."""
    import ray.data as rd

    from anomaly_detection_ray.stages.similarity import lof_scores

    rng = np.random.default_rng(3)
    X = np.vstack([rng.normal(size=(60, 4)), [[25.0, 25.0, 25.0, 25.0]]])
    df = pd.DataFrame({"vec_id": np.arange(61, dtype=np.int64),
                       "embedding": list(X)})
    got = lof_scores(rd.from_pandas(df).repartition(4), k=10)
    assert int(got.loc[got["lof"].idxmax(), "vec_id"]) == 60
    inliers = got[got["vec_id"] < 60]["lof"]
    assert inliers.max() < got["lof"].max() / 3


def test_mahalanobis_flags_correlated_outlier(ray_session):
    """A point far along the LOW-variance direction of a correlated
    Gaussian must out-score a same-Euclidean-distance point along the
    high-variance direction — the property Euclidean scoring lacks."""
    import os
    import tempfile

    from anomaly_detection_ray.pipelines.queries import (
        q_mahalanobis_embeddings)

    rng = np.random.default_rng(2)
    # anisotropic cloud: std 5 along x, std 0.3 along y
    X = rng.normal(size=(300, 2)) * np.array([5.0, 0.3])
    X = np.vstack([X, [8.0, 0.0], [0.0, 8.0]])  # ids 300 (easy), 301 (hard)
    df = pd.DataFrame({"vec_id": np.arange(302, dtype=np.int64),
                       "embedding": list(X)})
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "embeddings.parquet"))
        got = q_mahalanobis_embeddings(d).to_pandas()
    # streamed Dataset: block order is not row order — canonical sort is
    # consumer-side, exactly like the gate comparer
    s = got.set_index("vec_id")["maha_sq"].sort_index()
    assert s[301] > 20 * s[300]          # low-variance escape dominates
    assert s[301] == s.max()
    # parity with the closed form on the same data
    mu = X.mean(0)
    cov = np.cov(X.T)
    want = np.einsum("ij,jk,ik->i", X - mu, np.linalg.inv(cov), X - mu)
    np.testing.assert_allclose(s.to_numpy(), want, rtol=1e-4, atol=1e-6)


def test_lof_ivf_matches_exact_on_separated_clusters(ray_session):
    """When clusters are far apart (cells == clusters), per-cell LOF is
    exact: every true neighbourhood lives inside one cell."""
    import ray.data as rd

    from anomaly_detection_ray.stages.similarity import (lof_scores,
                                                         lof_scores_ivf)

    rng = np.random.default_rng(7)
    blobs = [rng.normal(loc=c, scale=0.3, size=(60, 5))
             for c in (0.0, 30.0, -30.0)]
    X = np.vstack(blobs)
    df = pd.DataFrame({"vec_id": np.arange(len(X), dtype=np.int64),
                       "embedding": list(X)})
    ds = rd.from_pandas(df).repartition(4)
    exact = lof_scores(ds, k=8).set_index("vec_id")["lof"]
    approx = (lof_scores_ivf(ds, k=8, n_cells=3, iters=8)
              .set_index("vec_id")["lof"])
    np.testing.assert_allclose(approx.to_numpy(), exact.to_numpy(),
                               rtol=1e-9, atol=1e-9)


def test_lof_ivf_flags_planted_outlier(ray_session):
    import ray.data as rd

    from anomaly_detection_ray.stages.similarity import lof_scores_ivf

    rng = np.random.default_rng(13)
    X = np.vstack([rng.normal(size=(80, 4)),
                   rng.normal(loc=20.0, size=(80, 4)),
                   [[10.0, 10.0, 10.0, 10.0]]])  # id 160: between clusters
    df = pd.DataFrame({"vec_id": np.arange(161, dtype=np.int64),
                       "embedding": list(X)})
    got = lof_scores_ivf(rd.from_pandas(df).repartition(3), k=10,
                         n_cells=2)
    assert int(got.loc[got["lof"].idxmax(), "vec_id"]) == 160


def test_pca_variance_spectrum(ray_session):
    """PCA spectrum audit: ratios sum to 1, cumulative is monotone to 1,
    the synth generator's near-isotropic cloud shows high effective
    dimensionality, and a deliberately collapsed (rank-deficient) cloud
    shows a tiny one."""
    import __ray_entry__ as e
    out = e.queries()["pca_variance_embeddings"]("/root/testdata/sf0.001")
    assert len(out) == 64
    assert abs(out["var_ratio"].sum() - 1.0) < 1e-3
    assert (np.diff(out["cum_ratio"]) >= -1e-9).all()
    assert abs(out["cum_ratio"].iloc[-1] - 1.0) < 1e-3
    assert out["eff_dim"].iloc[0] > 30.0       # near-isotropic synth
    # collapsed cloud: rank-2 data -> eff_dim ~ 2, top-2 carry ~all var
    rng = np.random.default_rng(0)
    Z = rng.standard_normal((500, 2)) @ rng.standard_normal((2, 64))
    lam = np.maximum(np.linalg.eigvalsh(np.cov(Z.T))[::-1], 0.0)
    eff = lam.sum() ** 2 / (lam ** 2).sum()
    assert eff < 2.5


def test_pca_projection_matches_spectrum(ray_session):
    """The distributed projection's per-component variance must equal the
    spectrum audit's top eigenvalues (same folded covariance, W is an
    orthonormal eigenbasis), and the components must be uncorrelated."""
    import __ray_entry__ as e
    sf = "/root/testdata/sf0.001"
    proj = e.queries()["pca_project_embeddings"](sf).to_pandas()
    spec = e.queries()["pca_variance_embeddings"](sf)
    assert len(proj) == 500
    Z = proj[[f"pc{j}" for j in range(8)]].to_numpy()
    var = Z.var(axis=0, ddof=1)
    lam = spec["eigenvalue"].to_numpy()[:8]
    assert np.allclose(var, lam, rtol=5e-3)
    c = np.corrcoef(Z.T)
    off = c[~np.eye(8, dtype=bool)]
    assert np.abs(off).max() < 0.05


def test_lof_auto_dispatches_to_ivf(ray_session):
    """lof_scores mode=auto: exact below exact_max_rows, IVF-cell kernel
    above (contamination_stats-style dispatch). The dispatched result
    keeps the exact-path schema (no cell column) and equals a direct
    lof_scores_ivf call on a cell-separable corpus."""
    import ray.data as rd

    from anomaly_detection_ray.stages.similarity import (lof_scores,
                                                         lof_scores_ivf)

    rng = np.random.default_rng(5)
    X = np.vstack([rng.normal(loc=c, scale=0.3, size=(40, 4))
                   for c in (0.0, 30.0)])
    df = pd.DataFrame({"vec_id": np.arange(len(X), dtype=np.int64),
                       "embedding": list(X)})
    ds = rd.from_pandas(df).repartition(3)

    # forced dispatch: threshold 0 -> every input routes to IVF
    got = lof_scores(ds, k=8, exact_max_rows=0)
    assert list(got.columns) == ["vec_id", "lof"]
    want = (lof_scores_ivf(ds, k=8).drop(columns=["cell"])
            .sort_values("vec_id").reset_index(drop=True))
    np.testing.assert_allclose(got["lof"].to_numpy(),
                               want["lof"].to_numpy(), rtol=1e-12)

    # and the as_dataset form streams
    res = lof_scores(ds, k=8, exact_max_rows=0, as_dataset=True)
    assert isinstance(res, rd.Dataset)
    assert sorted(res.schema().names) == ["lof", "vec_id"]
