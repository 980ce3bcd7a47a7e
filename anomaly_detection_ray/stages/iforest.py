"""Isolation forest — from scratch (no sklearn in this environment),
implementing the published iForest algorithm (Liu, Ting & Zhou 2008):
random split trees over subsamples, average path length score
``s = 2^(-E[h(x)]/c(psi))``, anomaly iff ``s > 0.5`` (the 'auto'
contamination convention the reference relies on via sklearn predict ±1,
/root/reference/src/algorithms/isolation_forest.py:138-147).

Ray mapping (SURVEY.md §2.4): training is a driver-side fit over a sample
(or a training Dataset pulled once); scoring is an actor-pool
``map_batches`` stage — the model is built once per actor in ``__init__``
from a broadcast object-store ref, and ``predict`` is vectorized over the
whole batch (trees evaluated breadth-first over index arrays, no per-row
Python recursion).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from .sizing import pool_size

from ..functions.grading import ERROR_CODE, OK_CODE, UNDEFINED_CODE


def _c_factor(n: float) -> float:
    """Average unsuccessful-BST path length c(n)."""
    if n <= 1:
        return 0.0
    if n == 2:
        return 1.0
    H = np.log(n - 1) + 0.5772156649
    return 2.0 * H - 2.0 * (n - 1) / n


class IsolationForestModel:
    """Array-encoded forest: each tree is (feature[], threshold[], left[],
    right[], size[]) with -1 children for leaves — picklable, broadcastable,
    vectorized predict."""

    def __init__(self, n_trees=100, max_samples=256, max_features=None, seed=0):
        self.n_trees = n_trees
        self.max_samples = max_samples
        self.max_features = max_features
        self.seed = seed
        self.trees: list[dict] = []
        self.psi = 0

    def fit(self, X: np.ndarray) -> "IsolationForestModel":
        X = np.asarray(X, dtype=np.float64)
        if X.ndim == 1:
            X = X[:, None]
        rng = np.random.default_rng(self.seed)
        n, d = X.shape
        self.psi = min(self.max_samples, n)
        height_limit = int(np.ceil(np.log2(max(self.psi, 2))))
        self.trees = []
        for _ in range(self.n_trees):
            idx = rng.choice(n, size=self.psi, replace=False)
            self.trees.append(self._build_tree(X[idx], rng, height_limit))
        return self

    def _build_tree(self, X: np.ndarray, rng, height_limit: int) -> dict:
        feat, thresh, left, right, size = [], [], [], [], []

        def grow(rows: np.ndarray, depth: int) -> int:
            node = len(feat)
            feat.append(-1)
            thresh.append(0.0)
            left.append(-1)
            right.append(-1)
            size.append(len(rows))
            if depth >= height_limit or len(rows) <= 1:
                return node
            sub = X[rows]
            spans = sub.max(axis=0) - sub.min(axis=0)
            nz = np.nonzero(spans > 0)[0]
            if len(nz) == 0:
                return node
            f = int(rng.choice(nz))
            lo, hi = sub[:, f].min(), sub[:, f].max()
            t = rng.uniform(lo, hi)
            m = sub[:, f] < t
            if not m.any() or m.all():
                return node
            feat[node] = f
            thresh[node] = t
            left[node] = grow(rows[m], depth + 1)
            right[node] = grow(rows[~m], depth + 1)
            return node

        grow(np.arange(len(X)), 0)
        return {"feat": np.array(feat, dtype=np.int32),
                "thresh": np.array(thresh),
                "left": np.array(left, dtype=np.int32),
                "right": np.array(right, dtype=np.int32),
                "size": np.array(size, dtype=np.int64)}

    def path_lengths(self, X: np.ndarray) -> np.ndarray:
        """Mean path length per row, vectorized per tree (iterative descent
        over index arrays — one numpy step per tree level)."""
        X = np.asarray(X, dtype=np.float64)
        if X.ndim == 1:
            X = X[:, None]
        total = np.zeros(len(X))
        for tr in self.trees:
            node = np.zeros(len(X), dtype=np.int32)
            depth = np.zeros(len(X))
            active = tr["feat"][node] >= 0
            while active.any():
                f = tr["feat"][node[active]]
                goes_left = X[active, f] < tr["thresh"][node[active]]
                nxt = np.where(goes_left, tr["left"][node[active]],
                               tr["right"][node[active]])
                node[active] = nxt
                depth[active] += 1
                active = tr["feat"][node] >= 0
            leaf_sizes = tr["size"][node]
            total += depth + np.array([_c_factor(s) for s in leaf_sizes])
        return total / max(len(self.trees), 1)

    def scores(self, X: np.ndarray) -> np.ndarray:
        return 2.0 ** (-self.path_lengths(X) / max(_c_factor(self.psi), 1e-12))

    def predict(self, X: np.ndarray) -> np.ndarray:
        """+1 inlier / -1 outlier, score threshold 0.5."""
        return np.where(self.scores(X) > 0.5, -1, 1)


def iforest_score_table(t: pa.Table, model: IsolationForestModel,
                        feature_cols: list[str],
                        prefix: str = "if") -> pa.Table:
    """Pure table scorer — appends <prefix>_code/_status/_score (Error on
    outlier, isolation_forest.py:141-147). Shared by the actor-pool stage
    and the in-process serving warm chain so scoring cannot drift."""
    X = np.column_stack([
        pa.compute.cast(t[c], pa.float64()).to_numpy(zero_copy_only=False)
        for c in feature_cols])
    valid = ~np.isnan(X).any(axis=1)
    code = np.full(t.num_rows, UNDEFINED_CODE, dtype=np.int8)
    status = np.full(t.num_rows, "Undefined", dtype=object)
    score = np.full(t.num_rows, np.nan)
    if valid.any():
        s = model.scores(X[valid])
        pred_err = s > 0.5
        code[valid] = np.where(pred_err, ERROR_CODE, OK_CODE)
        sv = status[valid]
        sv[pred_err] = "Error: outlier detected"
        sv[~pred_err] = "OK"
        status[valid] = sv
        score[valid] = s
    return (t.append_column(f"{prefix}_code", pa.array(code, type=pa.int8()))
             .append_column(f"{prefix}_status", pa.array(status, type=pa.string()))
             .append_column(f"{prefix}_score", pa.array(score, type=pa.float64())))


class IForestScore:
    """Actor-pool scoring stage: model deserialized ONCE per actor from the
    broadcast ref; per batch one vectorized predict."""

    def __init__(self, model_ref, feature_cols: list[str]):
        self.model: IsolationForestModel = ray.get(model_ref)
        self.feature_cols = feature_cols

    def __call__(self, t: pa.Table) -> pa.Table:
        return iforest_score_table(t, self.model, self.feature_cols)


def fit_from_dataset(ds, feature_cols: list[str], sample_rows: int = 4096,
                     **kwargs) -> IsolationForestModel:
    """Train from a Dataset sample (the 'retrain pass' — a separate bounded
    read, mirroring the reference's samples_for_retrain window)."""
    df = ds.limit(sample_rows).to_pandas()
    X = df[feature_cols].to_numpy(dtype=np.float64)
    X = X[~np.isnan(X).any(axis=1)]
    return IsolationForestModel(**kwargs).fit(X)


def score_stage(ds, model: IsolationForestModel, feature_cols: list[str],
                concurrency: int = 4, batch_size: int = 8192):
    model_ref = ray.put(model)
    return ds.map_batches(IForestScore,
                          fn_constructor_kwargs={"model_ref": model_ref,
                                                 "feature_cols": feature_cols},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=pool_size(concurrency), num_cpus=1)


# ------------------------------------------------------------------- PCA

class PCAModel:
    """PCA from scratch (numpy eigendecomposition of the covariance matrix;
    no sklearn in env). fit = training pass; transform = centered matmul.
    Re-expresses /root/reference/src/algorithms/pca.py:22-257: PCA projection
    to N_components, then isolation forest in the projected space."""

    def __init__(self, n_components: int):
        self.n_components = n_components
        self.mean_: np.ndarray | None = None
        self.components_: np.ndarray | None = None  # (d, n_components)
        self.explained_variance_: np.ndarray | None = None

    def fit(self, X: np.ndarray) -> "PCAModel":
        X = np.asarray(X, dtype=np.float64)
        self.mean_ = X.mean(axis=0)
        Xc = X - self.mean_
        cov = (Xc.T @ Xc) / max(len(X) - 1, 1)
        evals, evecs = np.linalg.eigh(cov)
        order = np.argsort(evals)[::-1][: self.n_components]
        self.explained_variance_ = evals[order]
        # deterministic sign: largest-|.| element of each component positive
        comps = evecs[:, order]
        signs = np.sign(comps[np.abs(comps).argmax(axis=0),
                              np.arange(comps.shape[1])])
        self.components_ = comps * np.where(signs == 0, 1.0, signs)
        return self

    def transform(self, X: np.ndarray) -> np.ndarray:
        return (np.asarray(X, dtype=np.float64) - self.mean_) @ self.components_


def pca_iforest_score_table(t: pa.Table, pca: "PCAModel",
                            model: IsolationForestModel,
                            feature_cols: list[str],
                            prefix: str = "pca") -> pa.Table:
    """Pure table scorer — PCA projection then iForest score (pca.py
    semantics), appending <prefix>_code/_status/_score. Shared by the
    actor-pool stage and the serving warm chain."""
    X = np.column_stack([
        pa.compute.cast(t[c], pa.float64()).to_numpy(zero_copy_only=False)
        for c in feature_cols])
    valid = ~np.isnan(X).any(axis=1)
    code = np.full(t.num_rows, UNDEFINED_CODE, dtype=np.int8)
    status = np.full(t.num_rows, "Undefined", dtype=object)
    score = np.full(t.num_rows, np.nan)
    if valid.any():
        s = model.scores(pca.transform(X[valid]))
        pred_err = s > 0.5
        code[valid] = np.where(pred_err, ERROR_CODE, OK_CODE)
        sv = status[valid]
        sv[pred_err] = "Error: outlier detected"
        sv[~pred_err] = "OK"
        status[valid] = sv
        score[valid] = s
    return (t.append_column(f"{prefix}_code", pa.array(code, type=pa.int8()))
             .append_column(f"{prefix}_status", pa.array(status, type=pa.string()))
             .append_column(f"{prefix}_score", pa.array(score, type=pa.float64())))


class PCAIForestScore:
    """Actor-pool stage: project with a broadcast PCAModel then score with a
    broadcast IsolationForestModel."""

    def __init__(self, pca_ref, model_ref, feature_cols: list[str]):
        self.pca: PCAModel = ray.get(pca_ref)
        self.model: IsolationForestModel = ray.get(model_ref)
        self.feature_cols = feature_cols

    def __call__(self, t: pa.Table) -> pa.Table:
        return pca_iforest_score_table(t, self.pca, self.model,
                                       self.feature_cols)


def fit_pca_iforest(X: np.ndarray, n_components: int,
                    **if_kwargs) -> tuple[PCAModel, IsolationForestModel]:
    pca = PCAModel(n_components).fit(X)
    forest = IsolationForestModel(**if_kwargs).fit(pca.transform(X))
    return pca, forest


def pca_score_stage(ds, pca: PCAModel, model: IsolationForestModel,
                    feature_cols: list[str], concurrency: int = 4,
                    batch_size: int = 8192):
    pca_ref, model_ref = ray.put(pca), ray.put(model)
    return ds.map_batches(PCAIForestScore,
                          fn_constructor_kwargs={"pca_ref": pca_ref,
                                                 "model_ref": model_ref,
                                                 "feature_cols": feature_cols},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=pool_size(concurrency), num_cpus=1)


# ------------------------------------------------------------- clustering

class DBSCANCoreModel:
    """DBSCAN core-sample extraction (from scratch): a training point is a
    core sample iff >= min_samples points (incl. itself) lie within eps.
    Scoring: anomalous iff euclidean distance to EVERY core sample exceeds
    ``treshold`` (clustering.py:120-140, including the config's spelling)."""

    def __init__(self, eps: float, min_samples: int, treshold: float):
        self.eps, self.min_samples, self.treshold = eps, min_samples, treshold
        self.core: np.ndarray | None = None

    def fit(self, X: np.ndarray) -> "DBSCANCoreModel":
        X = np.asarray(X, dtype=np.float64)
        d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2)
        neighbors = (d2 <= self.eps**2).sum(axis=1)
        self.core = X[neighbors >= self.min_samples]
        return self

    def predict_codes(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        if self.core is None or len(self.core) == 0:
            return np.full(len(X), ERROR_CODE, dtype=np.int8)
        d2 = ((X[:, None, :] - self.core[None, :, :]) ** 2).sum(axis=2)
        near = (d2 < self.treshold**2).any(axis=1)
        return np.where(near, OK_CODE, ERROR_CODE).astype(np.int8)


def clustering_score_table(t: pa.Table, model: "DBSCANCoreModel",
                           feature_cols: list[str],
                           prefix: str = "cl") -> pa.Table:
    """Pure table scorer for DBSCANCoreModel, appending
    <prefix>_code/_status. Shared by the actor-pool stage and the serving
    warm chain."""
    X = np.column_stack([
        pa.compute.cast(t[c], pa.float64()).to_numpy(zero_copy_only=False)
        for c in feature_cols])
    valid = ~np.isnan(X).any(axis=1)
    code = np.full(t.num_rows, UNDEFINED_CODE, dtype=np.int8)
    if valid.any():
        code[valid] = model.predict_codes(X[valid])
    status = np.where(code == ERROR_CODE, "Error: outlier detected",
                      np.where(code == UNDEFINED_CODE, "Undefined", "OK")).astype(object)
    return (t.append_column(f"{prefix}_code", pa.array(code, type=pa.int8()))
             .append_column(f"{prefix}_status", pa.array(status, type=pa.string())))


class ClusteringScore:
    """Actor-pool scoring stage for DBSCANCoreModel (cl_code/cl_status)."""

    def __init__(self, model_ref, feature_cols: list[str]):
        self.model: DBSCANCoreModel = ray.get(model_ref)
        self.feature_cols = feature_cols

    def __call__(self, t: pa.Table) -> pa.Table:
        return clustering_score_table(t, self.model, self.feature_cols)
