"""Autoencoder reconstruction-error scorer with adaptive threshold.

Re-expresses the reference's 'GAN' scorer (/root/reference/src/algorithms/
gan.py — actually a dense autoencoder) with the SAME scoring mechanics but a
LINEAR autoencoder (PCA encode/decode, stages/iforest.py PCAModel) instead of
Keras, which is deliberately outside the dependency set:

- input z-normalized by train avg/(max-min)   (gan.py:124-126)
- feature vector = current + N_shifts lags    (gan.py:151, train :318-325)
- anomaly score = reconstruction MSE          (gan.py:154)
- adaptive threshold = K × exp-weighted mean (weights exp(linspace(0,1,W)),
  gan.py:51) of the trailing len_window errors INCLUDING the current one
  (gan.py:156-162); Error iff error >= threshold

Two codecs share those mechanics:
- ``LinearAutoencoder`` — PCA encode/decode (fast, convex, closed form)
- ``MLPAutoencoder`` — from-scratch numpy re-implementation of the
  reference's Keras net (gan.py:296-325): Dense 10-linear → 10-tanh →
  10-tanh → latent-tanh encoder, 10-tanh → 10-relu → 10-relu → D-linear
  decoder, Adam(lr=1e-3, beta1=0.95) on MSE, 100 epochs × batch 100 —
  seeded, so scoring is deterministic.

Ray mapping: fit is a driver-side pass over a training sample; scoring is
per-series ordered (the threshold is a trailing recurrence) — shift-stacking
and MSE are vectorized, only the windowed weighted average runs per step via
a stride-windowed matmul.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from numpy.lib.stride_tricks import sliding_window_view

from ..functions.grading import ERROR_CODE, OK_CODE, UNDEFINED_CODE
from .iforest import PCAModel


class LinearAutoencoder:
    """min/max/avg normalization + PCA encode/decode over shift-stacked
    vectors. fit() is the training pass; reconstruction_errors() vectorized."""

    def __init__(self, N_shifts: int, N_latent: int):
        self.N_shifts, self.N_latent = N_shifts, N_latent
        self.avg = 0.0
        self.span = 1.0
        self.pca: PCAModel | None = None

    @staticmethod
    def _stack(values: np.ndarray, n_shifts: int) -> np.ndarray:
        if len(values) <= n_shifts:
            return np.empty((0, n_shifts + 1))
        return sliding_window_view(values, n_shifts + 1)

    def fit(self, values: np.ndarray) -> "LinearAutoencoder":
        v = np.asarray(values, dtype=np.float64)
        self.avg = float(np.nanmean(v))
        span = float(np.nanmax(v) - np.nanmin(v))
        self.span = span if span != 0 else 1.0
        X = self._stack((v - self.avg) / self.span, self.N_shifts)
        self.pca = PCAModel(min(self.N_latent, X.shape[1])).fit(X)
        return self

    def reconstruction_errors(self, values: np.ndarray) -> np.ndarray:
        """Per-record MSE; first N_shifts records NaN (warm-up, the
        reference's feature-construction Undefined run)."""
        v = (np.asarray(values, dtype=np.float64) - self.avg) / self.span
        X = self._stack(v, self.N_shifts)
        out = np.full(len(v), np.nan)
        if len(X):
            Z = self.pca.transform(X)
            R = Z @ self.pca.components_.T + self.pca.mean_
            out[self.N_shifts:] = ((R - X) ** 2).mean(axis=1)
        return out


class MLPAutoencoder:
    """Numpy dense autoencoder with the reference's exact layer stack
    (gan.py:296-325), trained by seeded minibatch Adam on MSE. Same
    normalization as the reference train path: avg=(min+max)/2, span=max-min
    (gan.py:262-270)."""

    HIDDEN = 10  # gan.py:298 hidden_dim

    def __init__(self, N_shifts: int, N_latent: int, epochs: int = 100,
                 batch: int = 100, lr: float = 1e-3, seed: int = 0):
        self.N_shifts, self.N_latent = N_shifts, N_latent
        self.epochs, self.batch, self.lr, self.seed = epochs, batch, lr, seed
        self.avg, self.span = 0.0, 1.0
        self.W: list[np.ndarray] = []
        self.b: list[np.ndarray] = []
        self.acts: list[str] = []

    # ------------------------------------------------------------ network
    def _init_net(self, d_in: int):
        h, lat = self.HIDDEN, self.N_latent
        dims = [d_in, h, h, h, lat, h, h, h, d_in]
        # encoder: linear, tanh, tanh, tanh(latent); decoder: tanh, relu,
        # relu, linear — gan.py:299-313
        self.acts = ["linear", "tanh", "tanh", "tanh",
                     "tanh", "relu", "relu", "linear"]
        rng = np.random.default_rng(self.seed)
        self.W, self.b = [], []
        for i in range(len(dims) - 1):
            limit = np.sqrt(6.0 / (dims[i] + dims[i + 1]))  # Glorot uniform
            self.W.append(rng.uniform(-limit, limit, size=(dims[i], dims[i + 1])))
            self.b.append(np.zeros(dims[i + 1]))

    @staticmethod
    def _act(z: np.ndarray, kind: str) -> np.ndarray:
        if kind == "tanh":
            return np.tanh(z)
        if kind == "relu":
            return np.maximum(z, 0.0)
        return z

    def _forward(self, X: np.ndarray, keep: bool = False):
        a, cache = X, [X]
        for Wi, bi, act in zip(self.W, self.b, self.acts):
            a = self._act(a @ Wi + bi, act)
            if keep:
                cache.append(a)
        return (a, cache) if keep else a

    def _train(self, X: np.ndarray):
        n, d = X.shape
        self._init_net(d)
        rng = np.random.default_rng(self.seed + 1)
        mW = [np.zeros_like(w) for w in self.W]
        vW = [np.zeros_like(w) for w in self.W]
        mb = [np.zeros_like(bb) for bb in self.b]
        vb = [np.zeros_like(bb) for bb in self.b]
        b1, b2, eps = 0.95, 0.999, 1e-7  # gan.py:319 Adam(lr=1e-3, beta_1=.95)
        t = 0
        for _ in range(self.epochs):
            order = rng.permutation(n)
            for s in range(0, n, self.batch):
                B = X[order[s: s + self.batch]]
                out, cache = self._forward(B, keep=True)
                # d(MSE)/d(out); MSE averaged over batch × dims
                delta = 2.0 * (out - B) / B.size
                t += 1
                for li in range(len(self.W) - 1, -1, -1):
                    a_out, a_in = cache[li + 1], cache[li]
                    if self.acts[li] == "tanh":
                        delta = delta * (1.0 - a_out * a_out)
                    elif self.acts[li] == "relu":
                        delta = delta * (a_out > 0)
                    gW = a_in.T @ delta
                    gb = delta.sum(axis=0)
                    delta = delta @ self.W[li].T
                    for g, m, v, p in ((gW, mW, vW, self.W), (gb, mb, vb, self.b)):
                        m[li] = b1 * m[li] + (1 - b1) * g
                        v[li] = b2 * v[li] + (1 - b2) * g * g
                        mh = m[li] / (1 - b1 ** t)
                        vh = v[li] / (1 - b2 ** t)
                        p[li] = p[li] - self.lr * mh / (np.sqrt(vh) + eps)

    # ------------------------------------------------------------ API
    def fit(self, values: np.ndarray) -> "MLPAutoencoder":
        """Train on a scalar stream: reference normalization then
        shift-stacked (N_shifts+1)-windows (gan.py:318-325)."""
        v = np.asarray(values, dtype=np.float64)
        lo, hi = float(np.nanmin(v)), float(np.nanmax(v))
        self.avg = (lo + hi) / 2.0  # gan.py:264
        self.span = (hi - lo) if hi != lo else 1.0
        X = LinearAutoencoder._stack((v - self.avg) / self.span, self.N_shifts)
        self._train(np.asarray(X))
        return self

    def fit_vectors(self, X: np.ndarray) -> "MLPAutoencoder":
        """Train on prebuilt feature vectors (input_vector_size > 1 path,
        gan.py:129-135: the raw vector IS the feature vector)."""
        X = np.asarray(X, dtype=np.float64)
        lo, hi = float(np.nanmin(X)), float(np.nanmax(X))
        self.avg = (lo + hi) / 2.0
        self.span = (hi - lo) if hi != lo else 1.0
        self._train((X - self.avg) / self.span)
        return self

    def reconstruction_errors(self, values: np.ndarray) -> np.ndarray:
        v = (np.asarray(values, dtype=np.float64) - self.avg) / self.span
        X = LinearAutoencoder._stack(v, self.N_shifts)
        out = np.full(len(v), np.nan)
        if len(X):
            R = self._forward(np.asarray(X))
            out[self.N_shifts:] = ((R - X) ** 2).mean(axis=1)
        return out

    def reconstruction_errors_vectors(self, X: np.ndarray) -> np.ndarray:
        Xn = (np.asarray(X, dtype=np.float64) - self.avg) / self.span
        R = self._forward(Xn)
        return ((R - Xn) ** 2).mean(axis=1)


def adaptive_threshold_codes(errors: np.ndarray, K: float,
                             len_window: int) -> tuple[np.ndarray, np.ndarray]:
    """threshold_t = K × exp-weighted mean of the last len_window errors
    (current included); Error iff error_t >= threshold_t (gan.py:156-175)."""
    n = len(errors)
    code = np.full(n, UNDEFINED_CODE, dtype=np.int8)
    status = np.full(n, "Undefined", dtype=object)
    valid = ~np.isnan(errors)
    e = errors[valid]
    m = len(e)
    if m == 0:
        return code, status
    w_full = np.exp(np.linspace(0, 1, len_window))
    thr = np.empty(m)
    warm = min(len_window - 1, m)
    for i in range(warm):  # short warm-up prefix (< len_window steps)
        w = w_full[-(i + 1):]
        thr[i] = K * float(np.average(e[: i + 1], weights=w))
    if m >= len_window:
        W = sliding_window_view(e, len_window)
        thr[len_window - 1:] = K * (W @ w_full) / w_full.sum()
    err = e >= thr
    c = np.where(err, ERROR_CODE, OK_CODE).astype(np.int8)
    s = np.where(err, "Error: outlier detected (AE)", "OK").astype(object)
    code[valid] = c
    status[valid] = s
    return code, status


def autoencoder_check(values: np.ndarray, model: LinearAutoencoder, K: float,
                      len_window: int) -> dict[str, np.ndarray]:
    """Series kernel (stages/series.py KERNELS shape): score + grade one
    sorted series."""
    errors = model.reconstruction_errors(values)
    code, status = adaptive_threshold_codes(errors, K, len_window)
    return {"status_code": code, "status": status, "ae_error": errors}


def make_autoencoder_kernel(model: LinearAutoencoder, K: float,
                            len_window: int):
    return lambda values: autoencoder_check(values, model, K, len_window)
