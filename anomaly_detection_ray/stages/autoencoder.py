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

The neural variant would be the same actor-pool stage with a different
``reconstruct``; mark: the Keras path is intentionally NOT implemented.

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
