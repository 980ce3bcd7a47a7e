"""Learned trend classifier — numpy re-implementation of the reference's
configure-time Keras MLP (/root/reference/src/algorithms/
trend_classification.py:154-193): trained on synthetic up/flat/down ramps
with gaussian noise, ``Dense(N, relu) -> Dense(N/2, linear) ->
Dense(3, softmax)``, Adam(lr=1e-4, beta_1=0.95), categorical cross-entropy,
50 epochs x batch 10. Classes: 0=down, 1=flat, 2=up.

Differences from the reference, both deliberate:
- seeded synthesis/training (the reference trains unseeded at configure
  time, so two replicas disagree; a seed makes distributed scoring
  reproducible and fixture-oracle-able);
- inference windows are normalized like the TRAINING windows,
  ``(w - mean)/(max - min)`` — the reference's inference path has a
  precedence defect (``(FV-avg)/max(FV) - min(FV)``,
  trend_classification.py:110) that also corrupts its rolling FV state;
  we reproduce the intended semantics (same policy as SURVEY.md §2.3).

Ray mapping: the trained net is memoized per config tuple, so each worker
process trains once (~10^4 tiny SGD steps) and scores every group with one
batched forward matmul over all sliding windows.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


class MLPTrendClassifier:
    """3-class ramp classifier with the reference's layer stack."""

    def __init__(self, N: int, num_samples: int, train_noise: float,
                 seed: int = 0, epochs: int = 50, batch: int = 10,
                 lr: float = 1e-4):
        self.N, self.num_samples, self.train_noise = N, num_samples, train_noise
        self.seed, self.epochs, self.batch, self.lr = seed, epochs, batch, lr
        self.W: list[np.ndarray] = []
        self.b: list[np.ndarray] = []

    # ------------------------------------------------------------ training
    def _synth(self, rng: np.random.Generator):
        """Reference train_model sample synthesis (:157-181)."""
        X, Y = [], np.zeros((self.num_samples, 3))
        for i in range(self.num_samples):
            a = int(rng.integers(0, 3))
            noise = rng.normal(0.0, self.train_noise, self.N)
            if a == 1:
                sample = np.ones(self.N) * 0.5 + noise
            elif a == 2:
                sample = np.linspace(0, 1, self.N) + noise
            else:
                sample = np.linspace(1, 0, self.N) + noise
            X.append((sample - sample.mean()) / (sample.max() - sample.min()))
            Y[i, a] = 1.0
        return np.asarray(X), Y

    def fit(self) -> "MLPTrendClassifier":
        rng = np.random.default_rng(self.seed)
        X, Y = self._synth(rng)
        dims = [self.N, self.N, self.N // 2, 3]
        self.W, self.b = [], []
        for i in range(3):
            limit = np.sqrt(6.0 / (dims[i] + dims[i + 1]))  # Glorot uniform
            self.W.append(rng.uniform(-limit, limit, (dims[i], dims[i + 1])))
            self.b.append(np.zeros(dims[i + 1]))
        mW = [np.zeros_like(w) for w in self.W]
        vW = [np.zeros_like(w) for w in self.W]
        mb = [np.zeros_like(bb) for bb in self.b]
        vb = [np.zeros_like(bb) for bb in self.b]
        b1, b2, eps, t = 0.95, 0.999, 1e-7, 0
        n = len(X)
        for _ in range(self.epochs):
            order = rng.permutation(n)
            for s in range(0, n, self.batch):
                idx = order[s: s + self.batch]
                xb, yb = X[idx], Y[idx]
                h1 = np.maximum(xb @ self.W[0] + self.b[0], 0.0)
                h2 = h1 @ self.W[1] + self.b[1]
                z = h2 @ self.W[2] + self.b[2]
                z = z - z.max(axis=1, keepdims=True)
                p = np.exp(z)
                p /= p.sum(axis=1, keepdims=True)
                d3 = (p - yb) / len(xb)          # d(CE)/d(logits)
                d2 = d3 @ self.W[2].T
                d1 = (d2 @ self.W[1].T) * (h1 > 0)
                grads = [(xb.T @ d1, d1.sum(0)), (h1.T @ d2, d2.sum(0)),
                         (h2.T @ d3, d3.sum(0))]
                t += 1
                for li, (gW, gb) in enumerate(grads):
                    for g, m, v, prm in ((gW, mW, vW, self.W),
                                         (gb, mb, vb, self.b)):
                        m[li] = b1 * m[li] + (1 - b1) * g
                        v[li] = b2 * v[li] + (1 - b2) * g * g
                        mh = m[li] / (1 - b1 ** t)
                        vh = v[li] / (1 - b2 ** t)
                        prm[li] = prm[li] - self.lr * mh / (np.sqrt(vh) + eps)
        return self

    # ------------------------------------------------------------ inference
    def predict_classes(self, X: np.ndarray) -> np.ndarray:
        """argmax softmax over normalized windows — one batched forward pass
        (trend_classification.py:112 per-row Keras predict, vectorized)."""
        h1 = np.maximum(X @ self.W[0] + self.b[0], 0.0)
        z = (h1 @ self.W[1] + self.b[1]) @ self.W[2] + self.b[2]
        return np.argmax(z, axis=1)


@lru_cache(maxsize=8)
def trend_model(N: int, num_samples: int, train_noise: float,
                seed: int = 0) -> MLPTrendClassifier:
    """Per-process memoized trainer — Ray workers train once per config."""
    return MLPTrendClassifier(N, num_samples, train_noise, seed).fit()
