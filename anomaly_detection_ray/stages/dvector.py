"""Learned d-vector-style clip embeddings (the frame-stack-MLP /
penultimate-layer-average shape of Variani et al., "Deep neural networks
for small footprint text-dependent speaker verification", ICASSP 2014).

Why this exists: the MFCC mean++std clip embedding saturates cosine on
narrowband content — measured p50 max-cosine 0.99999 across DIFFERENT
pseudo-speakers on the synthetic tone corpus (SURVEY §11) — so cosine
thresholds cannot separate same-speaker from different-speaker clips and
no semantic-dedup claim could honestly be made on it. A small frame
classifier trained to tell a sampled handful of clips apart learns a
representation where frames from acoustically-alike clips land close and
unlike clips land far, de-saturating cosine (pinned in
tests/test_audio_ops.py::test_dvector_desaturates_and_separates).

Distributed shape — three bounded steps, no all-to-all shuffle:

1. SAMPLE: deterministic md5(clip_id)-ordered hash slice; one filtered
   decode pass touches only candidate rows (hash % stride == 0), each
   contributing at most ``max_frames`` stacked frames. Order-independent:
   the final training set is the ``n_train`` smallest hashes, sorted —
   identical at any parallelism (the same unbiased-sample fix the IVF
   codebook uses, stages/similarity.py).
2. TRAIN (driver): seeded numpy softmax MLP over the sampled frames with
   each training clip as its own class — the label-free utterance-class
   trick; weights are ~100 KB, trained in seconds.
3. EMBED: actor-pool ``map_batches`` — decode → log-mel → ±context frame
   stack → forward to the penultimate (d-vector) layer → mean-pool →
   L2-normalize. Weights ship once per actor via fn_constructor_kwargs
   (NOT per batch).

The reference holds per-scorer model state inside one consumer process
(/root/reference/src/anomaly_detection.py); here model state is immutable
broadcast weights and all per-clip work is an embarrassingly parallel
batch transform.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from .. import audio
from .audio_ops import logmel, resample_linear
from .sizing import pool_size

CONTEXT = 2          # ±2 frames stacked -> (2*2+1) * n_mels input dim
N_MELS = 26
DVEC_DIM = 32        # penultimate-layer width = embedding dim
HIDDEN = 64
CANON_SR = 16000     # features are rate-normalized: the mel filterbank
# spans 0..sr/2, so WITHOUT resampling the same content at different
# sample rates lands in different bins and rate — not speaker — dominates
# the embedding (measured on the n=200 test corpus: NN speaker accuracy
# 0.50 raw vs 0.73 rate-normalized, same/diff cosine 0.49 vs -0.04)


def _id_hash(clip_id: str) -> int:
    return int(np.frombuffer(hashlib.md5(str(clip_id).encode())
                             .digest()[:8], dtype=np.uint64)[0]
               >> np.uint64(1))


def _frame_stack(sig: np.ndarray, sr: int, n_mels: int = N_MELS,
                 context: int = CONTEXT) -> np.ndarray:
    """(n_frames, (2*context+1)*n_mels) stacked log-mel frames at the
    canonical rate; frames shorter than the context are edge-replicated."""
    if sr != CANON_SR:
        sig = resample_linear(sig, sr, CANON_SR)
    M = logmel(sig, CANON_SR, n_mels)
    if len(M) == 0:
        return np.zeros((0, (2 * context + 1) * n_mels))
    pad = np.concatenate([np.repeat(M[:1], context, axis=0), M,
                          np.repeat(M[-1:], context, axis=0)])
    cols = [pad[i:i + len(M)] for i in range(2 * context + 1)]
    return np.concatenate(cols, axis=1)


class DVectorNet:
    """Seeded numpy MLP frame classifier; the d-vector is the penultimate
    tanh layer. Layers: d_in -> HIDDEN tanh -> DVEC_DIM tanh -> n_classes
    softmax, trained with minibatch Adam on cross-entropy."""

    def __init__(self, d_in: int, n_classes: int, seed: int = 0,
                 epochs: int = 30, batch: int = 256, lr: float = 1e-3):
        self.seed, self.epochs, self.batch, self.lr = seed, epochs, batch, lr
        dims = [d_in, HIDDEN, DVEC_DIM, n_classes]
        rng = np.random.default_rng(seed)
        self.W = [rng.uniform(-np.sqrt(6.0 / (dims[i] + dims[i + 1])),
                              np.sqrt(6.0 / (dims[i] + dims[i + 1])),
                              size=(dims[i], dims[i + 1]))
                  for i in range(3)]
        self.b = [np.zeros(dims[i + 1]) for i in range(3)]
        self.mu = np.zeros(d_in)
        self.sd = np.ones(d_in)

    # ---------------------------------------------------------- forward
    def dvectors(self, X: np.ndarray) -> np.ndarray:
        """Frames -> penultimate activations (n, DVEC_DIM)."""
        Xn = (X - self.mu) / self.sd
        h1 = np.tanh(Xn @ self.W[0] + self.b[0])
        return np.tanh(h1 @ self.W[1] + self.b[1])

    def _logits(self, X: np.ndarray) -> tuple:
        Xn = (X - self.mu) / self.sd
        h1 = np.tanh(Xn @ self.W[0] + self.b[0])
        h2 = np.tanh(h1 @ self.W[1] + self.b[1])
        return Xn, h1, h2, h2 @ self.W[2] + self.b[2]

    # ------------------------------------------------------------ train
    def fit(self, X: np.ndarray, y: np.ndarray) -> "DVectorNet":
        X = np.asarray(X, dtype=np.float64)
        self.mu = X.mean(axis=0)
        self.sd = np.maximum(X.std(axis=0), 1e-6)
        n = len(X)
        rng = np.random.default_rng(self.seed + 1)
        mW = [np.zeros_like(w) for w in self.W]
        vW = [np.zeros_like(w) for w in self.W]
        mb = [np.zeros_like(bb) for bb in self.b]
        vb = [np.zeros_like(bb) for bb in self.b]
        b1, b2, eps = 0.9, 0.999, 1e-8
        t = 0
        for _ in range(self.epochs):
            order = rng.permutation(n)
            for s in range(0, n, self.batch):
                sel = order[s: s + self.batch]
                Xn, h1, h2, z = self._logits(X[sel])
                z -= z.max(axis=1, keepdims=True)
                p = np.exp(z)
                p /= p.sum(axis=1, keepdims=True)
                p[np.arange(len(sel)), y[sel]] -= 1.0
                delta = p / len(sel)
                t += 1
                grads = []
                a_ins = [Xn, h1, h2]
                a_outs = [h1, h2, None]
                for li in range(2, -1, -1):
                    gW = a_ins[li].T @ delta
                    gb = delta.sum(axis=0)
                    grads.append((li, gW, gb))
                    if li > 0:
                        delta = (delta @ self.W[li].T) \
                            * (1.0 - a_outs[li - 1] ** 2)
                for li, gW, gb in grads:
                    for g, m, v, prm in ((gW, mW, vW, self.W),
                                         (gb, mb, vb, self.b)):
                        m[li] = b1 * m[li] + (1 - b1) * g
                        v[li] = b2 * v[li] + (1 - b2) * g * g
                        prm[li] -= self.lr * (m[li] / (1 - b1 ** t)) \
                            / (np.sqrt(v[li] / (1 - b2 ** t)) + eps)
        return self

    def weights(self) -> dict:
        return {"W": [w.copy() for w in self.W],
                "b": [bb.copy() for bb in self.b],
                "mu": self.mu.copy(), "sd": self.sd.copy()}

    @classmethod
    def from_weights(cls, w: dict) -> "DVectorNet":
        net = cls.__new__(cls)
        net.W, net.b = w["W"], w["b"]
        net.mu, net.sd = w["mu"], w["sd"]
        return net


def train_dvector(ds, bytes_col: str = "bytes", id_col: str = "clip_id",
                  n_train: int = 48, max_frames: int = 120,
                  seed: int = 0, epochs: int = 30) -> dict:
    """Steps 1+2: hash-slice sample -> driver-trained DVectorNet weights.

    The sample pass is a Ray filter+decode over candidate rows only; the
    driver receives at most ~2×n_train clips × max_frames frames. Clips
    are keyed by md5(clip_id): the final training set is the n_train
    SMALLEST hashes — deterministic at any partitioning/CPU count."""
    est = ds.count()
    # stride so the candidate pass yields ~2×n_train clips
    stride = max(1, int(est // max(1, 2 * n_train)))

    def sample(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        seen = set()
        for cid, b in zip(df[id_col], df[bytes_col]):
            h = _id_hash(cid)
            if h % stride or cid in seen or not b:
                continue
            seen.add(cid)
            sig, sr = audio.decode_wav_lenient(b)
            if sig is None or not sr or len(sig) == 0:
                continue
            F = _frame_stack(sig, sr)
            if len(F) == 0:
                continue
            rows.append(pd.DataFrame(
                {"h": h, "cid": str(cid),
                 "frame": list(F[:max_frames].astype(np.float32))}))
        if not rows:
            return pd.DataFrame({"h": pd.Series([], dtype=np.int64),
                                 "cid": pd.Series([], dtype=str),
                                 "frame": pd.Series([], dtype=object)})
        return pd.concat(rows, ignore_index=True)

    got = ds.map_batches(sample, batch_format="pandas").to_pandas()
    if got.empty:
        raise ValueError("d-vector training sample is empty: no decodable "
                         "clips in the hash slice — lower n_train or check "
                         "the bytes column")
    got = got.sort_values(["h", "cid"], kind="mergesort")
    keep = got.drop_duplicates("cid")["cid"].head(n_train).tolist()
    got = got[got["cid"].isin(set(keep))]
    labels = {c: i for i, c in enumerate(sorted(set(keep)))}
    X = np.stack(got["frame"].to_numpy()).astype(np.float64)
    y = got["cid"].map(labels).to_numpy(np.int64)
    net = DVectorNet(X.shape[1], len(labels), seed=seed, epochs=epochs)
    net.fit(X, y)
    return net.weights()


class DVectorEmbedding:
    """Step 3 actor stage: WAV bytes -> L2-normalized mean-pooled d-vector
    per row (same output layout as MfccEmbedding: id, cid hash,
    embedding) — drop-in for kmeans/ANN/near-dup consumers."""

    def __init__(self, weights: dict, bytes_col: str = "bytes",
                 id_col: str = "clip_id"):
        self.net = DVectorNet.from_weights(weights)
        self.bytes_col, self.id_col = bytes_col, id_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids, hashes, embs = [], [], []
        for cid, b in zip(df[self.id_col], df[self.bytes_col]):
            sig, sr = (audio.decode_wav_lenient(b) if b else (None, None))
            if sig is None or not sr or len(sig) == 0:
                continue
            F = _frame_stack(sig, sr)
            if len(F) == 0:
                continue
            d = self.net.dvectors(F).mean(axis=0)
            nrm = float(np.linalg.norm(d))
            ids.append(cid)
            hashes.append(_id_hash(cid))
            embs.append(d / nrm if nrm > 0 else d)
        return pd.DataFrame({self.id_col: ids,
                             "cid": np.asarray(hashes, dtype=np.int64),
                             "embedding": embs})


def dvector_embedding_table(ds, weights: dict, bytes_col: str = "bytes",
                            id_col: str = "clip_id", batch_size: int = 64,
                            concurrency: int = 0):
    return ds.map_batches(DVectorEmbedding,
                          fn_constructor_kwargs={"weights": weights,
                                                 "bytes_col": bytes_col,
                                                 "id_col": id_col},
                          batch_format="pandas", batch_size=batch_size,
                          concurrency=pool_size(concurrency), num_cpus=1)
