"""Mergeable sketches for distributed validation.

All sketches here follow the partial/merge contract that makes wide
aggregation cheap on Ray Data (ray_guide: pre-aggregate per batch inside
``map_batches``, then merge the small partials in a tiny ``groupby``):

 - ``WelfordPartial``  — (n, mean, M2, min, max) with Chan's parallel merge;
   the partition-mergeable form of the reference's online Welford scorer
   (/root/reference/src/algorithms/welford.py:176-191).
 - ``HyperLogLog``     — distinct-count estimate for clip_id uniqueness.
 - ``BloomFilter``     — membership pre-filter for duplicate candidates.
 - ``TDigest``         — a compact mergeable quantile sketch (cluster-merge
   variant per Dunning & Ertl's published t-digest design).
 - ``Histogram``       — fixed-edge counts; the basis for KS/PSI drift.

Each is plain-numpy, picklable, and ``merge``-able; serialization goes
through ``to_state``/``from_state`` dicts so partials can travel as Arrow
binary or object-store refs.
"""

from __future__ import annotations

import math
import pickle

import numpy as np


# ---------------------------------------------------------------- Welford

class WelfordPartial:
    """Streaming (n, mean, M2, min, max); merge via Chan et al.'s
    parallel-variance formula."""

    __slots__ = ("n", "mean", "M2", "min", "max")

    def __init__(self, n=0, mean=0.0, M2=0.0, vmin=math.inf, vmax=-math.inf):
        self.n, self.mean, self.M2 = n, mean, M2
        self.min, self.max = vmin, vmax

    @classmethod
    def from_values(cls, values: np.ndarray) -> "WelfordPartial":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return cls()
        m = float(v.mean())
        return cls(len(v), m, float(((v - m) ** 2).sum()), float(v.min()), float(v.max()))

    def merge(self, other: "WelfordPartial") -> "WelfordPartial":
        if other.n == 0:
            return self
        if self.n == 0:
            return other
        n = self.n + other.n
        d = other.mean - self.mean
        mean = self.mean + d * other.n / n
        M2 = self.M2 + other.M2 + d * d * self.n * other.n / n
        return WelfordPartial(n, mean, M2, min(self.min, other.min),
                              max(self.max, other.max))

    @property
    def variance(self) -> float:  # population, matching sqrt(M2/count)
        return self.M2 / self.n if self.n else float("nan")

    @property
    def std(self) -> float:
        return math.sqrt(self.variance) if self.n else float("nan")

    @property
    def std_sample(self) -> float:
        return math.sqrt(self.M2 / (self.n - 1)) if self.n > 1 else float("nan")

    def to_tuple(self):
        return (self.n, self.mean, self.M2, self.min, self.max)

    @classmethod
    def from_tuple(cls, t):
        return cls(int(t[0]), float(t[1]), float(t[2]), float(t[3]), float(t[4]))


def welford_columns(n, mean, M2, vmin, vmax):
    """Vectorized merge of per-key partial columns grouped to one row per key:
    given aligned arrays of partials for ONE key, reduce them."""
    acc = WelfordPartial()
    for i in range(len(n)):
        acc = acc.merge(WelfordPartial(int(n[i]), float(mean[i]), float(M2[i]),
                                       float(vmin[i]), float(vmax[i])))
    return acc


# ---------------------------------------------------------------- HyperLogLog

class HyperLogLog:
    """Standard HLL (Flajolet et al.) with 2^p registers, numpy-vectorized add."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        h = np.asarray(h, dtype=np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)
        # rank = leading zeros of the remaining 64-p bits + 1
        lz = np.full(len(h), 64 - self.p + 1, dtype=np.uint8)
        nz = rest != 0
        if nz.any():
            bits = 63 - np.floor(np.log2(rest[nz].astype(np.float64))).astype(np.int64)
            lz[nz] = np.minimum(bits + 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, lz)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        E = alpha * m * m / float(np.sum(2.0 ** -self.registers.astype(np.float64)))
        zeros = int(np.count_nonzero(self.registers == 0))
        if E <= 2.5 * m and zeros:
            return m * math.log(m / zeros)
        return E


# ---------------------------------------------------------------- Bloom

class BloomFilter:
    """Double-hashing Bloom filter over 64-bit key hashes."""

    def __init__(self, n_bits: int = 1 << 20, k: int = 4):
        self.n_bits, self.k = n_bits, k
        self.bits = np.zeros(n_bits // 8 + 1, dtype=np.uint8)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        h = np.asarray(h, dtype=np.uint64)
        h1 = h % np.uint64(self.n_bits)
        h2 = (h >> np.uint64(32)) | np.uint64(1)
        pos = (h1[None, :] + np.arange(self.k, dtype=np.uint64)[:, None] * h2[None, :])
        return (pos % np.uint64(self.n_bits)).astype(np.int64)

    def add_hashes(self, h: np.ndarray) -> None:
        pos = self._positions(h).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        pos = self._positions(h)
        hit = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return hit.all(axis=0).astype(bool)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        out = BloomFilter(self.n_bits, self.k)
        out.bits = self.bits | other.bits
        return out


# ---------------------------------------------------------------- TDigest

class TDigest:
    """Mergeable quantile sketch (scale-function k1-style size bound).

    Partials buffer raw values per batch; ``compress`` clusters sorted values
    with capacity limited by the usual t-digest q(1-q) bound so tails stay
    accurate. Good to ~1e-3 relative quantile error at delta=200."""

    def __init__(self, delta: int = 200):
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)

    def add_values(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        self.means = np.concatenate([self.means, v])
        self.weights = np.concatenate([self.weights, np.ones(len(v))])
        if len(self.means) > 8 * self.delta:
            self.compress()

    def merge(self, other: "TDigest") -> "TDigest":
        out = TDigest(self.delta)
        out.means = np.concatenate([self.means, other.means])
        out.weights = np.concatenate([self.weights, other.weights])
        out.compress()
        return out

    def compress(self) -> None:
        if len(self.means) == 0:
            return
        order = np.argsort(self.means, kind="stable")
        means, weights = self.means[order], self.weights[order]
        total = weights.sum()
        new_means, new_weights = [], []
        acc_mean, acc_w, q0 = means[0], weights[0], 0.0
        for i in range(1, len(means)):
            q = (q0 + acc_w + weights[i]) / total
            limit = 4 * total * self.delta ** -1 * q * (1 - q) + 1
            if acc_w + weights[i] <= limit:
                acc_mean = (acc_mean * acc_w + means[i] * weights[i]) / (acc_w + weights[i])
                acc_w += weights[i]
            else:
                new_means.append(acc_mean)
                new_weights.append(acc_w)
                q0 += acc_w
                acc_mean, acc_w = means[i], weights[i]
        new_means.append(acc_mean)
        new_weights.append(acc_w)
        self.means = np.asarray(new_means)
        self.weights = np.asarray(new_weights)

    def quantile(self, q) -> float | np.ndarray:
        self.compress()
        if len(self.means) == 0:
            return float("nan")
        cum = np.cumsum(self.weights) - self.weights / 2.0
        total = self.weights.sum()
        return np.interp(np.asarray(q, dtype=np.float64) * total, cum, self.means)

    def to_bytes(self) -> bytes:
        self.compress()
        return pickle.dumps((self.delta, self.means, self.weights))

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        delta, means, weights = pickle.loads(b)
        out = cls(delta)
        out.means, out.weights = means, weights
        return out


# ---------------------------------------------------------------- Histogram

class Histogram:
    """Fixed-edge histogram partial; the shared basis for KS and PSI drift."""

    def __init__(self, edges: np.ndarray, counts: np.ndarray | None = None):
        self.edges = np.asarray(edges, dtype=np.float64)
        self.counts = (np.zeros(len(self.edges) + 1, dtype=np.int64)
                       if counts is None else np.asarray(counts, dtype=np.int64))

    def add_values(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        idx = np.searchsorted(self.edges, v, side="right")
        np.add.at(self.counts, idx, 1)

    def merge(self, other: "Histogram") -> "Histogram":
        return Histogram(self.edges, self.counts + other.counts)


def ks_statistic(counts_a: np.ndarray, counts_b: np.ndarray) -> float:
    """Two-sample KS statistic from aligned histogram counts (binned ECDFs)."""
    a = np.asarray(counts_a, dtype=np.float64)
    b = np.asarray(counts_b, dtype=np.float64)
    if a.sum() == 0 or b.sum() == 0:
        return float("nan")
    return float(np.max(np.abs(np.cumsum(a) / a.sum() - np.cumsum(b) / b.sum())))


def psi(expected_counts: np.ndarray, actual_counts: np.ndarray,
        eps: float = 1e-6) -> float:
    """Population stability index over aligned bins (standard formulation:
    sum((p_a - p_e) * ln(p_a / p_e)), probabilities floored at eps)."""
    e = np.asarray(expected_counts, dtype=np.float64)
    a = np.asarray(actual_counts, dtype=np.float64)
    if e.sum() == 0 or a.sum() == 0:
        return float("nan")
    pe = np.maximum(e / e.sum(), eps)
    pa = np.maximum(a / a.sum(), eps)
    return float(np.sum((pa - pe) * np.log(pa / pe)))


class MisraGries:
    """Misra-Gries frequent-items summary (deterministic heavy-hitter
    sketch; Misra & Gries 1982, mergeability per Agarwal et al.,
    "Mergeable Summaries", PODS 2012).

    Bounded state: at most ``k`` counters. Guarantee: after summarizing a
    stream of n items, every item with true frequency > n/k is present,
    and each retained count under-counts by at most n/k. Merging two
    summaries (sum counts per key, then subtract the (k+1)-th largest
    count and drop non-positives) preserves the guarantee over the union
    stream — which is exactly what the two-pass heavy-hitters operator
    needs: pass 1 produces a <=k candidate superset of every item above
    the support threshold, pass 2 exact-counts only those candidates.

    The reference keeps whole-stream state per scorer
    (/root/reference/src/anomaly_detection.py consumer loop); this sketch
    is the bounded-memory replacement that distributes: one MG per input
    batch, partials merged by the driver fold.
    """

    __slots__ = ("k", "counts")

    def __init__(self, k: int):
        self.k = int(k)
        self.counts: dict = {}

    def add_many(self, keys: np.ndarray) -> None:
        """Vectorized batch insert: pre-reduce with np.unique (one dict op
        per DISTINCT key, not per row), then standard MG decrement."""
        u, c = np.unique(np.asarray(keys), return_counts=True)
        for key, cnt in zip(u.tolist(), c.tolist()):
            self.counts[key] = self.counts.get(key, 0) + int(cnt)
        self._shrink()

    def _shrink(self) -> None:
        if len(self.counts) <= self.k:
            return
        # decrement all by the (k+1)-th largest count; drop non-positive
        vals = np.fromiter(self.counts.values(), dtype=np.int64)
        cut = int(np.partition(vals, -(self.k + 1))[-(self.k + 1)])
        self.counts = {key: n - cut for key, n in self.counts.items()
                       if n - cut > 0}

    def items(self):
        keys = list(self.counts.keys())
        return keys, [self.counts[key] for key in keys]

    @staticmethod
    def compact(keys: np.ndarray, counts: np.ndarray, k: int):
        """MG reduction over already-summed partial counts: keep the
        summary at <=k entries without losing any key whose true global
        count exceeds n/k (Agarwal et al. merge rule)."""
        counts = np.asarray(counts, dtype=np.int64)
        if len(counts) <= k:
            return keys, counts
        cut = int(np.partition(counts, -(k + 1))[-(k + 1)])
        keep = counts - cut > 0
        return keys[keep], counts[keep] - cut
