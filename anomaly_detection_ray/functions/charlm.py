"""Character-trigram language-model quality scoring (CCNet-style:
Wenzek et al. 2020 filter crawl text by LM perplexity; here the LM is a
from-scratch add-alpha char-trigram model so the container needs no
external model).

Two streaming passes over the corpus:

1. ``train_char_lm`` — per-batch trigram counting (np.unique over
   composite int keys of the batch's flattened byte stream, doc-boundary
   trigrams masked out) emits SPARSE (idx, count) partials; the driver
   folds them with ``fold_partials`` (integer sums — exact, order-free)
   and densifies into a V^3 float64 log-prob table (~7 MB at V=96).
2. ``score_char_lm`` — the table is broadcast ONCE via ``ray.put``; each
   batch is one vectorized gather + per-doc ``np.add.at`` fold, emitting
   bits-per-char (the perplexity exponent). No shuffle in either pass.

Alphabet: printable ASCII 32..126 -> ids 1..95, everything else -> 0
(OOV), V = 96. Non-ASCII input is ``encode('ascii', 'replace')``-folded,
so scoring is deterministic for any input.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

V = 96  # 0 = OOV, 1..95 = ASCII 32..126


def _char_ids(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(flat id array, per-doc lengths) for a batch of strings."""
    b = texts.fillna("").str.encode("ascii", "replace")
    lens = b.str.len().to_numpy(dtype=np.int64)
    flat = np.frombuffer(b"".join(b.to_numpy()), dtype=np.uint8).astype(np.int64)
    ids = flat - 31
    ids[(flat < 32) | (flat > 126)] = 0
    return ids, lens


def _trigram_keys(ids: np.ndarray, lens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Composite trigram keys over the flat stream + the owning doc index,
    with boundary-spanning trigrams removed."""
    n = len(ids)
    if n < 3:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    doc = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    keys = ids[:-2] * (V * V) + ids[1:-1] * V + ids[2:]
    ok = doc[:-2] == doc[2:]
    return keys[ok], doc[:-2][ok]


def train_char_lm(ds, text_col: str = "text", alpha: float = 0.1) -> np.ndarray:
    """ONE distributed counting pass -> dense log2 P(c2 | c0 c1) table of
    shape (V^3,). Sparse partials only cross the wire; integer fold is
    exact so the table is bit-identical for any partitioning."""
    from .fold import fold_partials

    def count(df: pd.DataFrame) -> pd.DataFrame:
        ids, lens = _char_ids(df[text_col])
        keys, _ = _trigram_keys(ids, lens)
        uk, cnt = np.unique(keys, return_counts=True)
        return pd.DataFrame({"idx": uk, "cnt": cnt.astype(np.int64)})

    partials = ds.map_batches(count, batch_format="pandas")
    folded = fold_partials(partials, "idx", {"cnt": "sum"})
    counts = np.zeros(V * V * V, dtype=np.float64)
    if len(folded):
        counts[folded["idx"].to_numpy()] = folded["cnt"].to_numpy()
    ctx = counts.reshape(V * V, V).sum(axis=1, keepdims=True)
    logp = np.log2(counts.reshape(V * V, V) + alpha) - np.log2(ctx + alpha * V)
    return logp.reshape(-1)


def score_char_lm(ds, logp: np.ndarray, text_col: str = "text",
                  id_col: str = "doc_id", round_to: int = 6):
    """Scoring pass: (id, n_trigrams, bits_per_char) per doc; high
    bits_per_char = improbable under the corpus LM = low-quality/outlier
    text. Table broadcast once; per-batch work is one gather + one
    ``np.add.at`` fold."""
    import ray as _ray

    ref = _ray.put(logp)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        tbl = _ray.get(ref)
        ids, lens = _char_ids(df[text_col])
        keys, doc = _trigram_keys(ids, lens)
        tot = np.zeros(len(df), dtype=np.float64)
        np.add.at(tot, doc, tbl[keys])
        n_tri = np.zeros(len(df), dtype=np.int64)
        np.add.at(n_tri, doc, 1)
        bpc = np.round(-tot / np.maximum(n_tri, 1), round_to)
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "n_trigrams": n_tri,
                             "bits_per_char": bpc})

    return ds.map_batches(score, batch_format="pandas")
