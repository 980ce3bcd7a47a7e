"""Text-analysis kernels for large-scale training-data pipelines:
token counting, quality scoring, language ID (stopword/n-gram heuristic),
document fingerprints (rolling hash, SimHash, MinHash, shingles).

All functions are batch-vectorized (pandas .str C kernels / numpy over
token-hash arrays); per-document Python work is limited to hashing token
lists that are already split.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

TOKEN_RE = re.compile(r"\S+")
WORD_RE = re.compile(r"[\w']+", re.UNICODE)
PUNCT_RE = re.compile(r"[.,!?;:\"'()\[\]{}-]")

STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "was",
           "for", "on", "are", "with", "as", "his", "they", "at", "be", "this"},
    "de": {"der", "die", "und", "das", "ist", "von", "nicht", "mit", "sich",
           "auf", "für", "als", "auch", "es", "an", "werden", "aus", "er",
           "hat", "dass", "sie", "nach", "bei", "um", "ein", "eine", "im"},
    "fr": {"le", "la", "les", "de", "des", "et", "est", "en", "un", "une",
           "du", "que", "qui", "dans", "pour", "pas", "sur", "avec", "au",
           "il", "elle", "ne", "ce", "se", "son", "plus", "par"},
    "es": {"el", "la", "los", "las", "de", "y", "que", "en", "un", "una",
           "es", "no", "con", "por", "para", "su", "al", "lo", "como",
           "más", "pero", "sus", "le", "ya", "o", "este", "sí"},
    "it": {"il", "la", "le", "di", "e", "che", "in", "un", "una", "è",
           "non", "con", "per", "del", "della", "al", "si", "dei", "come",
           "più", "ma", "sono", "gli", "questo", "anche"},
}

_EN_STOP = STOPWORDS["en"]


def token_count(texts: pd.Series) -> np.ndarray:
    """Whitespace token count (len(re.findall(r'\\S+', text)))."""
    return texts.fillna("").str.count(TOKEN_RE).to_numpy(dtype=np.int64)


def word_count(texts: pd.Series) -> np.ndarray:
    """BPE-ish word-token count: [\\w']+ runs."""
    return texts.fillna("").str.count(WORD_RE).to_numpy(dtype=np.int64)


def quality_features(texts: pd.Series) -> dict[str, np.ndarray]:
    """Vectorized quality signals: lengths, punct/digit/upper/space ratios,
    stopword ratio, mean token length."""
    s = texts.fillna("")
    n_chars = s.str.len().to_numpy(dtype=np.int64)
    n_tokens = token_count(s)
    n_punct = s.str.count(PUNCT_RE).to_numpy(dtype=np.int64)
    n_digit = s.str.count(r"\d").to_numpy(dtype=np.int64)
    n_upper = s.str.count(r"[A-Z]").to_numpy(dtype=np.int64)
    n_space = s.str.count(r"\s").to_numpy(dtype=np.int64)
    safe = np.maximum(n_chars, 1)
    stop = np.array([_stop_ratio(ws, _EN_STOP) for ws in s.str.lower().str.findall(WORD_RE)])
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": n_punct / safe,
        "digit_ratio": n_digit / safe,
        "upper_ratio": n_upper / safe,
        "space_ratio": n_space / safe,
        "mean_token_len": (n_chars - n_space) / np.maximum(n_tokens, 1),
        "stopword_ratio": stop,
    }


def _stop_ratio(words: list[str], stopset: set[str]) -> float:
    if not words:
        return 0.0
    return sum(w in stopset for w in words) / len(words)


# PII patterns kept RE2-compatible (no backrefs/lookaround) so the same
# pattern strings drive both the pandas kernels and the DuckDB oracle.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+\d[\d-]{7,}\d",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_scan(texts: pd.Series) -> dict[str, np.ndarray]:
    """Per-doc PII hit counts (email / phone / IPv4) — vectorized
    ``.str.count`` with the shared RE2-safe patterns."""
    s = texts.fillna("")
    return {f"n_{k}": s.str.count(p).to_numpy(dtype=np.int64)
            for k, p in PII_PATTERNS.items()}


def pii_redact(texts: pd.Series) -> pd.Series:
    """Replace every PII hit with a typed placeholder (``<EMAIL>`` etc.),
    applied email -> phone -> ip so a redacted token can't re-match a
    later pattern. Vectorized ``.str.replace`` (C regex kernel)."""
    s = texts.fillna("")
    for k, p in PII_PATTERNS.items():
        s = s.str.replace(p, f"<{k.upper()}>", regex=True)
    return s


def repetition_features(texts: pd.Series) -> dict[str, np.ndarray]:
    """Gopher-style repetition signals (Rae et al. 2021, §A1.1 flavor) per
    document over lowercased ``[\\w']+`` word tokens: word count, distinct-
    word fraction, top-word fraction, top-bigram fraction, and the longest
    run of the same word repeated back-to-back. Fully vectorized: ONE
    factorize over the batch's exploded tokens, per-(doc,word) counts via
    ``np.unique`` on composite int keys, per-doc maxima via
    ``np.maximum.at`` — no Python loop over rows or tokens."""
    toks = (texts.fillna("").str.lower().str.findall(WORD_RE)
            .reset_index(drop=True))
    n = len(toks)
    lens = toks.str.len().to_numpy(dtype=np.int64)
    out = {
        "n_words": lens,
        "uniq_word_frac": np.zeros(n, dtype=np.float64),
        "top_word_frac": np.zeros(n, dtype=np.float64),
        "top_bigram_frac": np.zeros(n, dtype=np.float64),
        "max_word_run": np.zeros(n, dtype=np.int64),
    }
    ex = toks.explode().dropna()
    if not len(ex):
        return out
    doc = ex.index.to_numpy(dtype=np.int64)
    wid, uniq = pd.factorize(ex.to_numpy())
    wid = wid.astype(np.int64)
    V = np.int64(max(len(uniq), 1))

    ukey, cnt = np.unique(doc * V + wid, return_counts=True)
    udoc = ukey // V
    n_uniq = np.zeros(n, dtype=np.int64)
    np.add.at(n_uniq, udoc, 1)
    top_word = np.zeros(n, dtype=np.int64)
    np.maximum.at(top_word, udoc, cnt)

    same_doc = doc[1:] == doc[:-1]
    top_big = np.zeros(n, dtype=np.int64)
    if same_doc.any():
        bw = (wid[:-1] * V + wid[1:])[same_doc]
        bdoc = doc[1:][same_doc]
        # composite (doc, bigram) key without int64 overflow: re-factorize
        # the bigram ids (bounded by batch token count, not V^2)
        bid, _ = pd.factorize(bw)
        B = np.int64(max(bid.max() + 1, 1))
        key2, cnt2 = np.unique(bdoc * B + bid.astype(np.int64),
                               return_counts=True)
        np.maximum.at(top_big, key2 // B, cnt2)

    chg = np.r_[True, (wid[1:] != wid[:-1]) | ~same_doc]
    run_len = np.bincount(np.cumsum(chg) - 1)
    np.maximum.at(out["max_word_run"], doc[chg], run_len)

    safe = np.maximum(lens, 1)
    out["uniq_word_frac"] = n_uniq / safe
    out["top_word_frac"] = top_word / safe
    out["top_bigram_frac"] = top_big / np.maximum(lens - 1, 1)
    return out


def detect_language(texts: pd.Series) -> np.ndarray:
    """Stopword-profile language ID over {en, de, fr, es, it}; 'und'
    (undetermined) when no profile scores > 0."""
    langs = list(STOPWORDS)
    tokens = texts.fillna("").str.lower().str.findall(WORD_RE)
    out = np.full(len(texts), "und", dtype=object)
    for i, ws in enumerate(tokens):
        if not ws:
            continue
        scores = [sum(w in STOPWORDS[lg] for w in ws) for lg in langs]
        best = int(np.argmax(scores))
        if scores[best] > 0:
            out[i] = langs[best]
    return out


# ------------------------------------------------------------- fingerprints

_M1 = np.uint64(0xC6A4A7935BD1E995)
_M2 = np.uint64(0xFF51AFD7ED558CCD)


def _hash_u64(arr: np.ndarray) -> np.ndarray:
    """Stable 64-bit hashes of a string array (pandas siphash, fixed key)."""
    return pd.util.hash_array(np.asarray(arr, dtype=object),
                              categorize=False).astype(np.uint64)


def token_hashes(text: str) -> np.ndarray:
    return _hash_u64(np.array(WORD_RE.findall(text.lower()), dtype=object))


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashes of word k-shingles via rolling combination of token hashes."""
    th = token_hashes(text)
    if len(th) < k:
        return np.unique(th)
    acc = th[: len(th) - k + 1].copy()
    for j in range(1, k):
        acc = acc * _M1 + th[j: len(th) - k + 1 + j]
    return np.unique(acc)


def word_ngram_hashes(text: str, n: int = 3) -> np.ndarray:
    """Distinct 64-bit hashes of word n-grams under LITERAL single-space
    tokenization (``text.split(' ')``, no lowering, empties kept) — exactly
    the token semantics of DuckDB's ``string_split(text, ' ')``, so a SQL
    oracle can mirror the set algebra 1:1. (``shingle_hashes`` uses the
    WORD_RE tokenizer instead and is NOT SQL-mirrorable.)"""
    words = text.split(" ")
    if len(words) < n:
        return np.empty(0, dtype=np.uint64)
    grams = np.array([" ".join(words[i:i + n])
                      for i in range(len(words) - n + 1)], dtype=object)
    return np.unique(_hash_u64(grams))


def rolling_fingerprint(text: str, window: int = 8) -> np.uint64:
    """Document fingerprint: xor of rolling-hash window combinations —
    stable under small local edits outside the changed windows."""
    th = token_hashes(text)
    if len(th) == 0:
        return np.uint64(0)
    if len(th) < window:
        return np.uint64(np.bitwise_xor.reduce(th * _M1))
    acc = th[: len(th) - window + 1].copy()
    for j in range(1, window):
        acc = acc * _M1 + th[j: len(th) - window + 1 + j]
    return np.uint64(np.bitwise_xor.reduce(acc))


def simhash(text: str) -> np.uint64:
    """64-bit SimHash over word-token hashes."""
    th = token_hashes(text)
    if len(th) == 0:
        return np.uint64(0)
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    votes = bits.astype(np.int64).sum(axis=0) * 2 - len(th)
    out = np.uint64(0)
    for b in range(64):
        if votes[b] > 0:
            out |= np.uint64(1) << np.uint64(b)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    # popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


_MINHASH_A = None
_MINHASH_B = None


def _minhash_params(k: int):
    global _MINHASH_A, _MINHASH_B
    if _MINHASH_A is None or len(_MINHASH_A) < k:
        rng = np.random.default_rng(0xD1CE)  # fixed: signatures must be stable
        _MINHASH_A = (rng.integers(1, 2**63, size=max(k, 128), dtype=np.int64)
                      .astype(np.uint64) | np.uint64(1))
        _MINHASH_B = rng.integers(0, 2**63, size=max(k, 128), dtype=np.int64).astype(np.uint64)
    return _MINHASH_A[:k], _MINHASH_B[:k]


def minhash_signature(shingles: np.ndarray, k: int = 64) -> np.ndarray:
    """k-permutation MinHash signature from shingle hashes (uint64[k])."""
    a, b = _minhash_params(k)
    if len(shingles) == 0:
        return np.full(k, np.iinfo(np.uint64).max, dtype=np.uint64)
    perm = shingles[None, :] * a[:, None] + b[:, None]
    return perm.min(axis=1)


def band_hashes(signature: np.ndarray, bands: int) -> np.ndarray:
    """LSH band hashes of a MinHash signature: one uint64 per band."""
    rows = len(signature) // bands
    sig = signature[: rows * bands].reshape(bands, rows)
    acc = sig[:, 0].copy()
    for j in range(1, rows):
        acc = acc * _M2 + sig[:, j]
    return acc


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two unique-hash sets."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


def jaro_similarity(s1: str, s2: str) -> float:
    """Jaro similarity, DuckDB-compatible (empty vs empty is 0.0, like
    DuckDB's jaro_similarity — not the textbook 1.0)."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    win = max(l1, l2) // 2 - 1
    if win < 0:
        win = 0
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - win), min(l2, i + win + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0


def jaro_winkler(s1: str, s2: str, boost_threshold: float = 0.7,
                 prefix_len: int = 4, scaling: float = 0.1) -> float:
    """Jaro-Winkler similarity, fuzz-pinned bit-exact to DuckDB's
    jaro_winkler_similarity (464-pair fuzz incl. random strings; the only
    divergence from the textbook form is empty-vs-empty = 0.0). Winkler
    prefix boost applies only above the 0.7 Jaro threshold."""
    j = jaro_similarity(s1, s2)
    if j > boost_threshold:
        p = 0
        for a, b in zip(s1[:prefix_len], s2[:prefix_len]):
            if a != b:
                break
            p += 1
        j += p * scaling * (1.0 - j)
    return j
