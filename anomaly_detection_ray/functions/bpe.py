"""Byte-pair-encoding vocabulary training over a document corpus.

The corpus-sized work is ONE distributed word count (per-batch Counters →
cardinality-aware fold); the merge loop then runs on the (word, count)
vocabulary, which is bounded by distinct-word count regardless of corpus
size — the same frequency-table formulation fastBPE / the original Sennrich
et al. 2016 implementation use, and the reason BPE training scales to
100 TB: you never touch the corpus again after the count pass.

Determinism: merge ties break on the lexicographically smallest pair, so
the rule table is a pure function of the word counts => fixture-oracle-able
and reproducible across runs and cluster sizes.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd

WORD_RE = re.compile(r"[a-z]+")
EOW = "</w>"


def word_counts(ds, text_col: str = "text") -> pd.DataFrame:
    """Distributed lowercase-word count -> (word, cnt) DataFrame."""
    from .fold import fold_partials

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in df[text_col].fillna(""):
            c.update(WORD_RE.findall(t.lower()))
        return pd.DataFrame({"word": list(c), "cnt": list(c.values())})

    return fold_partials(ds.map_batches(partial, batch_format="pandas"),
                         ["word"], {"cnt": "sum"})


def train_bpe(counts: pd.DataFrame, num_merges: int = 50,
              min_freq: int = 2, max_words: int = 100_000) -> pd.DataFrame:
    """Merge-rule table (rank, left, right, freq) from word counts.
    Words are character sequences terminated by EOW; each step merges the
    most frequent adjacent symbol pair (ties: lexicographically smallest).
    ``max_words`` bounds driver memory on open-vocabulary corpora (URLs,
    typos): keep the most frequent words, deterministic tie-break — the
    tail it drops is exactly the tail standard BPE trainers ignore."""
    if len(counts) > max_words:
        counts = (counts.sort_values(["cnt", "word"],
                                     ascending=[False, True])
                  .head(max_words))
    vocab: dict[tuple, int] = {
        (*w, EOW): int(c) for w, c in zip(counts["word"], counts["cnt"])}
    rules = []
    for rank in range(num_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # deterministic argmax: highest count, then smallest pair
        top = max(pairs.values())
        if top < min_freq:
            break
        best_pair = min(p for p, c in pairs.items() if c == top)
        rules.append({"rank": rank, "left": best_pair[0],
                      "right": best_pair[1], "freq": int(top)})
        merged = best_pair[0] + best_pair[1]
        new_vocab: dict[tuple, int] = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1
                        and (syms[i], syms[i + 1]) == best_pair):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return pd.DataFrame(rules, columns=["rank", "left", "right", "freq"])


def encode_word(word: str, rules: pd.DataFrame) -> list[str]:
    """Apply the trained merges (in rank order) to one word."""
    syms = [*word.lower(), EOW]
    for left, right in zip(rules["left"], rules["right"]):
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


class BpeEncoder:
    """Actor-pool encode stage: apply a trained merge table to every
    document. State built ONCE per actor (rank-indexed rule list + an
    unbounded-corpus-safe LRU word->tokens cache — natural text reuses a
    small working set of words, so the per-word dynamic programming runs
    once per DISTINCT word per actor, not once per occurrence). Emits
    per-doc token statistics; the token stream itself stays inside the
    actor (at 100 TB you would write token ids to a partitioned sink —
    same stage shape, different emit)."""

    def __init__(self, rules: pd.DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", cache_max: int = 200_000):
        self.pairs = list(zip(rules["left"], rules["right"]))
        self.text_col, self.id_col = text_col, id_col
        self.cache: dict[str, int] = {}
        self.cache_max = cache_max

    def _n_tokens(self, word: str) -> int:
        n = self.cache.get(word)
        if n is not None:
            return n
        syms = [*word, EOW]
        for left, right in self.pairs:
            out, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1 and syms[i] == left
                        and syms[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
            if len(syms) == 1:
                break
        if len(self.cache) >= self.cache_max:
            self.cache.clear()  # flat reset beats LRU bookkeeping here
        self.cache[word] = len(syms)
        return len(syms)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids, n_words, n_tokens = [], [], []
        for did, t in zip(df[self.id_col], df[self.text_col].fillna("")):
            words = WORD_RE.findall(t.lower())
            ids.append(did)
            n_words.append(len(words))
            n_tokens.append(sum(self._n_tokens(w) for w in words))
        import numpy as np
        return pd.DataFrame({
            self.id_col: np.asarray(ids, dtype=np.int64),
            "n_words": np.asarray(n_words, dtype=np.int64),
            "n_bpe_tokens": np.asarray(n_tokens, dtype=np.int64)})
