"""Text-analysis and dedup kernel tests (driver-side functions + Ray stages)."""

import numpy as np
import pandas as pd
import pytest

from anomaly_detection_ray.functions import text as tx


def test_token_count_matches_re():
    import re
    texts = pd.Series(["hello world", "  a  b   c ", "", None, "one"])
    got = tx.token_count(texts)
    want = [len(re.findall(r"\S+", t or "")) for t in texts]
    np.testing.assert_array_equal(got, want)


def test_quality_features():
    q = tx.quality_features(pd.Series(["The cat, and the dog!", "abc"]))
    assert q["n_tokens"][0] == 5
    assert q["punct_ratio"][0] > 0
    assert q["stopword_ratio"][0] == pytest.approx(3 / 5)
    assert q["stopword_ratio"][1] == 0.0


def test_detect_language():
    s = pd.Series([
        "the cat sat on the mat and it was happy",
        "der Hund ist nicht mit der Katze auf dem Dach",
        "le chat est dans la maison avec le chien",
        "el perro y el gato en la casa con su amigo",
        "xyzzy qwerty",
    ])
    langs = tx.detect_language(s)
    assert list(langs[:4]) == ["en", "de", "fr", "es"]
    assert langs[4] == "und"


def test_shingles_and_jaccard():
    a = tx.shingle_hashes("the quick brown fox jumps over the lazy dog")
    b = tx.shingle_hashes("the quick brown fox jumps over the lazy cat")
    c = tx.shingle_hashes("completely different text with other words here")
    assert 0.5 < tx.jaccard(a, b) < 1.0
    assert tx.jaccard(a, a) == 1.0
    assert tx.jaccard(a, c) == 0.0


def test_minhash_estimates_jaccard():
    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(200)]
    t1 = " ".join(words)
    t2 = " ".join(words[:150] + [f"x{i}" for i in range(50)])
    s1 = tx.shingle_hashes(t1)
    s2 = tx.shingle_hashes(t2)
    true_j = tx.jaccard(s1, s2)
    sig1 = tx.minhash_signature(s1, 128)
    sig2 = tx.minhash_signature(s2, 128)
    est = (sig1 == sig2).mean()
    assert abs(est - true_j) < 0.12


def test_simhash_similarity():
    h1 = tx.simhash("the quick brown fox jumps over the lazy dog " * 5)
    h2 = tx.simhash("the quick brown fox jumps over the lazy cat " * 5)
    h3 = tx.simhash("entirely unrelated content about ray data pipelines " * 5)
    d12 = tx.hamming64(np.array([h1]), np.array([h2]))[0]
    d13 = tx.hamming64(np.array([h1]), np.array([h3]))[0]
    assert d12 < d13
    assert tx.hamming64(np.array([h1]), np.array([h1]))[0] == 0


def test_rolling_fingerprint_stability():
    base = "one two three four five six seven eight nine ten " * 3
    assert tx.rolling_fingerprint(base) == tx.rolling_fingerprint(base)
    assert tx.rolling_fingerprint(base) != tx.rolling_fingerprint(base + " eleven")


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd
    texts = []
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
            "kilo lima mike november oscar papa quebec romeo sierra tango ")
    for i in range(60):
        texts.append(f"document {i} " + base + f"suffix {i % 7}")
    # exact duplicates
    texts[10] = texts[3]
    texts[20] = texts[3]
    # near duplicate of 5 (one token changed)
    texts[30] = texts[5].replace("echo", "modified")
    return rd.from_pandas(pd.DataFrame({"doc_id": range(60), "text": texts}))


def test_exact_dedup(docs_ds):
    from anomaly_detection_ray.stages import dedup
    groups = dedup.exact_dedup_groups(docs_ds).to_pandas()
    dup_groups = groups[groups["n_dups"] > 1]
    assert len(dup_groups) == 1
    assert dup_groups.iloc[0]["keep_doc_id"] == 3
    assert dup_groups.iloc[0]["n_dups"] == 3
    survivors = dedup.exact_dedup(docs_ds).to_pandas()
    assert len(survivors) == 58
    assert 10 not in set(survivors["doc_id"]) and 20 not in set(survivors["doc_id"])


def test_minhash_dedup(docs_ds):
    from anomaly_detection_ray.stages import dedup
    clusters = dedup.minhash_dedup(docs_ds, threshold=0.6)
    by_rep = clusters.groupby("cluster_rep")["doc_id"].apply(set).to_dict()
    all_clustered = set(clusters["doc_id"])
    assert {3, 10, 20} <= all_clustered
    assert 5 in all_clustered and 30 in all_clustered
    # 3/10/20 share one cluster; 5/30 share another
    rep_of = dict(zip(clusters["doc_id"], clusters["cluster_rep"]))
    assert rep_of[10] == rep_of[20] == rep_of[3]
    assert rep_of[30] == rep_of[5]


def test_simhash_dedup(docs_ds):
    from anomaly_detection_ray.stages import dedup
    pairs = dedup.simhash_dedup(docs_ds, max_hamming=3)
    got = {tuple(sorted((a, b))) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (3, 10) in got and (3, 20) in got and (10, 20) in got


def test_embedding_near_dup(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(6)
    vecs = rng.normal(size=(50, 16))
    vecs[13] = vecs[7] + rng.normal(scale=0.01, size=16)  # near dup pair
    df = pd.DataFrame({"vec_id": range(50), "embedding": list(vecs)})
    from anomaly_detection_ray.stages import dedup
    pairs = dedup.embedding_near_dup(rd.from_pandas(df), threshold=0.98)
    got = {tuple(sorted((int(a), int(b)))) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (7, 13) in got


def test_embedding_dedup_query_recovers_all_injected(ray_session):
    """Banded hyperplane LSH recovers EVERY injected perturbed copy with no
    false pairs (the synthetic table's max organic cosine is ~0.51)."""
    from anomaly_detection_ray.pipelines.queries import (EMB_DUP_OFFSET,
                                                         q_embedding_dedup_embeddings)
    pairs = q_embedding_dedup_embeddings("/root/testdata/sf0.001")
    assert (pairs["id_b"] - pairs["id_a"] == EMB_DUP_OFFSET).all()
    assert len(pairs) == 50  # one pair per injected copy, none missed
    assert (pairs["cosine"] >= 0.9).all()


def test_ngram_jaccard_pairs(docs_ds):
    from collections import Counter

    from anomaly_detection_ray.stages import dedup

    out = dedup.ngram_jaccard_pairs(docs_ds, n=3, max_df=8, threshold=0.5)

    # independent brute force: same df-filtered set semantics, all pairs
    df = docs_ds.to_pandas()
    sets = {int(i): set(tx.word_ngram_hashes(t, 3).tolist())
            for i, t in zip(df["doc_id"], df["text"])}
    dfc = Counter(g for s in sets.values() for g in s)
    fsets = {i: {g for g in s if dfc[g] <= 8} for i, s in sets.items()}
    exp = []
    ids = sorted(fsets)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1:]:
            inter = len(fsets[a] & fsets[b])
            if inter and inter / len(fsets[a] | fsets[b]) >= 0.5:
                exp.append((a, b, inter / len(fsets[a] | fsets[b])))

    got = list(zip(out["id_a"], out["id_b"], out["jaccard"]))
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in exp]
    assert np.allclose([j for *_, j in got], [j for *_, j in exp])
    # the exact-duplicate triple must be present with jaccard 1.0
    perfect = {(a, b) for a, b, j in got if j == 1.0}
    assert {(3, 10), (3, 20), (10, 20)} <= perfect


def test_connected_components_regimes_agree(ray_session):
    """stages/cc.py: driver union-find and Ray label propagation produce
    bit-identical (node, component=min id) tables on a random multi-
    component graph; known chain/star components come out right."""
    import ray.data as rd

    from anomaly_detection_ray.stages.cc import (_label_propagation,
                                                 connected_components)

    r = np.random.default_rng(9)
    e = pd.DataFrame({"id_a": r.integers(0, 120, 90),
                      "id_b": r.integers(0, 120, 90)})
    uf = connected_components(e)  # small => union-find regime
    lp = _label_propagation(rd.from_pandas(e).repartition(5),
                            "id_a", "id_b", max_iters=50,
                            num_partitions=2)
    m = uf.merge(lp, on="node", suffixes=("_uf", "_lp"))
    assert len(m) == len(uf) == len(lp)
    assert (m["component_uf"] == m["component_lp"]).all()

    # chain 10-11-12-13 and star 20-{21,22,23}: min-id components
    known = pd.DataFrame({"id_a": [11, 12, 13, 21, 22, 23],
                          "id_b": [10, 11, 12, 20, 20, 20]})
    got = connected_components(known).set_index("node")["component"]
    assert all(got[n] == 10 for n in (10, 11, 12, 13))
    assert all(got[n] == 20 for n in (20, 21, 22, 23))


def test_bpe_training_and_encode(ray_session):
    """BPE merges on a controlled corpus: most frequent pair merges first,
    encode applies rules in rank order, and tokens always reassemble to
    the original word + end marker."""
    import ray.data as rd

    from anomaly_detection_ray.functions import bpe

    docs = pd.DataFrame({"text": ["low low low low low",
                                  "lower lower newest newest",
                                  "newest newest newest newest"]})
    counts = bpe.word_counts(rd.from_pandas(docs))
    assert dict(zip(counts["word"], counts["cnt"])) == {
        "low": 5, "lower": 2, "newest": 6}
    rules = bpe.train_bpe(counts, num_merges=10, min_freq=2)
    # 'es' (freq 6) or 'est'-chain dominates early; 'lo'+'w' merges exist
    assert len(rules) == 10
    # BPE invariant: a post-merge pair's count never exceeds the pair it
    # came from, so chosen frequencies are non-increasing across ranks
    assert rules["freq"].is_monotonic_decreasing
    first = (rules["left"].iloc[0], rules["right"].iloc[0])
    assert first in {("e", "s"), ("s", "t"), ("l", "o"), ("o", "w"),
                     ("n", "e"), ("w", "e"), ("t", "</w>"), ("e", "w")}
    for w in ["low", "lower", "newest", "lowest"]:
        toks = bpe.encode_word(w, rules)
        assert "".join(toks) == w + bpe.EOW
    # frequent whole word collapses to few tokens
    assert len(bpe.encode_word("newest", rules)) <= 3


def test_connected_components_long_chain_converges(ray_session):
    """Pointer jumping: a 200-node chain (diameter 199) converges within
    the default iteration budget and labels every node with the chain
    minimum."""
    import ray.data as rd

    from anomaly_detection_ray.stages.cc import _label_propagation

    n = 64
    e = pd.DataFrame({"id_a": np.arange(1, n), "id_b": np.arange(0, n - 1)})
    out = _label_propagation(rd.from_pandas(e).repartition(4),
                             "id_a", "id_b", max_iters=12,
                             num_partitions=2)
    assert len(out) == n
    assert (out["component"] == 0).all()


def test_pigeonhole_pairs_exact_on_hot_bucket():
    """The recursive bucket kernel finds EVERY Hamming<=3 pair in a bucket
    far larger than the brute-force cap — bit-identical to an O(n^2)
    reference — including pairs the old head(256) truncation dropped."""
    from anomaly_detection_ray.functions import text as tx
    from anomaly_detection_ray.stages.dedup import _pigeonhole_pairs

    rng = np.random.default_rng(11)
    n = 2000
    base = rng.integers(0, 2**48, size=n, dtype=np.uint64) << np.uint64(16)
    h = base.copy()  # band 0 (bits 0..15) identical: one hot bucket
    # plant close pairs across the WHOLE id range (old cap kept first 256)
    for i in range(0, n - 1, 97):
        h[i + 1] = h[i] ^ (np.uint64(1) << np.uint64(rng.integers(16, 64)))
    ids = np.arange(n, dtype=np.int64)
    bits = np.arange(16, 64)
    ia, ib, d, trunc = _pigeonhole_pairs(ids, h, bits, 3, cap=64,
                                         quad_cap=100_000)
    assert trunc == 0
    got = {tuple(sorted((int(a), int(b)))) for a, b in zip(ia, ib)}
    ti, tj = np.triu_indices(n, 1)
    dd = tx.hamming64(h[ti], h[tj])
    want = {tuple(sorted((int(ids[i]), int(ids[j]))))
            for i, j in zip(ti[dd <= 3], tj[dd <= 3])}
    assert got == want and len(want) > 15  # pairs live beyond index 256


def test_pigeonhole_mega_group_counts_truncation():
    """A near-identical mega-group beyond quad_cap truncates its quadratic
    pair OUTPUT with an exact dropped-pair count — never silently."""
    from anomaly_detection_ray.stages.dedup import _pigeonhole_pairs
    n, qc = 3000, 100
    h = np.full(n, 0xDEAD0000, dtype=np.uint64)
    ids = np.arange(n, dtype=np.int64)
    ia, ib, d, trunc = _pigeonhole_pairs(ids, h, np.arange(16, 64), 3,
                                         cap=64, quad_cap=qc)
    assert len(ia) == qc * (qc - 1) // 2
    assert trunc == n * (n - 1) // 2 - qc * (qc - 1) // 2
    assert (d == 0).all()


def test_simhash_dedup_reports_truncation(ray_session):
    """End-to-end: identical texts form an identical-simhash mega-group;
    with a tiny quad_cap the dropped-pair count surfaces in the report."""
    import ray.data as rd

    from anomaly_detection_ray.stages import dedup
    df = pd.DataFrame({"doc_id": range(80),
                       "text": ["the same exact document body"] * 80})
    pairs, report = dedup.simhash_dedup(rd.from_pandas(df), max_hamming=3,
                                        cap=16, quad_cap=10,
                                        with_report=True)
    assert report["truncated_pairs"] > 0
    assert (pairs["id_a"] >= 0).all()  # sentinel rows stripped
    # emitted + per-band counted >= the true pair count for one band
    assert len(pairs) == 10 * 9 // 2


def test_embedding_near_dup_exact_beyond_old_cap(ray_session):
    """A hot bucket of 700 near-identical vectors: every one of the
    n*(n-1)/2 pairs is verified (the old head(512) silently dropped 188
    members' pairs); with a small bucket_cap the drop is counted."""
    import ray.data as rd

    from anomaly_detection_ray.stages import dedup
    rng = np.random.default_rng(3)
    base = rng.normal(size=32)
    vecs = base + rng.normal(scale=1e-4, size=(700, 32))
    df = pd.DataFrame({"vec_id": range(700), "embedding": list(vecs)})
    pairs = dedup.embedding_near_dup(rd.from_pandas(df), threshold=0.999)
    assert len(pairs) == 700 * 699 // 2

    capped, report = dedup.embedding_near_dup(
        rd.from_pandas(df), threshold=0.999, bucket_cap=100,
        with_report=True)
    assert len(capped) == 100 * 99 // 2
    assert report["truncated_pairs"] > 0


def test_repetition_features_match_slow_reference():
    """Vectorized Gopher repetition signals == per-doc Counter reference on
    adversarial inputs: empty/null docs, all-same-word docs, apostrophes,
    single word, cross-doc adjacency (no bigram bleed between docs)."""
    import collections
    import re

    import pandas as pd

    from anomaly_detection_ray.functions import text as tx

    docs = pd.Series([
        "", None, "batch batch batch batch",
        "a b a b a b", "word", "don't don't stop",
        "x y z x y z x y z", "q",   # adjacent docs ending/starting alike:
        "q q",                       # run must not bleed across docs
        "aa bb aa bb cc aa",
    ])
    got = tx.repetition_features(docs)
    for i, s in enumerate(docs):
        ws = re.findall(r"[\w']+", (s or "").lower())
        n = len(ws)
        assert got["n_words"][i] == n
        if n == 0:
            for k in ("uniq_word_frac", "top_word_frac", "top_bigram_frac"):
                assert got[k][i] == 0.0
            assert got["max_word_run"][i] == 0
            continue
        wc = collections.Counter(ws)
        assert got["uniq_word_frac"][i] == len(wc) / n
        assert got["top_word_frac"][i] == max(wc.values()) / n
        bg = collections.Counter(zip(ws, ws[1:]))
        top_big = max(bg.values()) if bg else 0
        assert got["top_bigram_frac"][i] == top_big / max(n - 1, 1)
        best = run = 1
        for a, b in zip(ws, ws[1:]):
            run = run + 1 if a == b else 1
            best = max(best, run)
        assert got["max_word_run"][i] == best


def test_pii_scan_and_redact_kernels():
    """PII kernels on tricky strings: multiple hits, no hits, boundary
    cases (a 4-digit octet is not an IP), order of redaction (a redacted
    email can't re-match phone/ip)."""
    import pandas as pd

    from anomaly_detection_ray.functions import text as tx

    s = pd.Series([
        "mail a.b+c@ex-am.ple.org and d@e.io",
        "call +1-555-123-4567 or +49-30-1234567",
        "hosts 10.0.0.1 and 192.168.255.3",
        "not an ip: 1234.5.6.7 nor 1.2.3",
        "no pii here", None,
    ])
    got = tx.pii_scan(s)
    assert got["n_email"].tolist() == [2, 0, 0, 0, 0, 0]
    assert got["n_phone"].tolist() == [0, 2, 0, 0, 0, 0]
    assert got["n_ip"].tolist() == [0, 0, 2, 0, 0, 0]
    red = tx.pii_redact(s)
    assert red[0] == "mail <EMAIL> and <EMAIL>"
    assert red[1] == "call <PHONE> or <PHONE>"
    assert red[2] == "hosts <IP> and <IP>"
    assert red[3] == "not an ip: 1234.5.6.7 nor 1.2.3"
    assert red[5] == ""


def test_charlm_matches_sequential_reference_and_ranks_garbage(ray_session):
    """Distributed char-trigram LM == sequential Counter reference
    (bit-exact table via integer fold); scores are partitioning-invariant;
    out-of-distribution text scores more bits/char than in-distribution."""
    import collections

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from anomaly_detection_ray.functions import charlm

    docs = ["the cat sat on the mat", "the dog sat on the log",
            "the cat and the dog", "zq#xv!!7 qq zz@@",
            "the mat and the log", ""]
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})

    def run(nparts):
        ds = rd.from_pandas(df).repartition(nparts)
        logp = charlm.train_char_lm(ds, alpha=0.1)
        return (charlm.score_char_lm(ds, logp).to_pandas()
                .sort_values("doc_id").reset_index(drop=True)), logp

    out, logp = run(2)
    out4, logp4 = run(4)
    np.testing.assert_array_equal(logp, logp4)
    pd.testing.assert_frame_equal(out, out4)

    # sequential reference
    def cid(ch):
        o = ord(ch.encode("ascii", "replace").decode())
        return o - 31 if 32 <= o <= 126 else 0

    cnt = collections.Counter()
    for d in docs:
        ids = [cid(c) for c in d]
        for i in range(len(ids) - 2):
            cnt[ids[i] * 96 * 96 + ids[i + 1] * 96 + ids[i + 2]] += 1
    Vv = 96
    for i, d in enumerate(docs):
        ids = [cid(c) for c in d]
        tot, n = 0.0, 0
        for j in range(len(ids) - 2):
            k = ids[j] * Vv * Vv + ids[j + 1] * Vv + ids[j + 2]
            ctx = sum(cnt[k // Vv * Vv + c] for c in range(Vv))
            tot += np.log2(cnt[k] + 0.1) - np.log2(ctx + 0.1 * Vv)
            n += 1
        want = round(-tot / max(n, 1), 6)
        assert abs(out["bits_per_char"][i] - want) < 1e-9, (i, d)
        assert out["n_trigrams"][i] == max(len(d) - 2, 0)

    # the garbage doc is the most surprising one
    assert out.loc[3, "bits_per_char"] == out["bits_per_char"].max()


def test_dup_span_stats_counts_shared_and_repeated_windows(ray_session):
    """Hash-windowed substring dedup: a doc sharing an 8-token span with
    another gets those windows flagged; a doc repeating its own span
    counts too; a short doc (< window tokens) reports 0 windows; an
    all-unique doc reports dup_frac 0. Sequential recomputation is the
    oracle."""
    import ray.data as rd

    from anomaly_detection_ray.stages import dedup

    span = "one two three four five six seven eight"
    docs = {
        0: span + " tail0 tail1 tail2 tail3",          # shares span with 1
        1: "head0 head1 head2 head3 " + span,          # shares span with 0
        2: span + " " + span,                          # self-repeat
        3: "u0 u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11",    # unique
        4: "too short",                                # < 8 tokens
    }
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": list(docs.values())}))
    out = (dedup.dup_span_stats(ds, window=8, stride=4).to_pandas()
           .set_index("doc_id").sort_index())

    # sequential oracle
    from collections import Counter
    wins = {}
    for did, txt in docs.items():
        toks = txt.split(" ")
        wins[did] = [" ".join(toks[p:p + 8])
                     for p in range(0, len(toks) - 7, 4)]
    tot = Counter(w for ws in wins.values() for w in ws)
    for did, ws in wins.items():
        nd = sum(1 for w in ws if tot[w] >= 2)
        assert out.loc[did, "n_windows"] == len(ws)
        assert out.loc[did, "n_dup_windows"] == nd
        exp = nd / len(ws) if ws else 0.0
        assert out.loc[did, "dup_frac"] == exp

    assert out.loc[4, "n_windows"] == 0 and out.loc[4, "dup_frac"] == 0.0
    assert out.loc[3, "n_dup_windows"] == 0
    assert out.loc[0, "n_dup_windows"] >= 1
    assert out.loc[2, "n_dup_windows"] >= 2  # repeated span inside one doc


def test_levenshtein_kernel_and_edit_verify(ray_session):
    """Edit-distance kernel matches a brute-force DP (random fuzz) and
    edit_verify_pairs attaches correct normalized similarity to candidate
    pairs fetched through the filtered streaming pass."""
    import random

    import ray.data as rd

    from anomaly_detection_ray.stages import dedup

    def ref(a, b):
        dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
        for i in range(len(a) + 1):
            dp[i][0] = i
        for j in range(len(b) + 1):
            dp[0][j] = j
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                dp[i][j] = min(dp[i - 1][j] + 1, dp[i][j - 1] + 1,
                               dp[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
        return dp[-1][-1]

    rng = random.Random(7)
    for _ in range(200):
        a = "".join(rng.choice("abcde ") for _ in range(rng.randint(0, 15)))
        b = "".join(rng.choice("abcde ") for _ in range(rng.randint(0, 15)))
        assert dedup.levenshtein(a, b) == ref(a, b), (a, b)

    texts = {0: "the quick brown fox jumps over the lazy dog today",
             1: "the quick brown fox jumps over the lazy cat today",
             2: "completely different content with nothing shared here ok"}
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values())}))
    pairs = pd.DataFrame({"id_a": [0], "id_b": [1], "jaccard": [0.8]})
    out = dedup.edit_verify_pairs(ds, pairs)
    exp = 1.0 - ref(texts[0], texts[1]) / max(len(texts[0]), len(texts[1]))
    assert out["edit_sim"].iloc[0] == exp
    # empty candidate list keeps the schema
    empty = dedup.edit_verify_pairs(ds, pairs.iloc[:0])
    assert "edit_sim" in empty.columns and len(empty) == 0


def test_dup_span_stats_large_regime_matches(ray_session):
    """Forcing the fully distributed (no-hot-set) regime with
    max_broadcast_hot=0 yields exactly the broadcast regime's rows."""
    import ray.data as rd

    from anomaly_detection_ray.stages import dedup

    span = "w1 w2 w3 w4 w5 w6 w7 w8"
    texts = [span + f" t{i} u{i} v{i} x{i}" for i in range(12)]
    texts.append("short doc")
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}))
    a = (dedup.dup_span_stats(ds).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (dedup.dup_span_stats(ds, max_broadcast_hot=0).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)
    assert (a.loc[a["doc_id"] < 12, "n_dup_windows"] >= 1).all()


def test_contamination_stats_flags_eval_overlap(ray_session):
    """A corpus doc sharing an 8-gram with the eval set is flagged with
    the exact per-position hit count; disjoint docs are clean; short docs
    report 0 windows."""
    import ray.data as rd

    from anomaly_detection_ray.stages import dedup

    span = "e1 e2 e3 e4 e5 e6 e7 e8"
    ev = rd.from_pandas(pd.DataFrame(
        {"doc_id": [1000], "text": ["pre " + span + " post"]}))
    corpus = rd.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [span + " tail1 tail2",            # 1 overlapping window
                 "c1 c2 c3 c4 c5 c6 c7 c8 c9",     # clean
                 "tiny"]}))                        # < 8 tokens
    out = (dedup.contamination_stats(corpus, ev).to_pandas()
           .set_index("doc_id").sort_index())
    assert out.loc[0, "n_contaminated"] == 1 and out.loc[0, "is_contaminated"]
    assert out.loc[1, "n_contaminated"] == 0 and not out.loc[1, "is_contaminated"]
    assert out.loc[2, "n_windows"] == 0 and not out.loc[2, "is_contaminated"]
    # repeated eval span inside one corpus doc counts per position
    corpus2 = rd.from_pandas(pd.DataFrame(
        {"doc_id": [5], "text": [span + " mid " + span]}))
    out2 = dedup.contamination_stats(corpus2, ev).to_pandas()
    assert out2["n_contaminated"].iloc[0] == 2


def test_contamination_semi_join_matches_broadcast(ray_session, docs_ds):
    """The large-eval (no driver-resident inventory) regime must reproduce
    the broadcast regime bit-for-bit, including per-position repeat
    counts and 0-window short docs."""
    import ray.data as rd

    from anomaly_detection_ray.stages import dedup

    ev = docs_ds.filter(lambda r: r["doc_id"] % 7 == 0)
    a = (dedup.contamination_stats(docs_ds, ev, mode="broadcast")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (dedup.contamination_stats(docs_ds, ev, mode="semi_join")
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b[a.columns.tolist()])
    assert a["is_contaminated"].any()           # eval docs self-overlap

    # repeat-count semantics survive the per-doc key dedup
    span = "e1 e2 e3 e4 e5 e6 e7 e8"
    ev2 = rd.from_pandas(pd.DataFrame({"doc_id": [9], "text": [span]}))
    c2 = rd.from_pandas(pd.DataFrame(
        {"doc_id": [5], "text": [span + " mid " + span]}))
    out = dedup.contamination_stats(c2, ev2, mode="semi_join")
    assert out["n_contaminated"].iloc[0] == 2


def test_bpe_encoder_stage_matches_encode_word(ray_session, docs_ds):
    """The actor-pool encode stage's per-doc token counts must equal a
    sequential encode_word pass (memoization and partitioning must not
    change results)."""
    from anomaly_detection_ray.functions import bpe

    rules = bpe.train_bpe(bpe.word_counts(docs_ds), num_merges=15,
                          min_freq=2)
    got = (docs_ds.map_batches(
        bpe.BpeEncoder, fn_constructor_kwargs={"rules": rules},
        batch_format="pandas", batch_size=32, concurrency=2, num_cpus=1)
        .to_pandas().sort_values("doc_id").reset_index(drop=True))

    df = docs_ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    for _, row in df.head(20).iterrows():
        words = bpe.WORD_RE.findall((row["text"] or "").lower())
        want = sum(len(bpe.encode_word(w, rules)) for w in words)
        g = got[got["doc_id"] == row["doc_id"]].iloc[0]
        assert g["n_words"] == len(words)
        assert g["n_bpe_tokens"] == want

def test_minhash_dedup_as_dataset_parity(docs_ds):
    """as_dataset=True keeps pairs + clusters worker-resident; both CC
    regimes (union-find and forced label propagation) must be bit-equal
    to the historical pandas path."""
    from anomaly_detection_ray.stages import dedup
    want = dedup.minhash_dedup(docs_ds, threshold=0.6)
    for cc_thr in (200_000, 0):   # small regime, forced-large regime
        got = (dedup.minhash_dedup(docs_ds, threshold=0.6, as_dataset=True,
                                   cc_edge_threshold=cc_thr)
               .to_pandas().astype("int64")
               .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)


def test_minhash_pairs_as_dataset_parity(docs_ds):
    from anomaly_detection_ray.stages import dedup
    want = (dedup.minhash_candidate_pairs(docs_ds)
            .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    got = (dedup.minhash_candidate_pairs(docs_ds, as_dataset=True)
           .to_pandas().sort_values(["id_a", "id_b"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
