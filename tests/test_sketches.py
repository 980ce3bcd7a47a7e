import numpy as np
import pandas as pd

from anomaly_detection_ray.functions import sketches as sk


def test_welford_merge_matches_whole():
    rng = np.random.default_rng(1)
    v = rng.normal(5, 2, size=10_000)
    whole = sk.WelfordPartial.from_values(v)
    parts = [sk.WelfordPartial.from_values(c) for c in np.array_split(v, 13)]
    acc = sk.WelfordPartial()
    for p in parts:
        acc = acc.merge(p)
    assert acc.n == whole.n == len(v)
    np.testing.assert_allclose(acc.mean, v.mean())
    np.testing.assert_allclose(acc.std, v.std())
    np.testing.assert_allclose(acc.min, v.min())
    np.testing.assert_allclose(acc.max, v.max())


def test_hll_estimate():
    rng = np.random.default_rng(2)
    n = 50_000
    h = rng.integers(0, 2**64, size=n, dtype=np.uint64)
    hll = sk.HyperLogLog(p=12)
    parts = [sk.HyperLogLog(p=12) for _ in range(4)]
    for i, chunk in enumerate(np.array_split(h, 4)):
        parts[i].add_hashes(chunk)
    for p in parts:
        hll = hll.merge(p)
    est = hll.estimate()
    assert abs(est - n) / n < 0.05


def test_bloom():
    rng = np.random.default_rng(3)
    present = rng.integers(0, 2**64, size=5000, dtype=np.uint64)
    absent = rng.integers(0, 2**64, size=5000, dtype=np.uint64)
    bf = sk.BloomFilter(n_bits=1 << 18, k=4)
    a, b = sk.BloomFilter(1 << 18, 4), sk.BloomFilter(1 << 18, 4)
    a.add_hashes(present[:2500])
    b.add_hashes(present[2500:])
    bf = a.merge(b)
    assert bf.contains_hashes(present).all()
    fp = bf.contains_hashes(absent).mean()
    assert fp < 0.02


def test_tdigest_quantiles():
    rng = np.random.default_rng(4)
    v = rng.lognormal(8, 0.5, size=40_000)
    td = sk.TDigest()
    parts = []
    for chunk in np.array_split(v, 10):
        p = sk.TDigest()
        p.add_values(chunk)
        parts.append(sk.TDigest.from_bytes(p.to_bytes()))  # serialization roundtrip
    for p in parts:
        td = td.merge(p)
    for q in [0.01, 0.25, 0.5, 0.75, 0.99]:
        exact = np.quantile(v, q)
        assert abs(td.quantile(q) - exact) / exact < 0.02


def test_histogram_ks_psi():
    rng = np.random.default_rng(5)
    edges = np.linspace(0, 10, 21)
    a = sk.Histogram(edges)
    b = sk.Histogram(edges)
    c = sk.Histogram(edges)
    a.add_values(rng.normal(5, 1, 20_000))
    b.add_values(rng.normal(5, 1, 20_000))
    c.add_values(rng.normal(7, 1, 20_000))  # shifted
    same_ks = sk.ks_statistic(a.counts, b.counts)
    diff_ks = sk.ks_statistic(a.counts, c.counts)
    assert same_ks < 0.02 and diff_ks > 0.5
    assert sk.psi(a.counts, b.counts) < 0.02
    assert sk.psi(a.counts, c.counts) > 1.0
    merged = a.merge(b)
    assert merged.counts.sum() == 40_000


def test_refined_quantile_exact_vs_sort(ray_session):
    """Histogram-refinement selection returns the EXACT quantile_disc
    element (sorted[ceil(q*n)-1]) on a heavy-tailed mixture with mass
    duplicates, for every q including the extremes."""
    import ray.data as rd

    from anomaly_detection_ray.stages.quantile import refined_quantile

    r = np.random.default_rng(2)
    v = np.concatenate([r.normal(0, 1, 12000), r.exponential(5, 8000),
                        np.full(500, 3.0)])
    ds = rd.from_pandas(pd.DataFrame({"x": v})).repartition(6)
    got = refined_quantile(ds, "x", [0.001, 0.25, 0.5, 0.99, 1.0],
                           bins=32, max_collect=200)
    sv = np.sort(v)
    for q, val in got.items():
        want = sv[max(int(np.ceil(q * len(sv) - 1e-9)), 1) - 1]
        assert val == want, (q, val, want)


def test_refined_quantile_heavy_mode(ray_session):
    """A value repeated far more than max_collect times that holds the
    target rank must resolve exactly instead of crashing: refinement hits
    the float-width floor around the point mass, then rank-selects among
    the (tiny) distinct-value fold. Covers quantiles inside, at the edge
    of, and outside the mode, plus an all-equal column."""
    import ray.data as rd

    from anomaly_detection_ray.stages.quantile import refined_quantile

    r = np.random.default_rng(7)
    v = np.concatenate([r.normal(0, 1, 50_000), np.full(50_000, 42.0),
                        r.normal(100, 1, 50_000)])
    ds = rd.from_pandas(pd.DataFrame({"x": v})).repartition(6)
    got = refined_quantile(ds, "x", [0.25, 0.5, 0.6, 0.9],
                           bins=32, max_collect=200)
    sv = np.sort(v)
    for q, val in got.items():
        want = sv[max(int(np.ceil(q * len(sv) - 1e-9)), 1) - 1]
        assert val == want, (q, val, want)

    allsame = rd.from_pandas(pd.DataFrame({"x": np.full(5000, 7.5)}))
    got = refined_quantile(allsame, "x", [0.1, 0.9], max_collect=100)
    assert got == {0.1: 7.5, 0.9: 7.5}


def test_profile_table_mixed(ray_session):
    """Single-pass column profiler: numeric Welford merge across batches,
    NaN/null accounting, lexicographic string min/max."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from anomaly_detection_ray.stages.stats import profile_table

    df = pd.DataFrame({
        "x": [1.0, 2.0, np.nan, 4.0, None, 8.0],
        "i": [5, 3, 9, 1, 7, 2],
        "s": ["pear", "apple", None, "mango", "fig", "kiwi"],
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(3)
    out = profile_table(ds).set_index("column_name")

    x = out.loc["x"]
    assert x["n_rows"] == 6 and x["n_valid"] == 4  # NaN and None invalid
    vals = np.array([1.0, 2.0, 4.0, 8.0])
    assert x["min"] == 1.0 and x["max"] == 8.0
    assert x["mean"] == round(vals.mean(), 4)
    assert x["std"] == round(float(np.std(vals)), 4)  # population

    i = out.loc["i"]
    assert (i["min"], i["max"], i["n_valid"]) == (1.0, 9.0, 6)

    s = out.loc["s"]
    assert s["min_str"] == "apple" and s["max_str"] == "pear"
    assert s["n_valid"] == 5 and np.isnan(s["mean"])


def test_misra_gries_guarantee_and_merge():
    """Every key with true freq > n/k survives: per-chunk MG summaries,
    summed then MG-compacted (the exact shape q_heavy_hitters uses)."""
    from anomaly_detection_ray.functions.sketches import MisraGries
    rng = np.random.default_rng(7)
    # zipf-ish stream: a few hot keys over a wide cold tail
    hot = np.repeat(np.arange(5), 4000)                 # 4000 each
    cold = rng.integers(100, 20000, size=30000)         # ~1.5 avg each
    stream = rng.permutation(np.concatenate([hot, cold]))
    n, k = len(stream), 64

    # chunked pass-1 partials summed, then compacted
    import pandas as pd
    parts = []
    for chunk in np.array_split(stream, 13):
        mg = MisraGries(k)
        mg.add_many(chunk)
        ks, cs = mg.items()
        parts.append(pd.DataFrame({"v": ks, "n": cs}))
    m = pd.concat(parts).groupby("v", as_index=False)["n"].sum()
    cand, lb = MisraGries.compact(m["v"].to_numpy(), m["n"].to_numpy(), k)

    assert len(cand) <= k
    # guarantee: all keys with true count > n/k are candidates
    thresh = n / k
    truth = pd.Series(stream).value_counts()
    must = set(truth[truth > thresh].index.tolist())
    assert must <= set(int(x) for x in cand)
    # lower bounds never exceed true counts
    for key, c in zip(cand, lb):
        assert c <= truth.get(int(key), 0)


def _brute_gini(v: np.ndarray) -> float:
    v = np.sort(v[(~np.isnan(v)) & (v >= 0)])
    n = len(v)
    s = v.sum()
    if n == 0 or s <= 0:
        return float("nan")
    i = np.arange(1, n + 1, dtype=np.float64)
    return float(2.0 * (i * v).sum() / (n * s) - (n + 1.0) / n)


def test_exact_gini_vs_sort(ray_session):
    """Histogram-refinement Gini equals the sorted closed form on a
    multi-group mixture with heavy tails, point-mass ties, NaNs, and
    negatives (excluded by domain) — with bins/max_collect forced small
    so recursion, the tie shortcut, and the collect path all fire."""
    import ray.data as rd

    from anomaly_detection_ray.stages.gini import exact_gini

    r = np.random.default_rng(5)
    frames = []
    truth = {}
    specs = {
        "uniform": r.uniform(0, 100, 9000),
        "pareto": (r.pareto(1.3, 9000) + 1) * 10,
        "ties": np.concatenate([np.full(4000, 7.0), r.uniform(0, 20, 5000)]),
        "messy": np.concatenate([r.exponential(3, 7000),
                                 np.full(300, np.nan), -r.uniform(1, 5, 200)]),
        "zeros": np.zeros(500),
    }
    for g, v in specs.items():
        frames.append(pd.DataFrame({"grp": g, "x": v}))
        truth[g] = _brute_gini(v)
    df = pd.concat(frames, ignore_index=True)
    ds = rd.from_pandas(df).repartition(8)
    got = exact_gini(ds, "x", "grp", bins=8, max_collect=2000)
    assert list(got["grp"]) == sorted(specs)
    for _, row in got.iterrows():
        want = truth[row["grp"]]
        if np.isnan(want):
            assert np.isnan(row["gini"]), row["grp"]
        else:
            assert abs(row["gini"] - want) < 1e-9, (row["grp"],
                                                    row["gini"], want)
    # n excludes NaN/negative rows
    nm = got.set_index("grp")["n"]
    assert nm["messy"] == 7000
    assert nm["zeros"] == 500 and np.isnan(got.set_index("grp")
                                           .loc["zeros", "gini"])
