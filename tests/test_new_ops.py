"""Parity tests for the round-1 late additions: EMA-percentile kernel,
LastNAverage repair, windowed PercentScore, feature construction, PCA.

Each vectorized implementation is checked against a straight sequential
re-implementation of the reference semantics (oracle.py classes or inline
loops mirroring /root/reference/src/...)."""

import numpy as np
import pandas as pd
import pytest

from anomaly_detection_ray import oracle
from anomaly_detection_ray.functions.grading import ERROR_CODE, OK_CODE, UNDEFINED_CODE
from anomaly_detection_ray.functions.rolling import ema_percentile_check
from anomaly_detection_ray.stages.features import FeatureConfig, construct_features
from anomaly_detection_ray.stages.iforest import (IsolationForestModel, PCAModel,
                                                  fit_pca_iforest)
from anomaly_detection_ray.stages.normalize import (last_n_average_repair,
                                                    windowed_percent_score)

rng = np.random.default_rng(7)


def seq_ema_percentile(values, percentile, window, start_on, period):
    """Sequential mirror of ema_percentile.py:62-98."""
    smoothing = 2.0 / (period + 1)
    EMA, codes = [], []
    percentiles = None
    for v in values:
        EMA.append(v if not EMA else v * smoothing + EMA[-1] * (1 - smoothing))
        if len(EMA) > window:
            EMA = EMA[-window:]
        if len(EMA) >= start_on:
            percentiles = np.percentile(EMA, [100 - percentile, percentile])
        if percentiles is not None:
            if EMA[-1] > percentiles[1] or EMA[-1] < percentiles[0]:
                codes.append(ERROR_CODE)
            else:
                codes.append(OK_CODE)
        else:
            codes.append(UNDEFINED_CODE)
    return np.array(codes, dtype=np.int8)


@pytest.mark.parametrize("percentile,window,start_on,period", [
    (95, 20, 5, 10), (90, 50, 10, 5), (99, 10, 1, 3)])
def test_ema_percentile_matches_sequential(percentile, window, start_on, period):
    values = rng.normal(50, 10, size=300)
    values[50] = 200.0
    values[150] = -100.0
    got = ema_percentile_check(values, percentile, window, start_on, period)
    want = seq_ema_percentile(values, percentile, window, start_on, period)
    np.testing.assert_array_equal(got["status_code"], want)


def test_last_n_average_repair_matches_oracle():
    values = rng.normal(50, 10, size=200)
    codes = np.where(rng.random(200) < 0.15, ERROR_CODE, OK_CODE).astype(np.int8)
    for N, period in [(5, 1), (3, 2)]:
        got = last_n_average_repair(values, codes, N, period)
        o = (oracle.OracleLastNAverage(N) if period == 1
             else oracle.OraclePeriodicLastNAverage(N, period))
        want = []
        for v, c in zip(values, codes):
            if c == ERROR_CODE:
                rep = o.get_normalized([v])
                want.append(rep[0] if rep is not False else v)
                if rep is False:
                    pass  # memory was appended with raw value inside get_normalized
            else:
                o.add_value([v])
                want.append(v)
        np.testing.assert_allclose(got, np.array(want), rtol=1e-12)


def test_windowed_percent_score_matches_sequential():
    n = 300
    ts = np.cumsum(rng.integers(10, 120, size=n)).astype(np.float64)
    scores = rng.random(n).round(2)
    interval, data_interval = 600.0, 60.0
    got = windowed_percent_score(scores, ts, interval, data_interval)
    # sequential mirror of combination.py:204-216
    memory = []
    want = []
    num_in_interval = int(interval / data_interval)
    for s, t in zip(scores, ts):
        memory.append([s, t])
        now = memory[-1][1]
        memory = [m for m in memory if m[1] > now - interval]
        want.append(sum(m[0] for m in memory) / max(num_in_interval, len(memory)))
    np.testing.assert_allclose(got, np.array(want), rtol=1e-12)


def test_feature_construction_matches_oracle():
    n = 120
    values = rng.normal(0, 1, size=n)
    ts = 1609459200.0 + np.arange(n) * 3600.0
    cfg = FeatureConfig(n_features=1, averages=[[2, 5]], shifts=[[1, 2]],
                        periodic_averages=[[(2, [3])]],
                        time_features=["hour", "weekday"])
    fv, valid = construct_features(values[:, None], ts, cfg)
    o = oracle.FeatureConstruction(
        input_vector_size=1, averages=[[2, 5]], shifts=[[1, 2]],
        periodic_averages=[[(2, [3])]], time_features=["hour", "weekday"])
    assert cfg.memory_size == o.memory_size
    for i in range(n):
        out = o.insert([values[i]], ts[i])
        if out is False:
            assert not valid[i]
        else:
            assert valid[i]
            np.testing.assert_allclose(fv[i], np.array(out), rtol=1e-10,
                                       err_msg=f"row {i}")
    # oracle time-feature order check: weekday col index
    assert fv.shape[1] == 1 + 2 + 1 + 2 + 2


def test_pca_model_recovers_principal_direction():
    # data stretched along (1, 1): first component must align with it
    base = rng.normal(0, 1, size=(500, 1))
    X = np.hstack([base, base]) + rng.normal(0, 0.05, size=(500, 2))
    pca = PCAModel(1).fit(X)
    comp = pca.components_[:, 0]
    direction = np.abs(comp @ np.array([1, 1]) / np.sqrt(2))
    assert direction > 0.99
    Z = pca.transform(X)
    assert Z.shape == (500, 1)
    assert np.abs(Z.mean()) < 1e-9  # centered projection


def test_pca_iforest_flags_projected_outliers():
    X = np.hstack([rng.normal(0, 1, size=(400, 1))] * 2)
    X += rng.normal(0, 0.02, size=X.shape)
    pca, forest = fit_pca_iforest(X, n_components=1, n_trees=50,
                                  max_samples=128, seed=3)
    inlier_scores = forest.scores(pca.transform(X[:50]))
    outlier = np.array([[8.0, 8.0], [-9.0, -9.0]])
    outlier_scores = forest.scores(pca.transform(outlier))
    assert outlier_scores.min() > np.median(inlier_scores)
    assert (outlier_scores > 0.5).all()


def test_trend_classification_detects_ramp():
    from anomaly_detection_ray.functions.rolling import trend_classification_check
    flat = np.full(100, 50.0) + rng.normal(0, 0.1, 100)
    up = 50.0 + np.arange(100) * 5.0
    params = dict(N=20, averaging=3, prediction_conv=5,
                  warning_stages=[0.5], amp_scale=10.0)
    r_flat = trend_classification_check(flat, **params)
    r_up = trend_classification_check(up, **params)
    # flat series: once graded, everything OK
    graded = r_flat["status_code"][30:]
    assert (graded == 1).all()
    # strong uptrend: upper-limit errors appear
    assert (r_up["status_code"] == -1).any()
    assert (r_up["status_code"][:19] == 2).all()  # warm-up Undefined


def test_trend_mlp_classifier_matches_reference_shape():
    """Learned path (stages/trend.py, trend_classification.py:154-193):
    the seeded numpy MLP classifies held-out noisy ramps perfectly and the
    full check grades a ramp/flat stream like the slope path."""
    from anomaly_detection_ray.functions.rolling import trend_classification_check
    from anomaly_detection_ray.stages.trend import trend_model
    m = trend_model(20, 1500, 0.01, 0)
    r = np.random.default_rng(5)
    for cls, gen in [(0, lambda: np.linspace(1, 0, 20)),
                     (1, lambda: np.full(20, 0.5)),
                     (2, lambda: np.linspace(0, 1, 20))]:
        X = []
        for _ in range(100):
            s = gen() + r.normal(0, 0.05, 20)
            X.append((s - s.mean()) / (s.max() - s.min()))
        assert (m.predict_classes(np.array(X)) == cls).all(), cls
    flat = np.full(100, 50.0) + rng.normal(0, 0.1, 100)
    up = 50.0 + np.arange(100) * 5.0
    params = dict(N=20, averaging=3, prediction_conv=5, warning_stages=[0.5],
                  amp_scale=10.0, num_samples=1500, train_noise=0.01, seed=0)
    assert (trend_classification_check(flat, **params)["status_code"][30:] == 1).all()
    r_up = trend_classification_check(up, **params)
    assert (r_up["status_code"] == -1).any()
    assert (r_up["status_code"][:19] == 2).all()


def test_trend_config_trains_learned_classifier(ray_session):
    """The reference's trend_classification.json surface (num_samples,
    train_noise honored) runs through the config layer."""
    import ray.data as rd

    from anomaly_detection_ray.pipelines.config import run_reference_config
    v = np.concatenate([np.full(200, 50.0), 50.0 + np.arange(200) * 5.0])
    ds = rd.from_pandas(pd.DataFrame(
        {"ts": np.arange(400, dtype=np.float64), "value": v}))
    conf = {"anomaly_detection_alg": ["Trend_Classification()"],
            "anomaly_detection_conf": [{
                "num_samples": 1500, "N": 20, "averaging": 3,
                "prediction_conv": 5, "train_noise": 0.01,
                "amp_scale": 10.0, "warning_stages": [0.5],
                "input_vector_size": 1}]}
    out = (run_reference_config(conf, ds=ds, value_col="value")
           .to_pandas().sort_values("ts"))
    col = "a0_trend_classification_code"
    assert (out[col].to_numpy()[:19] == 2).all()
    assert (out[col] == -1).any()


def test_rrcf_flags_injected_outliers():
    from anomaly_detection_ray.stages.rrcf import RandomCutTree, rrcf_check
    v = rng.normal(50, 2, size=400)
    v[250] = 500.0
    out = rrcf_check(v, num_trees=24, tree_size=64, threshold=30.0, seed=1)
    assert out["rr_score"][250] > 30.0
    assert out["status_code"][250] == -1
    # normal points rarely flagged (reference-style thresholds are large:
    # CoDisp baseline grows with tree_size; their config uses 38 @ 512)
    assert (out["status_code"] == -1).sum() <= 3
    # tree bookkeeping: sizes consistent after heavy churn
    t = RandomCutTree(np.random.default_rng(0))
    for i in range(200):
        if len(t.leaves) >= 32:
            t.forget_point(i - 32)
        t.insert_point(np.array([float(i % 7), float(i % 3)]), index=i)
    assert len(t.leaves) == 32
    assert t.root.size == 32


def test_asof_join_matches_merge_asof(ray_session):
    """Distributed asof_join (tag+union+groupby+searchsorted) must equal
    pandas merge_asof(direction='backward', allow_exact_matches=True) per
    key, with unmatched left rows dropped (DuckDB ASOF JOIN semantics)."""
    import ray.data as rd

    from anomaly_detection_ray.stages.asof import asof_join

    r = np.random.default_rng(11)
    n_l, n_r = 600, 400
    left = pd.DataFrame({
        "k": r.integers(0, 8, n_l),
        "ts": r.integers(0, 10_000, n_l).astype(np.int64),
        "lid": np.arange(n_l, dtype=np.int64),
        "lv": r.normal(size=n_l),
    })
    right = pd.DataFrame({
        "k": r.integers(0, 10, n_r),  # keys 8,9 exist only on the right
        "ts": r.integers(0, 10_000, n_r).astype(np.int64),
        "rv": r.normal(size=n_r),
    })
    # exact-match tie coverage: clone some right ts onto left rows
    left.loc[:50, "ts"] = right["ts"].iloc[:51].to_numpy()
    left.loc[:50, "k"] = right["k"].iloc[:51].to_numpy()
    # dedupe (k, ts) on the right so the expected match is unambiguous
    right = right.drop_duplicates(["k", "ts"]).reset_index(drop=True)

    got = (asof_join(rd.from_pandas(left).repartition(6),
                     rd.from_pandas(right).repartition(5),
                     key="k", ts_col="ts", left_cols=["lid", "lv"],
                     right_cols=["rv"], suffix="_r", lag_col="lag_s")
           .to_pandas())

    want = (pd.merge_asof(left.sort_values("ts", kind="mergesort"),
                          right.sort_values("ts", kind="mergesort")
                          .rename(columns={"rv": "rv_r"}),
                          on="ts", by="k", direction="backward",
                          allow_exact_matches=True)
            .dropna(subset=["rv_r"]))

    got = got.sort_values("lid").reset_index(drop=True)
    want = want.sort_values("lid").reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert (got["lid"].to_numpy() == want["lid"].to_numpy()).all()
    np.testing.assert_allclose(got["rv_r"], want["rv_r"])
    np.testing.assert_allclose(got["lv"], want["lv"])
    assert (got["lag_s"].to_numpy() >= 0).all()


def test_sessionize_gap_boundary(ray_session):
    """Strict-gap semantics: gap == gap_s stays in-session, gap just over
    starts a new one; session ids are 1-based per key in time order."""
    import ray.data as rd

    from anomaly_detection_ray.stages.sessions import sessionize

    base = pd.Timestamp("2024-01-01")
    gap = 60.0
    rows = []
    # user 1: 3 events exactly 60s apart (one session), then +60.000001s
    t = base
    for i in range(3):
        rows.append({"user_id": 1, "ts": t})
        t += pd.Timedelta(seconds=60)
    rows.append({"user_id": 1, "ts": rows[-1]["ts"] + pd.Timedelta(seconds=60, microseconds=1)})
    # user 2: single event
    rows.append({"user_id": 2, "ts": base})
    df = pd.DataFrame(rows)
    out = (sessionize(rd.from_pandas(df).repartition(3), key="user_id",
                      ts_col="ts", gap_s=gap)
           .to_pandas().sort_values(["user_id", "session_id"])
           .reset_index(drop=True))
    u1 = out[out["user_id"] == 1]
    assert list(u1["session_id"]) == [1, 2]
    assert list(u1["n_events"]) == [3, 1]
    assert u1["duration_s"].iloc[0] == pytest.approx(120.0)
    u2 = out[out["user_id"] == 2]
    assert list(u2["n_events"]) == [1]
    assert u2["duration_s"].iloc[0] == 0.0


def test_interval_join_bucket_boundaries(ray_session):
    """Bucket-replication interval join: pairs that straddle bucket edges
    are found exactly once; inclusive bounds; per-key isolation. Checked
    against a brute-force O(n*m) pandas join."""
    import ray.data as rd

    from anomaly_detection_ray.stages.intervals import interval_join

    r = np.random.default_rng(23)
    n_l, n_w = 500, 40
    bucket_s = 100.0
    left = pd.DataFrame({
        "k": r.integers(0, 5, n_l),
        "ts": r.uniform(0, 10_000, n_l),  # float epoch seconds
        "lid": np.arange(n_l, dtype=np.int64),
    })
    s = r.uniform(0, 9_500, n_w)
    win = pd.DataFrame({
        "k": r.integers(0, 6, n_w),
        "wid": np.arange(n_w, dtype=np.int64),
        "start_us": (s * 1e6).astype(np.int64),
        # spans 0.3-4.7 buckets => plenty of edge-straddling windows
        "end_us": ((s + r.uniform(30, 470, n_w)) * 1e6).astype(np.int64),
    })
    # pin one exact-boundary pair: left ts == window end
    left.loc[0, ["k", "ts"]] = [0, win["end_us"].iloc[0] / 1e6]
    win.loc[0, "k"] = 0

    got = (interval_join(rd.from_pandas(left).repartition(7), win,
                         key="k", ts_col="ts", left_cols=["lid", "k"],
                         id_col="wid", bucket_s=bucket_s)
           .to_pandas())

    l_us = np.round(left["ts"].to_numpy() * 1e6).astype(np.int64)
    want = {
        (int(l), int(w))
        for i, l in enumerate(left["lid"])
        for w, ks, a, b in win[["wid", "k", "start_us", "end_us"]].itertuples(index=False)
        if left["k"].iloc[i] == ks and a <= l_us[i] <= b
    }
    assert set(zip(got["lid"], got["wid"])) == want
    assert len(got) == len(want)  # exactly-once: no duplicate pairs
    assert (0, 0) in want  # the pinned inclusive-boundary pair exists


def test_skew_aware_join_parity(ray_session):
    """Hybrid join == plain pandas merge on a half-the-rows-one-key skewed
    input; both the broadcast (hot) and shuffle (cold) paths carry rows."""
    import ray.data as rd

    from anomaly_detection_ray.stages.joins import skew_aware_join

    r = np.random.default_rng(1)
    k = np.where(r.random(4000) < 0.5, 7, r.integers(0, 200, 4000))
    left = pd.DataFrame({"lk": k, "lv": r.normal(size=4000)})
    right = pd.DataFrame({"rk": np.arange(150), "rv": r.normal(size=150)})
    got = (skew_aware_join(rd.from_pandas(left).repartition(6),
                           rd.from_pandas(right).repartition(3),
                           "lk", "rk", hot_threshold=500, num_partitions=4)
           .to_pandas().sort_values(["lk", "lv"]).reset_index(drop=True))
    want = (left.merge(right, left_on="lk", right_on="rk", how="inner")
            .sort_values(["lk", "lv"]).reset_index(drop=True))
    assert len(got) == len(want)
    np.testing.assert_allclose(got[["lk", "lv", "rv"]].to_numpy(),
                               want[["lk", "lv", "rv"]].to_numpy())
    assert (got["lk"] == 7).sum() > 1500      # hot path produced rows
    assert (got["lk"] != 7).sum() > 1000      # cold path produced rows


def test_asof_join_left_outer(ray_session):
    """how='left' keeps unmatched left rows with null right columns —
    pd.merge_asof semantics (which is left by default)."""
    import ray.data as rd

    from anomaly_detection_ray.stages.asof import asof_join

    left = pd.DataFrame({"k": [1, 1, 2, 3], "ts": [5, 50, 10, 10],
                         "lid": np.arange(4, dtype=np.int64)})
    right = pd.DataFrame({"k": [1, 2], "ts": [20, 4],
                          "rv": [1.5, 2.5]})
    got = (asof_join(rd.from_pandas(left).repartition(2),
                     rd.from_pandas(right), key="k", ts_col="ts",
                     left_cols=["lid"], right_cols=["rv"], suffix="_r",
                     lag_col="lag_s", how="left")
           .to_pandas().sort_values("lid").reset_index(drop=True))
    assert len(got) == 4  # every left row survives
    # lid 0 (k=1, ts=5 < 20) and lid 3 (k=3, no right) unmatched
    assert np.isnan(got.loc[0, "rv_r"]) and np.isnan(got.loc[3, "rv_r"])
    assert got.loc[1, "rv_r"] == 1.5 and got.loc[1, "lag_s"] == 30.0
    assert got.loc[2, "rv_r"] == 2.5 and got.loc[2, "lag_s"] == 6.0


def test_interval_join_large_matches_broadcast(ray_session):
    """interval_join_large (union co-partition shuffle) returns exactly
    the broadcast path's pair set on the same random input."""
    import ray.data as rd

    from anomaly_detection_ray.stages.intervals import (interval_join,
                                                        interval_join_large)

    r = np.random.default_rng(31)
    left = pd.DataFrame({
        "k": r.integers(0, 5, 400),
        "ts": r.uniform(0, 5_000, 400),
        "lid": np.arange(400, dtype=np.int64),
    })
    s = r.uniform(0, 4_500, 30)
    win = pd.DataFrame({
        "k": r.integers(0, 6, 30),
        "wid": np.arange(30, dtype=np.int64),
        "start_us": (s * 1e6).astype(np.int64),
        "end_us": ((s + r.uniform(50, 400, 30)) * 1e6).astype(np.int64),
    })
    small = (interval_join(rd.from_pandas(left).repartition(4), win,
                           key="k", ts_col="ts", left_cols=["lid", "k"],
                           id_col="wid", bucket_s=100.0).to_pandas())
    large = (interval_join_large(rd.from_pandas(left).repartition(4),
                                 rd.from_pandas(win).repartition(3),
                                 key="k", ts_col="ts",
                                 left_cols=["lid", "k"], id_col="wid",
                                 bucket_s=100.0).to_pandas())
    a = {(int(l), int(w)) for l, w in zip(small["lid"], small["wid"])}
    b = {(int(l), int(w)) for l, w in zip(large["lid"], large["wid"])}
    assert a == b and len(large) == len(b) > 0


def test_interval_join_large_rejects_string_payload(ray_session):
    """The large path's float64 union contract refuses string left
    columns with a clear error instead of a deep arrow failure."""
    import ray.data as rd

    from anomaly_detection_ray.stages.intervals import interval_join_large

    left = pd.DataFrame({"k": [1], "ts": [5.0], "name": ["x"]})
    win = pd.DataFrame({"k": [1], "wid": [0], "start_us": [0],
                        "end_us": [10_000_000]})
    with pytest.raises(Exception, match="numeric"):
        interval_join_large(rd.from_pandas(left), rd.from_pandas(win),
                            key="k", ts_col="ts", left_cols=["name"],
                            id_col="wid").to_pandas()


def test_asof_left_schema_consistent_when_key_has_no_right_rows(ray_session):
    """how='left' groups with zero right rows emit float64 NaN right
    columns matching matched groups' dtype — one consistent schema."""
    import ray.data as rd

    from anomaly_detection_ray.stages.asof import asof_join

    left = pd.DataFrame({"k": [1, 2], "ts": [10, 10],
                         "lid": np.array([0, 1], dtype=np.int64)})
    right = pd.DataFrame({"k": [1], "ts": [5], "rv": [7.0]})
    got = (asof_join(rd.from_pandas(left), rd.from_pandas(right), key="k",
                     ts_col="ts", left_cols=["lid"], right_cols=["rv"],
                     how="left").to_pandas()
           .sort_values("lid").reset_index(drop=True))
    assert len(got) == 2
    assert got["rv_r"].dtype == np.float64
    assert got.loc[0, "rv_r"] == 7.0 and np.isnan(got.loc[1, "rv_r"])


def test_semi_anti_join_partition_left(ray_session):
    """Native left_semi + left_anti on the same keys partition the left
    side exactly (every left row lands in exactly one output)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    rng = np.random.default_rng(17)
    left = pd.DataFrame({"k": rng.integers(0, 50, 300),
                         "payload": np.arange(300)})
    right = pd.DataFrame({"rk": rng.integers(25, 60, 100)})
    lds, rds = rd.from_pandas(left), rd.from_pandas(right)
    semi = lds.join(rds, join_type="left_semi", num_partitions=4,
                    on=("k",), right_on=("rk",)).to_pandas()
    anti = lds.join(rds, join_type="left_anti", num_partitions=4,
                    on=("k",), right_on=("rk",)).to_pandas()
    assert len(semi) + len(anti) == len(left)
    rset = set(right["rk"])
    assert semi["k"].isin(rset).all()
    assert (~anti["k"].isin(rset)).all()
    got = sorted([*semi["payload"], *anti["payload"]])
    assert got == sorted(left["payload"])


def test_prefix_pack_matches_numpy_cumsum(ray_session):
    """Distributed range-bucket prefix sum == numpy exclusive cumsum in id
    order, for sparse non-contiguous ids and any partitioning; pack ids
    and offsets are consistent (start = pack_id*budget + pack_offset)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from anomaly_detection_ray.stages.pack import prefix_pack

    rng = np.random.default_rng(13)
    ids = np.sort(rng.choice(100_000, size=400, replace=False))
    w = rng.integers(1, 900, size=400)
    df = pd.DataFrame({"doc_id": ids, "n_tokens": w})

    def run(nparts, n_buckets):
        ds = rd.from_pandas(df.sample(frac=1, random_state=1)).repartition(nparts)
        return (prefix_pack(ds, "doc_id", "n_tokens", budget=256,
                            n_buckets=n_buckets)
                .to_pandas().sort_values("doc_id").reset_index(drop=True))

    out = run(4, 64)
    want_start = np.concatenate([[0], np.cumsum(w)[:-1]])
    np.testing.assert_array_equal(out["start_tok"].to_numpy(), want_start)
    np.testing.assert_array_equal(out["pack_id"], want_start // 256)
    np.testing.assert_array_equal(
        out["start_tok"], out["pack_id"] * 256 + out["pack_offset"])

    out2 = run(9, 7)  # different partitioning AND bucket count
    pd.testing.assert_frame_equal(
        out.astype("int64"), out2.astype("int64"))


def test_semi_mark_keys_parity(ray_session):
    """semi_mark_keys must mark exactly the rows whose key appears in the
    key Dataset (pandas isin parity), preserve row count and columns, and
    agree across bucket counts / partitionings — including the all-miss
    (empty key set) and all-hit extremes."""
    import ray.data as rd

    from anomaly_detection_ray.stages.joins import semi_mark_keys

    rng = np.random.default_rng(7)
    left = pd.DataFrame({
        "k": rng.integers(-2**40, 2**40, size=1000),
        "val": rng.normal(size=1000)})
    key_vals = pd.concat([left["k"].sample(137, random_state=3),
                          pd.Series(rng.integers(-2**40, 2**40, size=50))])
    keys = pd.DataFrame({"k": key_vals.to_numpy()})
    want = left.assign(hit=left["k"].isin(set(keys["k"])))

    def run(nb, nparts):
        got = semi_mark_keys(
            rd.from_pandas(left).repartition(nparts),
            rd.from_pandas(keys).repartition(3),
            on="k", mark="hit", num_buckets=nb).to_pandas()
        return got.sort_values(["k", "val"]).reset_index(drop=True)

    expect = want.sort_values(["k", "val"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(run(16, 4), expect)
    pd.testing.assert_frame_equal(run(3, 9), expect)

    # empty key set: every row present, none marked
    none = semi_mark_keys(
        rd.from_pandas(left),
        rd.from_pandas(keys.iloc[:0]), on="k", mark="hit").to_pandas()
    assert len(none) == len(left) and not none["hit"].any()

    # every key present: all marked
    allhit = semi_mark_keys(
        rd.from_pandas(left),
        rd.from_pandas(left[["k"]]), on="k", mark="hit").to_pandas()
    assert len(allhit) == len(left) and allhit["hit"].all()


def test_semi_mark_keys_string_and_null_keys(ray_session):
    """String keys route through the pandas object-hash bucket path; null
    left keys never match (SQL IN semantics for the present-key case) and
    survive with mark=False."""
    import ray.data as rd

    from anomaly_detection_ray.stages.joins import semi_mark_keys

    left = pd.DataFrame({
        "k": ["a", "b", None, "c", "dd", None, "b"],
        "v": list(range(7))})
    keys = pd.DataFrame({"k": ["b", "dd", "zz"]})
    got = semi_mark_keys(rd.from_pandas(left).repartition(3),
                         rd.from_pandas(keys),
                         on="k", mark="hit", num_buckets=4).to_pandas()
    got = got.sort_values("v").reset_index(drop=True)
    assert len(got) == 7
    want = left["k"].isin({"b", "dd"}).to_numpy()
    assert (got["hit"].to_numpy() == want).all()
    assert not got.loc[got["k"].isna(), "hit"].any()


def test_ntile_matches_duckdb_on_edge_shapes(ray_session):
    """SQL NTILE bucket-size semantics (first r buckets get q+1 rows) on
    shapes that stress the formula: n < k, n == k, exact division,
    remainder, and value ties broken by event_id."""
    import duckdb

    from anomaly_detection_ray.pipelines.queries import q_ntile_events

    rows = []
    eid = 0
    # user 1: n=3 < k; user 2: n=4 == k; user 3: n=8 exact; user 4: n=10
    # remainder 2; user 5: all-tied values (order = event_id)
    for uid, n in [(1, 3), (2, 4), (3, 8), (4, 10)]:
        for i in range(n):
            rows.append({"event_id": eid, "user_id": uid,
                         "value": float((i * 7) % n)})
            eid += 1
    for i in range(6):
        rows.append({"event_id": eid, "user_id": 5, "value": 1.0})
        eid += 1
    df = pd.DataFrame(rows)

    import os
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "events.parquet"))
        got = (q_ntile_events(d).to_pandas()
               .sort_values("event_id").reset_index(drop=True))
    want = duckdb.sql("""
        SELECT event_id, user_id,
               ntile(4) OVER (PARTITION BY user_id
                              ORDER BY value, event_id) AS tile
        FROM df ORDER BY event_id""").df()
    assert (got["tile"].to_numpy() == want["tile"].to_numpy()).all()


def test_rule_audit_nulls_fail(ray_session):
    """A row whose predicate can't be evaluated (NULL input) counts as a
    violation, matching count(*) - count(*) FILTER (cond)."""
    import ray.data as rd

    from anomaly_detection_ray.pipelines.queries import _rule_audit

    df = pd.DataFrame({"s": ["ok", None, "ok", "bad"]})
    out = _rule_audit(rd.from_pandas(df),
                      {"s_ok": lambda d: d["s"] == "ok"})
    assert out.loc[0, "n_checked"] == 4
    assert out.loc[0, "n_violations"] == 2  # None + "bad"


def test_reconcile_no_lineitem_order(ray_session):
    """Orders without line items reconcile False with NULL totals; a
    matching order reconciles True; a off-by-one-cent order is flagged."""
    import os
    import tempfile

    from anomaly_detection_ray.pipelines.queries import (
        q_reconcile_orders_lineitem)

    li = pd.DataFrame({
        "l_orderkey": [1, 1, 2],
        "l_extendedprice": [100.0, 50.0, 10.0],
        "l_discount": [0.0, 0.0, 0.10],
        "l_tax": [0.0, 0.0, 0.0]})
    orders = pd.DataFrame({
        "o_orderkey": [1, 2, 3],
        "o_totalprice": [150.0, 9.02, 42.0]})
    with tempfile.TemporaryDirectory() as d:
        li.to_parquet(os.path.join(d, "lineitem.parquet"))
        orders.to_parquet(os.path.join(d, "orders.parquet"))
        got = (q_reconcile_orders_lineitem(d).to_pandas()
               .sort_values("o_orderkey").reset_index(drop=True))
    assert got["recon_ok"].tolist() == [True, False, False]
    assert np.isnan(got.loc[2, "lineitem_total"])
    assert abs(got.loc[1, "price_diff"] - 0.02) < 1e-9


def test_weighted_sample_partition_invariant(ray_session):
    """The E-S candidate contract must yield the identical global sample
    regardless of block layout, and weight-0 docs never appear."""
    import os
    import tempfile

    from anomaly_detection_ray.pipelines.queries import (
        q_weighted_sample_documents)

    rng = np.random.default_rng(0)
    df = pd.DataFrame({
        "doc_id": np.arange(500, dtype=np.int64),
        "n_chars": rng.integers(0, 300, size=500)})
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "documents.parquet"))
        a = q_weighted_sample_documents(d)
    with tempfile.TemporaryDirectory() as d:
        # different block layout: small row groups force many batches
        df.to_parquet(os.path.join(d, "documents.parquet"),
                      row_group_size=37)
        b = q_weighted_sample_documents(d)
    pd.testing.assert_frame_equal(a, b)
    assert (a["w"] > 0).all()
    assert len(a) == 50


def test_jaro_winkler_matches_duckdb():
    """JW kernel bit-parity with DuckDB's jaro_winkler_similarity on
    textbook pairs, random fuzz, and the empty-string edges (DuckDB gives
    0.0 for ''-vs-'' where the textbook says 1.0)."""
    import random
    import string

    import duckdb

    from anomaly_detection_ray.functions.text import jaro_winkler

    random.seed(7)
    pairs = [("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"),
             ("DIXON", "DICKSONX"), ("", ""), ("a", ""), ("", "b"),
             ("cold widget", "bold widget"), ("same", "same")]
    for _ in range(200):
        a = "".join(random.choices(string.ascii_lowercase + " ",
                                   k=random.randint(0, 12)))
        b = "".join(random.choices(string.ascii_lowercase + " ",
                                   k=random.randint(0, 12)))
        pairs.append((a, b))
    for a, b in pairs:
        want = duckdb.sql("SELECT jaro_winkler_similarity(?, ?)",
                          params=[a, b]).fetchone()[0]
        assert abs(jaro_winkler(a, b) - want) < 1e-12, (a, b)


def test_group_stats_apply_join_bit_equal_broadcast(ray_session):
    """The two stats_apply regimes must be BIT-equal: the kernel is
    elementwise IEEE float ops, fed per-row stat arrays (broadcast) or
    per-group scalars (join) — same operations either way. Forces both
    regimes over the real events table for all four kernels' shapes
    (div-guard, clip, where-fill) and compares exactly, NaNs aligned.
    Also pins the regime switch itself (broadcast_max_groups=0 forces
    join in auto mode)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from anomaly_detection_ray.pipelines.queries import _read, rnd
    from anomaly_detection_ray.stages.stats_apply import group_stats_apply

    ds = _read("/root/testdata/sf0.001", "events",
               ["event_id", "user_id", "value"])

    def grp(df):
        v = df["value"].to_numpy(np.float64)
        v = v[~np.isnan(v)]
        med = float(np.median(v)) if len(v) else np.nan
        mad = float(np.median(np.abs(v - med))) if len(v) else np.nan
        return pd.DataFrame({"user_id": [df["user_id"].iloc[0]],
                             "med": [med], "mad": [mad]})

    def kernel(v, me, ma):
        with np.errstate(invalid="ignore", divide="ignore"):
            rz = (v - me) / np.where(ma == 0.0, np.nan, ma)
        return {"rz": rnd(pd.Series(rz), 6),
                "clipped": np.clip(v, me, np.inf),
                "filled": np.where(np.isnan(v), me, v)}

    stats = (ds.select_columns(["user_id", "value"])
               .groupby("user_id").map_groups(grp, batch_format="pandas"))

    outs = {}
    for mode in ("broadcast", "join"):
        res = group_stats_apply(ds, stats, "user_id", ["med", "mad"],
                                ["event_id", "user_id"], kernel, mode=mode)
        assert isinstance(res, rd.Dataset)
        df = res.to_pandas().sort_values("event_id").reset_index(drop=True)
        outs[mode] = df

    a, b = outs["broadcast"], outs["join"]
    assert list(a.columns) == list(b.columns)
    assert (a["event_id"].to_numpy() == b["event_id"].to_numpy()).all()
    assert str(a["event_id"].dtype) == str(b["event_id"].dtype) == "int64"
    for c in ["rz", "clipped", "filled"]:
        x, y = a[c].to_numpy(np.float64), b[c].to_numpy(np.float64)
        nx, ny = np.isnan(x), np.isnan(y)
        assert (nx == ny).all(), c
        # bit-equality, not allclose: identical elementwise IEEE ops
        assert (x[~nx] == y[~ny]).all(), c

    # auto mode switches to join when the stats exceed the threshold
    forced = group_stats_apply(ds, stats, "user_id", ["med", "mad"],
                               ["event_id", "user_id"], kernel,
                               mode="auto", broadcast_max_groups=0)
    df = forced.to_pandas().sort_values("event_id").reset_index(drop=True)
    assert (df["rz"].fillna(-1) == a["rz"].fillna(-1)).all()


def test_topk_per_group_edge_shapes(ray_session):
    """topk_per_group vs DuckDB row_number on shapes that stress the
    candidate contract: group smaller than k, exact k, ties broken by the
    tiebreak column, and partition-count invariance (local top-k partials
    must not depend on batch boundaries)."""
    import duckdb
    import ray.data as rd

    from anomaly_detection_ray.stages.stats import topk_per_group

    rows = []
    did = 0
    for src, n in [("a", 2), ("b", 5), ("c", 9)]:
        for i in range(n):
            rows.append({"doc_id": did, "source": src,
                         "n_chars": (i * 3) % 4})  # deliberate ties
            did += 1
    df = pd.DataFrame(rows)
    want = duckdb.sql("""
        SELECT source, doc_id, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS rk
        FROM df QUALIFY rk <= 5 ORDER BY source, rk""").df()
    for parts in (1, 4):
        ds = rd.from_pandas(df).repartition(parts)
        got = (topk_per_group(ds, "source", "n_chars", k=5,
                              tiebreak="doc_id")
               .to_pandas().sort_values(["source", "rk"])
               .reset_index(drop=True))
        assert (got["doc_id"].to_numpy()
                == want["doc_id"].to_numpy()).all(), parts
        assert (got["rk"].to_numpy() == want["rk"].to_numpy()).all()
