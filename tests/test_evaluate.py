"""Labelled-evaluation harness (pipelines/evaluate.py) — reference Test
consumer + AnomalyDetectorWrapper intent: config -> P/R/F1 vs labels."""

import numpy as np
import pandas as pd

from anomaly_detection_ray.pipelines.evaluate import (confusion_counts,
                                                      evaluate_config,
                                                      grid_search)

rng = np.random.default_rng(21)


def _labelled_stream(n=2000, n_anom=40):
    v = rng.normal(50, 5, n)
    idx = rng.choice(n, size=n_anom, replace=False)
    v[idx] = 200.0
    label = np.zeros(n, dtype=bool)
    label[idx] = True
    return pd.DataFrame({"ts": np.arange(n, dtype=np.float64),
                         "value": v, "label": label})


def test_evaluate_config_perfect_detector(ray_session):
    import ray.data as rd
    df = _labelled_stream()
    conf = {"anomaly_detection_alg": ["BorderCheck()"],
            "anomaly_detection_conf": [{"input_vector_size": 1, "UL": 80.0,
                                        "LL": 20.0, "warning_stages": []}]}
    m = evaluate_config(conf, ds=rd.from_pandas(df), value_col="value")
    assert m["f1"] == 1.0 and m["precision"] == 1.0 and m["recall"] == 1.0
    assert m["tp"] == int(df["label"].sum())
    assert m["n"] == len(df)


def test_confusion_counts_match_manual(ray_session):
    import ray.data as rd
    n = 1000
    label = rng.random(n) < 0.3
    code = np.where(rng.random(n) < 0.4, -1, 1).astype(np.int8)
    ds = rd.from_pandas(pd.DataFrame({"label": label, "c_code": code}))
    m = confusion_counts(ds, ["c_code"], "label")
    pred = code == -1
    tp = int((pred & label).sum())
    fp = int((pred & ~label).sum())
    fn = int((~pred & label).sum())
    assert (m["tp"], m["fp"], m["fn"]) == (tp, fp, fn)
    p, r = tp / (tp + fp), tp / (tp + fn)
    assert abs(m["f1"] - 2 * p * r / (p + r)) < 1e-12
    # string labels (ads-1.csv carries 'True'/'False')
    ds2 = rd.from_pandas(pd.DataFrame(
        {"label": np.where(label, "True", "False"), "c_code": code}))
    assert confusion_counts(ds2, ["c_code"], "label") == m


def test_grid_search_picks_true_threshold(ray_session):
    import ray.data as rd
    df = _labelled_stream()
    base = {"anomaly_detection_alg": ["BorderCheck()"],
            "anomaly_detection_conf": [{"input_vector_size": 1, "LL": -1e9,
                                        "warning_stages": []}]}
    out = grid_search(base, {"UL": [30.0, 100.0, 1000.0]},
                      ds=rd.from_pandas(df), value_col="value")
    assert out.loc[0, "UL"] == 100.0          # only threshold separating them
    assert out.loc[0, "f1"] == 1.0
    assert (out["f1"].to_numpy()[:-1] >= out["f1"].to_numpy()[1:]).all()


def test_evaluate_on_reference_ads1(ray_session):
    """The reference's OWN labelled eval corpus (data/ads-1.csv, 31,416
    rows): a BorderCheck config graded end-to-end through the distributed
    harness must produce exactly the confusion counts of an independent
    vectorized computation of the same check on the same file."""
    import pandas as pd

    from anomaly_detection_ray.pipelines.evaluate import evaluate_config

    UL, LL = 2.5, -2.0
    conf = {"anomaly_detection_alg": ["BorderCheck()"],
            "anomaly_detection_conf": [{
                "input_vector_size": 1, "warning_stages": [0.9],
                "UL": UL, "LL": LL, "output": [], "output_conf": []}]}
    m = evaluate_config(conf, data_path="/root/reference/data/ads-1.csv")

    df = pd.read_csv("/root/reference/data/ads-1.csv")
    v = df["ftr_vector"].to_numpy()
    vn = 2 * (v - (UL + LL) / 2) / (UL - LL)
    pred = (vn > 1) | (vn < -1)
    y = df["label"].astype(str).str.strip().str.lower().eq("true").to_numpy()
    assert m["n"] == len(df) == 31416
    assert m["tp"] == int((pred & y).sum())
    assert m["fp"] == int((pred & ~y).sum())
    assert m["fn"] == int((~pred & y).sum())
    assert m["tn"] == int((~pred & ~y).sum())
    assert m["tp"] > 0 and m["tn"] > 0  # both classes actually exercised


def test_evaluate_sweeps_all_ads_sets(ray_session):
    """Harness robustness over the reference's ENTIRE labelled corpus
    (ads-1..9): every set evaluates end-to-end, confusion counts cover all
    rows, and the Welford dynamic-limit config flags at least part of the
    labelled anomalies on each set that has any."""
    import glob

    import pandas as pd

    from anomaly_detection_ray.pipelines.evaluate import evaluate_config

    conf = {"anomaly_detection_alg": ["Welford()"],
            "anomaly_detection_conf": [{
                "input_vector_size": 1, "N": 200, "X": 4,
                "warning_stages": [], "output": [], "output_conf": []}]}
    paths = sorted(p for p in glob.glob("/root/reference/data/ads-[0-9].csv"))
    assert len(paths) == 9
    for p in paths:
        m = evaluate_config(conf, data_path=p)
        n_rows = len(pd.read_csv(p))
        assert m["n"] == n_rows, p
        y_pos = m["tp"] + m["fn"]
        if y_pos:  # labelled anomalies exist => recall must be non-trivial
            assert m["recall"] > 0.0, (p, m)
