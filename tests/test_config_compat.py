"""Reference-config compatibility + message sources + as-of band check +
linear-autoencoder scorer."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from anomaly_detection_ray import oracle
from anomaly_detection_ray.functions.grading import ERROR_CODE, OK_CODE, UNDEFINED_CODE
from anomaly_detection_ray.stages.asof import naive_forecast, nearest_band_codes
from anomaly_detection_ray.stages.autoencoder import (LinearAutoencoder,
                                                      adaptive_threshold_codes)

REF_CONFIG_DIR = "/root/reference/configuration"

rng = np.random.default_rng(11)


# ---------------------------------------------------------------- unit level

def test_nearest_band_codes_matches_reference_lookup():
    """Vectorized nearest-ts lookup == argmin |ts - f_ts| (fb_prophet.py:133)."""
    f_ts = np.array([10.0, 20.0, 30.0, 50.0])
    lo = np.array([0.0, 1.0, 2.0, 3.0])
    hi = np.array([5.0, 6.0, 7.0, 8.0])
    ts = np.array([9.0, 14.9, 15.1, 40.0, 41.0, 100.0])
    vals = np.array([4.0, 0.5, 6.5, 2.5, 9.0, 3.5])
    code, status = nearest_band_codes(ts, vals, f_ts, lo, hi)
    for t, v, c in zip(ts, vals, code):
        b = np.argmin(np.abs(t - f_ts))
        expect = OK_CODE if lo[b] <= v <= hi[b] else ERROR_CODE
        assert c == expect, (t, v)


def test_adaptive_threshold_matches_sequential_gan_window():
    errors = np.abs(rng.normal(0.1, 0.05, size=200))
    errors[80] = 5.0
    K, W = 2.0, 30
    code, _ = adaptive_threshold_codes(errors, K, W)
    # sequential mirror of gan.py:156-175
    weights = np.exp(np.linspace(0, 1, W))
    window: list[float] = []
    for i, e in enumerate(errors):
        window.append(e)
        if len(window) > W:
            window = window[-W:]
        thr = K * np.average(window, weights=weights[-len(window):])
        expect = ERROR_CODE if e >= thr else OK_CODE
        assert code[i] == expect, i


def test_linear_autoencoder_flags_injected_outlier():
    v = rng.normal(10, 1, size=500)
    model = LinearAutoencoder(N_shifts=3, N_latent=1).fit(v)
    test = v.copy()
    test[300] = 60.0
    errors = model.reconstruction_errors(test)
    assert np.isnan(errors[:3]).all()
    assert errors[300] > 10 * np.nanmedian(errors)


# ------------------------------------------------------------ Ray pipelines

@pytest.fixture()
def events_ds(ray_session):
    import ray.data as rd
    return rd.read_parquet("/root/testdata/sf0.001/events.parquet",
                           columns=["event_id", "ts", "user_id", "value"])


def test_message_csv_roundtrip(ray_session, tmp_path):
    from anomaly_detection_ray.sources.messages import read_message_csv
    p = tmp_path / "msgs.csv"
    pd.DataFrame({"timestamp": [1.0, 2.0, 3.0], "a": [0.1, 0.2, 0.3],
                  "b": [1.0, 2.0, 3.0], "label": [False, True, False],
                  "labelInfo": [0, 1, 0]}).to_csv(p, index=False)
    df = read_message_csv(str(p)).to_pandas()
    assert list(df.columns) == ["ts", "f0", "f1", "label", "labelInfo"]
    df = df.sort_values("ts")  # Ray block order is not row order
    np.testing.assert_allclose(df["f0"], [0.1, 0.2, 0.3])


def test_vector_csv_stable_schema_across_blocks(ray_session, tmp_path):
    """Vector width is pinned at dataset level: blocks whose vectors are
    all shorter than the dataset's width still emit the same f0..fk
    schema (NaN-padded), so downstream schema resolution never sees
    varying column sets."""
    import ray.data as rd

    from anomaly_detection_ray.sources.messages import read_message_csv
    p = tmp_path / "vec.csv"
    rows = ['"[1.0, 2.0, 3.0]"'] * 4 + ['"[9.0]"'] * 4  # short tail block
    p.write_text("timestamp,ftr_vector\n" + "\n".join(
        f"{i + 1}.0,{v}" for i, v in enumerate(rows)))
    ds = read_message_csv(str(p))
    # force multiple blocks so the short vectors form their own batch
    dfs = [b for b in ds.repartition(4).iter_batches(batch_format="pandas",
                                                     batch_size=2)]
    assert all(list(b.columns) == ["ts", "f0", "f1", "f2"] for b in dfs)
    df = ds.to_pandas().sort_values("ts")
    np.testing.assert_allclose(df["f0"], [1, 1, 1, 1, 9, 9, 9, 9])
    assert df["f2"].isna().tail(4).all()


def test_welford_partial_null_keys_do_not_collide_with_nan_string(
        ray_session):
    """Null group keys land in the empty-string bucket, NOT the 'nan'
    bucket — a genuine 'nan' string key keeps its own group."""
    import pyarrow as pa

    from anomaly_detection_ray.stages.stats import welford_partial_batch
    t = pa.table({"k": pa.array(["nan", None, "nan", None, "x"]),
                  "v": pa.array([1.0, 10.0, 3.0, 20.0, 5.0])})
    out = welford_partial_batch(t, "v", key_col="k").to_pandas()
    by_key = out.set_index("key")
    assert set(by_key.index) == {"nan", "", "x"}
    assert by_key.loc["nan", "n"] == 2 and by_key.loc["", "n"] == 2
    assert by_key.loc["", "mean"] == 15.0


def test_message_json_roundtrip(ray_session, tmp_path):
    from anomaly_detection_ray.sources.messages import read_message_json
    p = tmp_path / "msgs.json"
    p.write_text(json.dumps({"data": [
        {"ftr_vector": [1.0, 2.0], "timestamp": 10},
        {"ftr_vector": [3.0, 4.0], "timestamp": 20}]}))
    df = read_message_json(str(p)).to_pandas().sort_values("ts")
    assert list(df.columns) == ["ts", "f0", "f1"]
    np.testing.assert_allclose(df["f1"], [2.0, 4.0])


@pytest.mark.skipif(not os.path.isdir(REF_CONFIG_DIR),
                    reason="reference configs not present")
def test_train_file_vector_csv_parses(ray_session):
    """Stringified-vector train files (ads-1_train.csv layout,
    ``ftr_vector = "[2.53]"``) explode into float feature columns — the
    reference's literal_eval train parser, vectorized."""
    from anomaly_detection_ray.sources.messages import read_message_csv
    df = read_message_csv("/root/reference/data/ads-1_train.csv").to_pandas()
    assert list(df.columns) == ["ts", "f0"]
    assert df["f0"].dtype == np.float64
    assert abs(df["f0"].iloc[0] - 2.53152119344) < 1e-9
    assert df["f0"].notna().all()


def test_reference_border_check_config_runs_verbatim(ray_session, events_ds):
    """The reference's own border_check.json drives the engine unmodified;
    flags equal the sequential oracle run with the same config."""
    from anomaly_detection_ray.pipelines.config import run_reference_config
    with open(os.path.join(REF_CONFIG_DIR, "border_check.json")) as f:
        conf = json.load(f)
    out = run_reference_config(conf, ds=events_ds, key_col="user_id",
                               value_col="value").to_pandas()
    col = "a0_bordercheck_code"
    assert col in out.columns
    c = conf["anomaly_detection_conf"][0]
    ob = oracle.OracleBorderCheck(UL=c["UL"], LL=c["LL"],
                                  warning_stages=sorted(c["warning_stages"]))
    for _, row in out.sample(n=200, random_state=0).iterrows():
        s, code = ob.insert({"ftr_vector": [row["value"]], "timestamp": 1.0})
        assert code == row[col]


@pytest.mark.skipif(not os.path.isdir(REF_CONFIG_DIR),
                    reason="reference configs not present")
def test_reference_welford_and_ema_configs_run(ray_session, events_ds):
    from anomaly_detection_ray.pipelines.config import run_reference_config
    for name, col in [("welford.json", "a0_welford_code"),
                      ("ema.json", "a0_ema_code")]:
        with open(os.path.join(REF_CONFIG_DIR, name)) as f:
            conf = json.load(f)
        out = run_reference_config(conf, ds=events_ds, key_col="user_id",
                                   value_col="value").to_pandas()
        assert col in out.columns
        assert set(np.unique(out[col])) <= {-1, 0, 1, 2}


def test_mlp_autoencoder_reference_gan_shape():
    """Reference GAN functionality test shape (unit_tests.py:556-641):
    train on 90 near-constant 10-dim vectors (last carries a zero, per
    create_testing_file withzero=True), then an OK stream scores 1 and an
    anomalous vector scores -1 under K=1.5 / len_window=1000."""
    from anomaly_detection_ray.stages.autoencoder import MLPAutoencoder
    train = np.ones((90, 10))
    train[-1, -1] = 0.0
    model = MLPAutoencoder(N_shifts=9, N_latent=3).fit_vectors(train)
    ok = np.ones((3, 10))
    bad = np.array([[1, 2, 4, 100, 1, 1, 5, 1, 1, 1]] * 3, dtype=np.float64)
    errors = model.reconstruction_errors_vectors(np.vstack([ok, bad]))
    code, _ = adaptive_threshold_codes(errors, K=1.5, len_window=1000)
    assert code.tolist() == [1, 1, 1, -1, -1, -1]


def test_mlp_autoencoder_scalar_stream_flags_outlier():
    """Scalar-stream path (input_vector_size=1): shift-stacked windows,
    seeded training is deterministic, injected spike flagged."""
    from anomaly_detection_ray.stages.autoencoder import MLPAutoencoder
    v = np.sin(np.linspace(0, 40, 1500)) + rng.normal(0, 0.05, 1500)
    model = MLPAutoencoder(N_shifts=5, N_latent=2).fit(v[:1000])
    test = v.copy()
    test[1200] = 8.0
    errors = model.reconstruction_errors(test)
    assert np.nanargmax(errors) in (1200, 1201, 1202, 1203, 1204, 1205)
    assert errors[1200] > 50 * np.nanmedian(errors)
    # determinism: same seed -> identical weights -> identical errors
    model2 = MLPAutoencoder(N_shifts=5, N_latent=2).fit(v[:1000])
    np.testing.assert_array_equal(errors, model2.reconstruction_errors(test))


def test_gan_config_runs_reference_gan_json(ray_session):
    """The reference's gan.json runs verbatim through the config layer
    (train_data path resolved against the reference root)."""
    from anomaly_detection_ray.pipelines.config import run_reference_config
    out = run_reference_config(
        os.path.join(REF_CONFIG_DIR, "gan.json")).to_pandas()
    assert "a0_gan_code" in out.columns
    assert set(np.unique(out["a0_gan_code"])) <= {-1, 0, 1, 2}
    assert len(out) == 31416


def test_prophet_config_uncertainty_interval(ray_session, events_ds):
    """fb_Prophet() config: uncertainty_interval maps to the gaussian
    z-multiple and the seasonal band check runs end-to-end."""
    from anomaly_detection_ray.pipelines.config import (_z_for_interval,
                                                        run_reference_config)
    assert abs(_z_for_interval(0.95) - 1.959964) < 1e-4
    assert abs(_z_for_interval(0.99) - 2.575829) < 1e-4
    conf = {"anomaly_detection_alg": ["fb_Prophet()"],
            "anomaly_detection_conf": [{"uncertainty_interval": 0.9999}]}
    out = run_reference_config(conf, ds=events_ds, key_col="user_id",
                               value_col="value").to_pandas()
    assert "a0_fb_prophet_code" in out.columns
    codes = out["a0_fb_prophet_code"]
    assert set(np.unique(codes)) <= {-1, 1, 2}
    assert (codes == ERROR_CODE).mean() < 0.05


def test_seasonal_forecast_recovers_trend_and_seasonality(ray_session):
    """seasonal_forecast fits trend + daily shape from one distributed
    pass: grid yhat tracks the true signal and the band flags a spike."""
    import ray.data as rd

    from anomaly_detection_ray.stages.asof import (forecast_band_check,
                                                   seasonal_forecast)
    n = 20000
    ts = 1.7e9 + np.arange(n) * 300.0
    true = 10 + 1e-5 * (ts - 1.7e9) + 3 * np.sin(2 * np.pi * (ts % 86400) / 86400)
    val = true + rng.normal(0, 0.3, n)
    val[7777] = 60.0
    ds = rd.from_pandas(pd.DataFrame(
        {"event_id": np.arange(n), "ts": ts, "value": val}))
    fc = seasonal_forecast(ds, X=4.0)
    # grid prediction within noise of the truth at matching timestamps
    grid_true = (10 + 1e-5 * (fc["ts"] - 1.7e9)
                 + 3 * np.sin(2 * np.pi * (fc["ts"] % 86400) / 86400))
    assert float(np.abs(fc["yhat"] - grid_true).mean()) < 0.5
    out = forecast_band_check(ds, fc, prefix="szn").to_pandas()
    assert out.loc[out.event_id == 7777, "szn_code"].item() == ERROR_CODE
    assert (out["szn_code"] == ERROR_CODE).mean() < 0.01


def test_forecast_band_pipeline(ray_session, events_ds):
    from anomaly_detection_ray.stages.asof import forecast_band_check
    forecast = naive_forecast(events_ds, window_s=21600.0, X=4.0)
    assert {"ts", "yhat_lower", "yhat_upper"} <= set(forecast.columns)
    out = forecast_band_check(events_ds, forecast).to_pandas()
    codes = set(np.unique(out["fb_code"]))
    assert codes <= {-1, 1, 2}
    assert (out["fb_code"] == ERROR_CODE).sum() < 0.2 * len(out)


def test_verdict_sink_violations_only(ray_session, events_ds, tmp_path):
    import pyarrow as pa

    from anomaly_detection_ray.sources.messages import write_verdicts
    from anomaly_detection_ray.stages.checks import border_stage
    ds = events_ds.map_batches(
        lambda t: border_stage(t, "value", 80.0, 20.0, [], prefix="bc"),
        batch_format="pyarrow")
    out_dir = str(tmp_path / "viol")
    write_verdicts(ds, out_dir, violations_only=True, code_col="bc_code")
    import ray.data as rd
    back = rd.read_parquet(out_dir).to_pandas()
    assert (back["bc_code"] != 1).all()
    assert len(back) > 0


def test_bloom_dedup_finds_known_duplicates(ray_session):
    import ray.data as rd

    from anomaly_detection_ray.stages.uniqueness import bloom_dedup_candidates
    ids = [f"id-{i:04d}" for i in range(2000)]
    ids[500] = ids[10]          # one dup pair
    ids[1500] = ids[20]         # another
    ids.append(ids[30])         # triple source
    ids.append(ids[30])
    ds = rd.from_pandas(pd.DataFrame({"clip_id": ids}))
    out = bloom_dedup_candidates(ds, key_col="clip_id", n_shards=4)
    got = dict(zip(out["clip_id"], out["cnt"]))
    assert got == {ids[10]: 2, ids[20]: 2, ids[30]: 3}


REF_DATA = "/root/reference/data/ads-1.csv"


@pytest.mark.skipif(not os.path.isfile(REF_DATA),
                    reason="reference data not present")
def test_reference_welford_config_on_reference_csv(ray_session):
    """End-to-end 'switch from the reference': the reference's welford.json
    drives the engine over the reference's own ads-1.csv (message CSV), and
    the per-record flags equal the sequential oracle replay of the same
    config over the same stream."""
    from anomaly_detection_ray.pipelines.config import run_reference_config
    from anomaly_detection_ray.sources.messages import read_message_csv
    with open(os.path.join(REF_CONFIG_DIR, "welford.json")) as f:
        conf = json.load(f)
    ds = read_message_csv(REF_DATA)
    out = (run_reference_config(conf, ds=ds, value_col="f0")
           .to_pandas().sort_values("ts").reset_index(drop=True))
    c = conf["anomaly_detection_conf"][0]
    ow = oracle.OracleWelford(X=c["X"], N=c["N"],
                              warning_stages=sorted(c["warning_stages"]))
    want = [ow.insert({"ftr_vector": [v], "timestamp": t})[1]
            for v, t in zip(out["f0"], out["ts"])]
    got = out["a0_welford_code"].to_numpy()
    mism = (got != np.asarray(want, dtype=np.int8)).sum()
    assert mism == 0, f"{mism} of {len(got)} flags differ from the oracle"


@pytest.mark.skipif(not os.path.isfile(REF_DATA),
                    reason="reference data not present")
def test_reference_ema_and_filtering_configs_on_reference_csv(ray_session):
    """Same end-to-end proof for the EMA and Butterworth-filtering configs
    (the latter exercises the scipy-free dsp kernels on real data)."""
    from anomaly_detection_ray.pipelines.config import run_reference_config
    from anomaly_detection_ray.sources.messages import read_message_csv
    ds = read_message_csv(REF_DATA)
    for fname, col, make_oracle in [
        ("ema.json", "a0_ema_code",
         lambda c: oracle.OracleEMA(N=c["N"], UL=c["UL"], LL=c["LL"],
                                    warning_stages=sorted(c["warning_stages"]))),
        ("filtering.json", "a0_filtering_code",
         lambda c: oracle.OracleFiltering(
             filter_order=c["filter_order"],
             cutoff_frequency=c["cutoff_frequency"], mode=c["mode"],
             UL=c["UL"], LL=c["LL"],
             warning_stages=sorted(c["warning_stages"]))),
    ]:
        with open(os.path.join(REF_CONFIG_DIR, fname)) as f:
            conf = json.load(f)
        out = (run_reference_config(conf, ds=ds, value_col="f0")
               .to_pandas().sort_values("ts").reset_index(drop=True))
        c = conf["anomaly_detection_conf"][0]
        o = make_oracle(c)
        want = [o.insert({"ftr_vector": [v], "timestamp": t})[1]
                for v, t in zip(out["f0"], out["ts"])]
        got = out[col].to_numpy()
        mism = (got != np.asarray(want, dtype=np.int8)).sum()
        assert mism == 0, f"{fname}: {mism} of {len(got)} flags differ"


REF_ALL_CONFIGS = sorted(
    os.path.basename(p)
    for p in __import__("glob").glob(os.path.join(REF_CONFIG_DIR, "*.json")))


@pytest.mark.parametrize("cfg", REF_ALL_CONFIGS)
def test_every_reference_config_runs_verbatim(ray_session, cfg, tmp_path_factory):
    """'A user of the reference could switch': EVERY top-level JSON config
    shipped with the reference drives this engine unmodified — verdict
    columns appear and every emitted code is a legal 4-valued status."""
    from anomaly_detection_ray.pipelines.config import run_reference_config
    p = tmp_path_factory.mktemp("cfg") / "msgs.csv"
    rng = np.random.default_rng(0)
    n = 300
    pd.DataFrame({"timestamp": np.arange(n) * 60.0,
                  "ftr_vector": rng.normal(3, 1, n).round(3)}).to_csv(
        p, index=False)
    out = run_reference_config(os.path.join(REF_CONFIG_DIR, cfg),
                               data_path=str(p))
    d = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert len(d) == n
    code_cols = [c for c in d.columns if c.endswith("_code")]
    assert code_cols, f"{cfg}: no verdict columns in {list(d.columns)}"
    for c in code_cols:
        assert set(pd.unique(d[c].dropna())) <= {-1, 0, 1, 2}, (cfg, c)


def test_cli_main_runs_reference_config(ray_session, tmp_path, capsys):
    """python -m anomaly_detection_ray (main.py -f parity): reference
    config + message CSV -> summary + violations-only sink (per-check
    any-non-OK gate when no combined status_code exists)."""
    import glob

    from anomaly_detection_ray.__main__ import main

    rng = np.random.default_rng(2)
    data = tmp_path / "msgs.csv"
    pd.DataFrame({"timestamp": np.arange(200) * 60.0,
                  "ftr_vector": np.r_[rng.normal(3, 0.1, 197),
                                      [9.0, -5.0, 3.0]]}).to_csv(
        data, index=False)
    out = tmp_path / "verdicts"
    rc = main(["-c", os.path.join(REF_CONFIG_DIR, "border_check.json"),
               "--data", str(data), "--out", str(out),
               "--violations-only"])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "a0_bordercheck_code" in printed and "Error=" in printed
    df = pd.concat([pd.read_parquet(p)
                    for p in glob.glob(str(out / "*.parquet"))])
    assert (df["a0_bordercheck_code"] != 1).all()
    assert {9.0, -5.0} <= set(df["f0"])  # the injected outliers made it out


def test_model_config_trains_from_train_data_file(ray_session, tmp_path):
    """Reference semantics (isolation_forest.py:88-89): models with
    train_data fit from the train FILE at configure time, not from the
    scored stream. A Clustering detector trained on a tight cluster at 0
    must flag a stream of constant 100s; trained on the stream itself it
    would grade them OK — so the verdict pins which data trained it."""
    import ray.data as rd

    from anomaly_detection_ray.pipelines.config import run_reference_config

    rng = np.random.default_rng(3)
    train = tmp_path / "train.csv"
    pd.DataFrame({"timestamp": np.arange(200) * 1.0,
                  "ftr_vector": rng.normal(0, 0.05, 200).round(4)}).to_csv(
        train, index=False)
    conf = {"anomaly_detection_alg": ["Clustering()"],
            "anomaly_detection_conf": [{
                "input_vector_size": 1, "eps": 0.5, "min_samples": 5,
                "treshold": 0.4, "train_data": str(train)}]}
    stream = rd.from_pandas(pd.DataFrame(
        {"ts": np.arange(50) * 1.0, "f0": np.full(50, 100.0)}))
    out = run_reference_config(conf, ds=stream).to_pandas()
    assert (out["a0_clustering_code"] == ERROR_CODE).all()

    conf_nt = {"anomaly_detection_alg": ["Clustering()"],
               "anomaly_detection_conf": [{
                   "input_vector_size": 1, "eps": 0.5, "min_samples": 5,
                   "treshold": 0.4}]}
    out_nt = run_reference_config(conf_nt, ds=stream).to_pandas()
    assert (out_nt["a0_clustering_code"] == OK_CODE).all()


def test_cli_validate_clips_mode(tmp_path, ray_session):
    """--validate-clips runs the flagship over a clip table: exit 1 on
    failed partitions (the synth table plants violations in every
    partition), violations + manifest land under --out, and a resume
    invocation exits 0 with all partitions skipped."""
    import os

    from anomaly_detection_ray import synth
    from anomaly_detection_ray.__main__ import main

    clips = tmp_path / "clips"
    synth.write_clip_table(str(clips), seed=7, n=600, P=4,
                           rows_per_file=256)
    out = tmp_path / "out"
    rc = main(["--validate-clips", str(clips), "--out", str(out),
               "--partitions", "4", "--seed", "7"])
    assert rc == 1                       # planted violations => fail
    assert os.path.exists(out / "_manifest.json")
    assert os.path.isdir(out / "violations")
    # resume re-reports the table's (still failing) verdicts without
    # revalidating: exit stays 1, all partitions skipped
    rc2 = main(["--validate-clips", str(clips), "--out", str(out),
                "--partitions", "4", "--seed", "7", "--resume"])
    assert rc2 == 1
