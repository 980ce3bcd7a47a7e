"""Reference-config compatibility layer: run the reference's JSON configs
(/root/reference/configuration/*.json) against a Ray Data pipeline.

The reference instantiates scorers by ``eval`` of class-name strings from
config (consumer.py:157,260,269). Here the same config schema —
``{"anomaly_detection_alg": ["Welford()"], "anomaly_detection_conf": [{...}]}``
— resolves through an explicit registry (no eval) to the engine's check
stages: stateless kernels in ``map_batches``, order-dependent kernels in
``groupby().map_groups`` series stages, model-backed scorers as actor pools.

A user of the reference can point ``run_reference_config`` at their config +
message CSV/JSON and get the same per-record verdict columns, computed
data-parallel. Every reference scorer resolves — including the model-backed
ones (GAN via the from-scratch numpy autoencoder in stages/autoencoder.py,
Trend_Classification via stages/trend.py, fb_Prophet via the seasonal
forecaster in stages/asof.py, RRCF_trees via stages/rrcf.py); `_UNSUPPORTED`
is empty and exists only as the hook for future env-blocked names.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
import pandas as pd

from ..sources.messages import read_message_csv, read_message_json
from ..stages import normalize as norm_mod
from ..stages import series as series_mod

# reference class name -> (series-kernel name, config-key mapper)
_KERNEL_ALGS: dict[str, tuple[str, Any]] = {
    "BorderCheck": ("border_check", lambda c: {
        "UL": c["UL"], "LL": c["LL"],
        "warning_stages": sorted(c.get("warning_stages", []))}),
    "EMA": ("ema", lambda c: {
        "N": c["N"], "UL": c["UL"], "LL": c["LL"],
        "warning_stages": sorted(c.get("warning_stages", []))}),
    "Welford": ("welford", lambda c: {
        "X": c["X"], "N": c.get("N"),
        "warning_stages": sorted(c.get("warning_stages", []))}),
    "MACD": ("macd", lambda c: {
        "period1": c["period1"], "period2": c["period2"],
        "UL": c["UL"], "LL": c["LL"],
        "warning_stages": sorted(c.get("warning_stages", []))}),
    "Cumulative": ("cumulative", lambda c: {
        "decay": c["decay"], "averaging": c["averaging"],
        "warning_stages": sorted(c.get("warning_stages", []))}),
    "Hampel": ("hampel", lambda c: {
        "W": c.get("W", 1), "K": c["K"], "n_sigmas": c["n_sigmas"]}),
    "Percentile": ("percentile", lambda c: {
        # intended semantics (SURVEY.md §2.4): trailing buffer of buff_size;
        # the reference's `shift` plays the buffer-length role
        "buff_size": c.get("buff_size", c.get("shift", 30)),
        "lo": c["percentile_range"][0], "hi": c["percentile_range"][1]}),
    "LinearFit": ("linear_fit", lambda c: {
        "N": c.get("N", 10), "UL": c["UL"], "LL": c["LL"],
        "confidence_norm": c["confidence_norm"],
        "warning_stages": sorted(c.get("warning_stages", []))}),
    "Filtering": ("filtering", lambda c: {
        "filter_order": c["filter_order"],
        "cutoff_frequency": c["cutoff_frequency"], "mode": c["mode"],
        "UL": c["UL"], "LL": c["LL"],
        "warning_stages": sorted(c.get("warning_stages", []))}),
    "EMA_Percentile": ("ema_percentile", lambda c: {
        "percentile": c["percentile"], "window": c["window"],
        "start_on": c["start_on"], "period": c["period"]}),
    # from-scratch RRCF (stages/rrcf.py) replacing the rrcf lib
    "RRCF_trees": ("rrcf", lambda c: {
        "num_trees": c["num_trees"], "tree_size": c["tree_size"],
        "threshold": c["threshold"], "seed": 0}),
    # learned ramp classifier (stages/trend.py numpy MLP; the reference
    # raises when num_samples is absent — trend_classification.py:50-52)
    "Trend_Classification": ("trend_classification", lambda c: {
        "N": c["N"], "averaging": c["averaging"],
        "prediction_conv": c["prediction_conv"],
        "warning_stages": sorted(c.get("warning_stages", [])),
        "amp_scale": c.get("amp_scale", 1.0),
        "num_samples": c["num_samples"],
        "train_noise": c.get("train_noise", 0.01)}),
}

_UNSUPPORTED: dict[str, str] = {}


def _alg_name(s: str) -> str:
    return s.strip().removesuffix("()")


def _z_for_interval(interval: float) -> float:
    """Two-sided gaussian quantile: P(|Z| <= z) = interval (bisection on
    math.erf — no scipy)."""
    import math
    target = max(min(interval, 1 - 1e-12), 0.0)
    lo, hi = 0.0, 40.0
    for _ in range(80):
        mid = (lo + hi) / 2.0
        if math.erf(mid / math.sqrt(2.0)) < target:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


def parse_config(conf: dict | str) -> list[dict]:
    """Config (dict or path) -> list of resolved check specs."""
    if isinstance(conf, str):
        with open(conf) as f:
            conf = json.load(f)
    algs = conf["anomaly_detection_alg"]
    confs = conf["anomaly_detection_conf"]
    checks = []
    for i, (alg, c) in enumerate(zip(algs, confs)):
        name = _alg_name(alg)
        checks.extend(_resolve(name, c, prefix=f"a{i}_{name.lower()}"))
    return checks


def _resolve(name: str, c: dict, prefix: str) -> list[dict]:
    if name in _UNSUPPORTED:
        raise NotImplementedError(f"{name}: {_UNSUPPORTED[name]}")
    if name == "Combination":
        sub = []
        for j, (a, ac) in enumerate(zip(c["anomaly_algorithms"],
                                        c["anomaly_algorithms_configurations"])):
            sub.extend(_resolve(_alg_name(a), ac, prefix=f"{prefix}_s{j}"))
        det = _alg_name(c["status_determiner"])
        return [{"kind": "combination", "name": prefix, "determiner": det,
                 "determiner_conf": c.get("status_determiner_conf", {}),
                 "sub": sub}]
    if name in ("IsolationForest", "PCA", "Clustering"):
        # reference trains at configure time from train_data when present
        # (isolation_forest.py:88-89, clustering similarly); top-level key
        # so run_reference_config's path resolution covers it
        return [{"kind": "model", "name": prefix, "model": name, "conf": c,
                 "train_data": c.get("train_data")}]
    if name == "GAN":
        # numpy MLP autoencoder (stages/autoencoder.py MLPAutoencoder) with
        # the reference's scoring mechanics (gan.py:151-175)
        tc = c.get("train_conf", c)
        return [{"kind": "gan", "name": prefix,
                 "N_shifts": int(tc.get("N_shifts", 9)),
                 "N_latent": int(tc.get("N_latent", 3)),
                 "K": float(tc.get("K", 1.5)),
                 "len_window": int(tc.get("len_window", 1000)),
                 "train_data": c.get("train_data")}]
    if name == "fb_Prophet":
        # seasonal-decomposition forecaster band check (stages/asof.py;
        # fb_prophet.py:132-145 uncertainty-band semantics without Prophet).
        # The reference's uncertainty_interval (Prophet's interval_width,
        # fb_prophet.py:63) maps to a gaussian z-multiple of the residual std.
        if "uncertainty_X" in c:
            x = float(c["uncertainty_X"])
        else:
            x = _z_for_interval(float(c.get("uncertainty_interval", 0.95)))
        return [{"kind": "prophet", "name": prefix, "uncertainty_X": x,
                 "window_s": float(c.get("window_s", 21600.0))}]
    kernel, mapper = _KERNEL_ALGS[name]
    spec = {"kind": "kernel", "name": prefix, "kernel": kernel,
            "params": mapper(c)}
    if c.get("normalization"):
        nconf = c.get("normalization_conf", [{}])[0]
        spec["repair"] = {
            "periodic": _alg_name(c["normalization"][0]) == "PeriodicLastNAverage",
            "N": nconf.get("N", 5), "period": nconf.get("period", 1)}
    return spec if isinstance(spec, list) else [spec]


def _flatten(checks: list[dict]) -> list[dict]:
    out = []
    for ch in checks:
        if ch["kind"] == "combination":
            out.extend(_flatten(ch["sub"]))
        else:
            out.append(ch)
    return out


def run_reference_config(conf: dict | str, data_path: str | None = None,
                         ds=None, key_col: str | None = None,
                         value_col: str = "f0", base_dir: str | None = None):
    """Build and run the configured scorer chain.

    - ``data_path``: message CSV/JSON (defaults to the config's
      ``file_name``); or pass a prebuilt ``ds``.
    - ``key_col``: series key for data-parallel ordered processing; None
      reproduces the reference's single global stream (one group — correct
      but serial, exactly like the reference).
    Returns the Dataset with one ``<prefix>_code``/``<prefix>_status`` column
    pair per configured check, plus combination verdicts where configured.
    """
    if isinstance(conf, str):
        if base_dir is None:
            base_dir = os.path.dirname(os.path.dirname(os.path.abspath(conf)))
        with open(conf) as f:
            conf = json.load(f)
    checks = parse_config(conf)
    if ds is None:
        path = _resolve_path(data_path or conf.get("file_name"), base_dir)
        if path is None:
            raise ValueError("no data_path and config has no file_name")
        ds = (read_message_json(path) if path.endswith(".json")
              else read_message_csv(path))
    if key_col is None:
        key_col = "__stream__"
        ds = ds.add_column(key_col, lambda df: pd.Series(np.zeros(len(df), dtype=np.int8)))

    for c in _flatten(checks):
        if c.get("train_data"):
            c["train_data"] = _resolve_path(c["train_data"], base_dir)
    kernel_checks = [c for c in _flatten(checks) if c["kind"] == "kernel"]
    model_checks = [c for c in _flatten(checks) if c["kind"] == "model"]
    gan_checks = [c for c in _flatten(checks) if c["kind"] == "gan"]
    prophet_checks = [c for c in _flatten(checks) if c["kind"] == "prophet"]
    series_specs = [{"name": c["name"], "kernel": c["kernel"],
                     "params": c["params"]} for c in kernel_checks]
    for c in gan_checks:
        series_specs.append({"name": c["name"], "params": {},
                             "kernel": _fit_gan_kernel(c, ds, value_col)})
    if series_specs:
        ds = series_mod.apply_series_checks(ds, key_col, ["ts"], value_col,
                                            series_specs)
    for c in prophet_checks:
        from ..stages import asof as asof_mod
        forecast = asof_mod.seasonal_forecast(ds, ts_col="ts",
                                              value_col=value_col,
                                              X=c["uncertainty_X"])
        ds = asof_mod.forecast_band_check(ds, forecast, ts_col="ts",
                                          value_col=value_col,
                                          prefix=c["name"])
    for c in model_checks:
        ds = _apply_model_stage(ds, c, value_col)
    for c in kernel_checks:
        if "repair" in c:
            r = c["repair"]
            ds = norm_mod.apply_repair(ds, key_col, ["ts"], value_col,
                                       f"{c['name']}_code", N=r["N"],
                                       period=r["period"] if r["periodic"] else 1)
    for ch in checks:
        if ch["kind"] == "combination":
            ds = _apply_combination(ds, ch, key_col)
    return ds


def _resolve_path(path: str | None, base_dir: str | None) -> str | None:
    """Reference configs carry data paths relative to the reference root
    (e.g. ``data/ads-1.csv``); resolve against ``base_dir`` when the literal
    path does not exist."""
    if path is None or os.path.isabs(path) or os.path.exists(path):
        return path
    if base_dir is not None:
        cand = os.path.join(base_dir, path)
        if os.path.exists(cand):
            return cand
    return path


def _fit_gan_kernel(spec: dict, ds, value_col: str):
    """Train the numpy MLP autoencoder (reference GAN, gan.py:293-330) from
    the config's train_data message file or a head sample of the stream,
    returning a series kernel with the adaptive-threshold scoring."""
    from ..stages import autoencoder as ae_mod
    p = spec.get("train_data")
    if p:
        tds = read_message_json(p) if p.endswith(".json") else read_message_csv(p)
    else:
        tds = ds
    # head sample: minibatch-SGD fit saturates well below this, and a
    # bounded sample is the scale-correct default (the reference loads the
    # whole train file driver-side — gan.py:318)
    train = tds.limit(8192).to_pandas()[value_col].to_numpy(dtype=np.float64)
    train = train[~np.isnan(train)]
    model = ae_mod.MLPAutoencoder(spec["N_shifts"], spec["N_latent"]).fit(train)
    return ae_mod.make_autoencoder_kernel(model, spec["K"], spec["len_window"])


def _apply_model_stage(ds, spec: dict, value_col: str):
    from ..stages import iforest as if_mod
    sample = model_train_sample(spec, ds)
    fitted = fit_model_from_sample(spec, sample, value_col)
    # the score stages emit fixed column names (if_/pca_/cl_); rename to
    # the check's config prefix so combinations resolve members and two
    # model checks in one config never collide
    prefix = spec["name"]
    if spec["model"] == "IsolationForest":
        out = if_mod.score_stage(ds, fitted, [value_col])
        return _rename_model_cols(out, "if", prefix)
    if spec["model"] == "PCA":
        pca, forest = fitted
        out = if_mod.pca_score_stage(ds, pca, forest, [value_col])
        return _rename_model_cols(out, "pca", prefix)
    if spec["model"] == "Clustering":
        import ray as _ray
        out = ds.map_batches(
            if_mod.ClusteringScore,
            fn_constructor_kwargs={"model_ref": _ray.put(fitted),
                                   "feature_cols": [value_col]},
            batch_format="pyarrow", concurrency=2, num_cpus=1)
        return _rename_model_cols(out, "cl", prefix)
    raise NotImplementedError(spec["model"])


def model_train_sample(spec: dict, ds=None) -> pd.DataFrame:
    """Bounded training sample for a model spec: the config's ``train_data``
    message file when given (reference semantics — models fit at configure
    time from the train file, isolation_forest.py:88-89), else a head
    sample of the scored stream ``ds``."""
    tc = spec["conf"].get("train_conf", {})
    tp = spec.get("train_data")
    if tp:
        tds = read_message_json(tp) if tp.endswith(".json") \
            else read_message_csv(tp)
    elif ds is not None:
        tds = ds
    else:
        raise ValueError(f"{spec['name']}: no train_data and no stream")
    return tds.limit(int(tc.get("max_samples", 2048)) * 4).to_pandas()


def fit_model_from_sample(spec: dict, sample: pd.DataFrame, value_col: str):
    """Fit the spec's model objects from a training sample frame. Shared by
    the Dataset scoring stage and the serving warm chain (api/scoring.py)
    so fit semantics cannot drift between them."""
    from ..stages import iforest as if_mod
    c = spec["conf"]
    tc = c.get("train_conf", {})
    train_col = value_col
    if spec.get("train_data") and value_col not in sample.columns:
        # custom value_col over a message-format train file: train on its
        # first feature column
        train_col = "f0"
    X = sample[[train_col]].to_numpy(dtype=np.float64)
    X = X[~np.isnan(X).any(axis=1)]
    if spec["model"] == "IsolationForest":
        return if_mod.IsolationForestModel(
            max_samples=int(tc.get("max_samples", 256)), seed=0).fit(X)
    if spec["model"] == "PCA":
        ncomp = min(int(tc.get("N_components", 1)), X.shape[1])
        return if_mod.fit_pca_iforest(
            X, n_components=ncomp, max_samples=int(tc.get("max_samples", 256)),
            seed=0)
    if spec["model"] == "Clustering":
        return if_mod.DBSCANCoreModel(
            eps=c["eps"], min_samples=c["min_samples"],
            treshold=c["treshold"]).fit(X)
    raise NotImplementedError(spec["model"])


def _rename_model_cols(ds, fixed: str, prefix: str):
    names = ds.schema().names
    ren = {f"{fixed}_{s}": f"{prefix}_{s}" for s in ("code", "status", "score")
           if f"{fixed}_{s}" in names}
    return ds.rename_columns(ren) if ren else ds


def _apply_combination(ds, ch: dict, key_col: str):
    from ..stages.combination import combine_stage
    code_cols = [f"{s['name']}_code" for s in _flatten(ch["sub"])]
    det = ch["determiner"]
    if det in ("AND", "OR"):
        import pyarrow as pa

        def combine(t: pa.Table) -> pa.Table:
            return combine_stage(t, code_cols, mode=det.lower(),
                                 out_col=f"{ch['name']}_code")

        return ds.map_batches(combine, batch_format="pyarrow")
    if det in ("PercentScore", "PercentScore_Alicante"):
        dc = ch["determiner_conf"]
        return norm_mod.apply_percent_score(
            ds, key_col, ["ts"], code_cols, "ts",
            interval=dc["interval"], data_interval=dc["data_interval"],
            upper_only=det.endswith("Alicante"),
            status_cols=[f"{s['name']}_status" for s in _flatten(ch["sub"])])
    raise NotImplementedError(f"determiner {det}")
