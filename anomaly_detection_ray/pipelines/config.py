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
data-parallel. Unsupported scorers (Keras/Prophet/rrcf-backed: GAN,
Trend_Classification, fb_Prophet, RRCF_trees) raise NotImplementedError with
the reason (those libraries are deliberately out of the dependency set; see
SURVEY.md §2.4).
"""

from __future__ import annotations

import json
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
    # slope-classifier stand-in for the Keras MLP (functions/rolling.py
    # trend_classification_check docstring)
    "Trend_Classification": ("trend_classification", lambda c: {
        "N": c["N"], "averaging": c["averaging"],
        "prediction_conv": c["prediction_conv"],
        "warning_stages": sorted(c.get("warning_stages", [])),
        "amp_scale": c.get("amp_scale", 1.0)}),
}

_UNSUPPORTED = {
    "GAN": "Keras/TensorFlow not in the dependency set (see stages/"
           "autoencoder.py for the reconstruction-error mechanics with a "
           "linear codec)",
    "fb_Prophet": "Prophet not in the dependency set (see stages/asof.py "
                  "forecast_band_check for the as-of-join band semantics)",
}


def _alg_name(s: str) -> str:
    return s.strip().removesuffix("()")


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
        return [{"kind": "model", "name": prefix, "model": name, "conf": c}]
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
                         value_col: str = "f0"):
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
        with open(conf) as f:
            conf = json.load(f)
    checks = parse_config(conf)
    if ds is None:
        path = data_path or conf.get("file_name")
        if path is None:
            raise ValueError("no data_path and config has no file_name")
        ds = (read_message_json(path) if path.endswith(".json")
              else read_message_csv(path))
    if key_col is None:
        key_col = "__stream__"
        ds = ds.add_column(key_col, lambda df: pd.Series(np.zeros(len(df), dtype=np.int8)))

    kernel_checks = [c for c in _flatten(checks) if c["kind"] == "kernel"]
    model_checks = [c for c in _flatten(checks) if c["kind"] == "model"]
    if kernel_checks:
        ds = series_mod.apply_series_checks(
            ds, key_col, ["ts"], value_col,
            [{"name": c["name"], "kernel": c["kernel"], "params": c["params"]}
             for c in kernel_checks])
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


def _apply_model_stage(ds, spec: dict, value_col: str):
    from ..stages import iforest as if_mod
    c = spec["conf"]
    tc = c.get("train_conf", {})
    sample = ds.limit(int(tc.get("max_samples", 2048)) * 4).to_pandas()
    X = sample[[value_col]].to_numpy(dtype=np.float64)
    X = X[~np.isnan(X).any(axis=1)]
    if spec["model"] == "IsolationForest":
        model = if_mod.IsolationForestModel(
            max_samples=int(tc.get("max_samples", 256)), seed=0).fit(X)
        return if_mod.score_stage(ds, model, [value_col])
    if spec["model"] == "PCA":
        ncomp = min(int(tc.get("N_components", 1)), X.shape[1])
        pca, forest = if_mod.fit_pca_iforest(
            X, n_components=ncomp, max_samples=int(tc.get("max_samples", 256)),
            seed=0)
        return if_mod.pca_score_stage(ds, pca, forest, [value_col])
    if spec["model"] == "Clustering":
        import ray as _ray
        model = if_mod.DBSCANCoreModel(
            eps=c["eps"], min_samples=c["min_samples"],
            treshold=c["treshold"]).fit(X)
        return ds.map_batches(
            if_mod.ClusteringScore,
            fn_constructor_kwargs={"model_ref": _ray.put(model),
                                   "feature_cols": [value_col]},
            batch_format="pyarrow", concurrency=2, num_cpus=1)
    raise NotImplementedError(spec["model"])


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
