"""Scoring backends for the REST service — both routed through the SAME
config compat layer the CLI uses (pipelines/config.run_reference_config),
so the service fronts the engine rather than reimplementing it.

Single-record parity (reference router.py:79-117 detect_anomaly +
src/Test.py:103-177): the reference builds a FRESH consumer per call,
inserts ONE ``{"timestamp", "ftr_vector"}`` record, and returns 1 iff any
configured algorithm's first status string starts with "Error"
(Test.classify_data). Here the record becomes a 1-row Dataset through the
same ts/f0..fk column convention as sources/messages.read_message_json,
runs the configured chain, and maps any ``*_code == ERROR_CODE`` to 1.

Batch extension (engine-native, no reference equivalent): score a whole
message FILE through the distributed pipeline and return summary counts —
the Ray data plane the single-record endpoint cannot show.
"""

from __future__ import annotations

import hashlib
import json
import math
import threading
from typing import Any, Callable

import numpy as np
import pandas as pd

from ..functions.grading import ERROR_CODE
from ..pipelines.config import run_reference_config
from .store import ApiError


def _record_frame(timestamp: float, ftr_vector: list[float]) -> pd.DataFrame:
    cols: dict[str, Any] = {"ts": [float(timestamp)]}
    for i, v in enumerate(ftr_vector):
        cols[f"f{i}"] = [float(v)]
    return pd.DataFrame(cols)


# ---- warm per-detector chains ------------------------------------------
# The reference rebuilds a fresh consumer per detect_anomaly call
# (router.py:79-117), so there is no cross-call scorer state to preserve:
# a compiled chain is a pure function of (config, train files). For
# kernel-only configs (plus AND/OR combinations) we compile the pandas
# kernel ONCE per config hash and score the 1-row record in-process — the
# Ray data plane is for datasets, not single records, and this keeps the
# serving path off the cluster scheduler entirely. Model/GAN configs with
# a train_data file warm too: the model is FITTED once at compile time
# (the cache key carries the train file's mtime+size, so retraining the
# file invalidates the chain) and each call scores in-process against the
# fitted object. Configs whose fit depends on the scored stream itself
# (model/GAN without train_data) or on windowed determiners
# (prophet/repair/PercentScore) fall back to the full chain, same verdicts
# either way (pinned by test_api parity tests).
_CHAIN_CACHE: dict[str, Callable[[pd.DataFrame], pd.DataFrame] | None] = {}
_CHAIN_LOCK = threading.Lock()
_CHAIN_CACHE_MAX = 128


def _train_file_fingerprint(config: dict, base_dir: str | None) -> str:
    """(path, mtime_ns, size) for every train_data file the config names —
    part of the cache key so a retrained file recompiles the chain."""
    import os

    from ..pipelines.config import _flatten, _resolve_path, parse_config
    parts = []
    try:
        for c in _flatten(parse_config(config)):
            p = c.get("train_data")
            if not p:
                continue
            p = _resolve_path(p, base_dir)
            try:
                st = os.stat(p)
                parts.append(f"{p}:{st.st_mtime_ns}:{st.st_size}")
            except OSError:
                parts.append(f"{p}:missing")
    except Exception:
        # unparsable config: key on the config alone; compile will fall
        # back and the full chain raises the reference's error envelope
        return "unparsed"
    return "|".join(sorted(parts))


def _config_key(config: dict, base_dir: str | None = None) -> str:
    h = hashlib.sha256(
        json.dumps(config, sort_keys=True, default=str).encode())
    fp = _train_file_fingerprint(config, base_dir)
    if fp:
        h.update(b"\x00" + fp.encode())
    return h.hexdigest()


def _compile_record_chain(config: dict, base_dir: str | None = None):
    """Compile a config into an in-process 1-row scorer, or None when the
    config needs the full Ray chain (stream-dependent training, repair,
    windowed scoring)."""
    from functools import partial

    from ..pipelines.config import (_fit_gan_kernel, _flatten, _resolve_path,
                                    fit_model_from_sample, model_train_sample,
                                    parse_config)
    from ..stages import iforest as if_mod
    from ..stages.combination import combine_stage
    from ..stages.series import make_series_kernel

    checks = parse_config(config)
    flat = _flatten(checks)
    for c in flat:
        if c.get("train_data"):
            c["train_data"] = _resolve_path(c["train_data"], base_dir)
    kernel_flat = [c for c in flat if c["kind"] == "kernel"]
    model_flat = [c for c in flat if c["kind"] == "model"]
    gan_flat = [c for c in flat if c["kind"] == "gan"]
    if any("repair" in c for c in kernel_flat):
        return None
    if len(kernel_flat) + len(model_flat) + len(gan_flat) != len(flat):
        return None  # prophet etc.: windowed over the stream
    if any(not c.get("train_data") for c in model_flat + gan_flat):
        return None  # fit depends on the scored stream itself
    if any(ch["kind"] == "combination" and ch["determiner"] not in ("AND", "OR")
           for ch in checks):
        return None
    specs = [{"name": c["name"], "kernel": c["kernel"], "params": c["params"]}
             for c in kernel_flat]
    for c in gan_flat:
        # trains ONCE here from the train file (same helper as the full
        # chain); the fitted autoencoder lives in the cached closure
        specs.append({"name": c["name"], "params": {},
                      "kernel": _fit_gan_kernel(c, None, "f0")})
    per_group = make_series_kernel(specs, "f0", ["ts"], valid_col=None,
                                   keep_status=True) if specs else None
    model_scorers = []
    for c in model_flat:
        fitted = fit_model_from_sample(c, model_train_sample(c), "f0")
        if c["model"] == "IsolationForest":
            fn = partial(if_mod.iforest_score_table, model=fitted,
                         feature_cols=["f0"], prefix=c["name"])
        elif c["model"] == "PCA":
            pca, forest = fitted
            fn = partial(if_mod.pca_iforest_score_table, pca=pca,
                         model=forest, feature_cols=["f0"], prefix=c["name"])
        else:
            fn = partial(if_mod.clustering_score_table, model=fitted,
                         feature_cols=["f0"], prefix=c["name"])
        model_scorers.append(fn)
    combos = [(ch["name"], ch["determiner"].lower(),
               [f"{s['name']}_code" for s in _flatten(ch["sub"])])
              for ch in checks if ch["kind"] == "combination"]

    def run(frame: pd.DataFrame) -> pd.DataFrame:
        out = per_group(frame) if per_group is not None else frame
        if model_scorers or combos:
            import pyarrow as pa
            t = pa.Table.from_pandas(out)
            for fn in model_scorers:
                t = fn(t)
            for name, mode, cols in combos:
                t = combine_stage(t, cols, mode=mode, out_col=f"{name}_code")
            out = t.to_pandas()
        return out

    return run


def _warm_chain(config: dict, base_dir: str | None = None):
    key = _config_key(config, base_dir)
    with _CHAIN_LOCK:
        if key in _CHAIN_CACHE:
            return _CHAIN_CACHE[key]
    try:
        chain = _compile_record_chain(config, base_dir)
    except Exception:
        # let the full path raise the same error with the reference's
        # error envelope; never cache a poisoned entry as a scorer
        chain = None
    with _CHAIN_LOCK:
        if len(_CHAIN_CACHE) >= _CHAIN_CACHE_MAX:
            _CHAIN_CACHE.clear()
        _CHAIN_CACHE[key] = chain
    return chain


def detect_anomaly_record(config: dict, timestamp: float,
                          ftr_vector: list[float],
                          base_dir: str | None = None) -> int:
    """Run ONE record through the detector's configured chain; 1 iff any
    check graded it Error (the reference's pred_is_anomaly contract)."""
    import ray.data as rd

    if not ftr_vector or any(v is None or (isinstance(v, float)
                                           and math.isnan(v))
                             for v in ftr_vector):
        raise ApiError(400, "ftr_vector must be non-empty numbers")
    frame = _record_frame(timestamp, ftr_vector)
    try:
        chain = _warm_chain(config, base_dir)
        if chain is not None:
            row = chain(frame)
        else:
            out = run_reference_config(config, ds=rd.from_pandas(frame),
                                       base_dir=base_dir)
            row = out.to_pandas()
    except ApiError:
        raise
    except Exception as e:  # reference ProcessingException -> 500
        raise ApiError(500, f"An error occurred in start_consumer: {e}")
    if row.empty:
        raise ApiError(500, "scorer chain produced no verdict row")
    code_cols = [c for c in row.columns if c.endswith("_code")]
    codes = row.iloc[0][code_cols].to_numpy()
    return int(bool((codes == ERROR_CODE).any()))


def detect_anomaly_file(config: dict, data_path: str,
                        base_dir: str | None = None) -> dict:
    """Engine-native batch scoring: run a message CSV/JSON through the
    distributed chain and fold per-check verdict counts (one streaming
    aggregate — rows never collect on the driver)."""
    try:
        out = run_reference_config(config, data_path=data_path,
                                   base_dir=base_dir)
    except FileNotFoundError:
        raise ApiError(404, f"Data file with id {data_path} not found.")
    except Exception as e:
        raise ApiError(500, f"An error occurred in batch scoring: {e}")

    def fold(t) -> pd.DataFrame:
        df = t.to_pandas() if not isinstance(t, pd.DataFrame) else t
        code_cols = [c for c in df.columns if c.endswith("_code")]
        rec = {"rows": len(df)}
        for c in code_cols:
            rec[f"{c}_errors"] = int(
                (df[c].to_numpy() == ERROR_CODE).sum())
        return pd.DataFrame([rec])

    parts = out.map_batches(fold, batch_format="pyarrow").to_pandas()
    summary = {c: int(parts[c].fillna(0).sum()) for c in parts.columns}
    summary["anomalies"] = int(sum(
        v for k, v in summary.items() if k.endswith("_code_errors")))
    return summary
