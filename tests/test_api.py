"""REST service parity tests (reference api/src/component/router.py):
full detector CRUD lifecycle, config endpoints, single-record
detect_anomaly semantics (1 iff any configured check grades Error —
Test.classify_data), status gating, error envelope + status codes, and
the engine-native batch endpoint. The server runs on an ephemeral
localhost port, driven with urllib only.
"""

import json
import os
import urllib.error
import urllib.request

import pytest

from anomaly_detection_ray.api.server import start_background
from anomaly_detection_ray.api.store import DetectorStore

BORDER_CONFIG = {
    "anomaly_detection_alg": ["BorderCheck()"],
    "anomaly_detection_conf": [{
        "input_vector_size": 1,
        "warning_stages": [0.9],
        "UL": 4.0,
        "LL": -4.0,
        "output": ["TerminalOutput()"],
        "output_conf": [{}],
    }],
}


@pytest.fixture(scope="module")
def api(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("api")
    cfg_dir = str(root / "configuration")
    os.makedirs(cfg_dir)
    with open(os.path.join(cfg_dir, "border_check.json"), "w") as f:
        json.dump(BORDER_CONFIG, f)
    store = DetectorStore(str(root / "detectors.sqlite"), cfg_dir)
    srv, thread = start_background(store)
    host, port = srv.server_address[:2]
    yield f"http://{host}:{port}"
    srv.shutdown()
    store.close()


def call(base, method, path, body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(base + path, data=data, method=method,
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_config_endpoints(api):
    status, cfg = call(api, "GET", "/configuration/border_check.json")
    assert status == 200 and cfg == BORDER_CONFIG

    status, err = call(api, "GET", "/configuration/nope.json")
    assert status == 404
    assert err["error"]["status_code"] == 404 and err["error"]["path"]

    status, avail = call(api, "GET", "/available_configs")
    assert status == 200
    assert {"name": "BORDER_CHECK", "filename": "border_check.json"} in avail


def test_detector_lifecycle_and_detection(api):
    # empty store lists as 404, like the reference's DetectorNotFound
    status, _ = call(api, "GET", "/detectors")
    assert status == 404

    # create from a named config: starts inactive, config persisted
    status, res = call(api, "POST", "/detectors/create",
                       {"name": "b1", "description": "border",
                        "config_name": "border_check.json"})
    assert status == 200
    det = res["detector"]
    did = det["id"]
    assert det["status"] == "inactive"
    assert det["config_name"] == "detector_b1.json"
    assert json.loads(det["config"]) == BORDER_CONFIG

    # parameters endpoint returns the conf section
    status, params = call(api, "GET", f"/detectors/{did}/parameters")
    assert status == 200
    assert params == BORDER_CONFIG["anomaly_detection_conf"]

    # detection refused while inactive (400, reference DetectorNotActive)
    status, err = call(
        api, "POST",
        f"/detectors/{did}/detect_anomaly?timestamp=1.0&ftr_vector=0.5")
    assert status == 400 and "not active" in err["error"]["message"]

    status, det2 = call(api, "PUT", f"/detectors/{did}/active")
    assert status == 200 and det2["status"] == "active"

    # in-range value -> 0; out-of-border -> 1 (BorderCheck UL=4)
    status, pred = call(
        api, "POST",
        f"/detectors/{did}/detect_anomaly?timestamp=1.0&ftr_vector=0.5")
    assert (status, pred) == (200, 0)
    status, pred = call(
        api, "POST",
        f"/detectors/{did}/detect_anomaly?timestamp=2.0&ftr_vector=9.5")
    assert (status, pred) == (200, 1)

    # update name/description
    status, det3 = call(api, "PUT", f"/detectors/{did}",
                        {"description": "renamed"})
    assert status == 200 and det3["description"] == "renamed"

    # unknown id -> 404 everywhere
    for method, path in [("GET", "/detectors/9999"),
                         ("GET", "/detectors/9999/parameters"),
                         ("PUT", "/detectors/9999/active"),
                         ("DELETE", "/detectors/9999")]:
        status, err = call(api, method, path)
        assert status == 404, (method, path)

    # inline-config create (alg + conf, no config_name)
    status, res2 = call(api, "POST", "/detectors/create",
                        {"name": "b2", "description": None,
                         "config_data": BORDER_CONFIG})
    assert status == 200
    assert json.loads(res2["detector"]["config"]) == BORDER_CONFIG

    status, dets = call(api, "GET", "/detectors")
    assert status == 200 and [d["name"] for d in dets] == ["b1", "b2"]

    # delete one removes its persisted config file
    cfg_path = call(api, "GET", "/configuration/detector_b2.json")
    assert cfg_path[0] == 200
    status, _ = call(api, "DELETE", f"/detectors/{res2['detector']['id']}")
    assert status == 200
    assert call(api, "GET", "/configuration/detector_b2.json")[0] == 404

    # delete all -> {"status": "OK"}, store empty again
    status, ok = call(api, "DELETE", "/detectors")
    assert (status, ok) == (200, {"status": "OK"})
    assert call(api, "GET", "/detectors")[0] == 404


def test_detect_file_batch(api, tmp_path):
    """Engine extension: batch-score a message JSON through the
    distributed chain; summary counts must match the border math."""
    data = {"data": [{"timestamp": float(i),
                      "ftr_vector": [9.5 if i % 10 == 0 else 0.1]}
                     for i in range(100)]}
    p = tmp_path / "msgs.json"
    p.write_text(json.dumps(data))

    status, res = call(api, "POST", "/detectors/create",
                       {"name": "bf", "description": "",
                        "config_name": "border_check.json"})
    did = res["detector"]["id"]
    call(api, "PUT", f"/detectors/{did}/active")

    status, summary = call(api, "POST", f"/detectors/{did}/detect_file",
                           {"data_path": str(p)})
    assert status == 200
    assert summary["rows"] == 100
    assert summary["anomalies"] == 10  # every 10th value breaches UL=4

    call(api, "DELETE", "/detectors")


def test_bad_requests(api):
    status, _ = call(api, "POST", "/detectors/create", {"name": "x"})
    assert status == 400  # neither config_name nor inline config

    status, res = call(api, "POST", "/detectors/create",
                       {"name": "b3", "description": "",
                        "config_name": "border_check.json"})
    did = res["detector"]["id"]
    call(api, "PUT", f"/detectors/{did}/active")

    # missing params / non-numeric -> 400
    status, _ = call(api, "POST", f"/detectors/{did}/detect_anomaly")
    assert status == 400
    status, _ = call(
        api, "POST",
        f"/detectors/{did}/detect_anomaly?timestamp=a&ftr_vector=b")
    assert status == 400
    # bad status value -> 400
    status, _ = call(api, "PUT", f"/detectors/{did}/bogus")
    assert status == 400
    call(api, "DELETE", "/detectors")


def test_concurrent_requests(api):
    """The service is a ThreadingHTTPServer over one shared sqlite
    connection: a burst of concurrent creates + detections + reads must
    all succeed with consistent state (no lost writes, no cross-thread
    connection errors)."""
    import concurrent.futures as cf

    def mk(i):
        s, r = call(api, "POST", "/detectors/create",
                    {"name": f"cc{i}", "description": "",
                     "config_name": "border_check.json"})
        assert s == 200, r
        did = r["detector"]["id"]
        s, _ = call(api, "PUT", f"/detectors/{did}/active")
        assert s == 200
        s, pred = call(
            api, "POST",
            f"/detectors/{did}/detect_anomaly?timestamp={i}&ftr_vector=9.9")
        assert (s, pred) == (200, 1)
        s, got = call(api, "GET", f"/detectors/{did}")
        assert s == 200 and got["status"] == "active"
        return did

    with cf.ThreadPoolExecutor(max_workers=8) as ex:
        ids = list(ex.map(mk, range(12)))
    assert len(set(ids)) == 12  # autoincrement never reused under races
    status, dets = call(api, "GET", "/detectors")
    assert status == 200
    assert {d["id"] for d in dets} >= set(ids)
    call(api, "DELETE", "/detectors")


def test_warm_chain_parity_and_fallback(ray_session):
    """Kernel-only configs score through the compiled in-process chain;
    the verdict must equal the full Ray chain's for the same record, the
    compiled chain must be cached per config hash, and configs needing
    training/windows must fall back (chain is None)."""
    import ray.data as rd

    from anomaly_detection_ray.api import scoring
    from anomaly_detection_ray.pipelines.config import run_reference_config

    combo_config = {
        "anomaly_detection_alg": ["Combination()"],
        "anomaly_detection_conf": [{
            "anomaly_algorithms": ["BorderCheck()", "EMA()"],
            "anomaly_algorithms_configurations": [
                {"input_vector_size": 1, "warning_stages": [0.9],
                 "UL": 4.0, "LL": -4.0},
                {"input_vector_size": 1, "N": 5, "warning_stages": [0.9],
                 "UL": 3.0, "LL": -3.0},
            ],
            "status_determiner": "AND()",
        }],
    }
    for config in (BORDER_CONFIG, combo_config):
        scoring._CHAIN_CACHE.clear()
        chain = scoring._warm_chain(config)
        assert chain is not None
        assert scoring._warm_chain(config) is chain  # cache hit
        for ts, v in [(1.0, 0.5), (2.0, 9.5), (3.0, -9.5), (4.0, 3.5)]:
            fast = scoring.detect_anomaly_record(config, ts, [v])
            frame = scoring._record_frame(ts, [v])
            full = run_reference_config(
                config, ds=rd.from_pandas(frame)).to_pandas()
            code_cols = [c for c in full.columns if c.endswith("_code")]
            want = int(bool((full.iloc[0][code_cols].to_numpy()
                             == scoring.ERROR_CODE).any()))
            assert fast == want, (config, ts, v)

    model_config = {
        "anomaly_detection_alg": ["IsolationForest()"],
        "anomaly_detection_conf": [{
            "input_vector_size": 1,
            "train_conf": {"max_samples": 64, "max_features": 1},
        }],
    }
    assert scoring._warm_chain(model_config) is None  # full-chain fallback


def _full_chain_verdict(config, ts, vec):
    import ray.data as rd

    from anomaly_detection_ray.api import scoring
    from anomaly_detection_ray.pipelines.config import run_reference_config

    frame = scoring._record_frame(ts, vec)
    full = run_reference_config(config, ds=rd.from_pandas(frame)).to_pandas()
    code_cols = [c for c in full.columns if c.endswith("_code")]
    return int(bool((full.iloc[0][code_cols].to_numpy()
                     == scoring.ERROR_CODE).any()))


def test_warm_chain_fitted_models_from_train_data(ray_session, tmp_path):
    """Model/GAN configs WITH a train_data file compile to a warm chain
    (the model fits once at compile time) and every verdict equals the
    full Ray chain's; retraining the file (mtime change) recompiles."""
    import numpy as np
    import pandas as pd

    from anomaly_detection_ray.api import scoring

    rng = np.random.default_rng(11)
    train = tmp_path / "train.csv"
    pd.DataFrame({"timestamp": np.arange(300) * 1.0,
                  "ftr_vector": rng.normal(0, 0.05, 300).round(4)}).to_csv(
        train, index=False)

    configs = {
        "clustering": {"anomaly_detection_alg": ["Clustering()"],
                       "anomaly_detection_conf": [{
                           "input_vector_size": 1, "eps": 0.5,
                           "min_samples": 5, "treshold": 0.4,
                           "train_data": str(train)}]},
        "iforest": {"anomaly_detection_alg": ["IsolationForest()"],
                    "anomaly_detection_conf": [{
                        "input_vector_size": 1,
                        "train_conf": {"max_samples": 64},
                        "train_data": str(train)}]},
        "pca": {"anomaly_detection_alg": ["PCA()"],
                "anomaly_detection_conf": [{
                    "input_vector_size": 1,
                    "train_conf": {"max_samples": 64, "N_components": 1},
                    "train_data": str(train)}]},
        "gan": {"anomaly_detection_alg": ["GAN()"],
                "anomaly_detection_conf": [{
                    "input_vector_size": 1,
                    "train_conf": {"N_shifts": 4, "N_latent": 2, "K": 1.5,
                                   "len_window": 100},
                    "train_data": str(train)}]},
    }
    scoring._CHAIN_CACHE.clear()
    for name, config in configs.items():
        chain = scoring._warm_chain(config)
        assert chain is not None, name
        assert scoring._warm_chain(config) is chain, name  # cache hit
        for ts, v in [(1.0, 0.02), (2.0, 100.0), (3.0, -0.03)]:
            fast = scoring.detect_anomaly_record(config, ts, [v])
            assert fast == _full_chain_verdict(config, ts, [v]), (name, ts, v)
    # a detector trained on the tight cluster at 0 must flag 100
    assert scoring.detect_anomaly_record(configs["clustering"], 9.0, [100.0]) == 1
    assert scoring.detect_anomaly_record(configs["clustering"], 9.0, [0.01]) == 0

    # retrain the file around 100: the fingerprint key recompiles the
    # chain and the verdicts flip — no config change, no cache flush
    cfg = configs["clustering"]
    old_chain = scoring._warm_chain(cfg)
    pd.DataFrame({"timestamp": np.arange(300) * 1.0,
                  "ftr_vector": (100 + rng.normal(0, 0.05, 300)).round(4)}
                 ).to_csv(train, index=False)
    os.utime(train, ns=(os.stat(train).st_mtime_ns + 10**9,) * 2)
    new_chain = scoring._warm_chain(cfg)
    assert new_chain is not None and new_chain is not old_chain
    assert scoring.detect_anomaly_record(cfg, 9.0, [100.0]) == 0
    assert scoring.detect_anomaly_record(cfg, 9.0, [0.01]) == 1
    assert scoring.detect_anomaly_record(cfg, 9.0, [100.0]) \
        == _full_chain_verdict(cfg, 9.0, [100.0])
