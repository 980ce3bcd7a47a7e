"""PELT changepoints: exact-optimality vs full O(n^2) DP, planted-shift
recovery, robustness of the noise estimate, and series-stage integration."""

import numpy as np
import pytest

from anomaly_detection_ray.functions import changepoint as cpt
from anomaly_detection_ray.functions.grading import ERROR_CODE, OK_CODE, \
    UNDEFINED_CODE


def full_dp(x, beta, min_size=2):
    """O(n^2) optimal partition (no pruning) — the definitional optimum."""
    x = np.asarray(x, float)
    n = len(x)
    c1 = np.concatenate([[0.0], np.cumsum(x)])
    c2 = np.concatenate([[0.0], np.cumsum(x * x)])

    def cost(a, b):
        s = c1[b] - c1[a]
        return (c2[b] - c2[a]) - s * s / (b - a)

    F = np.full(n + 1, np.inf)
    F[0] = -beta
    prev = np.zeros(n + 1, dtype=int)
    for t in range(min_size, n + 1):
        for s in range(0, t - min_size + 1):
            if not np.isfinite(F[s]):
                continue
            v = F[s] + cost(s, t) + beta
            if v < F[t]:
                F[t], prev[t] = v, s
    cps = []
    t = n
    while t > 0:
        s = int(prev[t])
        if s > 0:
            cps.append(s)
        t = s
    return sorted(cps), F[n]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_pelt_matches_full_dp(seed):
    rng = np.random.default_rng(seed)
    x = np.concatenate([rng.normal(0, 1, 40), rng.normal(3, 1, 30),
                        rng.normal(-1, 1, 50), rng.normal(2, 1, 20)])
    for beta in (2.0, 8.0, 20.0):
        got = cpt.pelt_mean(x, beta=beta)
        want, _ = full_dp(x, beta)
        assert got == want, f"beta={beta}: {got} != {want}"


def test_planted_shifts_recovered():
    rng = np.random.default_rng(5)
    x = np.concatenate([rng.normal(0, .2, 100), rng.normal(4, .2, 80),
                        rng.normal(1, .2, 120)])
    cps = cpt.pelt_mean(x)
    assert len(cps) == 2
    assert abs(cps[0] - 100) <= 2 and abs(cps[1] - 180) <= 2


def test_stationary_series_no_changepoints():
    rng = np.random.default_rng(9)
    assert cpt.pelt_mean(rng.normal(0, 1, 300)) == []
    # constant series: sigma floor, still no changepoints
    assert cpt.pelt_mean(np.ones(100)) == []


def test_check_wrapper_flags_changepoints_only():
    rng = np.random.default_rng(11)
    x = np.concatenate([rng.normal(0, .2, 100), rng.normal(4, .2, 100)])
    out = cpt.changepoint_check(x, min_size=5)
    flagged = np.nonzero(out["status_code"] == ERROR_CODE)[0]
    assert len(flagged) == 1 and abs(flagged[0] - 100) <= 2
    assert (out["status_code"] != UNDEFINED_CODE).all()
    short = cpt.changepoint_check(np.arange(5, dtype=float), min_size=5)
    assert (short["status_code"] == UNDEFINED_CODE).all()


def test_series_stage_integration(ray_session):
    import pandas as pd
    import ray.data as rd
    from anomaly_detection_ray.stages import series as series_mod

    rng = np.random.default_rng(3)
    rows = []
    for uid, shift in (("u-flat", 0.0), ("u-shift", 5.0)):
        sig = np.concatenate([rng.normal(0, .3, 150),
                              rng.normal(shift, .3, 150)])
        rows += [{"event_id": f"{uid}-{i:05d}", "user_id": uid,
                  "ts": i, "value": float(v)} for i, v in enumerate(sig)]
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = series_mod.apply_series_checks(
        ds, "user_id", ["ts"], "value",
        [{"name": "cp", "kernel": "changepoint",
          "params": {"min_size": 5}}], keep_status=False).to_pandas()
    err = out[out["cp_code"] == ERROR_CODE]
    assert set(err["user_id"].unique()) == {"u-shift"}
    idx = err["event_id"].str[-5:].astype(int)
    assert len(idx) == 1 and abs(int(idx.iloc[0]) - 150) <= 2
