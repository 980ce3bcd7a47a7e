"""Matrix profile: STOMP vs brute-force definition, planted-discord
recovery, and the per-series check wrapper."""

import numpy as np
import pytest

from anomaly_detection_ray.functions import matprof
from anomaly_detection_ray.functions.grading import (ERROR_CODE, OK_CODE,
                                                     UNDEFINED_CODE)


def brute_mp(x, m):
    """O(n^2 m) literal definition: z-normalized Euclidean distance to the
    nearest neighbor outside the +-m/2 exclusion zone."""
    x = np.asarray(x, float)
    l = len(x) - m + 1
    excl = max(1, m // 2)
    subs = np.stack([x[i:i + m] for i in range(l)])
    mu = subs.mean(axis=1, keepdims=True)
    sd = subs.std(axis=1, keepdims=True)
    z = np.where(sd > 1e-12, (subs - mu) / np.where(sd > 1e-12, sd, 1.0), 0.0)
    const = (sd[:, 0] <= 1e-12)
    mp = np.full(l, np.inf)
    mpi = np.full(l, -1)
    for i in range(l):
        for j in range(l):
            if abs(i - j) <= excl:
                continue
            if const[i] and const[j]:
                d = 0.0
            elif const[i] or const[j]:
                d = np.sqrt(2.0 * m)
            else:
                corr = float(z[i] @ z[j]) / m
                d = np.sqrt(max(2.0 * m * (1.0 - min(corr, 1.0)), 0.0))
            if d < mp[i]:
                mp[i], mpi[i] = d, j
    return mp, mpi


def test_stomp_matches_brute_force():
    rng = np.random.default_rng(7)
    x = np.sin(np.linspace(0, 20 * np.pi, 240)) + rng.normal(0, .3, 240)
    m = 16
    mp, mpi = matprof.matrix_profile(x, m)
    bmp, _ = brute_mp(x, m)
    np.testing.assert_allclose(mp, bmp, atol=1e-7)


def test_constant_series_and_flatline_convention():
    # all-constant: every subsequence matches another constant => mp 0
    mp, _ = matprof.matrix_profile(np.ones(100), 8)
    np.testing.assert_allclose(mp, 0.0, atol=1e-9)
    # brute parity on a mixed flatline + signal series
    rng = np.random.default_rng(1)
    x = np.concatenate([np.zeros(60), np.sin(np.linspace(0, 8 * np.pi, 120))
                        + rng.normal(0, .05, 120), np.zeros(60)])
    mp, _ = matprof.matrix_profile(x, 12)
    bmp, _ = brute_mp(x, 12)
    np.testing.assert_allclose(mp, bmp, atol=1e-7)


def test_planted_discord_found():
    """A periodic series with ONE anomalous subsequence: the discord
    (argmax of the profile) lands on the planted window, while window
    statistics over the same series stay in-band (the capability the
    operator adds)."""
    t = np.linspace(0, 40 * np.pi, 800)
    x = np.sin(t)
    x[400:420] = np.sin(t[400:420]) * np.cos(np.linspace(0, 3 * np.pi, 20))
    mp, _ = matprof.matrix_profile(x, 20)
    disc = int(np.argmax(mp))
    assert 380 <= disc <= 420
    out = matprof.matrix_profile_check(x, m=20, threshold=4.0)
    flagged = np.nonzero(out["status_code"] == ERROR_CODE)[0]
    assert len(flagged) > 0
    assert all(375 <= i <= 425 for i in flagged)
    # clean periodic region is OK, tail is Undefined (no window starts)
    assert (out["status_code"][:300] == OK_CODE).all()
    assert (out["status_code"][-19:] == UNDEFINED_CODE).all()


def test_short_series_undefined():
    out = matprof.matrix_profile_check(np.arange(10, dtype=float), m=16)
    assert (out["status_code"] == UNDEFINED_CODE).all()


def test_series_stage_integration(ray_session):
    """The kernel runs behind the standard per-series stage and flags the
    planted discord in exactly one user's series."""
    import pandas as pd
    import ray.data as rd
    from anomaly_detection_ray.stages import series as series_mod

    t = np.linspace(0, 40 * np.pi, 600)
    good = np.sin(t)
    bad = np.sin(t).copy()
    bad[300:320] = 2.0 * np.cos(np.linspace(0, 3 * np.pi, 20))
    rows = []
    for uid, sig in (("u-good", good), ("u-bad", bad)):
        rows += [{"event_id": f"{uid}-{i:05d}", "user_id": uid,
                  "ts": i, "value": float(v)} for i, v in enumerate(sig)]
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = series_mod.apply_series_checks(
        ds, "user_id", ["ts"], "value",
        [{"name": "mpf", "kernel": "matrix_profile",
          "params": {"m": 20, "threshold": 4.0}}],
        keep_status=False).to_pandas()
    err = out[out["mpf_code"] == ERROR_CODE]
    assert set(err["user_id"].unique()) == {"u-bad"}
    idx = err["event_id"].str[-5:].astype(int)
    assert idx.between(280, 325).all()
