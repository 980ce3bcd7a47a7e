"""Parity: vectorized per-series kernels == sequential oracle.

Runs every kernel against its oracle twin on (a) the reference golden
vectors and (b) seeded random streams, comparing the full status_code
sequence element-wise.
"""

import numpy as np
import pytest

from anomaly_detection_ray import oracle as orc
from anomaly_detection_ray.functions import rolling

TS0 = 1459926000.0


def oracle_codes(scorer, values):
    return [scorer.insert({"ftr_vector": [float(v)], "timestamp": TS0 + 3600 * i})[1]
            for i, v in enumerate(values)]


def random_streams(n_streams=8, n=200, seed=7):
    rng = np.random.default_rng(seed)
    out = []
    for k in range(n_streams):
        base = rng.normal(10, 3, size=n)
        # add a few spikes and a ramp so all verdict classes appear
        spikes = rng.choice(n, size=5, replace=False)
        base[spikes] += rng.choice([-30, 30], size=5)
        base[n // 2:] += np.linspace(0, 10, n - n // 2)
        out.append(base)
    return out


@pytest.mark.parametrize("stream_idx", range(4))
def test_border_parity(stream_idx):
    vals = random_streams()[stream_idx]
    got = rolling.border_check(vals, UL=14, LL=6, warning_stages=[0.7, 0.9])
    want = oracle_codes(orc.OracleBorderCheck(UL=14, LL=6, warning_stages=[0.7, 0.9]), vals)
    np.testing.assert_array_equal(got["status_code"], want)


@pytest.mark.parametrize("stream_idx", range(4))
def test_ema_parity(stream_idx):
    vals = random_streams()[stream_idx]
    got = rolling.ema_check(vals, N=5, UL=14, LL=6, warning_stages=[0.7, 0.9])
    want = oracle_codes(orc.OracleEMA(N=5, UL=14, LL=6, warning_stages=[0.7, 0.9]), vals)
    np.testing.assert_array_equal(got["status_code"], want)


@pytest.mark.parametrize("stream_idx", range(4))
def test_macd_parity(stream_idx):
    vals = random_streams()[stream_idx]
    got = rolling.macd_check(vals, period1=5, period2=15, UL=2, LL=-2,
                             warning_stages=[0.5, 0.9])
    want = oracle_codes(
        orc.OracleMACD(period1=5, period2=15, UL=2, LL=-2, warning_stages=[0.5, 0.9]), vals)
    np.testing.assert_array_equal(got["status_code"], want)


@pytest.mark.parametrize("N", [None, 4, 10])
@pytest.mark.parametrize("stream_idx", range(3))
def test_welford_parity(N, stream_idx):
    vals = random_streams()[stream_idx]
    got = rolling.welford_check(vals, X=2, N=N, warning_stages=[0.7, 0.9])
    want = oracle_codes(orc.OracleWelford(X=2, N=N, warning_stages=[0.7, 0.9]), vals)
    np.testing.assert_array_equal(got["status_code"], want)


@pytest.mark.parametrize("stream_idx", range(3))
def test_cumulative_parity(stream_idx):
    vals = np.abs(random_streams()[stream_idx]) + 1  # keep running mean off zero
    got = rolling.cumulative_check(vals, decay=0.1, averaging=3, warning_stages=[0.5])
    want = oracle_codes(
        orc.OracleCumulative(decay=0.1, averaging=3, warning_stages=[0.5]), vals)
    np.testing.assert_array_equal(got["status_code"], want)


@pytest.mark.parametrize("stream_idx", range(3))
def test_hampel_parity(stream_idx):
    vals = random_streams()[stream_idx]
    got = rolling.hampel_check(vals, W=3, K=1.4826, n_sigmas=3)
    o = orc.OracleHampel(W=3, K=1.4826, n_sigmas=3)
    want, suggested = [], []
    for i, v in enumerate(vals):
        want.append(o.insert({"ftr_vector": [float(v)], "timestamp": TS0 + i})[1])
        suggested.append(o.suggested_value)
    np.testing.assert_array_equal(got["status_code"], want)
    graded = np.asarray(want) != 2
    np.testing.assert_allclose(got["suggested_value"][graded],
                               np.asarray(suggested, dtype=float)[graded])


@pytest.mark.parametrize("stream_idx", range(3))
def test_percentile_parity(stream_idx):
    vals = random_streams()[stream_idx]
    got = rolling.percentile_check(vals, buff_size=20, lo=5, hi=95)
    want = oracle_codes(orc.OraclePercentile(percentile_range=[5, 95], buff_size=20), vals)
    np.testing.assert_array_equal(got["status_code"], want)


@pytest.mark.parametrize("stream_idx", range(3))
def test_linear_fit_parity(stream_idx):
    vals = random_streams()[stream_idx]
    got = rolling.linear_fit_check(vals, N=8, UL=1, LL=-1, confidence_norm=5,
                                   warning_stages=[0.5])
    want = oracle_codes(
        orc.OracleLinearFit(N=8, UL=1, LL=-1, confidence_norm=5, warning_stages=[0.5]), vals)
    np.testing.assert_array_equal(got["status_code"], want)


@pytest.mark.parametrize("mode", [0, 1])
@pytest.mark.parametrize("stream_idx", range(3))
def test_filtering_parity(mode, stream_idx):
    vals = random_streams()[stream_idx] / 10.0
    got = rolling.filtering_check(vals, filter_order=3, cutoff_frequency=0.4,
                                  mode=mode, UL=2, LL=0, warning_stages=[0.7, 0.9])
    o = orc.OracleFiltering(filter_order=3, cutoff_frequency=0.4, mode=mode,
                            UL=2, LL=0, warning_stages=[0.7, 0.9])
    want = oracle_codes(o, vals)
    np.testing.assert_array_equal(got["status_code"], want)


def test_golden_vectors_through_kernels():
    """The FIXTURES.md §A golden sequences, straight through the kernels."""
    np.testing.assert_array_equal(
        rolling.border_check(np.array([3, 5, 1, 2.1]), 4, 2, [0.7, 0.9])["status_code"],
        [1, -1, -1, 0])
    np.testing.assert_array_equal(
        rolling.welford_check(np.array([1, 2, 3, 4, 1, 2.0]), X=2, N=4,
                              warning_stages=[0.7, 0.9])["status_code"],
        [2, 2, 2, 2, 1, 1])
    np.testing.assert_array_equal(
        rolling.welford_check(np.array([1, 2, 3, 4, -0.1, 5.73]), X=2, N=4,
                              warning_stages=[0.7, 0.9])["status_code"],
        [2, 2, 2, 2, -1, -1])
    np.testing.assert_array_equal(
        rolling.welford_check(np.array([1, 2, 2.4, 2.6, 1, 3.1]), X=2, N=None,
                              warning_stages=[])["status_code"],
        [2, 2, 1, 1, 1, 1])
    np.testing.assert_array_equal(
        rolling.welford_check(np.array([1, 2, 3, -1, 5, -2.5]), X=2, N=None,
                              warning_stages=[])["status_code"],
        [2, 2, -1, -1, -1, -1])
    np.testing.assert_array_equal(
        rolling.ema_check(np.array([3, 4, 4, 4, 4, 5, 5, 5.0]), N=5, UL=4, LL=2,
                          warning_stages=[0.7, 0.9])["status_code"],
        [1, 1, 1, 0, 0, -1, -1, -1])
    vals = np.array([1.0] * 30 + [-0.4 * i for i in range(10)])
    np.testing.assert_array_equal(
        rolling.macd_check(vals, 10, 30, 1, -1, [0.5])["status_code"],
        [1] * 30 + [1, 1, 1, 0, 0, 0, -1, -1, -1, -1])
    np.testing.assert_array_equal(
        rolling.cumulative_check(np.array([1, 1, 1, 5, 5, 5, 1, 1.0]), 0.1, 3,
                                 [0.5])["status_code"],
        [0, 0, 0, -1, -1, -1, -1, 1])
    np.testing.assert_array_equal(
        rolling.filtering_check(np.array([0, 0, 0, 1, 2, 2, 2.0]), 3, 0.4, 1,
                                UL=1, LL=0, warning_stages=[0.7, 0.9])["status_code"],
        [0, 1, 1, -1, -1, 1, 1])
    np.testing.assert_array_equal(
        rolling.filtering_check(np.array([0.5, 0.5, 0.5, 1, 1, 1, 2, 2, 2.0]), 3,
                                0.4, 0, UL=1, LL=0,
                                warning_stages=[0.7, 0.9])["status_code"],
        [0, 1, 1, 1, 1, 0, -1, -1, -1])


def test_first_order_scan_matches_loop():
    from anomaly_detection_ray.functions import dsp
    rng = np.random.default_rng(3)
    x = rng.normal(size=5000)
    for a in [0.9, 0.5, 0.05, -0.3]:
        got = dsp.first_order_scan(a, x, y0=1.0)
        y, want = 1.0, []
        for xi in x:
            y = a * y + xi
            want.append(y)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("stream_idx", range(4))
def test_cusum_parity(stream_idx):
    """cusum_check's prefix-scan form == the sequential max(0, s+x)
    recurrence, on streams with spikes and a drift ramp."""
    vals = random_streams()[stream_idx]
    got = rolling.cusum_check(vals, UL=14, LL=6, k=0.25, h=2.0)
    sp = sn = 0.0
    want_sp, want_sn, want_code = [], [], []
    for v in vals:
        vn = 2.0 * (v - 10.0) / 8.0
        sp = max(0.0, sp + vn - 0.25)
        sn = max(0.0, sn - vn - 0.25)
        want_sp.append(sp)
        want_sn.append(sn)
        want_code.append(-1 if (sp > 2.0 or sn > 2.0) else 1)
    np.testing.assert_allclose(got["s_pos"], want_sp, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(got["s_neg"], want_sn, rtol=1e-12, atol=1e-12)
    np.testing.assert_array_equal(got["status_code"], want_code)
    assert (got["status_code"] == -1).any()  # the ramp must alarm


@pytest.mark.parametrize("stream_idx", range(4))
def test_cusum_reset_parity(stream_idx):
    """The reset variant matches a sequential recurrence with post-alarm
    restart, and resets change the verdict stream vs the no-reset form
    on a drifting stream (multiple fresh alarms, not one excursion)."""
    vals = random_streams()[stream_idx]
    got = rolling.cusum_reset_check(vals, UL=14, LL=6, k=0.25, h=2.0)
    sp = sn = 0.0
    want_code = []
    for v in vals:
        vn = 2.0 * (v - 10.0) / 8.0
        sp = max(0.0, sp + vn - 0.25)
        sn = max(0.0, sn - vn - 0.25)
        a = sp > 2.0 or sn > 2.0
        want_code.append(-1 if a else 1)
        if a:
            sp = sn = 0.0
    np.testing.assert_array_equal(got["status_code"], want_code)
    no_reset = rolling.cusum_check(vals, UL=14, LL=6, k=0.25, h=2.0)
    assert (got["status_code"] == -1).sum() < (no_reset["status_code"] == -1).sum()
