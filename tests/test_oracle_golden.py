"""Golden status-sequence tests from the reference unit tests.

Vectors transcribed from /root/reference/src/unit_tests.py (see FIXTURES.md
§A); the oracle must reproduce the exact per-record status_code sequences the
reference's own test suite asserts.
"""

import numpy as np
import pytest

from anomaly_detection_ray import oracle as orc

TS0 = 1459926000.0


def stream(values):
    return [{"ftr_vector": [v], "timestamp": TS0 + 3600 * i} for i, v in enumerate(values)]


def run(scorer, values):
    return [scorer.insert(m)[1] for m in stream(values)]


def test_border_check():
    # unit_tests.py:160-186
    s = orc.OracleBorderCheck(UL=4, LL=2, warning_stages=[0.7, 0.9])
    assert run(s, [3, 5, 1, 2.1]) == [1, -1, -1, 0]


def test_border_check_statuses():
    s = orc.OracleBorderCheck(UL=4, LL=2, warning_stages=[0.7, 0.9])
    out = [s.insert(m) for m in stream([3, 5, 1, 2.1, 3.95])]
    assert out[0] == ("OK", 1)
    assert out[1][0].startswith("Error: measurement above")
    assert out[2][0].startswith("Error: measurement below")
    assert out[3][0] == "Warning0: measurement close to lower limit."
    assert out[4][0] == "Warning1: measurement close to upper limit."


def test_welford_windowed():
    # unit_tests.py:219-244
    s = orc.OracleWelford(X=2, N=4, warning_stages=[0.7, 0.9])
    assert run(s, [1, 2, 3, 4, 1, 2]) == [2, 2, 2, 2, 1, 1]
    s = orc.OracleWelford(X=2, N=4, warning_stages=[0.7, 0.9])
    assert run(s, [1, 2, 3, 4, -0.1, 5.73]) == [2, 2, 2, 2, -1, -1]


def test_welford_infinite():
    # unit_tests.py:274-305
    s = orc.OracleWelford(X=2, N=None, warning_stages=[])
    assert run(s, [1, 2, 2.4, 2.6, 1, 3.1]) == [2, 2, 1, 1, 1, 1]
    s = orc.OracleWelford(X=2, N=None, warning_stages=[])
    assert run(s, [1, 2, 3, -1, 5, -2.5]) == [2, 2, -1, -1, -1, -1]


def test_ema():
    # unit_tests.py:338-356
    s = orc.OracleEMA(N=5, UL=4, LL=2, warning_stages=[0.7, 0.9])
    assert run(s, [3, 4, 4, 4, 4, 5, 5, 5]) == [1, 1, 1, 0, 0, -1, -1, -1]


def test_macd():
    # unit_tests.py:746-766
    s = orc.OracleMACD(period1=10, period2=30, UL=1, LL=-1, warning_stages=[0.5])
    vals = [1.0] * 30 + [-0.4 * i for i in range(10)]
    expected = [1] * 30 + [1, 1, 1, 0, 0, 0, -1, -1, -1, -1]
    assert run(s, vals) == expected


def test_cumulative():
    # reproduced from reference execution (FIXTURES.md; no unit test at head)
    s = orc.OracleCumulative(decay=0.1, averaging=3, warning_stages=[0.5])
    assert run(s, [1, 1, 1, 5, 5, 5, 1, 1]) == [0, 0, 0, -1, -1, -1, -1, 1]


def test_filtering_coefficients():
    # unit_tests.py:415-440 — Butterworth order 3, cutoff 0.4
    from anomaly_detection_ray.functions import dsp

    b, a = dsp.butter_lowpass(3, 0.4)
    np.testing.assert_allclose(
        a, [1.0, -0.57724052, 0.42178705, -0.05629724], atol=1e-8)
    np.testing.assert_allclose(
        b, [0.09853116, 0.29559348, 0.29559348, 0.09853116], atol=1e-8)


def test_filtering_constant_signal_converges():
    s = orc.OracleFiltering(filter_order=3, cutoff_frequency=0.4, mode=0,
                            UL=2, LL=0, warning_stages=[])
    for m in stream([1.0] * 10):
        s.insert(m)
    assert abs(s.filtered - 1.0) < 1e-6


def test_filtering_mode1():
    # unit_tests.py:442-449
    s = orc.OracleFiltering(filter_order=3, cutoff_frequency=0.4, mode=1,
                            UL=1, LL=0, warning_stages=[0.7, 0.9])
    assert run(s, [0, 0, 0, 1, 2, 2, 2]) == [0, 1, 1, -1, -1, 1, 1]


def test_filtering_mode0():
    # unit_tests.py:462-469
    s = orc.OracleFiltering(filter_order=3, cutoff_frequency=0.4, mode=0,
                            UL=1, LL=0, warning_stages=[0.7, 0.9])
    assert run(s, [0.5, 0.5, 0.5, 1, 1, 1, 2, 2, 2]) == [0, 1, 1, 1, 1, 0, -1, -1, -1]


def test_hampel():
    # hampel.py semantics: spike at the off-center graded point flags Error
    s = orc.OracleHampel(W=2, K=1.4826, n_sigmas=3)
    vals = [1, 1, 1, 1, 1, 100, 1, 1, 1, 1, 1]
    codes = run(s, vals)
    assert codes[:5] == [2, 2, 2, 2, 2]
    assert -1 in codes[5:]
    assert s.suggested_value is not None


def test_percentile_intended():
    s = orc.OraclePercentile(percentile_range=[5, 95], buff_size=5)
    codes = run(s, [1, 1, 1, 1, 1, 1, 100])
    assert codes[-1] == -1
    assert all(c in (1, -1) for c in codes)


def test_linear_fit():
    s = orc.OracleLinearFit(N=5, UL=1, LL=-1, confidence_norm=0.5,
                            warning_stages=[0.5])
    vals = [1, 1, 1, 1, 1, 1, 1, 2, 3, 4, 5, 6]
    codes = run(s, vals)
    assert codes[:5] == [2, 2, 2, 2, 2]
    assert codes[5] == 1  # flat => slope 0 => OK
    assert -1 in codes or 0 in codes  # ramp pushes slope up


def test_combination():
    # unit_tests.py:1021-1040 — two border checks + AND / OR
    def both(v):
        a = orc.OracleBorderCheck(UL=0.5, LL=0, warning_stages=[0.9])
        b = orc.OracleBorderCheck(UL=1, LL=0, warning_stages=[0.9])
        m = {"ftr_vector": [v], "timestamp": TS0}
        return [a.insert(m)[1], b.insert(m)[1]]

    assert [orc.combine_and(both(v)) for v in [0.2, 1, 1.5]] == [1, 0, -1]
    assert [orc.combine_or(both(v)) for v in [0.2, 0.5, 1.5]] == [1, 0, -1]


def test_percent_score():
    assert orc.percent_score([1, 1]) == 0.0
    assert orc.percent_score([-1, -1]) == 1.0
    assert orc.percent_score([0, -1]) == 0.75


def test_feature_construction():
    # unit_tests.py:1089-1175 intended semantics (FIXTURES.md §A)
    fc = orc.FeatureConstruction(
        input_vector_size=2,
        averages=[[2, 3], [2]],
        periodic_averages=[[(2, [3]), (3, [2])], []],
        shifts=[[1, 2, 3, 4], []],
        time_features=["day", "month", "weekday", "hour", "minute"],
    )
    step = 24 * 3600 + 3600 + 60
    outs = [fc.insert([x, x + 101], TS0 + step * x) for x in range(10)]
    assert outs[:4] == [False] * 4
    fv4 = outs[4]
    assert fv4[:2] == [4, 105]
    np.testing.assert_allclose(fv4[2:5], [3.5, 3, 104.5])  # averages
    np.testing.assert_allclose(fv4[5:7], [2, 2.5])  # periodic
    assert fv4[7:11] == [3, 2, 1, 0]  # shifts
    assert fv4[11:] == [4, 10, 6, 11, 4]  # month, day, weekday, hour, minute


def test_feature_construction_use_cols():
    fc = orc.FeatureConstruction(input_vector_size=2, shifts=[[1], []], use_cols=[0, 2])
    fc.insert([1.0, 5.0], TS0)
    out = fc.insert([2.0, 6.0], TS0 + 3600)
    assert out == [2.0, 1.0]


def test_check_message_validation():
    # unit_tests.py:1274-1318
    ok = {"ftr_vector": [1.0], "timestamp": TS0}
    assert orc.check_message(ok, 1)
    assert not orc.check_message(None, 1)
    assert not orc.check_message({"timestamp": TS0}, 1)
    assert not orc.check_message({"ftr_vector": [1.0]}, 1)
    assert not orc.check_message({"ftr_vector": [1.0, 2.0], "timestamp": TS0}, 1)
    assert not orc.check_message({"ftr_vector": ["a"], "timestamp": TS0}, 1)
    assert not orc.check_message({"ftr_vector": [None], "timestamp": TS0}, 1)
    assert not orc.check_message({"ftr_vector": [float("nan")], "timestamp": TS0}, 1)
    assert not orc.check_message({"ftr_vector": [1.0], "timestamp": "abc"}, 1)
    assert not orc.check_message({"ftr_vector": [1.0], "timestamp": 1e25}, 1)


def test_normalization_last_n_average():
    # unit_tests.py:1178-1222
    n = orc.OracleLastNAverage(N=4)
    n.add_value([1, 1])
    results = []
    for x in range(9):
        r = n.get_normalized([x, 11 + 2 * x])
        results.append(r)
    assert results[:3] == [False] * 3
    np.testing.assert_allclose(results[3], [1, 10])
    np.testing.assert_allclose(results[4], [1, 12.25])
    np.testing.assert_allclose(results[5], [1.25, 12.5625])
    np.testing.assert_allclose(results[6], [1.3125, 12.453125])
    np.testing.assert_allclose(results[7], [1.1406, 11.81640625], atol=1e-4)
    np.testing.assert_allclose(results[8], [1.17578, 12.27050781], atol=1e-4)


def test_normalization_periodic_last_n_average():
    # unit_tests.py:1225-1271
    n = orc.OraclePeriodicLastNAverage(N=4, period=2)
    n.add_value([1, 1])
    results = [n.get_normalized([x, 11 + 2 * x]) for x in range(11)]
    assert results[:6] == [False] * 6
    np.testing.assert_allclose(results[6], [2.5, 13])
    np.testing.assert_allclose(results[7], [2.125, 14.5])
    np.testing.assert_allclose(results[8], [2.78125, 16.375])
    np.testing.assert_allclose(results[9], [2.8203125, 15.84375])
    np.testing.assert_allclose(results[10], [3.236328125, 17.0859375])
