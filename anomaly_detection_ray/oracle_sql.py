"""DuckDB oracle SQL for every SQL-expressible query (driver correctness
gate; ANSI-ish SQL over the pre-registered table views region nation
customer supplier part orders lineitem events documents embeddings).

Column names ARE part of the contract: the driver sorts columns by name and
hash-compares values, so every alias here matches the Ray query's output
exactly.

Recurrence checks (EMA / MACD / cumulative / IIR filtering / repair) use
per-user RECURSIVE CTEs that replay the reference recurrence row by row —
an independent computation path from the engine's vectorized kernels
(pandas ewm / blocked prefix scans / sliding windows). Float low-bit
differences between the two paths can not flip a verdict code unless a
value sits within ~1e-12 of a grading threshold (verified empirically: zero
mismatches at sf0.001/sf0.01); constants are emitted with repr() so literal
parsing round-trips to the same double.

Non-SQL-expressible queries (seeded model scorers, sketches, the clip
table) get fixture oracles from ``fixtures.py`` instead: an independent
sequential implementation writes expected-result parquet at oracle-build
time and the SQL is a plain read of that file.
"""

from __future__ import annotations

EV_UL, EV_LL = 80.0, 20.0
EV_WS = [0.7, 0.9]
WF_N, WF_X = 20, 3.0

_MID = (EV_UL + EV_LL) / 2.0
_RNG = EV_UL - EV_LL

# events-standard grading in SQL given a normalized value column `vn`
# (grading.py: strict inequalities; warning iff |vn| > smallest stage)
def _code(vn: str, warn: float | None = 0.7) -> str:
    w = f"WHEN abs({vn}) > {warn!r} THEN 0 " if warn is not None else ""
    return (f"CAST(CASE WHEN {vn} > 1 OR {vn} < -1 THEN -1 {w}"
            f"ELSE 1 END AS TINYINT)")


# valid rows (scorer state only sees these) + per-user order (series.py)
_VALID = """
  SELECT event_id, user_id, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
"""

_UNDEF_TAIL = """
    UNION ALL
    SELECT event_id, CAST(2 AS TINYINT) AS {col} FROM events
    WHERE value IS NULL OR isnan(value)
"""


def _ema_recursion(alpha: float, extra_alpha: float | None = None) -> str:
    """Per-user EMA replay: ema_t = (1-s)*ema_{t-1} + s*v_t, ema_0 = v_0
    (ema.py:87-126 recurrence; matches pandas ewm(adjust=False) to float
    low bits). With ``extra_alpha`` carries a second EMA (MACD)."""
    s = repr(alpha)
    if extra_alpha is None:
        return f"""
    r AS (
      SELECT user_id, rn, event_id, value, value AS ema FROM v WHERE rn = 1
      UNION ALL
      SELECT v.user_id, v.rn, v.event_id, v.value,
             (1.0-{s})*r.ema + {s}*v.value
      FROM r JOIN v ON v.user_id = r.user_id AND v.rn = r.rn + 1
    )"""
    s2 = repr(extra_alpha)
    return f"""
    r AS (
      SELECT user_id, rn, event_id, value, value AS ema1, value AS ema2
      FROM v WHERE rn = 1
      UNION ALL
      SELECT v.user_id, v.rn, v.event_id, v.value,
             (1.0-{s})*r.ema1 + {s}*v.value,
             (1.0-{s2})*r.ema2 + {s2}*v.value
      FROM r JOIN v ON v.user_id = r.user_id AND v.rn = r.rn + 1
    )"""


def _sql_ema() -> str:
    s = 2.0 / (10 + 1)
    return f"""
    WITH RECURSIVE v AS ({_VALID}),
    {_ema_recursion(s)},
    g AS (SELECT event_id, 2.0*(ema - {_MID!r})/{_RNG!r} AS vn FROM r)
    SELECT event_id, {_code('vn')} AS ema_code FROM g
    {_UNDEF_TAIL.format(col='ema_code')}
    """


def _sql_macd() -> str:
    s1, s2 = 2.0 / (5 + 1), 2.0 / (15 + 1)
    # UL=30 LL=-30 => vn = macd/30; warning stage [0.5]
    return f"""
    WITH RECURSIVE v AS ({_VALID}),
    {_ema_recursion(s1, s2)},
    g AS (SELECT event_id, 2.0*((ema1 - ema2) - 0.0)/60.0 AS vn FROM r)
    SELECT event_id, {_code('vn', 0.5)} AS macd_code FROM g
    {_UNDEF_TAIL.format(col='macd_code')}
    """


def _sql_cumulative() -> str:
    # decay=0.05, averaging=5, ws=[0.5]: rm = trailing-5 mean (growing),
    # delta_t = (rm_t - rm_{t-1})/|rm_t| (prev=0 at t=0 => delta_0 = +-1),
    # cs_t = (cs_{t-1} + delta_t)*(1-decay)  (cumulative.py:41-111)
    a = repr(1.0 - 0.05)
    return f"""
    WITH RECURSIVE v AS ({_VALID}),
    m AS (
      SELECT *, AVG(value) OVER (PARTITION BY user_id ORDER BY rn
                                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS rm
      FROM v
    ),
    d AS (
      SELECT *, (rm - COALESCE(LAG(rm) OVER (PARTITION BY user_id ORDER BY rn),
                               0.0)) / abs(rm) AS delta
      FROM m
    ),
    r AS (
      SELECT user_id, rn, event_id, ({a})*delta AS cs FROM d WHERE rn = 1
      UNION ALL
      SELECT d.user_id, d.rn, d.event_id, (r.cs + d.delta)*({a})
      FROM r JOIN d ON d.user_id = r.user_id AND d.rn = r.rn + 1
    )
    SELECT event_id, {_code('cs', 0.5)} AS cum_code FROM r
    {_UNDEF_TAIL.format(col='cum_code')}
    """


def _sql_filtering() -> str:
    # Butterworth(order=3, wn=0.4) direct-form-II-transposed replay with the
    # steady-state zi of dsp.lfilter_zi — coefficients embedded as literals
    # from the same public design math (dsp.butter_lowpass)
    from .functions import dsp
    b, a = dsp.butter_lowpass(3, 0.4)
    zi = dsp.lfilter_zi(b, a)
    b0, b1, b2, b3 = (repr(x) for x in b)
    a1, a2, a3 = (repr(x) for x in a[1:])
    z0, z1, z2 = (repr(x) for x in zi)
    return f"""
    WITH RECURSIVE v AS ({_VALID}),
    r AS (
      SELECT user_id, rn, event_id,
             {b0}*value + {z0} AS y,
             {b1}*value + {z1} - {a1}*({b0}*value + {z0}) AS s0,
             {b2}*value + {z2} - {a2}*({b0}*value + {z0}) AS s1,
             {b3}*value - {a3}*({b0}*value + {z0}) AS s2
      FROM v WHERE rn = 1
      UNION ALL
      SELECT v.user_id, v.rn, v.event_id,
             {b0}*v.value + r.s0,
             {b1}*v.value + r.s1 - {a1}*({b0}*v.value + r.s0),
             {b2}*v.value + r.s2 - {a2}*({b0}*v.value + r.s0),
             {b3}*v.value - {a3}*({b0}*v.value + r.s0)
      FROM r JOIN v ON v.user_id = r.user_id AND v.rn = r.rn + 1
    ),
    g AS (SELECT event_id, 2.0*(y - {_MID!r})/{_RNG!r} AS vn FROM r)
    SELECT event_id, {_code('vn')} AS flt_code FROM g
    {_UNDEF_TAIL.format(col='flt_code')}
    """


def _sql_ema_percentile() -> str:
    # percentile=95, window=50, start_on=10, period=10 (alpha=2/11): EMA
    # graded vs the [5th, 95th] percentiles of its own trailing-50 window
    # (inclusive; growing during warm-up), Undefined before start_on
    s = 2.0 / (10 + 1)
    return f"""
    WITH RECURSIVE v AS ({_VALID}),
    {_ema_recursion(s)},
    w AS (
      SELECT event_id, rn, ema,
             quantile_cont(ema, 0.05) OVER win AS p_lo,
             quantile_cont(ema, 0.95) OVER win AS p_hi
      FROM r
      WINDOW win AS (PARTITION BY user_id ORDER BY rn
                     ROWS BETWEEN 49 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id,
           CAST(CASE WHEN rn < 10 THEN 2
                     WHEN ema > p_hi OR ema < p_lo THEN -1
                     ELSE 1 END AS TINYINT) AS ep_code
    FROM w
    {_UNDEF_TAIL.format(col='ep_code')}
    """


def _sql_repair() -> str:
    # LastNAverage(N=5): on border Error with FULL memory, replace with
    # mean(memory) and feed the repaired value back (normalization.py:24-63).
    # The memory sees raw values incl. NaN (no valid filter in apply_repair),
    # so value maps NULL->NaN and the list average propagates NaN exactly
    # like np.mean. Border codes use warning_stages=[] (no warnings).
    return f"""
    WITH RECURSIVE v AS (
      SELECT event_id, user_id, ts,
             COALESCE(value, 'NaN'::DOUBLE) AS value,
             CAST(CASE WHEN value IS NULL OR isnan(value) THEN 2
                       WHEN 2.0*(value - {_MID!r})/{_RNG!r} > 1
                         OR 2.0*(value - {_MID!r})/{_RNG!r} < -1 THEN -1
                       ELSE 1 END AS TINYINT) AS bc_code,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    r AS (
      SELECT user_id, rn, event_id, bc_code, value AS suggested_value,
             [value] AS mem
      FROM v WHERE rn = 1
      UNION ALL
      SELECT v.user_id, v.rn, v.event_id, v.bc_code,
             CASE WHEN v.bc_code = -1 AND len(r.mem) = 5
                  THEN list_sum(r.mem)/5.0 ELSE v.value END,
             list_slice(
               list_append(r.mem,
                           CASE WHEN v.bc_code = -1 AND len(r.mem) = 5
                                THEN list_sum(r.mem)/5.0 ELSE v.value END),
               CASE WHEN len(r.mem) = 5 THEN 2 ELSE 1 END, 6)
      FROM r JOIN v ON v.user_id = r.user_id AND v.rn = r.rn + 1
    )
    SELECT event_id, bc_code, suggested_value FROM r
    """


def _sql_percent_score() -> str:
    # PercentScore over border (ws=[0.7,0.9]) + windowed Welford (N=20, X=3)
    # verdicts: per-record points (Warning=1, Error=2)/(2K), trailing STRICT
    # 1h event-time window sum / max(60, n_in_window)
    # (combination.py:178-218). K=2 => /4. The RANGE frame is 3600s minus
    # 1 microsecond so ts > t-3600 is strict at the table's us precision.
    return f"""
    WITH b AS (
      SELECT event_id, user_id, ts, value,
             CAST(CASE WHEN value IS NULL OR isnan(value) THEN 2
                       WHEN abs(2.0*(value - {_MID!r})/{_RNG!r}) > 1 THEN -1
                       WHEN abs(2.0*(value - {_MID!r})/{_RNG!r}) > 0.7 THEN 0
                       ELSE 1 END AS TINYINT) AS bc_code
      FROM events
    ),
    v AS (SELECT event_id, user_id, ts, value FROM events
          WHERE value IS NOT NULL AND NOT isnan(value)),
    w AS (SELECT event_id, value,
            ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
            AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN {WF_N} PRECEDING AND 1 PRECEDING) AS m,
            STDDEV_SAMP(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN {WF_N} PRECEDING AND 1 PRECEDING) AS s
          FROM v),
    wf AS (SELECT event_id,
             CAST(CASE WHEN rn <= {WF_N} THEN 2
                       WHEN value > m + {WF_X!r}*s OR value < m - {WF_X!r}*s
                       THEN -1 ELSE 1 END AS TINYINT) AS wf_code
           FROM w),
    codes AS (
      SELECT b.event_id, b.user_id, b.ts,
             ((CASE WHEN b.bc_code = 0 THEN 1.0
                    WHEN b.bc_code = -1 THEN 2.0 ELSE 0.0 END)
            + (CASE WHEN wf.wf_code = 0 THEN 1.0
                    WHEN wf.wf_code = -1 THEN 2.0 ELSE 0.0 END)) / 4.0 AS pts
      FROM b LEFT JOIN wf ON b.event_id = wf.event_id
    ),
    win AS (
      SELECT event_id,
             SUM(pts) OVER w AS wsum,
             COUNT(*) OVER w AS n_in
      FROM codes
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN to_microseconds(3599999999) PRECEDING
                   AND CURRENT ROW)
    )
    SELECT event_id, wsum / GREATEST(60.0, CAST(n_in AS DOUBLE)) AS percent_score
    FROM win
    """


def _sql_forecast_band() -> str:
    # naive trailing forecast: per 6h-window mean +- 4*std of value; each
    # event graded vs the band of the NEAREST window center (ties -> earlier
    # center), Undefined for null/NaN values (asof.py semantics)
    return """
    WITH e AS (
      SELECT event_id, value,
             CAST(epoch_us(ts) AS DOUBLE)/1000000.0 AS sec
      FROM events
    ),
    f AS (
      SELECT (CAST(floor(sec/21600.0) AS BIGINT)) AS w,
             (floor(sec/21600.0) + 0.5) * 21600.0 AS fts,
             SUM(value) AS s1, SUM(value*value) AS s2,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM e WHERE value IS NOT NULL AND NOT isnan(value)
      GROUP BY 1, 2
    ),
    band AS (
      SELECT fts, s1/n - 4.0*sqrt(GREATEST(s2/n - (s1/n)*(s1/n), 0.0)) AS lo,
                  s1/n + 4.0*sqrt(GREATEST(s2/n - (s1/n)*(s1/n), 0.0)) AS hi
      FROM f
    )
    SELECT e.event_id,
           CAST(CASE WHEN e.value IS NULL OR isnan(e.value) THEN 2
                     WHEN e.value < nb.lo OR e.value > nb.hi THEN -1
                     ELSE 1 END AS TINYINT) AS fb_code
    FROM e, LATERAL (SELECT b.lo, b.hi FROM band b
                     ORDER BY abs(e.sec - b.fts), b.fts LIMIT 1) nb
    """


def _sql_seasonal_band() -> str:
    # seasonal-decomposition band (stages/asof.py seasonal_forecast,
    # X=4, period 86400 s, 24 bins, step 3600): global OLS y ~ a + b·t over
    # valid rows (t = days since 2000-01-01 on FLOORED epoch seconds),
    # per-hour-of-day residual mean (seasonal) and std (band), grid step
    # 3600 aligned at floor(t_lo/3600)*3600, each event graded vs the band
    # of its NEAREST grid point (exact fractional-second timestamps).
    # Expression order mirrors the driver arithmetic so both paths differ
    # only by summation order (same argument as the recurrence oracles).
    return """
    WITH e AS (
      SELECT event_id, value,
             CAST(epoch_us(ts) AS DOUBLE)/1000000.0 AS x,
             CAST(epoch_us(ts) // 1000000 AS DOUBLE) AS sec
      FROM events
    ),
    v AS (
      SELECT value, sec, (sec - 946684800.0)/86400.0 AS t,
             CAST(floor(fmod(sec, 86400.0)/3600.0) AS BIGINT) AS bin
      FROM e WHERE value IS NOT NULL AND NOT isnan(value)
    ),
    m AS (
      SELECT bin, CAST(COUNT(*) AS DOUBLE) AS n, SUM(t) AS st,
             SUM(value) AS sy, SUM(t*value) AS sty, SUM(t*t) AS stt,
             SUM(value*value) AS syy, MIN(sec) AS tmin, MAX(sec) AS tmax
      FROM v GROUP BY bin
    ),
    tot AS (
      SELECT SUM(n) AS nn, SUM(st) AS st, SUM(sy) AS sy, SUM(sty) AS sty,
             SUM(stt) AS stt, MIN(tmin) AS t_lo, MAX(tmax) AS t_hi
      FROM m
    ),
    c0 AS (
      SELECT *, CASE WHEN nn*stt - st*st > 0
                     THEN (nn*sty - st*sy)/(nn*stt - st*st)
                     ELSE 0.0 END AS b
      FROM tot
    ),
    coef AS (
      SELECT b, (sy - b*st)/nn AS a,
             floor(t_lo/3600.0)*3600.0 AS g0,
             floor(t_lo/3600.0)*3600.0
               + 3600.0*ceil((t_hi - floor(t_lo/3600.0)*3600.0)/3600.0) AS gmax
      FROM c0
    ),
    bins AS (
      SELECT m.bin,
             (m.sy - c.a*m.n - c.b*m.st)/m.n AS s_b,
             4.0*sqrt(GREATEST(
               (m.syy - 2*c.a*m.sy - 2*c.b*m.sty + c.a*c.a*m.n
                + 2*c.a*c.b*m.st + c.b*c.b*m.stt)/m.n
               - ((m.sy - c.a*m.n - c.b*m.st)/m.n)
                 * ((m.sy - c.a*m.n - c.b*m.st)/m.n), 0.0)) AS band
      FROM m, coef c
    ),
    ev AS (
      SELECT e.event_id, e.value,
             LEAST(GREATEST(c.g0 + 3600.0*floor((e.x - c.g0)/3600.0 + 0.5),
                            c.g0), c.gmax) AS ng,
             c.a AS a, c.b AS b
      FROM e, coef c
    ),
    evb AS (
      SELECT ev.*,
             ev.a + ev.b*(ev.ng - 946684800.0)/86400.0
                  + COALESCE(bn.s_b, 0.0) AS yhat,
             COALESCE(bn.band, 0.0) AS band
      FROM ev LEFT JOIN bins bn
        ON bn.bin = CAST(floor(fmod(ev.ng, 86400.0)/3600.0) AS BIGINT) % 24
    )
    SELECT event_id,
           CAST(CASE WHEN value IS NULL OR isnan(value) THEN 2
                     WHEN value < yhat - band OR value > yhat + band THEN -1
                     ELSE 1 END AS TINYINT) AS szn_code
    FROM evb
    """


def _sql_stream_validation() -> str:
    # streaming micro-batch replay (sources/streaming.py) == batch over the
    # full history: border check + GLOBAL-order windowed Welford (single
    # stream, ts unique in the synth tables)
    return f"""
    WITH v AS (SELECT event_id, ts, value FROM events
               WHERE value IS NOT NULL AND NOT isnan(value)),
    w AS (SELECT event_id, value,
            ROW_NUMBER() OVER (ORDER BY ts) AS rn,
            AVG(value) OVER (ORDER BY ts
                             ROWS BETWEEN {WF_N} PRECEDING AND 1 PRECEDING) AS m,
            STDDEV_SAMP(value) OVER (ORDER BY ts
                             ROWS BETWEEN {WF_N} PRECEDING AND 1 PRECEDING) AS s
          FROM v)
    SELECT e.event_id,
           CAST(CASE WHEN e.value IS NULL OR isnan(e.value) THEN 2
                     WHEN 2*(e.value - {_MID})/{_RNG} > 1
                       OR 2*(e.value - {_MID})/{_RNG} < -1 THEN -1
                     WHEN abs(2*(e.value - {_MID})/{_RNG}) > 0.7 THEN 0
                     ELSE 1 END AS TINYINT) AS sbc_code,
           CAST(CASE WHEN e.value IS NULL OR isnan(e.value) THEN 2
                     WHEN w.rn <= {WF_N} THEN 2
                     WHEN e.value > w.m + {WF_X}*w.s
                       OR e.value < w.m - {WF_X}*w.s THEN -1
                     ELSE 1 END AS TINYINT) AS swf_code
    FROM events e LEFT JOIN w ON e.event_id = w.event_id
    """


def _sql_eval_f1() -> str:
    # labelled-evaluation harness (pipelines/evaluate.py): ground truth =
    # border rule on value, prediction = per-user windowed Welford Error,
    # one-row confusion table with precision/recall/F1
    return f"""
    WITH v AS (SELECT event_id, user_id, ts, value FROM events
               WHERE value IS NOT NULL AND NOT isnan(value)),
    w AS (SELECT event_id, value,
            ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
            AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN {WF_N} PRECEDING AND 1 PRECEDING) AS m,
            STDDEV_SAMP(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN {WF_N} PRECEDING AND 1 PRECEDING) AS s
          FROM v),
    codes AS (SELECT event_id,
                     CASE WHEN rn <= {WF_N} THEN 2
                          WHEN value > m + {WF_X}*s OR value < m - {WF_X}*s
                          THEN -1 ELSE 1 END AS wf_code
              FROM w),
    j AS (SELECT (e.value IS NOT NULL AND NOT isnan(e.value)
                  AND (e.value > {EV_UL!r} OR e.value < {EV_LL!r})) AS y,
                 COALESCE(c.wf_code, 2) = -1 AS pred
          FROM events e LEFT JOIN codes c USING (event_id)),
    cnt AS (SELECT
              CAST(sum(CASE WHEN pred AND y THEN 1 ELSE 0 END) AS BIGINT) AS tp,
              CAST(sum(CASE WHEN pred AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS fp,
              CAST(sum(CASE WHEN NOT pred AND y THEN 1 ELSE 0 END) AS BIGINT) AS fn,
              CAST(sum(CASE WHEN NOT pred AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS tn
            FROM j),
    pr AS (SELECT *,
             CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE)/(tp + fp)
                  ELSE 0.0 END AS precision,
             CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE)/(tp + fn)
                  ELSE 0.0 END AS recall
           FROM cnt)
    SELECT tp, fp, fn, tn, tp + fp + fn + tn AS n, precision, recall,
           CASE WHEN precision + recall > 0
                THEN 2*precision*recall/(precision + recall)
                ELSE 0.0 END AS f1
    FROM pr
    """


def _sql_trend_classification() -> str:
    # slope classifier over the averaged window (trend_classification.py
    # mechanics without the Keras MLP; rolling.py:276): a = trailing-3 mean,
    # window N=20 of a, span = max-min, normalized slope = slope(a)/span,
    # classes down/flat/up vs half the pure-ramp slope 1/(N-1); prediction
    # averaged over 5; vn = 1 + (avg_pred - 1)*span/50; Error outside [0,2],
    # Warning beyond the last stage (0.5)
    thr = repr(0.5 * (1.0 / 19.0))
    return f"""
    WITH v AS ({_VALID}),
    m AS (
      SELECT *, AVG(value) OVER (PARTITION BY user_id ORDER BY rn
                                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS a
      FROM v
    ),
    w AS (
      SELECT *,
        MAX(a) OVER w20 - MIN(a) OVER w20 AS span,
        regr_slope(a, rn) OVER w20 AS slope_raw
      FROM m
      WINDOW w20 AS (PARTITION BY user_id ORDER BY rn
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    ),
    p AS (
      SELECT *,
        CASE WHEN span = 0 THEN 1.0
             WHEN slope_raw/span > {thr} THEN 2.0
             WHEN slope_raw/span < -{thr} THEN 0.0
             ELSE 1.0 END AS pred
      FROM w
    ),
    q AS (
      SELECT event_id, rn, span,
        AVG(pred) OVER (PARTITION BY user_id ORDER BY rn
                        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS pred_avg
      FROM p
    ),
    g AS (SELECT event_id, rn, 1.0 + (pred_avg - 1.0)*(span/50.0) AS vn FROM q)
    SELECT event_id,
           CAST(CASE WHEN rn < 24 THEN 2
                     WHEN vn > 2 OR vn < 0 THEN -1
                     WHEN vn > 1.5 OR vn < 0.5 THEN 0
                     ELSE 1 END AS TINYINT) AS tc_code
    FROM g
    {_UNDEF_TAIL.format(col='tc_code')}
    """


def _sql_drift_psi() -> str:
    # partition_drift over event_type with fixed edges 25..500 step 25
    # (21 bins incl. overflow), reference profile = per-bin MEDIAN of
    # partition proportions renormalized, rest = round(ref_p * others_total),
    # KS = max |ECDF diff|, PSI with 1e-6 floor, sample-size-aware
    # thresholds (drift.py:92-131)
    return """
    WITH vals AS (
      SELECT event_type,
             LEAST(CAST(floor(value/25.0) AS BIGINT), 20) AS bin
      FROM events WHERE value IS NOT NULL AND NOT isnan(value)
    ),
    bins AS (SELECT unnest(generate_series(0, 20)) AS bin),
    types AS (SELECT DISTINCT event_type FROM vals),
    h AS (
      SELECT t.event_type, b.bin,
             CAST(COALESCE(c.n, 0) AS DOUBLE) AS cnt
      FROM types t CROSS JOIN bins b
      LEFT JOIN (SELECT event_type, bin, COUNT(*) AS n
                 FROM vals GROUP BY 1, 2) c
        ON c.event_type = t.event_type AND c.bin = b.bin
    ),
    tot AS (SELECT event_type, SUM(cnt) AS n FROM h GROUP BY 1),
    gtot AS (SELECT SUM(cnt) AS g FROM h),
    ref AS (  -- per-bin median of partition proportions, renormalized
      SELECT bin, median(cnt / GREATEST(n, 1)) AS med
      FROM h JOIN tot USING (event_type) GROUP BY bin
    ),
    refn AS (SELECT bin, med / (SELECT SUM(med) FROM ref) AS ref_p FROM ref),
    pair AS (
      SELECT h.event_type, h.bin, h.cnt,
             round(refn.ref_p * ((SELECT g FROM gtot) - tot.n)) AS rest
      FROM h JOIN refn USING (bin) JOIN tot USING (event_type)
    ),
    cum AS (
      SELECT event_type, bin, cnt, rest,
        SUM(cnt)  OVER (PARTITION BY event_type ORDER BY bin) AS c_cnt,
        SUM(rest) OVER (PARTITION BY event_type ORDER BY bin) AS c_rest,
        SUM(cnt)  OVER (PARTITION BY event_type) AS n,
        SUM(rest) OVER (PARTITION BY event_type) AS m
      FROM pair
    ),
    stats AS (
      SELECT event_type,
        MAX(abs(c_rest/m - c_cnt/n)) AS ks,
        SUM((GREATEST(cnt/n, 1e-6) - GREATEST(rest/m, 1e-6))
            * ln(GREATEST(cnt/n, 1e-6) / GREATEST(rest/m, 1e-6))) AS psi,
        ANY_VALUE(n) AS n, ANY_VALUE(m) AS m
      FROM cum GROUP BY event_type
    ),
    graded AS (
      SELECT event_type, ks, psi,
        GREATEST(0.1,  1.95*sqrt((n + m)/(n*m))) AS ks_err,
        GREATEST(0.05, 1.36*sqrt((n + m)/(n*m))) AS ks_warn,
        GREATEST(0.25, 10.0*20.0*(1.0/n + 1.0/m)) AS psi_err,
        GREATEST(0.1,   5.0*20.0*(1.0/n + 1.0/m)) AS psi_warn
      FROM stats
    )
    SELECT event_type, 'value' AS column,
           round(ks, 6) AS ks, round(psi, 6) AS psi,
           CAST(CASE WHEN ks >= ks_err OR psi >= psi_err THEN -1
                     WHEN ks >= ks_warn OR psi >= psi_warn THEN 0
                     ELSE 1 END AS TINYINT) AS drift_code
    FROM graded
    ORDER BY event_type
    """


def _sql_lang_detect() -> str:
    from .functions.text import STOPWORDS
    langs = list(STOPWORDS)  # argmax tie-break = first in this order
    counts = []
    for lg in langs:
        inlist = ", ".join(f"'{w}'" for w in sorted(STOPWORDS[lg]))
        counts.append(
            f"len(list_filter(toks, t -> t IN ({inlist}))) AS c_{lg}")
    best = "GREATEST(" + ", ".join(f"c_{lg}" for lg in langs) + ")"
    pick = " ".join(f"WHEN c_{lg} = {best} THEN '{lg}'" for lg in langs)
    return f"""
    WITH t AS (
      SELECT doc_id, lang,
             regexp_extract_all(lower(coalesce(text, '')),
                                '[\\p{{L}}\\p{{N}}_'']+') AS toks
      FROM documents
    ),
    c AS (SELECT doc_id, lang, {', '.join(counts)} FROM t)
    SELECT doc_id, lang,
           CASE WHEN {best} > 0 THEN (CASE {pick} END)
                ELSE 'und' END AS lang_pred
    FROM c
    """


def _sql_reference_config_borders() -> str:
    return f"""
    SELECT event_id,
           CAST(CASE WHEN value IS NULL OR isnan(value) THEN 2
                     WHEN abs(2.0*(value - {_MID!r})/{_RNG!r}) > 1 THEN -1
                     WHEN abs(2.0*(value - {_MID!r})/{_RNG!r}) > 0.7 THEN 0
                     ELSE 1 END AS TINYINT) AS a0_bordercheck_code
    FROM events
    """


def oracle_sql() -> dict[str, str]:
    border_status = """
      CASE WHEN value IS NULL OR isnan(value) THEN 'Undefined'
           WHEN vn > 1 THEN 'Error: measurement above upper limit'
           WHEN vn < -1 THEN 'Error: measurement below lower limit'
           WHEN vn > 0.9 THEN 'Warning1: measurement close to upper limit.'
           WHEN vn < -0.9 THEN 'Warning1: measurement close to lower limit.'
           WHEN vn > 0.7 THEN 'Warning0: measurement close to upper limit.'
           WHEN vn < -0.7 THEN 'Warning0: measurement close to lower limit.'
           ELSE 'OK' END
    """
    punct_class = "[.,!?;:\"''()\\[\\]{}-]"
    out = {
        "row_validate_events": """
            SELECT event_id,
                   CAST(CASE WHEN value IS NULL OR isnan(value) OR ts IS NULL
                             THEN 2 ELSE 1 END AS TINYINT) AS rv_code
            FROM events
        """,
        "border_check_events": f"""
            WITH b AS (SELECT event_id, value,
                              2*(value - {_MID})/{_RNG} AS vn FROM events)
            SELECT event_id,
                   CAST(CASE WHEN value IS NULL OR isnan(value) THEN 2
                             WHEN vn > 1 OR vn < -1 THEN -1
                             WHEN abs(vn) > 0.7 THEN 0 ELSE 1 END AS TINYINT) AS bc_code,
                   {border_status} AS bc_status
            FROM b
        """,
        "grouped_stats_events": """
            SELECT event_type, CAST(count(value) AS BIGINT) AS n,
                   round(avg(value), 4) AS mean,
                   round(stddev_pop(value), 4) AS std,
                   round(stddev_samp(value), 4) AS std_sample,
                   round(min(value), 4) AS min,
                   round(max(value), 4) AS max
            FROM events GROUP BY event_type
        """,
        "welford_window_events": f"""
            WITH v AS (SELECT event_id, user_id, ts, value FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)),
            w AS (SELECT event_id, value,
                    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
                    AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN {WF_N} PRECEDING AND 1 PRECEDING) AS m,
                    STDDEV_SAMP(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN {WF_N} PRECEDING AND 1 PRECEDING) AS s
                  FROM v)
            SELECT event_id,
                   CAST(CASE WHEN rn <= {WF_N} THEN 2
                             WHEN value > m + {WF_X}*s OR value < m - {WF_X}*s THEN -1
                             ELSE 1 END AS TINYINT) AS wf_code
            FROM w
        """,
        "welford_inf_events": f"""
            WITH v AS (SELECT event_id, user_id, ts, value FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)),
            w AS (SELECT event_id, value,
                    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
                    AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m,
                    STDDEV_POP(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS s
                  FROM v)
            SELECT event_id,
                   CAST(CASE WHEN rn <= 2 THEN 2
                             WHEN value > m + {WF_X}*s OR value < m - {WF_X}*s THEN -1
                             ELSE 1 END AS TINYINT) AS wf_code
            FROM w
        """,
        "percentile_events": """
            -- trailing-buffer percentile check (intended Percentile
            -- semantics): window of 30 values ending at current (growing
            -- during warm-up, exactly like the kernel's prefix), Error when
            -- the current value falls outside [p2, p98] of its own window
            WITH v AS (SELECT event_id, user_id, ts, value FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)),
            w AS (SELECT event_id, value,
                    quantile_cont(value, 0.02) OVER win AS p_lo,
                    quantile_cont(value, 0.98) OVER win AS p_hi
                  FROM v
                  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN 29 PRECEDING AND CURRENT ROW))
            SELECT event_id,
                   CAST(CASE WHEN value < p_lo OR value > p_hi THEN -1
                             ELSE 1 END AS TINYINT) AS pct_code
            FROM w
            UNION ALL
            SELECT event_id, CAST(2 AS TINYINT) AS pct_code FROM events
            WHERE value IS NULL OR isnan(value)
        """,
        "linear_fit_events": """
            -- rolling OLS slope over the last 15 values, graded vs UL=20 /
            -- LL=-20 with warning stage 0.5; Undefined during warm-up
            -- (first 15 records) and when SSR/value > confidence_norm=1000
            WITH v AS (SELECT event_id, user_id, ts, value FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)),
            r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id) AS rn
                  FROM v),
            w AS (SELECT event_id, value, rn,
                    regr_slope(value, rn) OVER win AS slope,
                    regr_syy(value, rn) OVER win AS syy,
                    regr_sxx(value, rn) OVER win AS sxx
                  FROM r
                  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN 14 PRECEDING AND CURRENT ROW)),
            g AS (SELECT event_id, value, rn, slope,
                         slope / 20.0 AS vn,
                         (syy - slope*slope*sxx) / value AS fit_q
                  FROM w)
            SELECT event_id,
                   CAST(CASE WHEN rn <= 15 THEN 2
                             WHEN fit_q > 1000 THEN 2
                             WHEN vn > 1 OR vn < -1 THEN -1
                             WHEN abs(vn) > 0.5 THEN 0
                             ELSE 1 END AS TINYINT) AS lf_code
            FROM g
            UNION ALL
            SELECT event_id, CAST(2 AS TINYINT) AS lf_code FROM events
            WHERE value IS NULL OR isnan(value)
        """,
        "hampel_events": """
            -- centered-window (2W+1=11) median/MAD outlier check grading the
            -- reference's off-center point memory[W+1] (hampel.py:79-96):
            -- for the window ending at the current row, the graded value is
            -- the one 4 rows back; Undefined for the first 11 records
            WITH v AS (SELECT event_id, user_id, ts, value FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)),
            w AS (SELECT event_id, value,
                    ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS rn,
                    list(value) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS BETWEEN 10 PRECEDING
                                      AND CURRENT ROW) AS l
                  FROM v),
            m AS (SELECT event_id, rn, l[7] AS pt,
                         list_aggregate(l, 'median') AS med,
                         list_aggregate(list_transform(l,
                             x -> abs(x - list_aggregate(l, 'median'))),
                             'median') AS mad
                  FROM w)
            SELECT event_id,
                   CAST(CASE WHEN rn <= 11 THEN 2
                             WHEN abs(pt - med) > 3 * (1.4826 * mad) THEN -1
                             ELSE 1 END AS TINYINT) AS hp_code
            FROM m
            UNION ALL
            SELECT event_id, CAST(2 AS TINYINT) AS hp_code FROM events
            WHERE value IS NULL OR isnan(value)
        """,
        "uniqueness_events": """
            SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_events
            FROM events GROUP BY user_id, event_type HAVING count(*) > 1
        """,
        "referential_orders_customer": """
            SELECT o.o_orderkey, o.o_custkey
            FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_custkey IS NULL
        """,
        "time_filter_events": """
            SELECT event_id FROM events
            WHERE abs(extract('epoch' FROM CAST(ts AS TIME)) - 43200) < 7200
        """,
        "value_histogram_events": """
            SELECT event_type,
                   LEAST(CAST(floor(value/50) AS BIGINT), 10) AS bin,
                   CAST(count(*) AS BIGINT) AS n
            FROM events WHERE value IS NOT NULL AND NOT isnan(value)
            GROUP BY event_type, LEAST(CAST(floor(value/50) AS BIGINT), 10)
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice*(1-l_discount)), 2) AS sum_disc_price,
                   round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)), 2) AS sum_charge,
                   round(sum(l_quantity)/count(*), 4) AS avg_qty,
                   round(sum(l_extendedprice)/count(*), 4) AS avg_price,
                   round(sum(l_discount)/count(*), 6) AS avg_disc,
                   CAST(count(*) AS BIGINT) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_customers_revenue": """
            SELECT o.o_custkey, c.c_name,
                   round(sum(o.o_totalprice), 2) AS revenue,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY o.o_custkey, c.c_name
            ORDER BY sum(o.o_totalprice) DESC, o.o_custkey
            LIMIT 10
        """,
        "events_hourly": """
            SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
                   event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   round(sum(value)/count(*), 6) AS avg_value
            FROM events
            GROUP BY date_trunc('hour', ts), event_type
        """,
        "sessionize_events": """
            -- gaps-and-islands in SQL (independent path from the engine's
            -- per-group diff/cumsum kernel); microsecond-exact boundary
            WITH e AS (SELECT user_id, ts,
                              lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts) AS prev
                       FROM events),
            s AS (SELECT user_id, ts,
                         CASE WHEN prev IS NULL OR date_diff('microsecond',
                                   prev, ts) > 28800000000
                              THEN 1 ELSE 0 END AS new_s FROM e),
            g AS (SELECT user_id, ts,
                         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING)
                             AS session_id FROM s)
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   CAST(session_id AS BIGINT) AS session_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   epoch_us(min(ts)) AS start_us,
                   epoch_us(max(ts)) AS end_us,
                   round((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0,
                         6) AS duration_s
            FROM g GROUP BY user_id, session_id
        """,
        "expectations_orders": """
            -- mirrors the q_expectations_orders suite check by check;
            -- 'mostly' tolerance only on the in_range check (0.95)
            WITH s AS (
              SELECT 'dtype' AS check_name, 'o_orderkey' AS column_name,
                     0 AS n_rows, 0 AS violations
              UNION ALL
              SELECT 'not_null', 'o_custkey', count(*),
                     count(*) - count(o_custkey) FROM orders
              UNION ALL
              SELECT 'in_range', 'o_totalprice', count(*),
                     sum(CASE WHEN o_totalprice < 900.0
                              OR o_totalprice > 200000.0
                              THEN 1 ELSE 0 END) FROM orders
              UNION ALL
              SELECT 'in_set', 'o_orderstatus', count(*),
                     sum(CASE WHEN o_orderstatus NOT IN ('O', 'F')
                              THEN 1 ELSE 0 END) FROM orders
              UNION ALL
              SELECT 'regex', 'o_orderpriority', count(*),
                     sum(CASE WHEN NOT regexp_full_match(
                              o_orderpriority, '[1-5]-[A-Z]+')
                              THEN 1 ELSE 0 END) FROM orders
              UNION ALL
              SELECT 'str_len_between', 'o_orderstatus', count(*),
                     sum(CASE WHEN length(o_orderstatus) NOT BETWEEN 1 AND 1
                              THEN 1 ELSE 0 END) FROM orders
              UNION ALL
              SELECT 'unique', 'o_orderkey', count(o_orderkey),
                     count(o_orderkey) - count(DISTINCT o_orderkey)
              FROM orders
              UNION ALL
              SELECT 'referential', 'o_custkey', count(*),
                     sum(CASE WHEN o_custkey NOT IN
                              (SELECT c_custkey FROM customer)
                              THEN 1 ELSE 0 END) FROM orders
            )
            SELECT check_name, column_name,
                   CAST(n_rows AS BIGINT) AS n_rows,
                   CAST(violations AS BIGINT) AS violations,
                   CASE WHEN check_name = 'dtype' THEN TRUE
                        WHEN check_name = 'in_range'
                          THEN 1.0 - violations * 1.0 / n_rows >= 0.95
                        ELSE violations = 0 END AS passed
            FROM s ORDER BY check_name, column_name
        """,
        "profile_events": """
            -- mirrors profile_table: NaN counts as invalid for the
            -- float column, population stddev, 4dp rounding
            WITH v AS (SELECT CASE WHEN isnan(value) THEN NULL
                                   ELSE value END AS value FROM events),
            p AS (
              SELECT 'event_id' AS column_name, 'int64' AS dtype,
                     count(*) AS n_rows,
                     count(*) - count(event_id) AS n_null,
                     count(event_id) AS n_valid,
                     round(min(event_id) * 1.0, 4) AS min,
                     round(max(event_id) * 1.0, 4) AS max,
                     round(avg(event_id), 4) AS mean,
                     round(stddev_pop(event_id), 4) AS std
              FROM events
              UNION ALL
              SELECT 'user_id', 'int64', count(*),
                     count(*) - count(user_id), count(user_id),
                     round(min(user_id) * 1.0, 4),
                     round(max(user_id) * 1.0, 4),
                     round(avg(user_id), 4), round(stddev_pop(user_id), 4)
              FROM events
              UNION ALL
              SELECT 'value', 'double', count(*),
                     (SELECT count(*) - count(value) FROM events),
                     count(value),
                     round(min(value), 4), round(max(value), 4),
                     round(avg(value), 4), round(stddev_pop(value), 4)
              FROM v
            )
            SELECT column_name, dtype, CAST(n_rows AS BIGINT) AS n_rows,
                   CAST(n_null AS BIGINT) AS n_null,
                   CAST(n_valid AS BIGINT) AS n_valid,
                   CAST(min AS DOUBLE) AS min, CAST(max AS DOUBLE) AS max,
                   CAST(mean AS DOUBLE) AS mean, CAST(std AS DOUBLE) AS std
            FROM p ORDER BY column_name
        """,
        "expectations_events_order": """
            WITH ev AS (SELECT user_id, ts, event_id, value FROM events),
            tl AS (SELECT ts, LAG(ts) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id) AS pv
                   FROM ev WHERE ts IS NOT NULL),
            vl AS (SELECT value, LAG(value) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id) AS pv
                   FROM ev WHERE value IS NOT NULL AND NOT isnan(value)),
            s AS (
              SELECT 'non_decreasing' AS check_name, 'ts' AS column_name,
                     count(*) AS n_rows,
                     sum(CASE WHEN ts < pv THEN 1 ELSE 0 END) AS violations,
                     NULL AS mostly
              FROM tl
              UNION ALL
              SELECT 'non_decreasing', 'value', count(*),
                     sum(CASE WHEN value < pv THEN 1 ELSE 0 END), 0.3
              FROM vl
            )
            SELECT check_name, column_name,
                   CAST(n_rows AS BIGINT) AS n_rows,
                   CAST(violations AS BIGINT) AS violations,
                   1.0 - violations * 1.0 / n_rows
                       >= coalesce(mostly, 1.0) AS passed
            FROM s ORDER BY check_name, column_name
        """,
        "expectations_by_status": """
            WITH r AS (
              SELECT o_orderstatus, 'in_range' AS check_name,
                     'o_totalprice' AS column_name, count(*) AS n_rows,
                     sum(CASE WHEN o_totalprice < 900.0
                              OR o_totalprice > 200000.0
                              THEN 1 ELSE 0 END) AS violations,
                     0.95 AS mostly
              FROM orders GROUP BY o_orderstatus
              UNION ALL
              SELECT o_orderstatus, 'not_null', 'o_custkey', count(*),
                     count(*) - count(o_custkey), NULL
              FROM orders GROUP BY o_orderstatus
              UNION ALL
              SELECT o_orderstatus, 'unique', 'o_orderkey',
                     count(o_orderkey),
                     count(o_orderkey) - count(DISTINCT o_orderkey), NULL
              FROM orders GROUP BY o_orderstatus
            )
            SELECT o_orderstatus, check_name, column_name,
                   CAST(n_rows AS BIGINT) AS n_rows,
                   CAST(violations AS BIGINT) AS violations,
                   1.0 - violations * 1.0 / n_rows
                       >= coalesce(mostly, 1.0) AS passed
            FROM r ORDER BY o_orderstatus, check_name, column_name
        """,
        "expectations_lineitem": """
            WITH s AS (
              SELECT 'not_null' AS check_name,
                     'l_orderkey' AS column_name, count(*) AS n_rows,
                     count(*) - count(l_orderkey) AS violations,
                     NULL AS mostly FROM lineitem
              UNION ALL
              SELECT 'in_range', 'l_quantity', count(*),
                     sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                              THEN 1 ELSE 0 END), NULL FROM lineitem
              UNION ALL
              SELECT 'in_range', 'l_discount', count(*),
                     sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.1
                              THEN 1 ELSE 0 END), NULL FROM lineitem
              UNION ALL
              SELECT 'col_compare', 'l_extendedprice >= 1000*l_quantity',
                     count(*),
                     sum(CASE WHEN NOT (l_extendedprice >= 1000 * l_quantity)
                              THEN 1 ELSE 0 END), 0.7 FROM lineitem
              UNION ALL
              SELECT 'col_compare', 'l_discount <= l_tax', count(*),
                     sum(CASE WHEN NOT (l_discount <= l_tax)
                              THEN 1 ELSE 0 END), NULL FROM lineitem
            )
            SELECT check_name, column_name,
                   CAST(n_rows AS BIGINT) AS n_rows,
                   CAST(violations AS BIGINT) AS violations,
                   1.0 - violations * 1.0 / n_rows
                       >= coalesce(mostly, 1.0) AS passed
            FROM s ORDER BY check_name, column_name
        """,
        "refined_quantiles_norms": """
            WITH n AS (SELECT round(sqrt(list_sum(list_transform(embedding,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4)
                           AS norm
                       FROM embeddings)
            SELECT 0.25 AS q, quantile_disc(norm, 0.25) AS norm FROM n
            UNION ALL
            SELECT 0.5, quantile_disc(norm, 0.5) FROM n
            UNION ALL
            SELECT 0.9, quantile_disc(norm, 0.9) FROM n
        """,
        "user_event_paths": """
            -- ordered path aggregation; identical (ts, event_id) sort
            -- and 40-step truncation on both sides
            WITH o AS (
              SELECT user_id,
                     list(event_type ORDER BY ts, event_id) AS seq,
                     count(*) AS n_events
              FROM events GROUP BY user_id
            )
            SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
                   array_to_string(seq[1:40], '>') AS path40
            FROM o
        """,
        "benford_events": """
            -- leading-digit forensics; identical IEEE digit extraction,
            -- deviation from log10(1+1/d) rounded on both sides
            WITH v AS (SELECT abs(value) AS a FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)
                         AND value <> 0),
            -- exact-integer route: scale by 100 (values carry <=2
            -- decimals), leading digit from the integer's decimal
            -- string — float log10/pow digit extraction is
            -- engine-dependent on edge values (measured on 0.3/0.6/0.7)
            d AS (SELECT CAST(substr(CAST(CAST(round(a * 100.0, 0)
                    AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
                  FROM v WHERE round(a * 100.0, 0) > 0),
            c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
            t AS (SELECT sum(n) AS tot FROM c)
            SELECT g.digit, CAST(coalesce(c.n, 0) AS BIGINT) AS n,
                   round(CAST(coalesce(c.n, 0) AS DOUBLE) / t.tot
                         - log10(1.0 + 1.0 / g.digit), 6) AS benford_dev
            FROM generate_series(1, 9) AS g(digit)
            LEFT JOIN c ON c.digit = g.digit, t
        """,
        "heavy_hitters_events": """
            -- exact heavy hitters (support > 0.005 of non-null rows) over
            -- round-half-away(value, 0); the Ray side reaches the same
            -- exact set via Misra-Gries candidates + an exact second pass
            WITH x AS (SELECT CAST(round(value, 0) AS BIGINT) AS v
                       FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)),
            t AS (SELECT count(*) AS tot FROM x)
            SELECT x.v, CAST(count(*) AS BIGINT) AS n
            FROM x, t
            GROUP BY x.v, t.tot
            HAVING count(*) > 0.005 * t.tot
        """,
        "mode_events": """
            -- deterministic per-group mode: ties to the smallest type
            WITH c AS (SELECT user_id, event_type, count(*) AS n
                       FROM events GROUP BY 1, 2),
            r AS (SELECT user_id, event_type, n,
                         row_number() OVER (PARTITION BY user_id
                                            ORDER BY n DESC,
                                                     event_type ASC) AS rk
                  FROM c)
            SELECT user_id, event_type AS mode_type, CAST(n AS BIGINT) AS n
            FROM r WHERE rk = 1
        """,
        "entropy_by_source": """
            -- per-source Shannon entropy (log2) of the language mix
            WITH c AS (SELECT source, lang, count(*) AS n
                       FROM documents GROUP BY 1, 2),
            t AS (SELECT source, sum(n) AS tot, count(*) AS n_langs
                  FROM c GROUP BY 1)
            SELECT c.source,
                   CAST(t.tot AS BIGINT) AS n_docs,
                   CAST(t.n_langs AS BIGINT) AS n_langs,
                   round(sum(-(CAST(c.n AS DOUBLE) / t.tot)
                             * log2(CAST(c.n AS DOUBLE) / t.tot)), 6)
                       AS lang_entropy
            FROM c JOIN t USING (source)
            GROUP BY c.source, t.tot, t.n_langs
        """,
        "chi2_drift_events": """
            -- chi-squared homogeneity: first vs second half of month
            WITH c AS (SELECT event_type,
                              CASE WHEN ts >= TIMESTAMP '2024-01-16'
                                   THEN 1 ELSE 0 END AS h,
                              count(*) AS n
                       FROM events GROUP BY 1, 2),
            ty AS (SELECT DISTINCT event_type FROM events),
            grid AS (SELECT event_type, v.h
                     FROM ty CROSS JOIN (VALUES (0), (1)) AS v(h)),
            f AS (SELECT g.event_type, g.h,
                         CAST(coalesce(c.n, 0) AS DOUBLE) AS n
                  FROM grid g LEFT JOIN c
                  ON c.event_type = g.event_type AND c.h = g.h),
            r AS (SELECT event_type, sum(n) AS rn FROM f GROUP BY 1),
            cl AS (SELECT h, sum(n) AS cn FROM f GROUP BY 1),
            t AS (SELECT sum(n) AS tot FROM f),
            cell AS (SELECT f.event_type, f.h, f.n,
                            r.rn * cl.cn / t.tot AS e
                     FROM f JOIN r USING (event_type)
                     JOIN cl ON cl.h = f.h, t),
            per AS (SELECT event_type,
                           CAST(sum(n) FILTER (WHERE h = 0) AS BIGINT)
                               AS n_first,
                           CAST(sum(n) FILTER (WHERE h = 1) AS BIGINT)
                               AS n_second,
                           sum(pow(n - e, 2) / e) AS contrib
                    FROM cell GROUP BY 1),
            tot AS (SELECT sum(contrib) AS chi2,
                           count(*) - 1 AS dof FROM per)
            SELECT per.event_type, per.n_first, per.n_second,
                   round(per.contrib, 6) AS chi2_contrib,
                   round(tot.chi2, 6) AS chi2_total,
                   CAST(tot.dof AS BIGINT) AS dof
            FROM per, tot
        """,
        "heartbeat_gaps_events": """
            -- missed-heartbeat detection: inter-event gaps per user
            WITH d AS (
                SELECT user_id,
                       epoch_us(ts - lag(ts) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id)) / 1e6 AS gap_s
                FROM events
            )
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                   CAST(count(*) FILTER (WHERE gap_s > 43200.0)
                        AS BIGINT) AS n_gaps,
                   round(max(gap_s), 3) AS max_gap_s
            FROM d GROUP BY user_id
        """,
        "expectations_freshness": """
            -- freshness kind: stale groups vs explicit as_of
            WITH m AS (SELECT user_id, max(ts) AS mt FROM events
                       WHERE ts IS NOT NULL GROUP BY 1),
            w AS (SELECT max(ts) AS mt FROM events WHERE ts IS NOT NULL)
            SELECT 'freshness' AS check_name,
                   'ts by user_id' AS column_name,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(*) FILTER (WHERE mt <
                        TIMESTAMP '2024-01-30 00:00:00'
                        - INTERVAL 86400 SECOND) AS BIGINT) AS violations,
                   (1.0 - CAST(count(*) FILTER (WHERE mt <
                        TIMESTAMP '2024-01-30 00:00:00'
                        - INTERVAL 86400 SECOND) AS DOUBLE)
                        / count(*)) >= 0.5 AS passed
            FROM m
            UNION ALL
            SELECT 'freshness', 'ts', 1,
                   CASE WHEN mt < TIMESTAMP '2024-01-30 00:00:00'
                        - INTERVAL 604800 SECOND THEN 1 ELSE 0 END,
                   mt >= TIMESTAMP '2024-01-30 00:00:00'
                        - INTERVAL 604800 SECOND
            FROM w
        """,
        "fd_check": """
            -- functional-dependency report over the fixed candidate list
            WITH f1 AS (SELECT user_id AS l,
                               count(DISTINCT event_type) AS d
                        FROM events GROUP BY 1),
            f2 AS (SELECT o_custkey AS l,
                          count(DISTINCT o_orderpriority) AS d
                   FROM orders GROUP BY 1),
            f3 AS (SELECT l_partkey AS l,
                          count(DISTINCT l_suppkey) AS d
                   FROM lineitem GROUP BY 1),
            f4 AS (SELECT c_custkey AS l,
                          count(DISTINCT c_nationkey) AS d
                   FROM customer GROUP BY 1)
            SELECT 'events.user_id->event_type' AS fd,
                   CAST(count(*) AS BIGINT) AS n_lhs,
                   CAST(count(*) FILTER (WHERE d > 1) AS BIGINT)
                       AS n_violating_lhs,
                   bool_and(d <= 1) AS holds FROM f1
            UNION ALL
            SELECT 'orders.o_custkey->o_orderpriority',
                   CAST(count(*) AS BIGINT),
                   CAST(count(*) FILTER (WHERE d > 1) AS BIGINT),
                   bool_and(d <= 1) FROM f2
            UNION ALL
            SELECT 'lineitem.l_partkey->l_suppkey',
                   CAST(count(*) AS BIGINT),
                   CAST(count(*) FILTER (WHERE d > 1) AS BIGINT),
                   bool_and(d <= 1) FROM f3
            UNION ALL
            SELECT 'customer.c_custkey->c_nationkey',
                   CAST(count(*) AS BIGINT),
                   CAST(count(*) FILTER (WHERE d > 1) AS BIGINT),
                   bool_and(d <= 1) FROM f4
        """,
        "mutual_information_events": """
            -- plug-in MI(event_type; hour) in bits from the contingency
            -- table; identical per-term IEEE divisions as the Ray side
            WITH c AS (SELECT event_type, hour(ts) AS h, count(*) AS n
                       FROM events GROUP BY 1, 2),
            t AS (SELECT sum(n) AS tot FROM c),
            px AS (SELECT event_type, sum(n) AS nx FROM c GROUP BY 1),
            py AS (SELECT h, sum(n) AS ny FROM c GROUP BY 1)
            SELECT CAST(t.tot AS BIGINT) AS n,
                   round(sum((c.n / t.tot)
                             * log2((c.n / t.tot)
                                    / ((px.nx / t.tot)
                                       * (py.ny / t.tot)))), 6) AS mi_bits
            FROM c
            JOIN px USING (event_type)
            JOIN py USING (h), t
            GROUP BY t.tot
        """,
        "snapshot_diff_events": """
            -- snapshot reconciliation vs the deterministically mutated
            -- version B (delete %101, double value %97, insert %103+10M);
            -- IS DISTINCT FROM gives NULL==NULL and DuckDB NaN==NaN,
            -- which the Ray side mirrors with a both-NaN override
            WITH a AS (SELECT event_id, value FROM events),
            b AS (
                SELECT event_id,
                       CASE WHEN event_id % 97 = 0 THEN value * 2
                            ELSE value END AS value
                FROM events WHERE event_id % 101 <> 0
                UNION ALL
                SELECT event_id + 10000000, value + 1
                FROM events WHERE event_id % 103 = 0
            )
            SELECT coalesce(a.event_id, b.event_id) AS event_id,
                   CASE WHEN a.event_id IS NULL THEN 'added'
                        WHEN b.event_id IS NULL THEN 'removed'
                        ELSE 'changed' END AS change_type
            FROM a FULL OUTER JOIN b ON a.event_id = b.event_id
            WHERE a.event_id IS NULL OR b.event_id IS NULL
               OR a.value IS DISTINCT FROM b.value
        """,
        "corr_events": """
            -- Pearson corr(value, hour) per type via the identical
            -- raw-moments formula the Ray side folds (NOT corr(), whose
            -- streaming update would differ in ulps before rounding)
            WITH s AS (SELECT event_type,
                              count(*) AS n,
                              sum(value) AS sx,
                              sum(CAST(hour(ts) AS DOUBLE)) AS sy,
                              sum(value * value) AS sxx,
                              sum(CAST(hour(ts) AS DOUBLE)
                                  * CAST(hour(ts) AS DOUBLE)) AS syy,
                              sum(value * CAST(hour(ts) AS DOUBLE)) AS sxy
                       FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)
                       GROUP BY 1)
            SELECT event_type, CAST(n AS BIGINT) AS n,
                   round((sxy - sx * sy / n)
                         / sqrt((sxx - sx * sx / n)
                                * (syy - sy * sy / n)), 6)
                       AS corr_value_hour
            FROM s
        """,
        "gini_events": """
            -- exact Gini per type via a straight sort; ties ordered
            -- arbitrarily (sum i*x is tie-order invariant)
            WITH v AS (SELECT event_type, value FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)
                             AND value >= 0),
            r AS (SELECT event_type, value,
                         row_number() OVER (PARTITION BY event_type
                                            ORDER BY value) AS i
                  FROM v),
            m AS (SELECT event_type, count(*) AS n, sum(value) AS s,
                         sum(i * value) AS t FROM r GROUP BY 1)
            SELECT event_type, CAST(n AS BIGINT) AS n,
                   round(CASE WHEN s > 0
                         THEN 2.0 * t / (n * s) - (n + 1.0) / n
                         ELSE NULL END, 6) AS gini
            FROM m
        """,
        "moments_events": """
            -- grouped skewness / excess kurtosis about the group mean:
            -- central power sums (the engine's pass-2 fold), population
            -- formulas g1 = m3/m2^1.5, g2 = m4/m2^2 - 3
            WITH m AS (SELECT event_type, avg(value) AS mu,
                              count(*) AS n
                       FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)
                       GROUP BY 1),
            s AS (SELECT e.event_type,
                         sum((e.value - m.mu) * (e.value - m.mu)) AS d2,
                         sum((e.value - m.mu) * (e.value - m.mu)
                             * (e.value - m.mu)) AS d3,
                         sum((e.value - m.mu) * (e.value - m.mu)
                             * (e.value - m.mu) * (e.value - m.mu)) AS d4
                  FROM events e JOIN m ON e.event_type = m.event_type
                  WHERE e.value IS NOT NULL AND NOT isnan(e.value)
                  GROUP BY 1)
            SELECT m.event_type, CAST(m.n AS BIGINT) AS n,
                   round(CASE WHEN s.d2 > 0
                         THEN (s.d3 / m.n) / pow(s.d2 / m.n, 1.5)
                         ELSE NULL END, 6) AS skewness,
                   round(CASE WHEN s.d2 > 0
                         THEN (s.d4 / m.n) / pow(s.d2 / m.n, 2) - 3.0
                         ELSE NULL END, 6) AS kurtosis
            FROM m JOIN s ON m.event_type = s.event_type
        """,
        "ntile_events": """
            -- per-user quartile buckets; (value, event_id) pins tie
            -- order so NTILE is deterministic
            SELECT event_id, user_id,
                   ntile(4) OVER (PARTITION BY user_id
                                  ORDER BY value, event_id) AS tile
            FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        """,
        "reconcile_orders_lineitem": """
            -- header-vs-detail reconciliation; money sums are
            -- decimal-exact at 6 dp so round-6 and the off-grid
            -- 0.0100005 tolerance are association-order-proof
            WITH li AS (
              SELECT l_orderkey,
                     sum(l_extendedprice * (1 - l_discount)
                         * (1 + l_tax)) AS t
              FROM lineitem GROUP BY 1)
            SELECT o.o_orderkey, o.o_totalprice,
                   round(li.t, 6) AS lineitem_total,
                   round(o.o_totalprice - li.t, 6) AS price_diff,
                   coalesce(abs(o.o_totalprice - li.t) <= 0.0100005,
                            FALSE) AS recon_ok
            FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey
        """,
        "format_audit_customer": """
            -- per-rule conformance counts; violations = rows whose
            -- predicate is not strictly TRUE (NULL fails)
            WITH c AS (SELECT count(*) AS n FROM customer)
            SELECT 'acctbal_in_range' AS rule,
                   CAST(c.n AS BIGINT) AS n_checked,
                   CAST(c.n - (SELECT count(*) FROM customer
                               WHERE c_acctbal BETWEEN -1000.0 AND 10000.0)
                        AS BIGINT) AS n_violations,
                   round((c.n - (SELECT count(*) FROM customer
                                 WHERE c_acctbal BETWEEN -1000.0
                                       AND 10000.0)) * 1.0 / c.n, 6)
                       AS violation_rate
            FROM c
            UNION ALL
            SELECT 'acctbal_nonneg', CAST(c.n AS BIGINT),
                   CAST(c.n - (SELECT count(*) FROM customer
                               WHERE c_acctbal >= 0) AS BIGINT),
                   round((c.n - (SELECT count(*) FROM customer
                                 WHERE c_acctbal >= 0)) * 1.0 / c.n, 6)
            FROM c
            UNION ALL
            SELECT 'custkey_positive', CAST(c.n AS BIGINT),
                   CAST(c.n - (SELECT count(*) FROM customer
                               WHERE c_custkey >= 0) AS BIGINT),
                   round((c.n - (SELECT count(*) FROM customer
                                 WHERE c_custkey >= 0)) * 1.0 / c.n, 6)
            FROM c
            UNION ALL
            SELECT 'name_format', CAST(c.n AS BIGINT),
                   CAST(c.n - (SELECT count(*) FROM customer
                               WHERE regexp_matches(c_name,
                                     '^Customer#[0-9]{9}$')) AS BIGINT),
                   round((c.n - (SELECT count(*) FROM customer
                                 WHERE regexp_matches(c_name,
                                       '^Customer#[0-9]{9}$')))
                         * 1.0 / c.n, 6)
            FROM c
            UNION ALL
            SELECT 'segment_known', CAST(c.n AS BIGINT),
                   CAST(c.n - (SELECT count(*) FROM customer
                               WHERE c_mktsegment IN ('AUTOMOBILE',
                                     'BUILDING', 'FURNITURE', 'HOUSEHOLD',
                                     'MACHINERY')) AS BIGINT),
                   round((c.n - (SELECT count(*) FROM customer
                                 WHERE c_mktsegment IN ('AUTOMOBILE',
                                       'BUILDING', 'FURNITURE',
                                       'HOUSEHOLD', 'MACHINERY')))
                         * 1.0 / c.n, 6)
            FROM c
        """,
        "cast_audit_events": """
            -- castability / parse audit over the semi-structured props
            -- column (json_valid / extracted-k TRY_CAST / domain) plus
            -- type + load-window rules; NULL predicate = violation
            WITH t AS (SELECT count(*) AS n FROM events),
            k AS (SELECT CASE WHEN json_valid(props)
                         THEN TRY_CAST(json_extract_string(props, '$.k')
                                       AS BIGINT) END AS kv,
                         json_valid(props) AS jv,
                         -- json ints only: reject 87.5-style extracts
                         CASE WHEN json_valid(props) THEN
                           json_type(json_extract(props, '$.k'))
                         END AS kt,
                         event_type, value, ts
                  FROM events),
            agg AS (
              SELECT
                count(*) AS n,
                count(*) FILTER (WHERE value IS NOT NULL
                                 AND NOT isnan(value)) AS ok_value,
                count(*) FILTER (WHERE jv) AS ok_json,
                count(*) FILTER (WHERE kv IS NOT NULL
                                 AND kt IN ('UBIGINT', 'BIGINT'))
                    AS ok_kint,
                count(*) FILTER (WHERE kt IN ('UBIGINT', 'BIGINT')
                                 AND kv BETWEEN 0 AND 89) AS ok_kdom,
                count(*) FILTER (WHERE event_type IN ('click', 'error',
                                 'purchase', 'signup', 'view')) AS ok_type,
                count(*) FILTER (WHERE ts >= TIMESTAMP '2024-01-01'
                                 AND ts < TIMESTAMP '2026-01-01') AS ok_ts
              FROM k)
            SELECT r.rule, CAST(agg.n AS BIGINT) AS n_checked,
                   CAST(agg.n - r.ok AS BIGINT) AS n_violations,
                   round((agg.n - r.ok) * 1.0 / agg.n, 6) AS violation_rate
            FROM agg, LATERAL (VALUES
                ('event_type_known', agg.ok_type),
                ('props_json_valid', agg.ok_json),
                ('props_k_in_domain', agg.ok_kdom),
                ('props_k_integer', agg.ok_kint),
                ('ts_in_window', agg.ok_ts),
                ('value_present', agg.ok_value)) AS r(rule, ok)
        """,
        "auc_events": """
            -- Mann-Whitney AUC with midrank ties, closed form over
            -- per-distinct-value (pos, neg) counts — the identical
            -- half-integer sum the engine folds
            WITH v AS (SELECT value,
                              CASE WHEN event_type = 'error' THEN 1
                                   ELSE 0 END AS y
                       FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)),
            g AS (SELECT value, sum(y) AS p, count(*) - sum(y) AS q
                  FROM v GROUP BY 1),
            o AS (SELECT p, q,
                         coalesce(sum(q) OVER (ORDER BY value
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) AS below
                  FROM g)
            SELECT CAST(sum(p) AS BIGINT) AS n_pos,
                   CAST(sum(q) AS BIGINT) AS n_neg,
                   round(sum(p * (below + 0.5 * q))
                         / (sum(p) * sum(q)), 6) AS auc
            FROM o
        """,
        "spearman_events": """
            -- per-type Spearman: Pearson over midranks (row_number
            -- averaged per tied value) — the engine's identical ranks
            WITH v AS (SELECT event_type, value,
                              CAST(hour(ts) AS DOUBLE) AS h
                       FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)),
            rv AS (SELECT event_type, value, h,
                          avg(rn) OVER (PARTITION BY event_type, value)
                              AS r_v
                   FROM (SELECT *, CAST(row_number() OVER (
                             PARTITION BY event_type ORDER BY value)
                             AS DOUBLE) AS rn FROM v)),
            rh AS (SELECT event_type, value, h, r_v,
                          avg(rn2) OVER (PARTITION BY event_type, h)
                              AS r_h
                   FROM (SELECT *, CAST(row_number() OVER (
                             PARTITION BY event_type ORDER BY h)
                             AS DOUBLE) AS rn2 FROM rv)),
            m AS (SELECT event_type, count(*) AS n, sum(r_v) AS sa,
                         sum(r_h) AS sb, sum(r_v * r_v) AS saa,
                         sum(r_h * r_h) AS sbb, sum(r_v * r_h) AS sab
                  FROM rh GROUP BY 1)
            SELECT event_type, CAST(n AS BIGINT) AS n,
                   round((sab - sa * sb / n)
                         / sqrt((saa - sa * sa / n)
                                * (sbb - sb * sb / n)), 6) AS spearman
            FROM m
            WHERE n >= 2 AND (saa - sa * sa / n) > 0
                  AND (sbb - sb * sb / n) > 0
        """,
        "wow_change_events": """
            -- hourly counts + lag percent change; alert past +/-50%
            WITH h AS (SELECT date_trunc('hour', ts) AS hour_ts,
                              count(*) AS n
                       FROM events GROUP BY 1),
            l AS (SELECT hour_ts, n,
                         lag(n) OVER (ORDER BY hour_ts) AS prev
                  FROM h)
            SELECT hour_ts, CAST(n AS BIGINT) AS n,
                   round((n - prev) * 1.0 / prev, 6) AS pct_change,
                   coalesce(abs((n - prev) * 1.0 / prev) > 0.5, FALSE)
                       AS alert
            FROM l
        """,
        "cohort_retention_events": """
            -- first-seen-day cohorts x activity-day offsets, distinct
            -- users per cell (integer epoch days — exact)
            WITH d AS (SELECT user_id,
                              CAST(floor(epoch(ts) / 86400) AS BIGINT)
                                  AS day
                       FROM events),
            f AS (SELECT user_id, min(day) AS first_day FROM d
                  GROUP BY 1)
            SELECT f.first_day AS cohort_day,
                   d.day - f.first_day AS offset_days,
                   CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_users
            FROM d JOIN f ON d.user_id = f.user_id
            GROUP BY 1, 2
        """,
        "theilsen_events": """
            -- per-user Theil-Sen: median of pairwise slopes over the
            -- centered-epoch-day x (same precision recipe as the OLS
            -- oracle); pairs via self-join on (user, rn < rn)
            WITH v AS (
              SELECT user_id, value,
                     CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0
                         - 20000.0 AS x,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn
              FROM events
              WHERE value IS NOT NULL AND NOT isnan(value)),
            p AS (
              SELECT a.user_id,
                     (b.value - a.value) / (b.x - a.x) AS slope
              FROM v a JOIN v b
                ON a.user_id = b.user_id AND a.rn < b.rn
              WHERE b.x <> a.x),
            c AS (SELECT user_id, count(*) AS n FROM v GROUP BY 1)
            SELECT p.user_id, CAST(c.n AS BIGINT) AS n,
                   round(quantile_cont(p.slope, 0.5), 6)
                       AS ts_slope_per_day
            FROM p JOIN c ON p.user_id = c.user_id
            GROUP BY p.user_id, c.n
        """,
        "expectations_conditional": """
            -- conditional (row_condition) expectations: scope rows are
            -- the denominator and the only violation candidates;
            -- labels carry the when clause (engine _col_label)
            WITH s AS (
              SELECT 'in_range' AS check_name,
                     'value when event_type == ''purchase'''
                         AS column_name,
                     count(*) FILTER (WHERE event_type = 'purchase')
                         AS n_rows,
                     count(*) FILTER (WHERE event_type = 'purchase'
                         AND (value < 0.0 OR value > 200.0))
                         AS violations,
                     0.9 AS mostly
              FROM events
              UNION ALL
              SELECT 'regex',
                     'props when event_type in [''error'', ''signup'']',
                     count(*) FILTER (WHERE event_type
                                      IN ('error', 'signup')),
                     count(*) FILTER (WHERE event_type
                         IN ('error', 'signup')
                         AND NOT regexp_full_match(props, '\\{.*\\}')),
                     1.0
              FROM events
              UNION ALL
              SELECT 'not_null', 'value when user_id < 50',
                     count(*) FILTER (WHERE user_id < 50),
                     count(*) FILTER (WHERE user_id < 50
                                      AND value IS NULL),
                     1.0
              FROM events
              UNION ALL
              SELECT 'in_range', 'value',
                     count(*),
                     count(*) FILTER (WHERE value < 0.0
                                      OR value > 500.0),
                     1.0
              FROM events
            )
            SELECT check_name, column_name,
                   CAST(n_rows AS BIGINT) AS n_rows,
                   CAST(violations AS BIGINT) AS violations,
                   CASE WHEN n_rows = 0 THEN TRUE
                        ELSE 1.0 - violations * 1.0 / n_rows >= mostly
                   END AS passed
            FROM s ORDER BY check_name, column_name
        """,
        "rfm_customers": """
            -- RFM quintile scores; NTILE over the per-customer
            -- aggregate with (metric, custkey) tie-break, 5 = best
            WITH a AS (
              SELECT o_custkey,
                     max(CAST(floor(epoch(o_orderdate) / 86400)
                              AS BIGINT)) AS last_day,
                     count(*) AS frequency,
                     sum(o_totalprice) AS spend
              FROM orders GROUP BY 1),
            b AS (SELECT o_custkey,
                         (SELECT max(last_day) FROM a) - last_day
                             AS recency_days,
                         frequency, round(spend, 2) AS monetary
                  FROM a)
            SELECT o_custkey, CAST(recency_days AS BIGINT) AS recency_days,
                   CAST(frequency AS BIGINT) AS frequency, monetary,
                   6 - ntile(5) OVER (ORDER BY recency_days, o_custkey)
                       AS r_score,
                   6 - ntile(5) OVER (ORDER BY frequency DESC, o_custkey)
                       AS f_score,
                   6 - ntile(5) OVER (ORDER BY monetary DESC, o_custkey)
                       AS m_score
            FROM b
        """,
        "cube_events": """
            -- full grouping lattice; NULL margins surfaced as 'ALL'
            -- to keep the hash contract null-free
            SELECT coalesce(event_type, 'ALL') AS event_type,
                   coalesce(CAST(user_id % 10 AS VARCHAR), 'ALL')
                       AS user_bucket,
                   CAST(count(*) AS BIGINT) AS n,
                   round(sum(value), 4) AS sum_value
            FROM events WHERE value IS NOT NULL AND NOT isnan(value)
            GROUP BY CUBE (event_type, user_id % 10)
        """,
        "lift_table_events": """
            -- decile gain/lift, descending score; each DISTINCT value
            -- lands in the decile of its last row: ceil(10*cum/total)
            WITH v AS (SELECT value,
                              CASE WHEN event_type = 'error' THEN 1
                                   ELSE 0 END AS y
                       FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)),
            g AS (SELECT value, count(*) AS rows_, sum(y) AS pos
                  FROM v GROUP BY 1),
            o AS (SELECT rows_, pos,
                         CAST(ceil(10.0 * sum(rows_) OVER (
                             ORDER BY value DESC)
                             / (SELECT count(*) FROM v)) AS BIGINT)
                             AS decile
                  FROM g),
            d AS (SELECT decile, sum(rows_) AS n, sum(pos) AS n_pos
                  FROM o GROUP BY 1),
            c AS (SELECT decile, n, n_pos,
                         sum(n_pos) OVER (ORDER BY decile) AS cp,
                         sum(n) OVER (ORDER BY decile) AS cn
                  FROM d)
            SELECT decile, CAST(n AS BIGINT) AS n,
                   CAST(n_pos AS BIGINT) AS n_pos,
                   round(n_pos * 1.0 / n, 6) AS rate,
                   round((cp * 1.0 / cn)
                         / ((SELECT sum(y) FROM v) * 1.0
                            / (SELECT count(*) FROM v)), 6) AS cum_lift
            FROM c
        """,
        "hourly_profile_events": """
            -- per-hour-of-day seasonal quantile bands (quantile_cont =
            -- np.quantile linear interpolation)
            SELECT CAST(hour(ts) AS BIGINT) AS hour,
                   CAST(count(*) AS BIGINT) AS n,
                   round(quantile_cont(value, 0.50), 6) AS p50,
                   round(quantile_cont(value, 0.90), 6) AS p90,
                   round(quantile_cont(value, 0.99), 6) AS p99
            FROM events WHERE value IS NOT NULL AND NOT isnan(value)
            GROUP BY 1
        """,
        "weighted_sample_documents": """
            -- Efraimidis-Spirakis A-Res: global k smallest -ln(u)/w;
            -- u from the engine's exact integer hash (32-bit multiply
            -- constants keep the mulmod-2^64 inside HUGEINT)
            WITH x AS (SELECT doc_id, n_chars,
                              CAST(CAST(doc_id AS BIGINT) AS UBIGINT) AS v
                       FROM documents WHERE n_chars > 0),
            s1 AS (SELECT doc_id, n_chars, xor(v, v >> 33) AS z FROM x),
            s2 AS (SELECT doc_id, n_chars,
                          CAST((CAST(z AS HUGEINT) * 4283543511)
                               % 18446744073709551616 AS UBIGINT) AS z
                   FROM s1),
            s3 AS (SELECT doc_id, n_chars, xor(z, z >> 29) AS z FROM s2),
            s4 AS (SELECT doc_id, n_chars,
                          CAST((CAST(z AS HUGEINT) * 3301882366)
                               % 18446744073709551616 AS UBIGINT) AS z
                   FROM s3),
            h AS (SELECT doc_id, n_chars, xor(z, z >> 32) AS hh FROM s4),
            k AS (SELECT doc_id, n_chars AS w,
                         -ln((CAST(hh AS DOUBLE) + 0.5)
                             / 18446744073709551616.0)
                         / n_chars AS key
                  FROM h)
            SELECT doc_id, CAST(w AS BIGINT) AS w,
                   round(key, 9) AS es_key
            FROM k ORDER BY key, doc_id LIMIT 50
        """,
        "tfidf_topk_documents": """
            -- top-5 distinctive terms per source by tf * ln(ns/df);
            -- single-space tokenization, (tfidf DESC, word) tie-break
            WITH w AS (SELECT source, t.w AS word
                       FROM (SELECT source,
                                    string_split(text, ' ') AS parts
                             FROM documents WHERE text IS NOT NULL) d,
                            LATERAL unnest(d.parts) AS t(w)),
            tf AS (SELECT source, word, count(*) AS n FROM w
                   GROUP BY 1, 2),
            ns AS (SELECT count(DISTINCT source) AS c FROM w),
            df AS (SELECT word, count(DISTINCT source) AS d FROM w
                   GROUP BY 1),
            sc AS (SELECT tf.source, tf.word, tf.n,
                          tf.n * ln(ns.c * 1.0 / df.d) AS tfidf,
                          row_number() OVER (PARTITION BY tf.source
                              ORDER BY tf.n * ln(ns.c * 1.0 / df.d) DESC,
                                       tf.word) AS r
                   FROM tf, ns JOIN df ON tf.word = df.word)
            SELECT source, word, CAST(n AS BIGINT) AS tf,
                   round(tfidf, 6) AS tfidf
            FROM sc WHERE r <= 5
        """,
        "bigram_topk_documents": """
            -- corpus top-20 word bigrams; tokenization = single-space
            -- string_split, (n DESC, w1, w2) tie-break
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS parts
                       FROM documents WHERE text IS NOT NULL),
            b AS (SELECT parts[i] AS w1, parts[i + 1] AS w2
                  FROM d, LATERAL unnest(generate_series(
                       1, len(parts) - 1)) AS g(i))
            SELECT w1, w2, CAST(count(*) AS BIGINT) AS n
            FROM b GROUP BY 1, 2
            ORDER BY n DESC, w1, w2 LIMIT 20
        """,
        "assoc_rules_events": """
            -- market-basket support/confidence/lift over per-user
            -- distinct event-type baskets (DISTINCT self-join)
            WITH u AS (SELECT DISTINCT user_id, event_type FROM events),
            tot AS (SELECT count(DISTINCT user_id) AS nu FROM events),
            cnt AS (SELECT event_type, count(*) AS c FROM u GROUP BY 1),
            pair AS (SELECT a.event_type AS ante, b.event_type AS cons,
                            count(*) AS cab
                     FROM u a JOIN u b ON a.user_id = b.user_id
                          AND a.event_type <> b.event_type
                     GROUP BY 1, 2)
            SELECT p.ante, p.cons, CAST(p.cab AS BIGINT) AS n_both,
                   round(p.cab * 1.0 / tot.nu, 6) AS support,
                   round(p.cab * 1.0 / ca.c, 6) AS confidence,
                   round((p.cab * 1.0 / ca.c) / (cb.c * 1.0 / tot.nu), 6)
                       AS lift
            FROM pair p, tot
            JOIN cnt ca ON p.ante = ca.event_type
            JOIN cnt cb ON p.cons = cb.event_type
        """,
        "transition_matrix_events": """
            -- first-order transition counts + per-prev probabilities
            -- over the (ts, event_id)-ordered per-user sequence
            WITH s AS (
              SELECT user_id, event_type AS next_type,
                     lag(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id)
                         AS prev_type
              FROM events),
            c AS (SELECT prev_type, next_type, count(*) AS n FROM s
                  WHERE prev_type IS NOT NULL GROUP BY 1, 2)
            SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
                   round(n * 1.0 / sum(n) OVER (PARTITION BY prev_type),
                         6) AS prob
            FROM c
        """,
        "regression_events": """
            -- per-user OLS of value vs epoch-days via the identical
            -- raw-moments closed form the Ray side folds (NOT
            -- regr_slope(), whose streaming update would differ in ulps
            -- before rounding); x = epoch_us/86400e6 - 20000 days
            -- bit-matches the engine's centered float64 expression
            WITH m AS (
              SELECT user_id, count(*) AS n,
                     sum(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0
                         - 20000.0) AS sx,
                     sum(value) AS sy,
                     sum((CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0
                          - 20000.0)
                         * (CAST(epoch_us(ts) AS DOUBLE)
                            / 86400000000.0 - 20000.0)) AS sxx,
                     sum(value * value) AS syy,
                     sum((CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0
                          - 20000.0) * value) AS sxy
              FROM events
              WHERE value IS NOT NULL AND NOT isnan(value)
              GROUP BY 1)
            SELECT user_id, CAST(n AS BIGINT) AS n,
                   round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6)
                       AS slope_per_day,
                   round((sy - (sxy - sx * sy / n) / (sxx - sx * sx / n)
                          * sx) / n, 4) AS intercept,
                   round(CASE WHEN (syy - sy * sy / n) > 0
                         THEN (sxy - sx * sy / n) * (sxy - sx * sy / n)
                              / ((sxx - sx * sx / n)
                                 * (syy - sy * sy / n))
                         ELSE NULL END, 6) AS r2
            FROM m
            WHERE n >= 2 AND (sxx - sx * sx / n) > 0
        """,
        "autocorr_events": """
            -- per-user lag-1 autocorrelation over the (ts, event_id)-
            -- ordered valid-value series; pairs skip invalid values
            -- (filter BEFORE the window), raw-moments Pearson mirrors
            -- the engine's fold
            WITH v AS (
              SELECT user_id, ts, event_id, value
              FROM events
              WHERE value IS NOT NULL AND NOT isnan(value)
            ), p AS (
              SELECT user_id, value AS b,
                     lag(value) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS a
              FROM v
            ), m AS (
              SELECT user_id, count(*) AS n, sum(a) AS sa, sum(b) AS sb,
                     sum(a * a) AS saa, sum(b * b) AS sbb,
                     sum(a * b) AS sab
              FROM p WHERE a IS NOT NULL GROUP BY 1
            )
            SELECT user_id, CAST(n AS BIGINT) AS n_pairs,
                   round((sab - sa * sb / n)
                         / sqrt((saa - sa * sa / n)
                                * (sbb - sb * sb / n)), 6)
                       AS autocorr_lag1
            FROM m
            WHERE n >= 2 AND (saa - sa * sa / n) > 0
                  AND (sbb - sb * sb / n) > 0
        """,
        "percent_rank_events": """
            -- order-statistics window; min-rank ties, (rank-1)/(n-1)
            SELECT event_id,
                   percent_rank() OVER (PARTITION BY user_id
                                        ORDER BY value) AS pct_rank
            FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        """,
        "pivot_events": """
            -- crosstab via conditional aggregation (the PIVOT shape)
            SELECT user_id,
                   CAST(count(*) FILTER (WHERE event_type = 'click')
                        AS BIGINT) AS n_click,
                   CAST(count(*) FILTER (WHERE event_type = 'error')
                        AS BIGINT) AS n_error,
                   CAST(count(*) FILTER (WHERE event_type = 'purchase')
                        AS BIGINT) AS n_purchase,
                   CAST(count(*) FILTER (WHERE event_type = 'signup')
                        AS BIGINT) AS n_signup,
                   CAST(count(*) FILTER (WHERE event_type = 'view')
                        AS BIGINT) AS n_view
            FROM events GROUP BY user_id
        """,
        "funnel_events": """
            -- ordered signup -> purchase funnel; exists-after collapses
            -- to max(purchase ts) > min(signup ts)
            WITH u AS (
              SELECT user_id,
                     min(ts) FILTER (WHERE event_type = 'signup')
                       AS first_signup,
                     max(ts) FILTER (WHERE event_type = 'purchase')
                       AS last_purchase
              FROM events GROUP BY user_id
            )
            SELECT 'users' AS stage, CAST(count(*) AS BIGINT) AS n FROM u
            UNION ALL
            SELECT 'signed_up', count(*) FROM u
            WHERE first_signup IS NOT NULL
            UNION ALL
            SELECT 'converted', count(*) FROM u
            WHERE first_signup IS NOT NULL AND last_purchase > first_signup
        """,
        "rollup_events": """
            -- OLAP subtotals; rolled-up keys are NULL (user_id emitted
            -- as nullable DOUBLE to match the engine's NaN encoding)
            SELECT event_type,
                   CAST(user_id AS DOUBLE) AS user_id,
                   CAST(count(*) AS BIGINT) AS n,
                   round(sum(value), 4) AS sum_value
            FROM events
            WHERE value IS NOT NULL AND NOT isnan(value)
            GROUP BY ROLLUP (event_type, user_id)
        """,
        "equidepth_histogram_events": """
            -- decile equi-depth histogram; bucket = #boundaries strictly
            -- below the value (quantile_disc boundaries, ties go down)
            WITH v AS (SELECT value FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)),
            b AS (SELECT quantile_disc(value,
                           [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bl
                  FROM v)
            SELECT CAST(len(list_filter(b.bl, x -> x < v.value)) AS BIGINT)
                     AS bucket,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM v, b GROUP BY 1
        """,
        "exact_quantiles_events": """
            SELECT event_type, CAST(count(value) AS BIGINT) AS n,
                   quantile_disc(value, 0.5) AS p50,
                   quantile_disc(value, 0.9) AS p90,
                   quantile_disc(value, 0.99) AS p99
            FROM events WHERE value IS NOT NULL AND NOT isnan(value)
            GROUP BY event_type
        """,
        "deterministic_shuffle_documents": """
            SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key
            FROM documents ORDER BY shuffle_key LIMIT 100
        """,
        "temporal_drift_events": """
            -- day-over-previous-OBSERVED-day PSI, identical bins/smoothing
            WITH e AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
                              LEAST(GREATEST(CAST(floor(value / 25.0)
                                    AS BIGINT), 0), 19) AS bin
                       FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)),
            c AS (SELECT day, bin, count(*) AS n FROM e GROUP BY day, bin),
            grid AS (SELECT d.day, b.bin, coalesce(c.n, 0) AS n
                     FROM (SELECT DISTINCT day FROM c) d
                     CROSS JOIN (SELECT unnest(generate_series(0, 19)) AS bin) b
                     LEFT JOIN c ON c.day = d.day AND c.bin = b.bin),
            tot AS (SELECT day, sum(n) AS t FROM grid GROUP BY day),
            p AS (SELECT g.day, g.bin,
                         (g.n + 0.5) / (t.t + 0.5 * 20) AS p, t.t
                  FROM grid g JOIN tot t ON g.day = t.day),
            lagged AS (SELECT day, bin, p, t,
                              lag(p) OVER (PARTITION BY bin ORDER BY day) AS q
                       FROM p)
            SELECT day, CAST(max(t) AS BIGINT) AS n,
                   round(sum((p - q) * ln(p / q)), 6) AS psi
            FROM lagged WHERE q IS NOT NULL
            GROUP BY day
        """,
        "sliding_window_events": """
            -- sliding windows via explicit window-id replication
            -- (generate_series), the independent path vs np.repeat
            WITH e AS (SELECT event_type, value, epoch_us(ts) AS us
                       FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)),
            x AS (SELECT event_type, value,
                         unnest(generate_series(
                             CAST(floor((us - 10800000000) / 3600000000.0)
                                  AS BIGINT) + 1,
                             CAST(floor(us / 3600000000.0) AS BIGINT)))
                             AS window_id
                  FROM e)
            SELECT window_id, event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   round(sum(value) / count(*), 6) AS avg_value
            FROM x GROUP BY window_id, event_type
        """,
        "stratified_sample_documents": """
            -- deterministic hash-threshold sample: lexicographic compare of
            -- the md5 hex prefix == numeric compare at equal length
            SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
            FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '40000000'
        """,
        "pack_documents": """
            -- global exclusive prefix over doc_id order == the
            -- distributed range-bucket prefix sum
            WITH t AS (
              SELECT doc_id,
                     CAST(CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                               ELSE len(string_split_regex(trim(text), '\\s+'))
                          END AS BIGINT) AS n_tokens
              FROM documents),
            p AS (
              SELECT doc_id, n_tokens,
                     -- DuckDB SUM(BIGINT) OVER yields HUGEINT, which pandas
                     -- renders as float64 and the driver hashes as floats;
                     -- cast back so dtypes match the engine's int64
                     CAST(coalesce(SUM(n_tokens) OVER
                       (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
              FROM t)
            SELECT doc_id, n_tokens, start_tok,
                   CAST(start_tok // 512 AS BIGINT) AS pack_id,
                   CAST(start_tok % 512 AS BIGINT) AS pack_offset
            FROM p
        """,
        "mixture_sample_documents": """
            -- per-source mixture rate (1 + src_idx%8)/16, hash-threshold
            -- keep via 8-hex lexicographic compare; printf('%08x') renders
            -- the numeric threshold in the same fixed width
            SELECT doc_id, source
            FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
                  printf('%08x',
                         (1 + CAST(substr(source, 4) AS BIGINT) % 8)
                         * 268435456)
        """,
        "top_events_per_user": """
            WITH v AS (SELECT user_id, event_id, value FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)),
            r AS (SELECT user_id, event_id, value,
                         row_number() OVER (PARTITION BY user_id
                                            ORDER BY value DESC, event_id)
                             AS rk
                  FROM v)
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   CAST(event_id AS BIGINT) AS event_id,
                   round(value, 4) AS value, CAST(rk AS BIGINT) AS rk
            FROM r WHERE rk <= 3
        """,
        "props_extract_events": """
            WITH k AS (SELECT event_type,
                              TRY_CAST(regexp_extract(props, '"k": ([0-9]+)',
                                                      1) AS BIGINT) AS kv
                       FROM events)
            SELECT event_type, CAST(count(kv) AS BIGINT) AS n,
                   round(sum(kv) / count(kv), 6) AS avg_k,
                   CAST(max(kv) AS BIGINT) AS max_k
            FROM k GROUP BY event_type
        """,
        "interval_join_events": """
            -- range-containment join: native BETWEEN join is the
            -- independent path vs the engine's bucket-replication join
            WITH w AS (SELECT event_id AS incident_id, user_id, ts AS s,
                              ts + INTERVAL 4 HOUR AS e
                       FROM events
                       WHERE event_type = 'error' AND value > 200.0)
            SELECT CAST(ev.event_id AS BIGINT) AS event_id,
                   CAST(ev.user_id AS BIGINT) AS user_id,
                   CAST(w.incident_id AS BIGINT) AS incident_id
            FROM events ev JOIN w
              ON ev.user_id = w.user_id AND ev.ts >= w.s AND ev.ts <= w.e
        """,
        "anti_join_customer_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                    WHERE o_orderstatus = 'P')
            ORDER BY c_custkey
        """,
        "semi_mark_orders_customer": """
            SELECT o_orderkey, o_custkey,
                   o_custkey IN (SELECT c_custkey FROM customer
                                 WHERE c_mktsegment = 'BUILDING')
                       AS building_cust
            FROM orders ORDER BY o_orderkey
        """,
        "skew_join_lineitem_supplier": """
            SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY s_nationkey
        """,
        "join_orders_lineitem": """
            SELECT o_orderpriority, l_returnflag,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority, l_returnflag
        """,
        "shipping_priority": """
            SELECT l_orderkey, o_orderdate, o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < DATE '1997-07-01'
              AND l_shipdate  > DATE '1997-07-01'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, l_orderkey
            LIMIT 10
        """,
        "local_supplier_volume": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey
                         AND c_nationkey = s_nationkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= DATE '1996-01-01'
              AND o_orderdate <  DATE '1997-01-01'
            GROUP BY n_name
            ORDER BY revenue DESC
        """,
        "bloom_dedup_documents": """
            SELECT md5(text) AS text_hash, CAST(count(*) AS BIGINT) AS cnt
            FROM (SELECT coalesce(text, '') AS text FROM documents)
            GROUP BY md5(text) HAVING count(*) >= 2
        """,
        "double_fire_audit_events": """
            -- same-(user, type) events < 60 s apart in (ts, event_id)
            -- order: burst count + tightest observed gap per series
            WITH g AS (
                SELECT user_id, event_type,
                       epoch_us(ts) - lag(epoch_us(ts)) OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS gap_us
                FROM events)
            SELECT user_id, event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(count(*) FILTER (WHERE gap_us < 60000000)
                        AS BIGINT) AS n_double,
                   round(min(gap_us) / 1000.0, 6) AS min_gap_ms
            FROM g GROUP BY user_id, event_type
            ORDER BY user_id, event_type
        """,
        "interarrival_audit_events": """
            -- per-user inter-arrival gaps in (ts, event_id) order;
            -- quantile_cont == np.quantile linear interpolation
            WITH g AS (
                SELECT user_id,
                       (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id)) / 1000000.0 AS gap
                FROM events)
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n,
                   round(quantile_cont(gap, 0.5), 6) AS median_gap_s,
                   round(quantile_cont(gap, 0.95), 6) AS p95_gap_s,
                   round(max(gap), 6) AS max_gap_s
            FROM g GROUP BY user_id ORDER BY user_id
        """,
        "independence_audit_events": """
            -- Pearson chi-square independence of event_type x weekday;
            -- weekday from the same integer epoch-day floor as the
            -- engine (epoch day 0 = Thursday)
            WITH c AS (
                SELECT event_type,
                       ((epoch_us(ts) // 86400000000) + 4) % 7 AS weekday,
                       count(*) AS n
                FROM events GROUP BY 1, 2),
            t AS (SELECT sum(n) AS total FROM c)
            SELECT c.event_type,
                   CAST(c.weekday AS BIGINT) AS weekday,
                   CAST(c.n AS BIGINT) AS n,
                   round(sum(c.n) OVER (PARTITION BY c.event_type)
                         * sum(c.n) OVER (PARTITION BY c.weekday)
                         / t.total, 6) AS expected,
                   round(pow(c.n - sum(c.n) OVER (PARTITION BY c.event_type)
                                   * sum(c.n) OVER (PARTITION BY c.weekday)
                                   / t.total, 2)
                         / (sum(c.n) OVER (PARTITION BY c.event_type)
                            * sum(c.n) OVER (PARTITION BY c.weekday)
                            / t.total), 6) AS chi2_part
            FROM c, t ORDER BY c.event_type, c.weekday
        """,
        "freshness_audit_events": """
            -- per-type staleness vs the table's own frontier (no
            -- wall-clock dependence); exact integer epoch-us lag
            WITH m AS (SELECT event_type,
                              max(epoch_us(ts)) AS last_us,
                              count(*) AS n
                       FROM events GROUP BY event_type),
            f AS (SELECT max(last_us) AS frontier FROM m)
            SELECT m.event_type,
                   CAST(m.n AS BIGINT) AS n,
                   CAST(m.last_us AS BIGINT) AS last_us,
                   round((f.frontier - m.last_us) / 1000000.0, 6) AS lag_s
            FROM m, f ORDER BY m.event_type
        """,
        "json_props_audit_events": """
            -- JSON payload conformance + k-field stats per type; the
            -- integer-k predicate mirrors the engine's isinstance(int)
            WITH p AS (
                SELECT event_type, props,
                       props IS NOT NULL AND json_valid(props) AS valid,
                       CASE WHEN props IS NOT NULL AND json_valid(props)
                                 AND json_type(props, '$.k') IN
                                     ('INTEGER', 'UBIGINT', 'BIGINT')
                            THEN CAST(json_extract(props, '$.k')
                                      AS BIGINT) END AS k
                FROM events)
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(count(*) FILTER (WHERE valid) AS BIGINT)
                       AS n_valid,
                   CAST(count(*) FILTER (WHERE props IS NOT NULL
                                           AND NOT json_valid(props))
                        AS BIGINT) AS n_malformed,
                   CAST(count(*) FILTER (WHERE valid AND k IS NULL)
                        AS BIGINT) AS n_missing_k,
                   CAST(min(k) AS BIGINT) AS k_min,
                   CAST(max(k) AS BIGINT) AS k_max,
                   round(avg(k), 6) AS k_mean
            FROM p GROUP BY event_type ORDER BY event_type
        """,
        "coverage_audit_events": """
            -- temporal completeness per type: present vs expected hour
            -- slots between first and last event; integer epoch-us hour
            -- floors identical to the engine
            WITH h AS (SELECT DISTINCT event_type,
                              epoch_us(ts) // 3600000000 AS hour
                       FROM events)
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS hours_present,
                   CAST(max(hour) - min(hour) + 1 AS BIGINT)
                       AS hours_expected,
                   CAST(max(hour) - min(hour) + 1 - count(*) AS BIGINT)
                       AS hours_missing,
                   round(100.0 * count(*) / (max(hour) - min(hour) + 1),
                         6) AS coverage_pct
            FROM h GROUP BY event_type ORDER BY event_type
        """,
        "disorder_audit_events": """
            -- event-time disorder per user: running max ts over arrival
            -- order (event_id); lateness in exact integer epoch-us
            WITH w AS (
                SELECT user_id, epoch_us(ts) AS us,
                       max(epoch_us(ts)) OVER (
                           PARTITION BY user_id ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS prev_max
                FROM events)
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(count(*) FILTER (WHERE us < prev_max)
                        AS BIGINT) AS n_late,
                   round(coalesce(max(CASE WHEN us < prev_max
                                           THEN prev_max - us END), 0)
                         / 1000000.0, 6) AS max_late_s
            FROM w GROUP BY user_id ORDER BY user_id
        """,
        "fd_audit_documents": """
            -- functional-dependency audit: source -> lang, with witness
            -- min/max values for violated sources
            SELECT source,
                   CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                   min(lang) AS lang_min, max(lang) AS lang_max,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   count(DISTINCT lang) = 1 AS fd_ok
            FROM documents GROUP BY source ORDER BY source
        """,
        "benford_orders": """
            -- Benford first-digit audit of o_totalprice: digit read from
            -- the integer-cents decimal string exactly as the engine
            WITH d AS (
                SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100)
                                              AS BIGINT) AS VARCHAR),
                                   1, 1) AS BIGINT) AS digit
                FROM orders
                WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0),
            c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
            base AS (SELECT g.digit,
                            coalesce(c.n, 0) AS n,
                            (SELECT sum(n) FROM c) AS total
                     FROM generate_series(1, 9) AS g(digit)
                     LEFT JOIN c ON c.digit = g.digit)
            SELECT CAST(digit AS BIGINT) AS digit,
                   CAST(n AS BIGINT) AS n,
                   round(n / total, 6) AS freq,
                   round(log10(1.0 + 1.0 / digit), 6) AS expected,
                   round(total * pow(n / total - log10(1.0 + 1.0 / digit),
                                     2) / log10(1.0 + 1.0 / digit), 6)
                       AS chi2_part
            FROM base ORDER BY digit
        """,
        "topk_docs_per_source": """
            -- per-domain best-k: 5 longest docs per source, dense rank,
            -- (n_chars DESC, doc_id) ordering identical to the engine's
            -- local-topk + per-group merge
            SELECT source, CAST(rk AS BIGINT) AS rk,
                   CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(n_chars AS BIGINT) AS n_chars
            FROM (SELECT source, doc_id, n_chars,
                         row_number() OVER (PARTITION BY source
                                            ORDER BY n_chars DESC, doc_id)
                             AS rk
                  FROM documents)
            WHERE rk <= 5 ORDER BY source, rk
        """,
        "exact_dedup_documents": """
            SELECT md5(text) AS text_hash,
                   CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
                   CAST(count(*) AS BIGINT) AS n_dups
            FROM documents GROUP BY md5(text)
        """,
        "ngram_jaccard_documents": """
            -- exact word-trigram Jaccard join, df<=64-filtered sets,
            -- threshold 0.5; literal single-space tokenization matches the
            -- engine's word_ngram_hashes exactly
            WITH words AS (
              SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w
              FROM documents
            ), sh AS (
              SELECT DISTINCT doc_id,
                unnest(list_transform(range(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
              FROM words
            ), df AS (
              SELECT g, count(*) AS df FROM sh GROUP BY g
            ), kept AS (
              SELECT sh.doc_id, sh.g FROM sh JOIN df USING (g)
              WHERE df.df <= 64
            ), sizes AS (
              SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id
            ), pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     count(*) AS inter
              FROM kept a JOIN kept b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   round(inter / (sa.n + sb.n - inter), 6) AS jaccard
            FROM pairs
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE inter / (sa.n + sb.n - inter) >= 0.5
            ORDER BY id_a, id_b
        """,
        "editdist_dedup_documents": """
            -- ngram_jaccard candidate pairs + normalized char edit
            -- similarity; levenshtein() semantics fuzz-matched by the
            -- engine's DP kernel, division IEEE-identical on both sides
            WITH words AS (
              SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w
              FROM documents
            ), sh AS (
              SELECT DISTINCT doc_id,
                unnest(list_transform(range(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
              FROM words
            ), df AS (
              SELECT g, count(*) AS df FROM sh GROUP BY g
            ), kept AS (
              SELECT sh.doc_id, sh.g FROM sh JOIN df USING (g)
              WHERE df.df <= 64
            ), sizes AS (
              SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id
            ), pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM kept a JOIN kept b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ), jac AS (
              SELECT id_a, id_b,
                     round(inter / (sa.n + sb.n - inter), 6) AS jaccard
              FROM pairs
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE inter / (sa.n + sb.n - inter) >= 0.5
            )
            SELECT j.id_a, j.id_b, j.jaccard,
                   CASE WHEN greatest(length(coalesce(ta.text, '')),
                                      length(coalesce(tb.text, ''))) = 0
                        THEN 1.0
                        ELSE 1.0 - CAST(levenshtein(coalesce(ta.text, ''),
                                                    coalesce(tb.text, ''))
                                        AS DOUBLE)
                             / greatest(length(coalesce(ta.text, '')),
                                        length(coalesce(tb.text, '')))
                   END AS edit_sim
            FROM jac j
            JOIN documents ta ON ta.doc_id = j.id_a
            JOIN documents tb ON tb.doc_id = j.id_b
        """,
        "contamination_documents": """
            -- eval-leakage scan: stride-1 8-gram overlap with the
            -- doc_id%101==0 eval set; eval windows deduped so the join
            -- never multiplies corpus rows
            WITH toks AS (
              SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t
              FROM documents
            ), ev AS (
              SELECT DISTINCT
                unnest(list_transform(range(1, len(t) - 6, 1),
                       i -> array_to_string(t[i : i + 7], ' '))) AS win
              FROM toks WHERE doc_id % 101 = 0 AND len(t) >= 8
            ), corpus AS (
              SELECT doc_id, t FROM toks WHERE doc_id % 101 <> 0
            ), wins AS (
              SELECT doc_id,
                unnest(list_transform(range(1, len(t) - 6, 1),
                       i -> array_to_string(t[i : i + 7], ' '))) AS win
              FROM corpus WHERE len(t) >= 8
            ), hits AS (
              SELECT w.doc_id, count(*) AS n_cont
              FROM wins w JOIN ev USING (win) GROUP BY w.doc_id
            )
            SELECT c.doc_id,
                   CAST(CASE WHEN len(c.t) >= 8 THEN len(c.t) - 7
                             ELSE 0 END AS BIGINT) AS n_windows,
                   CAST(coalesce(h.n_cont, 0) AS BIGINT) AS n_contaminated,
                   coalesce(h.n_cont, 0) > 0 AS is_contaminated
            FROM corpus c LEFT JOIN hits h USING (doc_id)
        """,
        "dup_spans_documents": """
            -- hash-windowed duplicated-substring stats: 8-token windows,
            -- stride 4, literal single-space tokenization; a window is
            -- duplicated when its text occurs >= 2 times corpus-wide.
            -- DuckDB list slicing t[i : i+7] is 1-based inclusive; the
            -- engine's 0-based toks[p : p+8] emits identical windows.
            WITH toks AS (
              SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t
              FROM documents
            ), nwin AS (
              SELECT doc_id,
                     CAST(CASE WHEN len(t) >= 8 THEN (len(t) - 8) // 4 + 1
                               ELSE 0 END AS BIGINT) AS n_windows
              FROM toks
            ), wins AS (
              -- range() is exclusive-stop: positions 1, 1+4, ... <= len-7
              SELECT doc_id,
                     unnest(list_transform(range(1, len(t) - 6, 4),
                            i -> array_to_string(t[i : i + 7], ' '))) AS win
              FROM toks WHERE len(t) >= 8
            ), keycnt AS (
              SELECT win, count(*) AS tot FROM wins GROUP BY win
            ), docdup AS (
              SELECT w.doc_id,
                     count(*) FILTER (WHERE k.tot >= 2) AS n_dup
              FROM wins w JOIN keycnt k USING (win) GROUP BY w.doc_id
            )
            SELECT n.doc_id,
                   n.n_windows,
                   CAST(coalesce(d.n_dup, 0) AS BIGINT) AS n_dup_windows,
                   CASE WHEN n.n_windows > 0
                        THEN CAST(coalesce(d.n_dup, 0) AS DOUBLE)
                             / n.n_windows
                        ELSE 0.0 END AS dup_frac
            FROM nwin n LEFT JOIN docdup d USING (doc_id)
        """,
        "vocab_documents": """
            -- corpus vocabulary top-100; deterministic (n desc, word)
            -- tie-break matches the engine's sort
            WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
                       FROM documents WHERE text IS NOT NULL),
            c AS (SELECT word, count(*) AS n FROM w
                  WHERE word <> '' GROUP BY 1)
            SELECT word, CAST(n AS BIGINT) AS n
            FROM c ORDER BY n DESC, word LIMIT 100
        """,
        "zipf_documents": """
            -- OLS of ln(freq) on ln(rank) over the full vocabulary via
            -- the identical raw-moments closed form the engine computes
            WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
                       FROM documents WHERE text IS NOT NULL),
            c AS (SELECT word, count(*) AS n FROM w
                  WHERE word <> '' GROUP BY 1),
            r AS (SELECT ln(CAST(row_number() OVER (ORDER BY n DESC, word)
                                 AS DOUBLE)) AS x,
                         ln(CAST(n AS DOUBLE)) AS y FROM c),
            m AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                         sum(x * x) AS sxx, sum(y * y) AS syy,
                         sum(x * y) AS sxy FROM r)
            SELECT CAST(n AS BIGINT) AS n_vocab,
                   round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6)
                       AS zipf_slope,
                   round(CASE WHEN (syy - sy * sy / n) > 0
                         THEN (sxy - sx * sy / n) * (sxy - sx * sy / n)
                              / ((sxx - sx * sx / n)
                                 * (syy - sy * sy / n))
                         ELSE NULL END, 6) AS fit_r2
            FROM m
        """,
        "token_count_documents": """
            SELECT doc_id,
                   CAST(CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                             ELSE len(string_split_regex(trim(text), '\\s+'))
                        END AS BIGINT) AS n_tokens
            FROM documents
        """,
        "text_quality_documents": f"""
            WITH t AS (SELECT doc_id, coalesce(text, '') AS s FROM documents)
            SELECT doc_id,
                   CAST(length(s) AS BIGINT) AS n_chars,
                   CAST(CASE WHEN trim(s) = '' THEN 0
                             ELSE len(string_split_regex(trim(s), '\\s+'))
                        END AS BIGINT) AS n_tokens,
                   CAST(length(s) - length(regexp_replace(s, '{punct_class}', '', 'g')) AS BIGINT) AS n_punct,
                   CAST(length(s) - length(regexp_replace(s, '[0-9]', '', 'g')) AS BIGINT) AS n_digits
            FROM t
        """,
        "pii_redact_documents": r"""
            -- identical doc_id-derived PII injection as the Ray query
            -- (pure string concat), identical RE2 patterns for scan+redact
            WITH inj AS (
              SELECT doc_id,
                coalesce(text, '')
                || CASE WHEN doc_id % 3 = 0
                        THEN ' contact user' || doc_id || '@example.org now'
                        ELSE '' END
                || CASE WHEN doc_id % 5 = 0
                        THEN ' from 10.' || (doc_id % 256) || '.0.'
                             || (doc_id % 100) || ' today'
                        ELSE '' END
                || CASE WHEN doc_id % 7 = 0
                        THEN ' call +1-555-' || (1000 + doc_id % 9000)
                             || ' soon'
                        ELSE '' END AS s
              FROM documents)
            SELECT doc_id,
              CAST(len(regexp_extract_all(s,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
                AS n_email,
              CAST(len(regexp_extract_all(s, '\+\d[\d-]{7,}\d')) AS BIGINT)
                AS n_phone,
              CAST(len(regexp_extract_all(s,
                '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT)
                AS n_ip,
              regexp_replace(regexp_replace(regexp_replace(s,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                '<EMAIL>', 'g'),
                '\+\d[\d-]{7,}\d', '<PHONE>', 'g'),
                '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')
                AS redacted
            FROM inj
        """,
        "doc_quality_verdicts": """
            -- graded corpus verdict over the same repetition kernels as
            -- repetition_stats_documents; strict inequalities on
            -- bit-identical divisions, so no rounding is needed
            WITH t AS (SELECT doc_id, text,
                              regexp_extract_all(lower(coalesce(text, '')),
                                                 '[a-z0-9_'']+') AS w
                       FROM documents),
            tok AS (SELECT doc_id, unnest(w) AS word,
                           generate_subscripts(w, 1) AS pos
                    FROM t),
            wc AS (SELECT doc_id, word, count(*) AS c
                   FROM tok GROUP BY doc_id, word),
            bg AS (SELECT a.doc_id, count(*) AS c
                   FROM tok a JOIN tok b
                     ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                   GROUP BY a.doc_id, a.word, b.word),
            runs AS (SELECT doc_id, word,
                            pos - ROW_NUMBER() OVER
                              (PARTITION BY doc_id, word ORDER BY pos) AS isl
                     FROM tok),
            runlen AS (SELECT doc_id, max(c) AS max_run
                       FROM (SELECT doc_id, count(*) AS c
                             FROM runs GROUP BY doc_id, word, isl)
                       GROUP BY doc_id),
            agg AS (SELECT doc_id, sum(c) AS n_words,
                           count(*) AS n_uniq, max(c) AS top_word
                    FROM wc GROUP BY doc_id),
            bagg AS (SELECT doc_id, max(c) AS top_big FROM bg GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(CASE
                     WHEN d.text IS NULL OR trim(d.text) = '' THEN 2
                     WHEN coalesce(a.n_words, 0) < 12
                       OR coalesce(a.n_uniq / greatest(a.n_words, 1), 0)
                          < 0.31
                       OR coalesce(a.top_word / greatest(a.n_words, 1), 0)
                          > 0.18 THEN -1
                     WHEN coalesce(b.top_big / greatest(a.n_words - 1, 1), 0)
                          > 0.06
                       OR coalesce(r.max_run, 0) >= 3 THEN 0
                     ELSE 1 END AS TINYINT) AS dq_code
            FROM documents d
            LEFT JOIN agg a USING (doc_id)
            LEFT JOIN bagg b USING (doc_id)
            LEFT JOIN runlen r USING (doc_id)
        """,
        "repetition_stats_documents": """
            -- Gopher-style repetition stats: tokens = lowercased [\\w']+
            -- runs, zipped unnest(list)+generate_subscripts gives (word,
            -- pos); islands trick (pos - dense rank within word) finds
            -- same-word runs
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(lower(coalesce(text, '')),
                                                 '[a-z0-9_'']+') AS w
                       FROM documents),
            tok AS (SELECT doc_id, unnest(w) AS word,
                           generate_subscripts(w, 1) AS pos
                    FROM t),
            wc AS (SELECT doc_id, word, count(*) AS c
                   FROM tok GROUP BY doc_id, word),
            bg AS (SELECT a.doc_id, a.word AS w1, b.word AS w2, count(*) AS c
                   FROM tok a JOIN tok b
                     ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                   GROUP BY a.doc_id, a.word, b.word),
            runs AS (SELECT doc_id, word,
                            pos - ROW_NUMBER() OVER
                              (PARTITION BY doc_id, word ORDER BY pos) AS isl
                     FROM tok),
            runlen AS (SELECT doc_id, max(c) AS max_run
                       FROM (SELECT doc_id, count(*) AS c
                             FROM runs GROUP BY doc_id, word, isl)
                       GROUP BY doc_id),
            agg AS (SELECT doc_id, sum(c) AS n_words,
                           count(*) AS n_uniq, max(c) AS top_word
                    FROM wc GROUP BY doc_id),
            bagg AS (SELECT doc_id, max(c) AS top_big FROM bg GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
                   round(coalesce(a.n_uniq / greatest(a.n_words, 1), 0), 6)
                     AS uniq_word_frac,
                   round(coalesce(a.top_word / greatest(a.n_words, 1), 0), 6)
                     AS top_word_frac,
                   round(coalesce(b.top_big / greatest(a.n_words - 1, 1), 0), 6)
                     AS top_bigram_frac,
                   CAST(coalesce(r.max_run, 0) AS BIGINT) AS max_word_run
            FROM documents d
            LEFT JOIN agg a USING (doc_id)
            LEFT JOIN bagg b USING (doc_id)
            LEFT JOIN runlen r USING (doc_id)
        """,
        "feature_construction_events": """
            -- fv layout: raw, avg2, avg5, periodic(2,[3]), lag1, lag2, then
            -- time features in the reference's fixed check order: weekday
            -- (python Monday=0), hour; memory_size = 5
            WITH w AS (
              SELECT event_id, value, ts,
                ROW_NUMBER() OVER win AS rn,
                AVG(value) OVER (win ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS avg2,
                AVG(value) OVER (win ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS avg5,
                LAG(value, 1) OVER win AS lag1,
                LAG(value, 2) OVER win AS lag2,
                LAG(value, 4) OVER win AS lag4
              FROM events
              WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT event_id,
              CASE WHEN rn >= 5 THEN value END AS fv0,
              CASE WHEN rn >= 5 THEN avg2 END AS fv1,
              CASE WHEN rn >= 5 THEN avg5 END AS fv2,
              CASE WHEN rn >= 5 THEN (value + lag2 + lag4) / 3 END AS fv3,
              CASE WHEN rn >= 5 THEN lag1 END AS fv4,
              CASE WHEN rn >= 5 THEN lag2 END AS fv5,
              CASE WHEN rn >= 5 THEN CAST((dayofweek(ts) + 6) % 7 AS DOUBLE) END AS fv6,
              CASE WHEN rn >= 5 THEN CAST(hour(ts) AS DOUBLE) END AS fv7,
              rn >= 5 AS fv_valid
            FROM w
        """,
        "embedding_norms": """
            SELECT vec_id,
                   round(sqrt(list_sum(list_transform(embedding,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm
            FROM embeddings
        """,
        "similarity_topk_embeddings": """
            -- cosine in DOUBLE via unnest (list_cosine_similarity computes in
            -- float32, which diverges from the engine's float64 kernels)
            WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
            pe AS (SELECT vec_id, unnest(embedding) AS x,
                          generate_subscripts(embedding, 1) AS i
                   FROM embeddings WHERE vec_id <> 0),
            pq AS (SELECT unnest(qe) AS y, generate_subscripts(qe, 1) AS i FROM q),
            d AS (SELECT vec_id, sum(x*y) AS dot, sum(x*x) AS nx
                  FROM pe JOIN pq USING (i) GROUP BY vec_id),
            nq AS (SELECT sum(y*y) AS ny FROM pq)
            SELECT vec_id,
                   round(dot / (sqrt(nx) * sqrt(ny)), 6) AS cosine
            FROM d, nq
            ORDER BY dot / (sqrt(nx) * sqrt(ny)) DESC, vec_id
            LIMIT 10
        """,
        # ------------------- recurrence / window oracles (round 2) --------
        "zscore_events": """
            -- group-wise z-score with sample std; NULL for null values,
            -- single-row groups and zero-variance groups (NULLIF)
            SELECT event_id, user_id,
                   round((value - AVG(value) OVER w)
                         / NULLIF(STDDEV_SAMP(value) OVER w, 0.0), 6) AS z
            FROM events
            WINDOW w AS (PARTITION BY user_id)
        """,
        "robust_zscore_events": """
            -- group-wise robust z-score: (value - median) / MAD.
            -- median() is quantile_cont(0.5) (midpoint interpolation),
            -- matching numpy.median; NULL for null values and
            -- zero-MAD groups (NULLIF)
            WITH med AS (
              SELECT user_id, median(value) AS med
              FROM events WHERE value IS NOT NULL GROUP BY user_id
            ), mad AS (
              SELECT e.user_id, median(abs(e.value - m.med)) AS mad
              FROM events e JOIN med m USING (user_id)
              WHERE e.value IS NOT NULL GROUP BY e.user_id
            )
            SELECT e.event_id, e.user_id,
                   round((e.value - m.med) / NULLIF(d.mad, 0.0), 6) AS rz
            FROM events e
            LEFT JOIN med m USING (user_id)
            LEFT JOIN mad d USING (user_id)
        """,
        "winsorize_events": """
            -- group-wise p05/p95 clamp; quantile_cont matches
            -- numpy.quantile's linear interpolation
            WITH b AS (
              SELECT user_id,
                     quantile_cont(value, 0.05) AS lo,
                     quantile_cont(value, 0.95) AS hi
              FROM events WHERE value IS NOT NULL GROUP BY user_id
            )
            SELECT e.event_id, e.user_id,
                   round(least(greatest(e.value, b.lo), b.hi), 6) AS value_w
            FROM events e LEFT JOIN b USING (user_id)
        """,
        "impute_median_events": """
            -- null values filled with the group median; all-null groups
            -- stay null
            WITH m AS (
              SELECT user_id, median(value) AS med
              FROM events WHERE value IS NOT NULL GROUP BY user_id
            )
            SELECT e.event_id, e.user_id,
                   round(coalesce(e.value, m.med), 6) AS value_f,
                   e.value IS NULL AS was_null
            FROM events e LEFT JOIN m USING (user_id)
        """,
        "covariance_embeddings": """
            -- sample covariance of the leading 8 embedding dims via
            -- covar_samp over an unnest self-join (the engine computes
            -- the same block from one pass of X'X partials)
            WITH e AS (
              SELECT vec_id, unnest(embedding[1:8]) AS v,
                     generate_subscripts(embedding[1:8], 1) AS d
              FROM embeddings
            )
            SELECT CAST(a.d - 1 AS BIGINT) AS i,
                   CAST(b.d - 1 AS BIGINT) AS j,
                   round(covar_samp(a.v, b.v), 6) AS cov
            FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.d <= b.d
            GROUP BY a.d, b.d
        """,
        "source_quality_report": f"""
            -- per-source curation report; token/punct kernels identical
            -- to the D-verified token_count/text_quality oracles; rates
            -- are integer-ratio IEEE divisions (bit-exact both sides)
            WITH q AS (
              SELECT source,
                     length(coalesce(text, '')) AS n_chars,
                     CAST(CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                               ELSE len(string_split_regex(trim(text),
                                                           '\\s+'))
                          END AS BIGINT) AS n_tokens,
                     length(coalesce(text, ''))
                       - length(regexp_replace(coalesce(text, ''),
                                               '{punct_class}', '', 'g'))
                         AS n_punct
              FROM documents
            )
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
                   CAST(sum(n_chars) AS BIGINT) AS n_chars,
                   CAST(sum(n_punct) AS BIGINT) AS n_punct,
                   CAST(sum(n_tokens) AS DOUBLE) / count(*) AS mean_tokens,
                   CAST(sum(n_punct) AS DOUBLE)
                     / NULLIF(sum(n_chars), 0) AS punct_rate
            FROM q GROUP BY source
        """,
        "doc_split_documents": """
            -- deterministic 90/5/5 hash split, identical 8-hex compare
            SELECT doc_id,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                             < 'e6666666' THEN 'train'
                        WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                             < 'f3333333' THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        """,
        "large_orders": """
            -- Q18-shaped: HAVING on the fact aggregate, join-back to
            -- orders + customer (quantities are integer-valued doubles,
            -- sums exact)
            WITH big AS (
              SELECT l_orderkey, sum(l_quantity) AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING sum(l_quantity) > 220
            )
            SELECT o.o_orderkey, o.o_custkey, c.c_name,
                   round(o.o_totalprice, 2) AS o_totalprice, b.total_qty
            FROM big b
            JOIN orders o ON o.o_orderkey = b.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
        """,
        "cusum_events": f"""
            -- two-sided no-reset CUSUM via the prefix-scan identity
            -- s_t = c_t - min(0, running_min(c)); pure window SQL mirrors
            -- the engine's cumsum + minimum.accumulate kernel exactly
            WITH v AS ({_VALID}),
            c AS (
              SELECT event_id, user_id, rn,
                     SUM(2.0*(value - {_MID!r})/{_RNG!r} - 0.25)
                         OVER w AS cp,
                     SUM(-(2.0*(value - {_MID!r})/{_RNG!r}) - 0.25)
                         OVER w AS cn
              FROM v WINDOW w AS (PARTITION BY user_id ORDER BY rn)
            ),
            s AS (
              SELECT event_id,
                     cp - LEAST(MIN(cp) OVER w, 0.0) AS sp,
                     cn - LEAST(MIN(cn) OVER w, 0.0) AS sn
              FROM c WINDOW w AS (PARTITION BY user_id ORDER BY rn)
            )
            SELECT event_id,
                   CAST(CASE WHEN sp > 2.0 OR sn > 2.0 THEN -1 ELSE 1 END
                        AS TINYINT) AS cusum_code
            FROM s
            {_UNDEF_TAIL.format(col='cusum_code')}
        """,
        "cusum_reset_events": f"""
            -- CUSUM with post-alarm restart: true per-user recurrence
            -- replay (the reset breaks the prefix-scan identity used by
            -- cusum_events, so this oracle is a recursive CTE like EMA)
            WITH RECURSIVE v AS ({_VALID}),
            r AS (
              SELECT user_id, rn, event_id,
                     greatest(0.0, 2.0*(value - {_MID!r})/{_RNG!r} - 0.25)
                         AS sp,
                     greatest(0.0, -(2.0*(value - {_MID!r})/{_RNG!r})
                                   - 0.25) AS sn
              FROM v WHERE rn = 1
              UNION ALL
              SELECT v.user_id, v.rn, v.event_id,
                     greatest(0.0,
                       (CASE WHEN r.sp > 2.0 OR r.sn > 2.0
                             THEN 0.0 ELSE r.sp END)
                       + 2.0*(v.value - {_MID!r})/{_RNG!r} - 0.25),
                     greatest(0.0,
                       (CASE WHEN r.sp > 2.0 OR r.sn > 2.0
                             THEN 0.0 ELSE r.sn END)
                       - (2.0*(v.value - {_MID!r})/{_RNG!r}) - 0.25)
              FROM r JOIN v ON v.user_id = r.user_id AND v.rn = r.rn + 1
            )
            SELECT event_id,
                   CAST(CASE WHEN sp > 2.0 OR sn > 2.0 THEN -1 ELSE 1 END
                        AS TINYINT) AS cusumr_code
            FROM r
            {_UNDEF_TAIL.format(col='cusumr_code')}
        """,
        "ema_check_events": _sql_ema(),
        "macd_check_events": _sql_macd(),
        "cumulative_events": _sql_cumulative(),
        "filtering_events": _sql_filtering(),
        "ema_percentile_events": _sql_ema_percentile(),
        "repair_events": _sql_repair(),
        "percent_score_events": _sql_percent_score(),
        "forecast_band_events": _sql_forecast_band(),
        "seasonal_band_events": _sql_seasonal_band(),
        "asof_join_events": """
            -- distributed as-of join parity: DuckDB's native ASOF JOIN is
            -- the independent computation path (inner, greatest r.ts <= l.ts)
            WITH l AS (SELECT event_id, user_id, ts, value FROM events
                       WHERE event_type = 'error'),
                 r AS (SELECT user_id, ts, value FROM events
                       WHERE event_type = 'signup')
            SELECT l.event_id, l.user_id,
                   round(l.value, 4) AS value,
                   round(r.value, 4) AS signup_value,
                   round(date_diff('microsecond', r.ts, l.ts) / 1000000.0, 3)
                       AS lag_s
            FROM l ASOF JOIN r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "welch_ttest_events": """
            -- per-type Welch t between first/second half of the time
            -- range (integer epoch-us midpoint split); raw-moment
            -- variances pin float parity with the engine fold
            WITH r AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2
                           AS mid FROM events),
            v AS (SELECT event_type,
                         CASE WHEN epoch_us(ts) < (SELECT mid FROM r)
                              THEN 'a' ELSE 'b' END AS period, value
                  FROM events
                  WHERE value IS NOT NULL AND NOT isnan(value)),
            m AS (SELECT event_type, period, count(*) AS n,
                         sum(value) AS s, sum(value * value) AS ss
                  FROM v GROUP BY 1, 2),
            w AS (SELECT a.event_type,
                         a.n AS na, b.n AS nb,
                         a.s / a.n AS ma, b.s / b.n AS mb,
                         (a.ss - a.s * a.s / a.n) / (a.n - 1) AS va,
                         (b.ss - b.s * b.s / b.n) / (b.n - 1) AS vb
                  FROM m a JOIN m b ON a.event_type = b.event_type
                  WHERE a.period = 'a' AND b.period = 'b'
                        AND a.n >= 2 AND b.n >= 2)
            SELECT event_type,
                   CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                   round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
                   round((ma - mb) / sqrt(va / na + vb / nb), 6) AS t_stat,
                   round((va / na + vb / nb) * (va / na + vb / nb)
                         / ((va / na) * (va / na) / (na - 1)
                            + (vb / nb) * (vb / nb) / (nb - 1)), 6) AS dof
            FROM w
            WHERE va / na + vb / nb > 0
            ORDER BY event_type
        """,
        "volume_shipping_nations": """
            -- Q7 shape: bi-directional NATION_3<->NATION_8 trade flow,
            -- 1996-1997 ship years
            WITH p AS (SELECT n_nationkey, n_name FROM nation
                       WHERE n_name IN ('NATION_3', 'NATION_8'))
            SELECT ns.n_name AS supp_nation,
                   nc.n_name AS cust_nation,
                   CAST(year(l.l_shipdate) AS BIGINT) AS year,
                   round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                             * CAST(round((1 - l.l_discount) * 100)
                                    AS BIGINT)) / 10000.0, 2) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN p ns ON s.s_nationkey = ns.n_nationkey
            JOIN p nc ON c.c_nationkey = nc.n_nationkey
            WHERE ns.n_name <> nc.n_name
              AND l.l_shipdate >= DATE '1996-01-01'
              AND l.l_shipdate < DATE '1998-01-01'
            GROUP BY 1, 2, 3
            ORDER BY 1, 2, 3
        """,
        "returned_item_report": """
            -- Q10 shape: top-20 customers by returned-item revenue loss
            -- for 1996Q1 orders; post-round ordering + custkey tie-break
            -- mirrors the engine's deterministic prefix. Revenue in
            -- exact integer 1e-4-dollar units (cents x percent) as
            -- volume_shipping_nations, so the 2 dp round and top-20 cut
            -- are association-order-proof on both sides.
            WITH rev AS (
                SELECT o.o_custkey,
                       round(sum(CAST(round(l.l_extendedprice * 100)
                                      AS BIGINT)
                                 * CAST(round((1 - l.l_discount) * 100)
                                        AS BIGINT)) / 10000.0,
                             2) AS revenue
                FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                WHERE l.l_returnflag = 'R'
                  AND o.o_orderdate >= DATE '1996-01-01'
                  AND o.o_orderdate < DATE '1996-04-01'
                GROUP BY 1)
            SELECT c.c_custkey, c.c_name, n.n_name,
                   round(c.c_acctbal, 2) AS c_acctbal, rev.revenue
            FROM rev
            JOIN customer c ON rev.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            ORDER BY rev.revenue DESC, c.c_custkey
            LIMIT 20
        """,
        "bracket_revenue_part": """
            -- Q19 shape: OR-bracket (brand, size, quantity) conditional
            -- revenue, one row per bracket
            WITH b AS (
                SELECT CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       * CAST(round((1 - l.l_discount) * 100) AS BIGINT)
                           AS rev,
                       CASE WHEN p.p_brand = 'Brand#1' AND p.p_size
                                 BETWEEN 1 AND 5
                                 AND l.l_quantity BETWEEN 1 AND 11
                            THEN 'Brand#1'
                            WHEN p.p_brand = 'Brand#2' AND p.p_size
                                 BETWEEN 1 AND 10
                                 AND l.l_quantity BETWEEN 10 AND 20
                            THEN 'Brand#2'
                            WHEN p.p_brand = 'Brand#3' AND p.p_size
                                 BETWEEN 1 AND 15
                                 AND l.l_quantity BETWEEN 20 AND 30
                            THEN 'Brand#3'
                       END AS p_brand
                FROM lineitem l
                JOIN part p ON l.l_partkey = p.p_partkey)
            SELECT p_brand, CAST(count(*) AS BIGINT) AS n_items,
                   round(sum(rev) / 10000.0, 2) AS revenue
            FROM b WHERE p_brand IS NOT NULL
            GROUP BY 1 ORDER BY 1
        """,
        "sales_opportunity_customers": """
            -- Q22 shape: above-average-balance customers with no RECENT
            -- (2000+) orders, per market segment
            WITH t AS (SELECT avg(c_acctbal) AS thresh FROM customer
                       WHERE c_acctbal > 0.0)
            SELECT c.c_mktsegment,
                   CAST(count(*) AS BIGINT) AS n_cust,
                   round(sum(c.c_acctbal), 2) AS total_acctbal
            FROM customer c, t
            WHERE c.c_acctbal > t.thresh
              AND c.c_custkey NOT IN (SELECT o_custkey FROM orders
                                      WHERE o_orderdate >= DATE '2000-01-01')
            GROUP BY 1
            ORDER BY 1
        """,
        "survival_users_events": """
            -- Kaplan-Meier time-to-first-purchase, administratively
            -- censored at 24 h from the user's first event; running
            -- product via exp(sum(ln)) (rows with d=0 add ln 1)
            WITH u AS (SELECT user_id, min(epoch_us(ts)) AS f,
                              min(CASE WHEN event_type = 'purchase'
                                       THEN epoch_us(ts) END) AS fp
                       FROM events GROUP BY 1),
            d AS (SELECT CASE WHEN fp IS NOT NULL
                                   AND fp - f < 86400000000
                              THEN fp - f ELSE 86400000000 END AS life_us,
                         CASE WHEN fp IS NOT NULL
                                   AND fp - f < 86400000000
                              THEN 1 ELSE 0 END AS churn
                  FROM u),
            t AS (SELECT life_us, sum(churn) AS d_i, count(*) AS a_i
                  FROM d GROUP BY 1),
            km AS (SELECT life_us, d_i,
                          sum(a_i) OVER (ORDER BY life_us DESC) AS n_risk
                   FROM t)
            SELECT round(life_us / 3600000000.0, 6) AS t_hours,
                   CAST(n_risk AS BIGINT) AS n_risk,
                   CAST(d_i AS BIGINT) AS n_events,
                   round(exp(sum(ln(1.0 - CAST(d_i AS DOUBLE) / n_risk))
                             OVER (ORDER BY life_us)), 6) AS survival
            FROM km
            QUALIFY d_i > 0
            ORDER BY life_us
        """,
        "calibration_events": """
            -- reliability diagram + Brier of min-max-normalized value
            -- vs the error label; identical bin/score expressions
            WITH r AS (SELECT min(value) AS lo, max(value) AS hi
                       FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)),
            s AS (SELECT (value - r.lo) / (r.hi - r.lo) AS sc,
                         CASE WHEN event_type = 'error' THEN 1.0
                              ELSE 0.0 END AS y
                  FROM events, r
                  WHERE value IS NOT NULL AND NOT isnan(value)),
            b AS (SELECT CAST(least(greatest(floor(sc * 10.0), 0), 9)
                              AS INT) AS bin, sc, y FROM s),
            g AS (SELECT bin, count(*) AS n, sum(sc) AS ss, sum(y) AS sy
                  FROM b GROUP BY 1),
            tot AS (SELECT sum((sc - y) * (sc - y)) / count(*) AS brier,
                           sum(y) / count(*) AS base FROM b)
            SELECT CAST(g.bin AS BIGINT) AS bin,
                   CAST(g.n AS BIGINT) AS n,
                   round(g.ss / g.n, 6) AS avg_score,
                   round(g.sy / g.n, 6) AS frac_pos,
                   round(tot.brier, 6) AS brier,
                   round(tot.base, 6) AS base_rate
            FROM g, tot ORDER BY g.bin
        """,
        "new_users_daily_events": """
            -- running COUNT DISTINCT reduced to first-seen grain; day
            -- from the same integer epoch-day floor as the engine.
            -- make_timestamp(epoch_us) is session-TimeZone-independent
            -- (to_timestamp converts through the host TZ and breaks the
            -- gate on non-UTC hosts).
            WITH f AS (SELECT user_id,
                              min(epoch_us(ts) // 86400000000) AS day
                       FROM events GROUP BY 1),
            c AS (SELECT day, count(*) AS new_users FROM f GROUP BY 1)
            SELECT make_timestamp(day * 86400000000) AS day,
                   CAST(new_users AS BIGINT) AS new_users,
                   CAST(sum(new_users) OVER (ORDER BY day)
                        AS BIGINT) AS cum_users
            FROM c ORDER BY day
        """,
        "temporal_integrity_orders_lineitem": """
            -- temporal referential audit: ship-before-order and >90-day
            -- lags per priority; lags as exact integer day counts from
            -- epoch-us differences (identical expression as the engine)
            SELECT o.o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n_items,
                   CAST(count(*) FILTER (WHERE
                       (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
                       // 86400000000 < 0) AS BIGINT) AS n_early,
                   CAST(count(*) FILTER (WHERE
                       (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
                       // 86400000000 > 90) AS BIGINT) AS n_late,
                   CAST(max((epoch_us(l.l_shipdate)
                             - epoch_us(o.o_orderdate)) // 86400000000)
                        AS BIGINT) AS max_lag_days
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY 1 ORDER BY 1
        """,
        "order_constraint_events": """
            -- per-user funnel-order violations: purchases before the
            -- first signup (strict <; same-microsecond counts ordered),
            -- or by users with no signup at all
            WITH s AS (SELECT user_id, min(ts) AS first_signup
                       FROM events WHERE event_type = 'signup'
                       GROUP BY 1)
            SELECT e.user_id,
                   CAST(count(*) AS BIGINT) AS n_purchase,
                   CAST(count(*) FILTER (WHERE s.first_signup IS NULL
                                         OR e.ts < s.first_signup)
                        AS BIGINT) AS n_unordered
            FROM events e
            LEFT JOIN s ON e.user_id = s.user_id
            WHERE e.event_type = 'purchase'
            GROUP BY 1 ORDER BY 1
        """,
        "fuzzy_match_parts": """
            -- JW fuzzy self-match over distinct part names; engine JW is
            -- fuzz-pinned bit-exact to jaro_winkler_similarity so the
            -- 0.85 threshold cuts identically
            WITH n AS (SELECT DISTINCT p_name FROM part)
            SELECT a.p_name AS name_a, b.p_name AS name_b,
                   round(jaro_winkler_similarity(a.p_name, b.p_name), 6)
                       AS jw
            FROM n a JOIN n b ON a.p_name < b.p_name
            WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.85
            ORDER BY 1, 2
        """,
        "wasserstein_drift_events": """
            -- grid-W1 per type between time halves: 20 equal-width
            -- global bins, sum |cdf_a - cdf_b| * cell width over the
            -- first 19 cells (cell 20's term is exactly 0); identical
            -- bin expression as the engine
            WITH r AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2
                           AS mid FROM events),
            v AS (SELECT event_type,
                         CASE WHEN epoch_us(ts) < (SELECT mid FROM r)
                              THEN 'a' ELSE 'b' END AS period, value
                  FROM events
                  WHERE value IS NOT NULL AND NOT isnan(value)),
            rng AS (SELECT min(value) AS lo, max(value) AS hi FROM v),
            b AS (SELECT event_type, period,
                         CAST(least(greatest(floor(
                             (value - rng.lo) * 20.0 / (rng.hi - rng.lo)),
                             0), 19) AS INT) AS bin
                  FROM v, rng),
            c AS (SELECT event_type, period, bin, count(*) AS n
                  FROM b GROUP BY 1, 2, 3),
            grid AS (SELECT t.event_type, p.period, g.bin,
                            coalesce(c.n, 0) AS n
                     FROM (SELECT DISTINCT event_type FROM v) t
                     CROSS JOIN (VALUES ('a'), ('b')) p(period)
                     CROSS JOIN (SELECT range AS bin FROM range(20)) g
                     LEFT JOIN c ON c.event_type = t.event_type
                                AND c.period = p.period
                                AND c.bin = g.bin),
            cum AS (SELECT event_type, period, bin,
                           sum(n) OVER (PARTITION BY event_type, period
                                        ORDER BY bin) AS cum,
                           sum(n) OVER (PARTITION BY event_type, period)
                               AS tot
                    FROM grid),
            w AS (SELECT a.event_type,
                         max(a.tot) AS na, max(b2.tot) AS nb,
                         sum(abs(CAST(a.cum AS DOUBLE) / a.tot
                                 - CAST(b2.cum AS DOUBLE) / b2.tot)) AS s
                  FROM cum a JOIN cum b2
                    ON a.event_type = b2.event_type AND a.bin = b2.bin
                  WHERE a.period = 'a' AND b2.period = 'b' AND a.bin < 19
                  GROUP BY 1)
            SELECT w.event_type,
                   CAST(w.na AS BIGINT) AS n_a,
                   CAST(w.nb AS BIGINT) AS n_b,
                   round(w.s * (rng.hi - rng.lo) / 20.0, 6) AS w1
            FROM w, rng
            WHERE w.na > 0 AND w.nb > 0
            ORDER BY w.event_type
        """,
        "jsd_drift_events": """
            -- Jensen-Shannon divergence per type between time halves on
            -- the same 20-bin grid as wasserstein_drift_events; the
            -- p*ln(2p/(p+q)) terms drop p=0 cells exactly as the engine
            WITH r AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2
                           AS mid FROM events),
            v AS (SELECT event_type,
                         CASE WHEN epoch_us(ts) < (SELECT mid FROM r)
                              THEN 'a' ELSE 'b' END AS period, value
                  FROM events
                  WHERE value IS NOT NULL AND NOT isnan(value)),
            rng AS (SELECT min(value) AS lo, max(value) AS hi FROM v),
            bb AS (SELECT event_type, period,
                          CAST(least(greatest(floor(
                              (value - rng.lo) * 20.0 / (rng.hi - rng.lo)),
                              0), 19) AS INT) AS bin
                   FROM v, rng),
            c AS (SELECT event_type, period, bin, count(*) AS n
                  FROM bb GROUP BY 1, 2, 3),
            g AS (SELECT t.event_type, gb.bin,
                         coalesce(ca.n, 0) AS a, coalesce(cb.n, 0) AS b
                  FROM (SELECT DISTINCT event_type FROM v) t
                  CROSS JOIN (SELECT range AS bin FROM range(20)) gb
                  LEFT JOIN c ca ON ca.event_type = t.event_type
                               AND ca.bin = gb.bin AND ca.period = 'a'
                  LEFT JOIN c cb ON cb.event_type = t.event_type
                               AND cb.bin = gb.bin AND cb.period = 'b'),
            tot AS (SELECT event_type, sum(a) AS na, sum(b) AS nb
                    FROM g GROUP BY 1),
            terms AS (SELECT g.event_type, tot.na, tot.nb,
                             CAST(g.a AS DOUBLE) / tot.na AS p,
                             CAST(g.b AS DOUBLE) / tot.nb AS q
                      FROM g JOIN tot ON g.event_type = tot.event_type
                      WHERE tot.na > 0 AND tot.nb > 0)
            SELECT event_type,
                   CAST(max(na) AS BIGINT) AS n_a,
                   CAST(max(nb) AS BIGINT) AS n_b,
                   round(0.5 * sum(CASE WHEN p > 0
                                        THEN p * ln(2.0 * p / (p + q))
                                        ELSE 0 END)
                         + 0.5 * sum(CASE WHEN q > 0
                                          THEN q * ln(2.0 * q / (p + q))
                                          ELSE 0 END), 6) AS jsd
            FROM terms
            GROUP BY 1 ORDER BY 1
        """,
        "cramers_v_events": """
            -- Cramér's V over the FULL type x hour grid (empty cells
            -- contribute their expected count to chi2)
            WITH c AS (SELECT event_type, hour(ts) AS h,
                              CAST(count(*) AS DOUBLE) AS o
                       FROM events GROUP BY 1, 2),
            rt AS (SELECT event_type, sum(o) AS rt FROM c GROUP BY 1),
            ct AS (SELECT h, sum(o) AS ct FROM c GROUP BY 1),
            n AS (SELECT sum(o) AS n FROM c),
            grid AS (SELECT rt.event_type, ct.h, rt.rt, ct.ct,
                            coalesce(c.o, 0.0) AS o
                     FROM rt CROSS JOIN ct
                     LEFT JOIN c ON c.event_type = rt.event_type
                                AND c.h = ct.h),
            chi AS (SELECT sum((o - rt * ct / n.n) * (o - rt * ct / n.n)
                               / (rt * ct / n.n)) AS chi2,
                           count(DISTINCT event_type) AS nr,
                           count(DISTINCT h) AS nc
                    FROM grid, n)
            SELECT CAST(n.n AS BIGINT) AS n,
                   CAST(chi.nr AS BIGINT) AS n_rows_ct,
                   CAST(chi.nc AS BIGINT) AS n_cols_ct,
                   round(chi.chi2, 6) AS chi2,
                   round(sqrt(chi.chi2 / (n.n
                       * (least(chi.nr, chi.nc) - 1))), 6) AS cramers_v
            FROM chi, n
        """,
        "hbos_events": """
            -- HBOS: -log density over 10 equal-width value bins + 24
            -- hour bins; identical bin expression as the engine
            WITH r AS (SELECT min(value) AS lo, max(value) AS hi
                       FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)),
            b AS (SELECT event_id, hour(ts) AS hb,
                         CASE WHEN value IS NULL OR isnan(value) THEN NULL
                              ELSE CAST(least(greatest(floor(
                                  (value - r.lo) * 10.0 / (r.hi - r.lo)),
                                  0), 9) AS BIGINT) END AS vb
                  FROM events, r),
            vc AS (SELECT vb, CAST(count(*) AS DOUBLE) AS cnt FROM b
                   WHERE vb IS NOT NULL GROUP BY 1),
            hc AS (SELECT hb, CAST(count(*) AS DOUBLE) AS cnt FROM b
                   GROUP BY 1),
            nv AS (SELECT sum(cnt) AS n FROM vc),
            na AS (SELECT sum(cnt) AS n FROM hc)
            SELECT b.event_id,
                   round(-(ln(vc.cnt) - ln(nv.n))
                         - (ln(hc.cnt) - ln(na.n)), 6) AS hbos
            FROM b
            LEFT JOIN vc ON b.vb = vc.vb
            JOIN hc ON b.hb = hc.hb, nv, na
            ORDER BY b.event_id
        """,
        "attribution_events": """
            -- first-/last-touch attribution of 'purchase' conversions to
            -- the nearest / earliest strictly-prior non-purchase type
            WITH o AS (SELECT user_id, ts, event_id, event_type,
                              CASE WHEN event_type <> 'purchase'
                                   THEN event_type END AS tp
                       FROM events),
            w AS (SELECT *,
                         first_value(tp IGNORE NULLS) OVER (
                             PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS ft,
                         last_value(tp IGNORE NULLS) OVER (
                             PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS lt
                  FROM o)
            SELECT model, event_type,
                   CAST(count(*) AS BIGINT) AS n_conversions
            FROM (SELECT 'first_touch' AS model, ft AS event_type
                  FROM w WHERE w.event_type = 'purchase'
                             AND ft IS NOT NULL
                  UNION ALL
                  SELECT 'last_touch', lt
                  FROM w WHERE w.event_type = 'purchase'
                             AND lt IS NOT NULL)
            GROUP BY 1, 2
            ORDER BY model, event_type
        """,
        "order_priority_check": """
            -- Q4-shaped: orders in 1996Q1 with any line shipped > 60
            -- days after the order date, counted per priority
            WITH ms AS (SELECT l_orderkey, max(l_shipdate) AS max_ship
                        FROM lineitem GROUP BY 1)
            SELECT o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CASE WHEN max_ship >
                                      o_orderdate + INTERVAL 60 DAY
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_late
            FROM orders JOIN ms ON o_orderkey = l_orderkey
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-04-01'
            GROUP BY 1 ORDER BY 1
        """,
        "promo_revenue_lineitem": """
            -- Q14-shaped: PROMO-part share of one quarter's discounted
            -- revenue
            SELECT CAST(count(*) AS BIGINT) AS n_items,
                   round(sum(CASE WHEN p_type = 'PROMO'
                             THEN l_extendedprice * (1 - l_discount)
                             ELSE 0 END), 2) AS promo_rev,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS total_rev,
                   round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                             THEN l_extendedprice * (1 - l_discount)
                             ELSE 0 END)
                         / sum(l_extendedprice * (1 - l_discount)), 6)
                       AS promo_share_pct
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-03-01'
              AND l_shipdate < TIMESTAMP '1996-06-01'
        """,
        "top_supplier_by_nation": """
            -- Q15-shaped argmax join-back: top supplier(s) per nation by
            -- lifetime discounted revenue, ties kept; max compares the
            -- 2-dp-rounded revenue (grid-exact doubles both sides)
            WITH r AS (SELECT l_suppkey,
                              round(sum(l_extendedprice * (1 - l_discount)),
                                    2) AS revenue
                       FROM lineitem GROUP BY 1),
            j AS (SELECT n_name, s_suppkey, s_name, revenue,
                         max(revenue) OVER (PARTITION BY s_nationkey) AS mx
                  FROM r JOIN supplier ON l_suppkey = s_suppkey
                         JOIN nation ON s_nationkey = n_nationkey)
            SELECT n_name, s_suppkey, s_name, revenue
            FROM j WHERE revenue = mx
            ORDER BY n_name, s_suppkey
        """,
        "burstiness_events": """
            -- per-user inter-arrival mean/cv/burstiness over consecutive
            -- (ts, event_id)-ordered gaps; population sigma, raw-moment
            -- form, gaps = int microsecond diffs / 1e6 as in the engine
            WITH g AS (SELECT user_id,
                              date_diff('microsecond',
                                        lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id),
                                        ts) / 1000000.0 AS gap
                       FROM events),
            a AS (SELECT user_id, count(gap) AS n, sum(gap) AS s,
                         sum(gap * gap) AS ss
                  FROM g WHERE gap IS NOT NULL GROUP BY 1)
            SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
                   round(s / n, 6) AS mean_gap_s,
                   round(sqrt((ss - s * s / n) / n) / (s / n), 6) AS cv,
                   round((sqrt((ss - s * s / n) / n) - s / n)
                         / (sqrt((ss - s * s / n) / n) + s / n), 6)
                       AS burstiness
            FROM a WHERE n >= 2 ORDER BY user_id
        """,
        "anova_hour_events": """
            -- per-type one-way ANOVA across hour-of-day groups: F and
            -- eta^2 from grouped raw moments (identical expressions as
            -- the engine's driver fold)
            WITH c AS (SELECT event_type, hour(ts) AS h,
                              CAST(count(*) AS DOUBLE) AS n,
                              sum(value) AS s, sum(value * value) AS ss
                       FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)
                       GROUP BY 1, 2),
            t AS (SELECT event_type, sum(n) AS n, sum(s) AS s,
                         CAST(count(*) AS DOUBLE) AS k
                  FROM c GROUP BY 1),
            x AS (SELECT c.event_type,
                         sum(c.n * (c.s / c.n - t.s / t.n)
                             * (c.s / c.n - t.s / t.n)) AS ssb,
                         sum(c.ss - c.s * c.s / c.n) AS ssw
                  FROM c JOIN t USING (event_type) GROUP BY 1)
            SELECT t.event_type, CAST(t.n AS BIGINT) AS n,
                   CAST(t.k AS BIGINT) AS n_hours,
                   round((x.ssb / (t.k - 1)) / (x.ssw / (t.n - t.k)), 6)
                       AS f_stat,
                   round(x.ssb / (x.ssb + x.ssw), 6) AS eta_sq
            FROM t JOIN x USING (event_type)
            WHERE t.k >= 2 AND t.n > t.k
            ORDER BY t.event_type
        """,
        "cardinality_profile_orders": """
            -- distribution of line counts per order + zero-line orders
            WITH c AS (SELECT l_orderkey, count(*) AS n_lines
                       FROM lineitem GROUP BY 1),
            d AS (SELECT n_lines, count(*) AS n_orders FROM c GROUP BY 1),
            z AS (SELECT 0 AS n_lines, count(*) AS n_orders FROM orders
                  WHERE o_orderkey NOT IN (SELECT l_orderkey FROM c))
            SELECT CAST(n_lines AS BIGINT) AS n_lines,
                   CAST(n_orders AS BIGINT) AS n_orders
            FROM (SELECT * FROM z WHERE n_orders > 0
                  UNION ALL SELECT * FROM d)
            ORDER BY n_lines
        """,
        "monthly_revenue_lineitem": """
            -- monthly discounted revenue + MoM percent change; revenue
            -- summed exactly as BIGINT 1e-4-dollar units (cents x
            -- percent), association-order-proof by construction
            WITH m AS (SELECT CAST(year(l_shipdate) * 100
                              + month(l_shipdate) AS BIGINT) AS ym,
                              CAST(count(*) AS BIGINT) AS n_items,
                              round(sum(CAST(round(l_extendedprice * 100)
                                             AS BIGINT)
                                        * CAST(round((1 - l_discount) * 100)
                                               AS BIGINT)) / 10000.0, 2)
                                  AS revenue
                       FROM lineitem GROUP BY 1)
            SELECT ym, n_items, revenue,
                   round(100.0 * (revenue - lag(revenue)
                                  OVER (ORDER BY ym))
                         / lag(revenue) OVER (ORDER BY ym), 6) AS mom_pct
            FROM m ORDER BY ym
        """,
        "tukey_outliers_events": """
            -- Tukey 1.5*IQR fences per type + outside counts; fences
            -- computed and compared unrounded (quantile_cont ==
            -- np.quantile linear, the winsorize precedent)
            WITH f AS (SELECT event_type,
                              quantile_cont(value, 0.25) AS q1,
                              quantile_cont(value, 0.75) AS q3
                       FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)
                       GROUP BY 1),
            c AS (SELECT e.event_type, count(*) AS n,
                         sum(CASE WHEN value < q1 - 1.5 * (q3 - q1)
                             THEN 1 ELSE 0 END) AS n_low,
                         sum(CASE WHEN value > q3 + 1.5 * (q3 - q1)
                             THEN 1 ELSE 0 END) AS n_high
                  FROM events e JOIN f USING (event_type)
                  WHERE value IS NOT NULL AND NOT isnan(value)
                  GROUP BY 1)
            SELECT f.event_type, CAST(n AS BIGINT) AS n,
                   round(q1, 6) AS q1, round(q3, 6) AS q3,
                   round(q1 - 1.5 * (q3 - q1), 6) AS lo,
                   round(q3 + 1.5 * (q3 - q1), 6) AS hi,
                   CAST(n_low AS BIGINT) AS n_low,
                   CAST(n_high AS BIGINT) AS n_high
            FROM f JOIN c USING (event_type) ORDER BY event_type
        """,
        "runs_test_events": """
            -- Wald-Wolfowitz runs test per user on sign(value - median)
            -- in (ts, event_id) order; exact E[R]/Var[R] closed forms,
            -- users with n1 < 5 or n2 < 5 dropped both sides
            WITH v AS (SELECT user_id, ts, event_id, value FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)),
            med AS (SELECT user_id, quantile_cont(value, 0.5) AS m
                    FROM v GROUP BY 1),
            s AS (SELECT v.user_id,
                         CASE WHEN value > m THEN 1 ELSE 0 END AS sg,
                         ts, event_id
                  FROM v JOIN med USING (user_id) WHERE value <> m),
            r AS (SELECT user_id, sg,
                         lag(sg) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS pg
                  FROM s),
            a AS (SELECT user_id,
                         1 + sum(CASE WHEN pg IS NOT NULL AND sg <> pg
                                 THEN 1 ELSE 0 END) AS runs,
                         sum(sg) AS n1, sum(1 - sg) AS n2
                  FROM r GROUP BY 1)
            SELECT user_id, CAST(runs AS BIGINT) AS n_runs,
                   CAST(n1 AS BIGINT) AS n_above,
                   CAST(n2 AS BIGINT) AS n_below,
                   round((runs - (1.0 + 2.0 * n1 * n2 / (n1 + n2)))
                         / sqrt(2.0 * n1 * n2
                                * (2.0 * n1 * n2 - (n1 + n2))
                                / ((n1 + n2) * (n1 + n2)
                                   * (n1 + n2 - 1.0))), 6) AS z
            FROM a WHERE n1 >= 5 AND n2 >= 5 ORDER BY user_id
        """,
        "encoding_audit_documents": """
            -- text-encoding conformance counts; predicates mirror the
            -- engine's compiled regexes and NFC check
            WITH t AS (SELECT text FROM documents WHERE text IS NOT NULL),
            c AS (SELECT
                (SELECT count(*) FROM documents) AS n_docs,
                count(*) AS n_text,
                sum(CASE WHEN regexp_matches(text,
                    '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]')
                    THEN 1 ELSE 0 END) AS n_control,
                sum(CASE WHEN contains(text, chr(65533))
                    THEN 1 ELSE 0 END) AS n_replacement,
                sum(CASE WHEN regexp_matches(text,
                    '[' || chr(8203) || chr(8204) || chr(8205)
                        || chr(65279) || ']')
                    THEN 1 ELSE 0 END) AS n_zero_width,
                sum(CASE WHEN regexp_matches(text, '[^\\x00-\\x7f]')
                    THEN 1 ELSE 0 END) AS n_non_ascii,
                sum(CASE WHEN nfc_normalize(text) <> text
                    THEN 1 ELSE 0 END) AS n_nfc_unstable
                FROM t)
            SELECT CAST(n_docs AS BIGINT) AS n_docs,
                   CAST(n_text AS BIGINT) AS n_text,
                   CAST(n_control AS BIGINT) AS n_control,
                   CAST(n_replacement AS BIGINT) AS n_replacement,
                   CAST(n_zero_width AS BIGINT) AS n_zero_width,
                   CAST(n_non_ascii AS BIGINT) AS n_non_ascii,
                   CAST(n_nfc_unstable AS BIGINT) AS n_nfc_unstable,
                   round(n_non_ascii * 1.0 / n_text, 6) AS frac_non_ascii
            FROM c
        """,
        "float_anomaly_audit": """
            -- IEEE hygiene of events.value: null/NaN/inf/subnormal/
            -- integer-valued counts; predicates identical to the engine
            WITH c AS (SELECT
                count(*) AS n,
                sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS n_null,
                sum(CASE WHEN value IS NOT NULL AND isnan(value)
                         THEN 1 ELSE 0 END) AS n_nan,
                sum(CASE WHEN value IS NOT NULL AND isinf(value)
                         THEN 1 ELSE 0 END) AS n_inf,
                sum(CASE WHEN value IS NOT NULL AND isfinite(value)
                          AND abs(value) < pow(2.0, -1022)
                          AND value <> 0 THEN 1 ELSE 0 END)
                    AS n_subnormal,
                sum(CASE WHEN value IS NOT NULL AND isfinite(value)
                          AND floor(value) = value THEN 1 ELSE 0 END)
                    AS n_integer,
                sum(CASE WHEN value IS NOT NULL AND isfinite(value)
                         THEN 1 ELSE 0 END) AS n_finite
                FROM events)
            SELECT CAST(n AS BIGINT) AS n,
                   CAST(n_null AS BIGINT) AS n_null,
                   CAST(n_nan AS BIGINT) AS n_nan,
                   CAST(n_inf AS BIGINT) AS n_inf,
                   CAST(n_subnormal AS BIGINT) AS n_subnormal,
                   CAST(n_integer AS BIGINT) AS n_integer,
                   CAST(n_finite AS BIGINT) AS n_finite,
                   round(n_integer * 1.0 / n_finite, 6) AS frac_integer
            FROM c
        """,
        "pmi_collocations_documents": """
            -- top-20 PMI collocations, min pair support 5; tokenization
            -- and the PMI double expression identical to the engine
            WITH d AS (SELECT string_split(text, ' ') AS parts
                       FROM documents WHERE text IS NOT NULL),
            uw AS (SELECT unnest(parts) AS w FROM d),
            uni AS (SELECT w, CAST(count(*) AS DOUBLE) AS c
                    FROM uw GROUP BY 1),
            nu AS (SELECT sum(c) AS nu FROM uni),
            b AS (SELECT parts[i] AS w1, parts[i + 1] AS w2
                  FROM d, LATERAL unnest(generate_series(
                       1, len(parts) - 1)) AS g(i)),
            bi AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS cab
                   FROM b GROUP BY 1, 2),
            nb AS (SELECT sum(cab) AS nb FROM bi),
            p AS (SELECT w1, w2, cab,
                         ln((cab / nb.nb) / ((ua.c / nu.nu)
                            * (ub.c / nu.nu))) AS pmi
                  FROM bi JOIN uni ua ON bi.w1 = ua.w
                        JOIN uni ub ON bi.w2 = ub.w, nu, nb
                  WHERE cab >= 5)
            SELECT w1, w2, CAST(cab AS BIGINT) AS n_pair,
                   round(pmi, 6) AS pmi
            FROM p ORDER BY pmi DESC, w1, w2 LIMIT 20
        """,
        "cdc_compact_events": """
            -- keep-latest compaction per (user, event_type) entity by
            -- (ts, event_id); survivor rows pass through bit-exact
            SELECT user_id, event_type, event_id, ts, value
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY user_id, event_type
                      ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events)
            WHERE rn = 1
            ORDER BY user_id, event_type
        """,
        "columnar_roundtrip_events": """
            -- the ORC and IPC roundtrips must reproduce the parquet
            -- truth: per-type count + sum over non-NaN values, once per
            -- format label
            WITH a AS (SELECT event_type,
                              CAST(count(*) AS BIGINT) AS n,
                              round(sum(value), 6) AS sum_value
                       FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)
                       GROUP BY 1)
            SELECT 'orc' AS fmt, * FROM a
            UNION ALL
            SELECT 'ipc', * FROM a
            ORDER BY fmt, event_type
        """,
        "audience_overlap_events": """
            -- Jaccard overlap of user audiences between event-type pairs
            WITH p AS (SELECT DISTINCT user_id, event_type FROM events),
            c AS (SELECT event_type, count(*) AS n FROM p GROUP BY 1),
            j AS (SELECT a.event_type AS ta, b.event_type AS tb,
                         count(*) AS inter
                  FROM p a JOIN p b ON a.user_id = b.user_id
                        AND a.event_type < b.event_type
                  GROUP BY 1, 2)
            SELECT ta AS type_a, tb AS type_b,
                   CAST(ca.n AS BIGINT) AS n_a,
                   CAST(cb.n AS BIGINT) AS n_b,
                   CAST(inter AS BIGINT) AS n_both,
                   round(inter * 1.0 / (ca.n + cb.n - inter), 6) AS jaccard
            FROM j JOIN c ca ON ta = ca.event_type
                   JOIN c cb ON tb = cb.event_type
            ORDER BY type_a, type_b
        """,
        "class_separability_embeddings": """
            -- per-label centroid geometry + overall Fisher ratio from
            -- unnested per-dim grouped moments (identical raw-moment
            -- expressions as the engine's fold)
            WITH u AS (SELECT label,
                              generate_subscripts(embedding, 1) AS i,
                              unnest(embedding) AS x
                       FROM embeddings),
            pl AS (SELECT label, i, sum(CAST(x AS DOUBLE)) AS s
                   FROM u GROUP BY 1, 2),
            sq AS (SELECT label, CAST(count(*) AS DOUBLE) AS nx,
                          sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS ss
                   FROM u GROUP BY 1),
            dims AS (SELECT CAST(max(i) AS DOUBLE) AS dim FROM u),
            lab AS (SELECT label, nx / dim AS n, ss FROM sq, dims),
            tot AS (SELECT sum(n) AS nn FROM lab),
            g AS (SELECT i, sum(s) / (SELECT nn FROM tot) AS gi
                  FROM pl GROUP BY 1),
            geo AS (SELECT pl.label,
                           sum((pl.s / lab.n) * (pl.s / lab.n)) AS mu2,
                           sum((pl.s / lab.n - g.gi)
                               * (pl.s / lab.n - g.gi)) AS d2,
                           sum(pl.s * pl.s) / any_value(lab.n) AS s2n
                    FROM pl JOIN lab USING (label) JOIN g USING (i)
                    GROUP BY 1),
            w AS (SELECT geo.label, lab.n,
                         sqrt(geo.mu2) AS centroid_norm,
                         (lab.ss - geo.s2n) / (lab.n * dims.dim)
                             AS within_ms,
                         sqrt(geo.d2) AS dist_to_grand,
                         lab.n * geo.d2 AS bc,
                         lab.n * ((lab.ss - geo.s2n) / (lab.n * dims.dim))
                             AS wc
                  FROM geo JOIN lab USING (label), dims),
            f AS (SELECT sum(bc) / ((SELECT nn FROM tot)
                                    * (SELECT dim FROM dims))
                         / (sum(wc) / (SELECT nn FROM tot)) AS fisher
                  FROM w)
            SELECT CAST(w.label AS BIGINT) AS label,
                   CAST(w.n AS BIGINT) AS n,
                   round(w.centroid_norm, 6) AS centroid_norm,
                   round(w.within_ms, 6) AS within_ms,
                   round(w.dist_to_grand, 6) AS dist_to_grand,
                   round(f.fisher, 6) AS fisher_overall
            FROM w, f ORDER BY label
        """,
        "seasonal_decompose_events": """
            -- two-way additive decomposition on (isodow-1, hour): cell
            -- mean vs grand + dow effect + hour effect
            WITH c AS (SELECT isodow(ts) - 1 AS dow, hour(ts) AS h,
                              CAST(count(*) AS DOUBLE) AS n,
                              sum(value) AS s
                       FROM events
                       WHERE value IS NOT NULL AND NOT isnan(value)
                       GROUP BY 1, 2),
            t AS (SELECT sum(s) / sum(n) AS grand FROM c),
            d AS (SELECT dow, sum(s) / sum(n) - t.grand AS de
                  FROM c, t GROUP BY 1, t.grand),
            hh AS (SELECT h, sum(s) / sum(n) - t.grand AS he
                   FROM c, t GROUP BY 1, t.grand)
            SELECT CAST(c.dow AS BIGINT) AS dow,
                   CAST(c.h AS BIGINT) AS hour,
                   CAST(c.n AS BIGINT) AS n,
                   round(c.s / c.n, 6) AS cell_mean,
                   round(t.grand + d.de + hh.he, 6) AS additive_fit,
                   round(c.s / c.n - (t.grand + d.de + hh.he), 6)
                       AS residual
            FROM c JOIN d USING (dow) JOIN hh USING (h), t
            ORDER BY dow, hour
        """,
        "eval_f1_events": _sql_eval_f1(),
        "stream_validation_events": _sql_stream_validation(),
        "trend_classification_events": _sql_trend_classification(),
        "drift_events_psi": _sql_drift_psi(),
        "lang_detect_documents": _sql_lang_detect(),
        "reference_config_borders": _sql_reference_config_borders(),
    }
    # ------------------- frozen-fixture oracles (round 2) -----------------
    # seeded-model / sketch / clip queries: expectation tables committed
    # under fixtures/, regenerated by tools/make_fixtures.py (fixtures.py)
    from .fixtures import available_fixture_oracles
    out.update(available_fixture_oracles())
    return out
