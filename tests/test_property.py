"""Property-based tests (hypothesis) for the codec and kernel surfaces:
random inputs, invariants that must hold for EVERY input — complements the
golden/parity suites which pin specific vectors."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from anomaly_detection_ray import audio
from anomaly_detection_ray import image as img


@settings(max_examples=40, deadline=None)
@given(arrays(np.uint8, st.tuples(st.integers(1, 40), st.integers(1, 40),
                                  st.sampled_from([1, 3, 4]))))
def test_png_roundtrip_any_uint8(a):
    dec, meta = img.decode_png(img.encode_png(a))
    np.testing.assert_array_equal(dec, a)
    assert (meta["height"], meta["width"]) == a.shape[:2]


@settings(max_examples=40, deadline=None)
@given(arrays(np.int16, st.integers(1, 5000)),
       st.sampled_from([8000, 16000, 44100]))
def test_wav_roundtrip_any_pcm(pcm, sr):
    f = pcm.astype(np.float64) / 32768.0
    dec, dec_sr = audio.decode_wav(audio.encode_wav(f, sr))
    assert dec_sr == sr
    # PCM16 quantization: exact to within one quantization step
    np.testing.assert_allclose(dec, f, atol=1.0 / 32768.0)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.floats(0, 1e6, allow_nan=False), min_size=1, max_size=200),
       st.floats(0.5, 100.0))
def test_sessionize_kernel_invariants(ts_list, gap_s):
    """For any event-time sequence: sessions partition the events, ids are
    contiguous from 1, spans never overlap, and consecutive sessions are
    separated by more than gap_s."""
    import ray.data as rd

    from anomaly_detection_ray.stages.sessions import sessionize

    df = pd.DataFrame({"user_id": 1, "ts": sorted(ts_list)})
    out = (sessionize(rd.from_pandas(df), key="user_id", ts_col="ts",
                      gap_s=gap_s)
           .to_pandas().sort_values("session_id").reset_index(drop=True))
    assert out["n_events"].sum() == len(df)
    assert list(out["session_id"]) == list(range(1, len(out) + 1))
    assert (out["end_us"] >= out["start_us"]).all()
    gap_us = int(round(gap_s * 1e6))
    gaps = out["start_us"].to_numpy()[1:] - out["end_us"].to_numpy()[:-1]
    assert (gaps > gap_us).all()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.floats(-1e9, 1e9, allow_nan=False), min_size=1,
                max_size=100))
def test_tdigest_quantiles_bounded(values):
    """t-digest quantile estimates always lie within [min, max] and are
    monotone in q."""
    from anomaly_detection_ray.functions.sketches import TDigest
    td = TDigest()
    td.add_values(np.asarray(values, dtype=np.float64))
    qs = [td.quantile(q) for q in (0.1, 0.5, 0.9)]
    assert min(values) <= qs[0] <= qs[1] <= qs[2] <= max(values)


@settings(max_examples=15, deadline=None)
@given(st.floats(20.0, 5000.0), st.integers(1, 6))
def test_interval_join_any_bucket_size(bucket_s, n_keys):
    """Bucket size is a pure performance knob: the pair set must be
    identical for ANY bucket_s (tiny => heavy replication, huge => one
    bucket)."""
    import ray.data as rd

    from anomaly_detection_ray.stages.intervals import interval_join

    r = np.random.default_rng(17)
    left = pd.DataFrame({"k": r.integers(0, n_keys, 120),
                         "ts": r.uniform(0, 3000, 120),
                         "lid": np.arange(120, dtype=np.int64)})
    s = r.uniform(0, 2800, 15)
    win = pd.DataFrame({"k": r.integers(0, n_keys, 15),
                        "wid": np.arange(15, dtype=np.int64),
                        "start_us": (s * 1e6).astype(np.int64),
                        "end_us": ((s + r.uniform(10, 600, 15)) * 1e6
                                   ).astype(np.int64)})
    got = (interval_join(rd.from_pandas(left).repartition(3), win, key="k",
                         ts_col="ts", left_cols=["lid"], id_col="wid",
                         bucket_s=bucket_s).to_pandas())
    l_us = np.round(left["ts"].to_numpy() * 1e6).astype(np.int64)
    want = {(int(l), int(w))
            for i, l in enumerate(left["lid"])
            for w, ks, a, b in win[["wid", "k", "start_us", "end_us"]]
            .itertuples(index=False, name=None)
            if left["k"].iloc[i] == ks and a <= l_us[i] <= b}
    assert set(zip(got["lid"], got["wid"])) == want
    assert len(got) == len(want)


@settings(max_examples=15, deadline=None)
@given(st.integers(1, 5), st.integers(1, 5))
def test_sliding_window_counts_any_geometry(w_mult, slide_div):
    """Every event appears in exactly ceil(window/slide) windows; total
    replicated count equals n_events x windows-per-event for any
    window/slide geometry."""
    import ray.data as rd

    from anomaly_detection_ray.stages.sessions import sliding_window_agg

    slide_s = 3600.0 / slide_div
    window_s = slide_s * w_mult
    r = np.random.default_rng(3)
    df = pd.DataFrame({
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(r.uniform(0, 86400, 300), unit="s"),
        "event_type": "x",
        "value": r.normal(size=300),
    })
    out = sliding_window_agg(rd.from_pandas(df).repartition(3),
                             key="event_type", ts_col="ts",
                             value_col="value", window_s=window_s,
                             slide_s=slide_s)
    assert out["n"].sum() == 300 * w_mult  # windows covering each event


@settings(max_examples=25, deadline=None)
@given(arrays(np.uint8, st.tuples(st.integers(1, 48), st.integers(1, 48),
                                  st.sampled_from([1, 3]))),
       st.sampled_from(["444", "422", "420"]))
def test_jpeg_roundtrip_any_uint8(a, sub):
    """Any uint8 image decodes to the right shape, stays uint8, and at
    q=95 the reconstruction error is bounded (DCT quantization only)."""
    from anomaly_detection_ray import jpeg
    src = a[:, :, 0] if a.shape[2] == 1 else a
    dec, meta = jpeg.decode_jpeg(jpeg.encode_jpeg(src, quality=95,
                                                  subsample=sub))
    assert dec.shape == (a.shape[0], a.shape[1], a.shape[2])
    assert dec.dtype == np.uint8
    assert (meta["height"], meta["width"]) == a.shape[:2]
    if a.shape[2] == 1:
        # grayscale has no chroma loss: error bounded by luma quantization
        # (q=95 steps are ~1/10 of Annex K; worst case sums quantization
        # error over all 64 coefficients — bound generous but universal)
        err = np.abs(dec.astype(int) - a.astype(int)).max()
        assert err <= 96


@settings(max_examples=30, deadline=None)
@given(st.lists(st.floats(-1e6, 1e6, allow_nan=False),
                min_size=1, max_size=300),
       st.floats(-1e5, 1e5, allow_nan=False),
       st.floats(0.0, 2e5, allow_nan=False))
def test_expectations_in_range_matches_numpy(vals, lo, width):
    """in_range violations == the numpy recomputation for ANY data/bounds,
    and flag_violations marks exactly those rows."""
    import pyarrow as pa
    import ray.data as rd

    from anomaly_detection_ray.stages import expectations as ex

    hi = lo + width
    x = np.asarray(vals, dtype=np.float64)
    df = pd.DataFrame({"x": x})
    ds = rd.from_arrow(pa.Table.from_pandas(df))
    suite = [{"check": "in_range", "column": "x", "min": lo, "max": hi}]
    res = ex.run_expectations(ds, suite)
    expected = int(((x < lo) | (x > hi)).sum())
    assert res["violations"].iloc[0] == expected
    flags = ex.flag_violations(ds, suite).to_pandas()
    got = flags.sort_values("x")["in_range:x__bad"].to_numpy()
    want = ((x < lo) | (x > hi))[np.argsort(x, kind="stable")]
    np.testing.assert_array_equal(got, want)


@settings(max_examples=60, deadline=None)
@given(arrays(np.float64, st.integers(1, 400),
              elements=st.floats(-200, 200, allow_nan=False)),
       st.floats(0.05, 1.0), st.floats(0.5, 5.0))
def test_cusum_prefix_scan_equals_recurrence(vals, k, h):
    """For ANY stream and (k, h), the vectorized prefix-scan CUSUM equals
    the sequential max(0, s + x) recurrence to float round-off (the two
    forms are algebraically identical but order operations differently —
    the SQL oracle computes the SAME scan form, so oracle parity is
    exact). Verdict codes must agree whenever the statistic is not within
    round-off of the threshold."""
    import math

    from anomaly_detection_ray.functions.rolling import cusum_check

    got = cusum_check(vals, UL=80.0, LL=20.0, k=k, h=h)
    sp = sn = 0.0
    for i, v in enumerate(vals):
        vn = 2.0 * (v - 50.0) / 60.0
        sp = max(0.0, sp + (vn - k))
        sn = max(0.0, sn + (-vn - k))
        assert math.isclose(got["s_pos"][i], sp, rel_tol=1e-9, abs_tol=1e-9)
        assert math.isclose(got["s_neg"][i], sn, rel_tol=1e-9, abs_tol=1e-9)
        if abs(sp - h) > 1e-9 and abs(sn - h) > 1e-9:
            assert (got["status_code"][i] == -1) == (sp > h or sn > h)


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="abcde ", max_size=25),
       st.text(alphabet="abcde ", max_size=25))
def test_levenshtein_metric_properties(a, b):
    """Distance is a metric: symmetric, zero iff equal, bounded by
    max(len) and by |len difference| below, and matches insertion count
    for prefix pairs."""
    from anomaly_detection_ray.stages.dedup import levenshtein

    d = levenshtein(a, b)
    assert d == levenshtein(b, a)
    assert (d == 0) == (a == b)
    assert abs(len(a) - len(b)) <= d <= max(len(a), len(b), 0)
    assert levenshtein(a, a + b) == len(b)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 50), min_size=1, max_size=2000),
       st.integers(4, 64), st.integers(1, 7))
def test_misra_gries_guarantee_any_stream(stream, k, n_chunks):
    """For ANY stream, chunking, and k: the chunked-partials + compact
    pipeline retains every key with true count > n/k, and lower bounds
    never exceed true counts."""
    from anomaly_detection_ray.functions.sketches import MisraGries

    arr = np.asarray(stream)
    parts = []
    for chunk in np.array_split(arr, min(n_chunks, len(arr))):
        if not len(chunk):
            continue
        mg = MisraGries(k)
        mg.add_many(chunk)
        ks, cs = mg.items()
        parts.append(pd.DataFrame({"v": ks, "n": cs}))
    m = pd.concat(parts).groupby("v", as_index=False)["n"].sum()
    cand, lb = MisraGries.compact(m["v"].to_numpy(), m["n"].to_numpy(), k)
    assert len(cand) <= k
    truth = pd.Series(arr).value_counts()
    must = set(truth[truth > len(arr) / k].index.tolist())
    assert must <= set(int(x) for x in cand)
    for key, c in zip(cand, lb):
        assert c <= truth.get(int(key), 0)


@settings(max_examples=20, deadline=None)
@given(st.floats(60.0, 900.0), st.floats(0.05, 0.9),
       st.sampled_from([8000, 16000, 44100]))
def test_pitch_recovers_any_tone(freq, amp, sr):
    """ACF pitch recovers ANY in-range fundamental within 2 Hz at any
    amplitude and sample rate (freq must stay below Nyquist/4 for the
    second-harmonic-free pure tone to be trackable)."""
    from anomaly_detection_ray.stages import audio_ops as ao
    t = np.arange(sr) / sr
    sig = amp * np.sin(2 * np.pi * freq * t)
    p = ao.pitch_f0(sig, sr)
    assert abs(p["f0_hz"] - freq) < 2.0
    assert p["voiced_conf"] > 0.7


@settings(max_examples=20, deadline=None)
@given(st.floats(0.01, 1.0), st.floats(0.01, 1.0))
def test_gated_loudness_gain_linearity(a1, a2):
    """Scaling a signal by g moves gated loudness by exactly 20·log10(g)
    (gating decisions are level-relative, so they shift together)."""
    from anomaly_detection_ray.stages import audio_ops as ao
    sr = 16000
    rng = np.random.default_rng(11)
    sig = rng.normal(0, 0.2, sr) * np.hanning(sr)
    l1 = ao.gated_loudness(a1 * sig, sr)["loudness_db"]
    l2 = ao.gated_loudness(a2 * sig, sr)["loudness_db"]
    want = 20.0 * (np.log10(a1) - np.log10(a2))
    assert abs((l1 - l2) - want) < 1e-6


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(alphabet="abcd ", min_size=0, max_size=40),
                min_size=1, max_size=30))
def test_bpe_encoder_counts_match_encode_word(texts):
    """For ANY corpus: the memoizing encoder's token counts equal the
    plain per-word encode_word (cache must be semantics-free)."""
    from anomaly_detection_ray.functions import bpe

    counts = pd.DataFrame({
        "word": pd.Series([w for t in texts
                           for w in bpe.WORD_RE.findall(t.lower())])
    })
    if counts.empty:
        return
    wc = counts.groupby("word").size().reset_index(name="cnt")
    rules = bpe.train_bpe(wc, num_merges=8, min_freq=1)
    enc = bpe.BpeEncoder(rules.to_dict("list"), cache_max=3)  # force resets
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = enc(df)
    for i, t in enumerate(texts):
        words = bpe.WORD_RE.findall(t.lower())
        want = sum(len(bpe.encode_word(w, rules)) for w in words)
        assert got["n_bpe_tokens"].iloc[i] == want


@settings(max_examples=120, deadline=None)
@given(st.data())
def test_nd_fold_partition_invariance(data):
    """Incremental non_decreasing: for ANY table (unique order keys, NaN
    holes) split into ANY file assignment (disjoint, interleaved, or
    tied ranges), per-file partials + the fold/recompute merge must equal
    the direct whole-table computation (pipelines/profile_store)."""
    from anomaly_detection_ray.pipelines.profile_store import (
        _nd_fold_group, _nd_group_stats)

    n = data.draw(st.integers(2, 50))
    ks = data.draw(st.permutations(list(range(n))))
    gs = data.draw(st.lists(st.integers(0, 2), min_size=n, max_size=n))
    vals = data.draw(st.lists(
        st.one_of(st.floats(-5, 5, allow_nan=False), st.just(np.nan)),
        min_size=n, max_size=n))
    files = data.draw(st.lists(st.integers(0, 3), min_size=n, max_size=n))
    df = pd.DataFrame({"k": ks, "g": [f"g{i}" for i in gs],
                       "val": vals, "file": files})

    want_n = want_v = 0
    for _, g in df.groupby("g"):
        x = g.sort_values("k")["val"].dropna().to_numpy()
        want_n += len(x)
        if len(x) > 1:
            want_v += int((np.diff(x) < 0).sum())

    rows = []
    for f, fd in df.groupby("file"):
        for gv, gd in fd.groupby("g"):
            stt = _nd_group_stats(gd, "val", "k")
            if stt is not None:
                rows.append((f, gv) + stt)
    got_n = got_v = 0
    if rows:
        parts = pd.DataFrame(rows, columns=[
            "_rel", "g", "n", "v", "ob_min", "ob_max", "first_v",
            "last_v"])
        for gv, g in parts.groupby("g"):
            n_, v_, rec = _nd_fold_group(g)
            if rec:  # interleaved/tied ranges: exact recompute
                sub = df[(df["g"] == gv) & df["file"].isin(g["_rel"])]
                stt = _nd_group_stats(sub, "val", "k")
                n_, v_ = (stt[0], stt[1]) if stt is not None else (0, 0)
            got_n += n_
            got_v += v_
    assert (got_n, got_v) == (want_n, want_v)


@settings(max_examples=40, deadline=None)
@given(arrays(np.float64, st.integers(16, 4000),
              elements=st.floats(-1.0, 1.0, allow_nan=False)),
       st.sampled_from([8000, 16000, 44100]))
def test_hygiene_stats_invariants(sig, sr):
    """For EVERY signal: dc_offset is exactly the mean, the subsonic
    share is a valid fraction, crest is non-negative (peak >= rms), and
    flat_top is a valid fraction including the peak sample itself."""
    from anomaly_detection_ray.stages import audio_ops as ao
    h = ao.hygiene_stats(sig, sr)
    assert h["dc_offset"] == float(np.asarray(sig, dtype=np.float64).mean())
    if h["sub20_ratio"] == h["sub20_ratio"]:
        assert -1e-12 <= h["sub20_ratio"] <= 1.0 + 1e-12
    if h["crest_db"] == h["crest_db"]:
        assert h["crest_db"] >= -1e-9
    if h["flat_top_ratio"] == h["flat_top_ratio"]:
        assert 0.0 < h["flat_top_ratio"] <= 1.0


@settings(max_examples=25, deadline=None)
@given(st.floats(0.15, 1.0), st.integers(0, 2**31 - 1))
def test_synth_rir_energy_budget(rt60, seed):
    """For EVERY (rt60, seed): the synthetic RIR has a unit direct path,
    finite tail energy, and its Schroeder-60 dB time tracks the planted
    rt60 within 20% (single noise realization)."""
    from anomaly_detection_ray.stages import audio_ops as ao
    sr = 16000
    h = ao.synth_rir(rt60, sr, seed)
    assert h[0] == 1.0
    assert np.isfinite(h).all()
    tail = h[1:]
    sch = np.cumsum((tail ** 2)[::-1])[::-1]
    db = 10.0 * np.log10(sch / sch[0])
    k = np.flatnonzero(db <= -60.0)
    t60 = (1 + (k[0] if len(k) else len(tail))) / sr
    assert abs(t60 - rt60) / rt60 < 0.2, (rt60, t60)


def test_encoding_audit_predicate_parity():
    """The encoding-audit predicates (engine pandas regex + unicodedata
    vs DuckDB regexp_matches + nfc_normalize) agree on planted defects:
    C0 control, U+FFFD, zero-width, non-ASCII, NFC-unstable."""
    import duckdb
    import unicodedata
    rows = ["clean ascii", "ctl\x07here", "repl�char",
            "zero​width", "café", "nfc é unstable",
            "tab\tand\nnewline ok"]
    s = pd.Series(rows)
    eng = (int(s.str.contains("[\x00-\x08\x0b\x0c\x0e-\x1f]").sum()),
           int(s.str.contains("�", regex=False).sum()),
           int(s.str.contains("[​‌‍﻿]").sum()),
           int(s.str.contains("[^\x00-\x7f]").sum()),
           int(sum(unicodedata.normalize("NFC", x) != x for x in s)))
    con = duckdb.connect()
    con.register("d", pd.DataFrame({"text": rows}))
    want = con.sql(r"""SELECT
      sum(CASE WHEN regexp_matches(text,'[\x00-\x08\x0b\x0c\x0e-\x1f]')
          THEN 1 ELSE 0 END),
      sum(CASE WHEN contains(text, chr(65533)) THEN 1 ELSE 0 END),
      sum(CASE WHEN regexp_matches(text, '[' || chr(8203) || chr(8204)
          || chr(8205) || chr(65279) || ']') THEN 1 ELSE 0 END),
      sum(CASE WHEN regexp_matches(text,'[^\x00-\x7f]')
          THEN 1 ELSE 0 END),
      sum(CASE WHEN nfc_normalize(text) <> text THEN 1 ELSE 0 END)
      FROM d""").fetchone()
    assert eng == tuple(int(x) for x in want)


@settings(max_examples=8, deadline=None)
@given(st.data())
def test_stats_apply_regimes_agree_any_frame(ray_session, data):
    """For ANY fact frame (random key cardinality, NaN values, string or
    int keys, keys with no stats row) the broadcast and join regimes of
    group_stats_apply must produce identical output — the elementwise-
    kernel contract, stressed far beyond the curated gate shapes."""
    import ray.data as rd

    from anomaly_detection_ray.stages.stats_apply import group_stats_apply

    n = data.draw(st.integers(5, 60))
    n_keys = data.draw(st.integers(1, 6))
    str_keys = data.draw(st.booleans())
    rng_seed = data.draw(st.integers(0, 2**31))
    rng = np.random.default_rng(rng_seed)
    keys = rng.integers(0, n_keys, size=n)
    if str_keys:
        key_vals = np.array([f"k{i}" for i in range(n_keys)])[keys]
    else:
        key_vals = keys.astype(np.int64)
    vals = rng.normal(size=n)
    vals[rng.random(n) < 0.2] = np.nan
    fact = pd.DataFrame({"rid": np.arange(n, dtype=np.int64),
                         "k": key_vals, "value": vals})

    # stats for a SUBSET of keys (some facts have no stats row)
    present = sorted(set(np.unique(keys)) - {n_keys - 1})
    stats = pd.DataFrame({
        "k": (np.array([f"k{i}" for i in present], dtype=object)
              if str_keys else np.array(present, dtype=np.int64)),
        "mu": rng.normal(size=len(present)),
        "sd": np.abs(rng.normal(size=len(present))) + 0.01})
    if data.draw(st.booleans()):
        stats.loc[stats.index[:1], "sd"] = 0.0  # zero-variance group

    def kernel(v, mu, sd):
        with np.errstate(invalid="ignore", divide="ignore"):
            z = (v - mu) / np.where(sd == 0.0, np.nan, sd)
        return {"z": z}

    outs = {}
    for mode in ("broadcast", "join"):
        ds = rd.from_pandas(fact).repartition(3)
        res = group_stats_apply(ds, stats, "k", ["mu", "sd"],
                                ["rid", "k"], kernel, mode=mode)
        outs[mode] = (res.to_pandas().sort_values("rid")
                      .reset_index(drop=True))
    a, b = outs["broadcast"], outs["join"]
    assert (a["rid"].to_numpy() == b["rid"].to_numpy()).all()
    za, zb = a["z"].to_numpy(np.float64), b["z"].to_numpy(np.float64)
    na, nb = np.isnan(za), np.isnan(zb)
    assert (na == nb).all()
    assert (za[~na] == zb[~nb]).all()  # bit-equal


@settings(max_examples=8, deadline=None)
@given(st.data())
def test_topk_per_group_matches_pandas_any_frame(ray_session, data):
    """For ANY frame and k: topk_per_group equals the pandas
    sort+head+rank reference, at any partition count (the local-candidate
    contract must be batch-boundary-invariant), including heavy ties and
    groups smaller than k."""
    import ray.data as rd

    from anomaly_detection_ray.stages.stats import topk_per_group

    n = data.draw(st.integers(1, 80))
    n_keys = data.draw(st.integers(1, 5))
    k = data.draw(st.integers(1, 6))
    tie_span = data.draw(st.integers(1, 4))  # small span => many ties
    seed = data.draw(st.integers(0, 2**31))
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "rid": np.arange(n, dtype=np.int64),
        "grp": rng.integers(0, n_keys, size=n).astype(np.int64),
        "score": rng.integers(0, tie_span, size=n).astype(np.int64)})

    want = (df.sort_values(["score", "rid"], ascending=[False, True],
                           kind="mergesort")
            .groupby("grp", sort=True).head(k)
            .sort_values(["grp", "score", "rid"],
                         ascending=[True, False, True])
            .reset_index(drop=True))

    parts = data.draw(st.sampled_from([1, 3, 7]))
    got = (topk_per_group(rd.from_pandas(df).repartition(parts),
                          "grp", "score", k=k, tiebreak="rid")
           .to_pandas()
           .sort_values(["grp", "score", "rid"],
                        ascending=[True, False, True])
           .reset_index(drop=True))
    assert (got["rid"].to_numpy() == want["rid"].to_numpy()).all()
    # rank is dense 1..k within each group in (score DESC, rid) order
    for _, g in got.sort_values(["grp", "rk"]).groupby("grp"):
        assert (g["rk"].to_numpy() == np.arange(1, len(g) + 1)).all()
