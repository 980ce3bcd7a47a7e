"""Audio-native operator tests: spectral kernels against known signals,
and the Ray actor-pool stages over the deterministic synth clip table."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from anomaly_detection_ray import audio, synth
from anomaly_detection_ray.stages import audio_ops as ao

SR = 16000


def tone(freq: float, dur_s: float = 1.0, sr: int = SR, amp: float = 0.5,
         phase: float = 0.0) -> np.ndarray:
    t = np.arange(int(sr * dur_s)) / sr
    return amp * np.sin(2 * np.pi * freq * t + phase)


# ---------------------------------------------------------------- kernels


def test_spectral_features_pure_tone():
    f = ao.spectral_features(tone(440.0), SR)
    assert abs(f["centroid_hz"] - 440.0) < 30.0
    assert abs(f["zcr"] - 880.0) < 40.0          # 2 crossings per cycle
    assert f["rolloff_hz"] < 600.0
    assert f["bandwidth_hz"] < 100.0
    assert f["flatness"] < 0.05                  # tonal => very peaked


def test_spectral_flatness_noise_vs_tone():
    noise = np.random.default_rng(0).uniform(-0.5, 0.5, SR)
    assert ao.spectral_features(noise, SR)["flatness"] > 0.5


def test_vad_silence_padding():
    sig = np.concatenate([np.zeros(int(0.2 * SR)), tone(440.0, 0.6),
                          np.zeros(int(0.2 * SR))])
    v = ao.vad_stats(sig, SR)
    assert 150.0 <= v["lead_silence_ms"] <= 250.0
    assert 150.0 <= v["trail_silence_ms"] <= 250.0
    assert 0.4 <= v["speech_ratio"] <= 0.8
    assert v["n_segments"] == 1


def test_vad_all_silence():
    v = ao.vad_stats(np.zeros(SR), SR)
    assert v["speech_ratio"] == 0.0 and v["n_segments"] == 0


def test_clipping_stats():
    clipped = np.clip(tone(440.0) * 5.0, -1.0, 1.0)
    c = ao.clipping_stats(clipped)
    assert c["clipping_ratio"] > 0.3
    assert ao.clipping_stats(tone(440.0))["clipping_ratio"] == 0.0


def test_fingerprint_phase_and_gain_invariant():
    a = ao.fingerprint(tone(440.0, phase=1.0), SR)
    b = ao.fingerprint(tone(440.0, phase=2.5), SR)
    c = ao.fingerprint(tone(440.0, amp=0.25, phase=0.3), SR)
    d = ao.fingerprint(tone(620.0), SR)
    assert a == b == c
    assert a != d


def test_resample_linear_tone():
    sig = tone(440.0)
    rs = ao.resample_linear(sig, SR, 11025)
    assert abs(len(rs) - 11025) <= 1
    ref = 0.5 * np.sin(2 * np.pi * 440.0 * (np.arange(len(rs)) / 11025))
    assert audio.snr_db(rs, ref) > 25.0


# --------------------------------------------------------------- stages


@pytest.fixture(scope="module")
def clip_ds(ray_session):
    return rd.from_arrow(synth.generate_table(seed=42, n=200, P=4))


def test_spectral_feature_table(clip_ds):
    out = ao.spectral_feature_table(clip_ds, concurrency=2).to_pandas()
    assert len(out) == 200
    assert set(out["aq_code"].unique()) <= {-1, 0, 1, 2}
    # every synth payload decodes (even truncated WAVs decode leniently);
    # sine clips are tonal (low flatness), corrupt_pcm noise clips are flat
    ok = out[out["aq_code"] == 1]
    assert len(ok) > 150
    tonal = ok[ok["flatness"] < 0.1]
    assert len(tonal) > 100
    # sr_range violations encode 48k-generated tones at 192 kHz => content
    # appears up to 4x higher; bound covers that
    assert tonal["centroid_hz"].between(150, 6000).all()
    assert (ok["clipping_ratio"] == 0.0).all()


def test_denoise_wiener_physics():
    """Decision-directed Wiener: big win on heavy noise, strong pure-
    noise attenuation, near-identity OLA resynthesis — and a documented
    processing floor that callers must gate (clean audio pinned as the
    case NOT to process)."""
    t = np.arange(SR * 2) / SR
    rng = np.random.default_rng(0)
    sig = 0.5 * np.sin(2 * np.pi * 300 * t)

    def snr(y, ref):
        return 10 * np.log10(np.mean(ref ** 2) / np.mean((y - ref) ** 2))

    noisy = sig + rng.normal(0, 0.2, len(t))          # ~5 dB input
    den = ao.denoise_wiener(noisy, SR)
    assert snr(den, sig) > snr(noisy, sig) + 4.0
    # pure noise collapses
    x = rng.normal(0, 0.05, SR * 2)
    red = 10 * np.log10(np.mean(ao.denoise_wiener(x, SR) ** 2)
                        / np.mean(x ** 2))
    assert red < -15.0
    # clean passthrough: resynthesis itself is near-identity...
    assert snr(ao.denoise_wiener(sig, SR), sig) > 60.0
    # ...but moderate-SNR audio is degraded by the processing floor —
    # the documented reason the prep option gates on snr_estimate
    mild = sig + rng.normal(0, 0.02, len(t))          # ~25 dB input
    assert snr(ao.denoise_wiener(mild, SR), sig) < snr(mild, sig)
    # short input: unchanged
    assert np.array_equal(ao.denoise_wiener(np.ones(10), SR), np.ones(10))


def test_declip_reconstruction_physics():
    """A hard-clipped sine recovers >20 dB of SNR; unclipped audio is
    untouched; a fully-clipped signal stays honestly clipped (no anchor
    points to reconstruct from)."""
    t = np.arange(SR) / SR
    true = np.sin(2 * np.pi * 220 * t)
    clipped = np.clip(true, -0.7, 0.7)

    def snr(y):
        return 10 * np.log10(np.mean(true ** 2) / np.mean((y - true) ** 2))

    rep, nfix = ao.declip(clipped, full_scale=0.7 * 0.999)
    assert nfix > 0
    assert snr(rep) > snr(clipped) + 20.0
    # peaks are RESTORED above the old rail (the whole point), tracking
    # the true amplitude
    assert 0.9 < np.abs(rep).max() < 1.1
    # clean signal: identity, zero repairs
    out, n0 = ao.declip(true * 0.5)
    assert n0 == 0 and np.array_equal(out, true * 0.5)
    # all-clipped: nothing to anchor on, returned unchanged
    flat, nf = ao.declip(np.ones(100), full_scale=0.999)
    assert nf == 0 and np.allclose(flat, 1.0)


def test_declip_table(clip_ds):
    out = ao.declip_table(clip_ds, concurrency=2,
                          full_scale=0.45).to_pandas()
    assert len(out) == 200
    fin = out.dropna(subset=["clip_ratio_before"])
    # synth tones peak ~0.5 > 0.45: real runs exist and repairs reduce
    # the ratio on the majority of decodable clips
    hit = fin[fin["clip_ratio_before"] > 0]
    assert len(hit) > 100
    assert (hit["clip_ratio_after"] <= hit["clip_ratio_before"]).all()
    assert (hit["n_repaired"] > 0).all()


def test_denoise_table(clip_ds):
    out = ao.denoise_table(clip_ds, concurrency=2,
                           below_snr_db=10.0).to_pandas()
    assert len(out) == 200
    fin = out.dropna(subset=["snr_before_db"])
    # corrupt_pcm noise clips sit far below the 10 dB gate and get
    # processed; pure-noise input collapses (energy drop, SNR reported
    # lower or unchanged is fine — blind SNR on residue is undefined)
    proc = fin[fin["denoised"]]
    assert len(proc) > 0
    assert (proc["energy_delta_db"] < -3.0).all()
    # clean tonal clips (blind SNR above the gate) are untouched
    clean = fin[~fin["denoised"]]
    assert len(clean) > 100
    assert (clean["energy_delta_db"] == 0.0).all()
    assert (clean["snr_after_db"] == clean["snr_before_db"]).all()


def test_vad_segments_boundaries():
    """Speech spans land on the constructed tone/silence boundaries
    (within a VAD frame + pad), intra-utterance pauses below min_gap
    stay inside one span, and pure silence yields no spans."""
    sig = np.concatenate([tone(300.0, 1.0), np.zeros(int(1.5 * SR)),
                          tone(440.0, 0.5)])
    spans = ao.vad_segments(sig, SR)
    assert len(spans) == 2
    tol = int(0.12 * SR)                         # frame + pad slack
    assert abs(spans[0][0] - 0) <= tol
    assert abs(spans[0][1] - SR) <= tol
    assert abs(spans[1][0] - int(2.5 * SR)) <= tol
    assert abs(spans[1][1] - len(sig)) <= tol
    # a 120 ms pause (< min_gap 200 ms) does NOT split the utterance
    sig2 = np.concatenate([tone(300.0, 0.5), np.zeros(int(0.12 * SR)),
                           tone(300.0, 0.5)])
    assert len(ao.vad_segments(sig2, SR)) == 1
    assert ao.vad_segments(np.zeros(SR), SR) == []
    assert ao.vad_segments(np.zeros(0), SR) == []


def test_snr_estimate_physics():
    """Blind SNR must track the constructed tone+noise SNR within ~1 dB
    from strong to weak signal, including AM modulation; pure noise
    reads strongly negative; the shared-STFT path equals the standalone
    path exactly."""
    t = np.arange(SR * 2) / SR
    rng = np.random.default_rng(3)
    for a, s in [(0.5, 0.005), (0.5, 0.02), (0.5, 0.1), (0.2, 0.1)]:
        x = a * np.sin(2 * np.pi * 300 * t) + rng.normal(0, s, len(t))
        true = 10 * np.log10((a * a / 2) / (s * s))
        assert abs(ao.snr_estimate(x, SR)["snr_db"] - true) < 1.0
    env = 0.5 * (1 + np.sin(2 * np.pi * 3 * t))
    x = 0.5 * env * np.sin(2 * np.pi * 300 * t) + rng.normal(0, .02, len(t))
    true = 10 * np.log10((0.25 * np.mean(env ** 2) / 2) / 4e-4)
    assert abs(ao.snr_estimate(x, SR)["snr_db"] - true) < 1.0
    assert ao.snr_estimate(rng.normal(0, .1, SR), SR)["snr_db"] < -10.0
    # shared-STFT path identity + edge cases
    P = ao.stft_mag(x, 512, 256) ** 2
    assert (ao.snr_estimate(x, SR, P=P)["snr_db"]
            == ao.snr_estimate(x, SR)["snr_db"])
    assert np.isnan(ao.snr_estimate(np.zeros(0), SR)["snr_db"])
    assert np.isfinite(ao.snr_estimate(tone(300.0, 0.01), SR)["snr_db"]) \
        or np.isinf(ao.snr_estimate(tone(300.0, 0.01), SR)["snr_db"])


def test_spectral_table_snr_columns(clip_ds):
    out = ao.spectral_feature_table(clip_ds, concurrency=2).to_pandas()
    ok = out[out["aq_code"] == 1]
    # clean synth tones: high SNR; corpus-wide majority decodable
    assert (ok["snr_db"] > 10.0).mean() > 0.8
    assert ok["noise_db"].notna().all()


def test_spectral_stage_bad_payload(ray_session):
    import pyarrow as pa
    ds = rd.from_arrow(pa.table({"clip_id": ["x", "y"],
                                 "bytes": [b"not-a-wav", b""]}))
    out = ao.spectral_feature_table(ds, concurrency=1).to_pandas()
    assert (out["aq_code"] == 2).all()  # Undefined: undecodable


def test_fingerprint_dedup_groups(clip_ds):
    out = ao.fingerprint_dedup(clip_ds, concurrency=2)
    # synth duplicates share their source's exact signal; clips with equal
    # tone frequency (index % 37) collide by design of the content hash
    assert len(out) > 10
    assert (out["cnt"] > 1).all()
    assert out["fp"].is_unique
    # every group keeps its lexicographically-first clip id
    assert out["keep_id"].str.startswith("clip-").all()


def test_fingerprint_dedup_matches_sequential(clip_ds):
    """Distributed groups == driver-side recompute over the same table."""
    df = clip_ds.to_pandas()
    fps = {}
    for _, r in df.iterrows():
        if not r["bytes"]:
            fps.setdefault(0, []).append(r["clip_id"])
            continue
        sig, sr = audio.decode_wav_lenient(r["bytes"])
        fp = 0 if sig is None or not sr else ao.fingerprint(sig, sr)
        fps.setdefault(fp, []).append(r["clip_id"])
    expected = {fp: (len(ids), min(ids)) for fp, ids in fps.items()
                if len(ids) > 1}
    got = ao.fingerprint_dedup(clip_ds, concurrency=2)
    assert {int(r.fp): (int(r.cnt), r.keep_id)
            for r in got.itertuples()} == expected


def test_fingerprint_neardup_pairs(clip_ds):
    pairs = ao.fingerprint_neardup_pairs(clip_ds, max_hamming=0,
                                         concurrency=2)
    # hamming==0 pairs must reproduce the exact-fp group structure over
    # DISTINCT clip ids (the pair pass dedupes identical ids in-bucket;
    # synth duplicate rows reuse their source's clip_id)
    df = clip_ds.to_pandas()
    fps = {}
    for _, r in df.iterrows():
        sig, sr = (audio.decode_wav_lenient(r["bytes"])
                   if r["bytes"] else (None, None))
        fp = 0 if sig is None or not sr else ao.fingerprint(sig, sr)
        fps.setdefault(fp, set()).add(r["clip_id"])
    n_pairs_expected = sum(len(s) * (len(s) - 1) // 2 for s in fps.values())
    assert len(pairs) == n_pairs_expected
    assert (pairs["hamming"] == 0).all()
    assert (pairs["id_a"] < pairs["id_b"]).all()


def test_segment_clips(ray_session):
    sig = tone(440.0, 1.0, sr=8000)
    wav = audio.encode_wav(sig, 8000)
    import pyarrow as pa
    ds = rd.from_arrow(pa.table({"clip_id": ["a", "b"],
                                 "bytes": [wav, wav]}))
    segs = ao.segment_clips(ds, seg_ms=250, concurrency=1).to_pandas()
    assert len(segs) == 8  # 2 clips x 4 segments
    assert sorted(segs["seg_idx"].unique()) == [0, 1, 2, 3]
    one = segs[(segs["clip_id"] == "a") & (segs["seg_idx"] == 2)].iloc[0]
    sig2, sr2 = audio.decode_wav(one["seg_bytes"])
    assert sr2 == 8000 and len(sig2) == 2000
    assert audio.snr_db(sig2, sig[4000:6000]) > 40.0


def test_resample_clips(ray_session):
    import pyarrow as pa
    wav = audio.encode_wav(tone(440.0, 1.0, sr=8000), 8000)
    ds = rd.from_arrow(pa.table({"clip_id": ["a"], "bytes": [wav]}))
    out = ao.resample_clips(ds, target_sr=16000, concurrency=1).to_pandas()
    assert int(out["n_samples_rs"].iloc[0]) == 16000
    sig, sr = audio.decode_wav(out["bytes_rs"].iloc[0])
    assert sr == 16000
    ref = 0.5 * np.sin(2 * np.pi * 440.0 * (np.arange(16000) / 16000))
    assert audio.snr_db(sig, ref) > 20.0


def test_mfcc_matches_naive_reference():
    """Vectorized MFCC equals a per-frame naive computation (explicit
    filter loop + direct DCT-II sum), and a pure tone concentrates energy
    in the filterbank bin containing its frequency."""
    from anomaly_detection_ray.stages import audio_ops as ao
    rng = np.random.default_rng(5)
    sr = 16000
    sig = rng.normal(0, 0.2, 4000) + np.sin(
        2 * np.pi * 440 * np.arange(4000) / sr)
    got = ao.mfcc(sig, sr, n_mels=20, n_mfcc=8)

    frames = ao.frame_signal(sig)
    win = np.hanning(ao.FRAME)
    fb = ao.mel_filterbank(sr, ao.FRAME, 20)
    want = np.zeros_like(got)
    for i in range(frames.shape[0]):
        p = np.abs(np.fft.rfft(frames[i] * win)) ** 2
        logmel = np.log(fb @ p + 1e-10)
        for k in range(8):
            c = np.sqrt(2.0 / 20) * np.cos(
                np.pi * k * (2 * np.arange(20) + 1) / 40.0)
            if k == 0:
                c *= np.sqrt(0.5)
            want[i, k] = (c * logmel).sum()
    np.testing.assert_allclose(got, want, rtol=1e-10)

    # tone energy lands in the mel filter whose center brackets 440 Hz
    tone = np.sin(2 * np.pi * 440 * np.arange(8000) / sr)
    p = (ao.stft_mag(tone) ** 2).mean(axis=0)
    energies = ao.mel_filterbank(sr, ao.FRAME, 20) @ p
    freqs = np.fft.rfftfreq(ao.FRAME, 1 / sr)
    assert abs(freqs[np.argmax(
        ao.mel_filterbank(sr, ao.FRAME, 20)[np.argmax(energies)])] - 440) < 300


def test_mel_features_stage(ray_session):
    """MelFeatures actor stage: long-form rows, 13 coefs per decodable
    clip, undecodable payloads skipped."""
    import pyarrow as pa
    import ray.data as rd

    from anomaly_detection_ray import audio
    from anomaly_detection_ray.stages.audio_ops import MelFeatures
    rng = np.random.default_rng(3)
    good = audio.encode_wav(rng.normal(0, 0.3, 2000), 16000)
    t = pa.table({"clip_id": ["a", "bad", "b"],
                  "bytes": [good, b"nope", good]})
    out = (rd.from_arrow(t)
           .map_batches(MelFeatures, fn_constructor_kwargs={},
                        batch_format="pyarrow", concurrency=1)
           .to_pandas())
    assert sorted(set(out["clip_id"])) == ["a", "b"]
    assert (out.groupby("clip_id")["coef"].count() == 13).all()
    a = out[out["clip_id"] == "a"].sort_values("coef")
    b = out[out["clip_id"] == "b"].sort_values("coef")
    np.testing.assert_array_equal(a["mfcc_mean"].to_numpy(),
                                  b["mfcc_mean"].to_numpy())


def test_sinc_resample_beats_linear_on_tone():
    """Downsampling a near-Nyquist tone: the Kaiser-sinc path reconstructs
    it far more faithfully than linear interpolation (SNR vs the analytic
    tone at the target rate), and both preserve duration."""
    from anomaly_detection_ray.stages import audio_ops as ao
    # non-integer ratio: linear interpolation must actually interpolate
    # (an integer decimation just picks samples and looks artificially
    # perfect on a clean tone)
    sr_from, sr_to, f = 44100, 16000, 5000.0
    n = 44100
    t = np.arange(n) / sr_from
    sig = np.sin(2 * np.pi * f * t)
    n_out = int(round(n * sr_to / sr_from))
    want = np.sin(2 * np.pi * f * np.arange(n_out) / sr_to)

    def snr(got):
        m = slice(200, len(want) - 200)  # ignore edge transients
        err = got[m] - want[m]
        return 10 * np.log10(np.mean(want[m] ** 2) / np.mean(err ** 2))

    lin = ao.resample_linear(sig, sr_from, sr_to)
    snc = ao.resample_sinc(sig, sr_from, sr_to)
    assert len(snc) == len(want) and len(lin) == len(want)
    assert snr(snc) > snr(lin) + 20  # >=20 dB better
    assert snr(snc) > 40


def test_gain_to_dbfs():
    from anomaly_detection_ray.stages import audio_ops as ao
    rng = np.random.default_rng(4)
    sig = rng.normal(0, 0.01, 8000)  # very quiet
    out = ao.gain_to_dbfs(sig, target_dbfs=-20.0)
    rms_db = 20 * np.log10(np.sqrt(np.mean(out ** 2)))
    assert abs(rms_db - (-20.0)) < 0.5
    # peak mode + limiter
    loud = ao.gain_to_dbfs(np.array([0.001, -0.002]), target_dbfs=0.0,
                           mode="peak")
    assert np.abs(loud).max() <= 0.999 + 1e-12
    assert ao.gain_to_dbfs(np.zeros(10)).sum() == 0.0  # silence: no-op


def test_gain_to_lufs_silence_immune():
    """LUFS-mode leveling targets gated loudness, so silence padding
    must not change the applied gain — the failure mode of RMS leveling
    on padded corpus clips (it over-amplifies by the pad ratio)."""
    sig = tone(300.0, 2.0, amp=0.05)             # quiet clip
    out = ao.gain_to_dbfs(sig, target_dbfs=-23.0, mode="lufs", sr=SR)
    assert abs(ao.gated_loudness(out, SR)["loudness_db"] - (-23.0)) < 0.3
    padded = np.concatenate([np.zeros(2 * SR), sig, np.zeros(2 * SR)])
    outp = ao.gain_to_dbfs(padded, target_dbfs=-23.0, mode="lufs", sr=SR)
    g = np.abs(out).max() / np.abs(sig).max()
    gp = np.abs(outp).max() / np.abs(sig).max()
    assert abs(20 * np.log10(gp / g)) < 1.0      # gain ~unchanged by pad
    rms = ao.gain_to_dbfs(padded, target_dbfs=-23.0, mode="rms")
    g_rms = np.abs(rms).max() / np.abs(sig).max()
    assert 20 * np.log10(g_rms / gp) > 3.0       # RMS over-amplifies
    # all-silence: no-op, and missing sr is an error
    assert ao.gain_to_dbfs(np.zeros(SR), mode="lufs", sr=SR).sum() == 0.0
    with pytest.raises(ValueError):
        ao.gain_to_dbfs(sig, mode="lufs")


def test_delta_matches_naive_htk_regression():
    """Vectorized delta == per-frame HTK regression formula with edge
    replication; delta of a linear ramp is the constant slope; CMVN output
    has per-coefficient mean ~0 / std ~1."""
    import numpy as np

    from anomaly_detection_ray.stages.audio_ops import cmvn, delta

    rng = np.random.default_rng(3)
    M = rng.normal(size=(12, 4))
    N = 2
    got = delta(M, N)
    denom = 2.0 * sum(n * n for n in range(1, N + 1))
    for t in range(len(M)):
        want = np.zeros(4)
        for n in range(1, N + 1):
            hi = M[min(t + n, len(M) - 1)]
            lo = M[max(t - n, 0)]
            want += n * (hi - lo)
        np.testing.assert_allclose(got[t], want / denom, atol=1e-12)

    ramp = np.outer(np.arange(10, dtype=float), np.ones(3)) * 2.5
    d = delta(ramp, 2)
    np.testing.assert_allclose(d[2:-2], 2.5, atol=1e-12)

    c = cmvn(M)
    np.testing.assert_allclose(c.mean(axis=0), 0.0, atol=1e-12)
    np.testing.assert_allclose(c.std(axis=0), 1.0, atol=1e-12)
    # degenerate: empty and constant input don't blow up
    assert delta(np.empty((0, 3))).shape == (0, 3)
    np.testing.assert_allclose(cmvn(np.ones((5, 2))), 0.0)


def test_mfcc_delta_stage_over_clips(ray_session):
    """MfccDeltaFeatures actor stage: 13 rows per decodable clip, finite
    dynamics, cmvn_delta_std positive for real signals."""
    import numpy as np
    import ray.data as rd

    from anomaly_detection_ray import synth
    from anomaly_detection_ray.stages.audio_ops import MfccDeltaFeatures

    tbl = synth.generate_batch(5, np.arange(6), 2)
    ds = rd.from_arrow(tbl.select(["clip_id", "bytes"]))
    out = ds.map_batches(MfccDeltaFeatures, batch_format="pyarrow",
                         concurrency=1, batch_size=8).to_pandas()
    per = out.groupby("clip_id").size()
    assert (per == 13).all() and len(per) >= 5
    assert np.isfinite(out[["delta_mean", "delta_std", "d2_std",
                            "cmvn_delta_std"]].to_numpy()).all()
    assert (out["cmvn_delta_std"] > 0).all()


def test_speaking_rate_stage_grades():
    """Speaking-rate grading on crafted metadata: OK band, fast warning,
    impossible error, too-slow-on-long-clip error, null transcript/dur
    undefined; payload column not required."""
    import numpy as np
    import pyarrow as pa

    from anomaly_detection_ray.functions.grading import (
        ERROR_CODE, OK_CODE, UNDEFINED_CODE, WARNING_CODE)
    from anomaly_detection_ray.stages.checks import speaking_rate_stage

    t = pa.table({
        "clip_id": [f"c{i}" for i in range(7)],
        "dur_ms": pa.array([10_000, 1_000, 1_000, 10_000, None, 2_000, 0],
                           type=pa.int32()),
        "transcript": ["hello world " * 10,   # 120 ch / 10 s = 12 cps OK
                       "x" * 25,              # 25 cps -> warning
                       "x" * 40,              # 40 cps -> error
                       "hi",                  # 0.2 cps on 10 s -> error
                       "anything",            # null dur -> undefined
                       None,                  # null transcript -> undefined
                       "text"],               # dur 0 -> error
    })
    out = speaking_rate_stage(t)
    assert out["sr_code"].to_pylist() == [
        OK_CODE, WARNING_CODE, ERROR_CODE, ERROR_CODE,
        UNDEFINED_CODE, UNDEFINED_CODE, ERROR_CODE]
    cps = out["chars_per_sec"].to_pylist()
    assert abs(cps[0] - 12.0) < 1e-9 and abs(cps[1] - 25.0) < 1e-9
    assert np.isnan(cps[4]) and np.isnan(cps[5])
    wpm = out["words_per_min"].to_pylist()
    assert abs(wpm[0] - 120.0) < 1e-9  # 20 words / 10 s


def test_augment_clips_deterministic_and_physical(ray_session):
    """Augmentation stage: 3 variants per decodable clip; speed 0.9/1.1
    changes length by ~1/speed; byte-identical across partitionings;
    noise at 20 dB SNR leaves RMS within a sane band of the gained
    signal."""
    import numpy as np
    import ray.data as rd

    from anomaly_detection_ray import audio, synth
    from anomaly_detection_ray.stages import audio_ops as ao

    tbl = synth.generate_batch(9, np.arange(5), 2)
    ds = rd.from_arrow(tbl.select(["clip_id", "bytes"]))

    def run(nparts):
        return (ao.augment_clips(ds.repartition(nparts), concurrency=2,
                                 emit_bytes=True)
                .to_pandas().sort_values(["clip_id", "variant"])
                .reset_index(drop=True))

    out = run(1)
    out2 = run(3)
    assert out.drop(columns=["aug_bytes"]).equals(
        out2.drop(columns=["aug_bytes"]))
    assert all(a == b for a, b in zip(out["aug_bytes"], out2["aug_bytes"]))

    per = out.groupby("clip_id").size()
    assert (per == 3).all()
    for cid, g in out.groupby("clip_id"):
        g = g.set_index("variant")
        n0 = g.loc[1, "n_samples"]  # speed 1.0
        assert abs(g.loc[0, "n_samples"] - n0 / 0.9) <= 5
        assert abs(g.loc[2, "n_samples"] - n0 / 1.1) <= 5
        # re-decodable payloads with matching sample counts
        sig, sr = audio.decode_wav(bytes(g.loc[1, "aug_bytes"]))
        assert len(sig) == n0 and sr > 0
    assert (out["rms"] > 0).all() and np.isfinite(out["rms"]).all()


def test_specaugment_deterministic_masks_and_mean_pull(ray_session):
    """SpecAugment stage: byte-identical across partitionings (seeded by
    clip_id only); mask widths within [0, t_max]x[0, f_max] per draw;
    masked_frac consistent with the reported mask sizes; masking with the
    clip mean pulls the post-mean toward the pre-mean."""
    import numpy as np
    import ray.data as rd

    from anomaly_detection_ray import synth
    from anomaly_detection_ray.stages import audio_ops as ao

    tbl = synth.generate_batch(11, np.arange(6), 2)
    ds = rd.from_arrow(tbl.select(["clip_id", "bytes"]))

    def run(nparts):
        return (ao.specaugment_clips(ds.repartition(nparts), concurrency=2)
                .to_pandas().sort_values("clip_id").reset_index(drop=True))

    out, out2 = run(1), run(3)
    assert out.equals(out2)
    assert len(out) >= 5

    n_mels = 26
    for _, r in out.iterrows():
        assert 0 <= r["time_masked"] <= 2 * 40
        assert 0 <= r["freq_masked"] <= 2 * 8
        # union-area identity: tm rows full + remaining rows x fm cols
        cells = (r["time_masked"] * n_mels
                 + (r["n_frames"] - r["time_masked"]) * r["freq_masked"])
        assert abs(r["masked_frac"] - cells / (r["n_frames"] * n_mels)) < 1e-5
        # mean-fill masking moves the mean toward itself: |post - pre|
        # bounded by the unmasked deviation, and exact when fully masked
        assert np.isfinite(r["logmel_mean_post"])
        if r["masked_frac"] == 1.0:
            assert abs(r["logmel_mean_post"] - r["logmel_mean"]) < 1e-5
    # with mean fill, post-mean deviation from pre-mean shrinks vs an
    # unmasked clip only when something was masked; just require sanity:
    assert (out["masked_frac"] > 0).any()


def test_mfcc_embedding_and_speaker_clusters_deterministic(ray_session):
    """MfccEmbedding emits one 26-dim row per decodable clip with a
    stable id hash; k-means over it is partitioning-invariant (the
    composition query's fixture contract)."""
    import numpy as np
    import ray.data as rd

    from anomaly_detection_ray import synth
    from anomaly_detection_ray.stages import audio_ops as ao
    from anomaly_detection_ray.stages import similarity as sim

    tbl = synth.generate_batch(13, np.arange(24), 2)
    ds = rd.from_arrow(tbl.select(["clip_id", "bytes"]))

    def run(nparts):
        feats = ao.mfcc_embedding_table(ds.repartition(nparts),
                                        concurrency=2).materialize()
        C = sim.kmeans_fit(feats, k=3, iters=3, id_col="cid", seed=0)
        return (sim.kmeans_assign(feats, C, id_col="clip_id").to_pandas()
                .sort_values("clip_id").reset_index(drop=True), C)

    (a, Ca), (b, Cb) = run(1), run(4)
    assert np.array_equal(Ca, Cb)
    assert a["cluster"].equals(b["cluster"])
    assert np.allclose(a["dist"], b["dist"], rtol=1e-9)
    emb = (ao.mfcc_embedding_table(ds, concurrency=2).to_pandas())
    assert (emb["embedding"].map(len) == 26).all()
    assert emb["cid"].dtype == np.int64 and (emb["cid"] >= 0).all()


def test_trim_silence_removes_padding_and_keeps_speech(ray_session):
    """A tone wrapped in digital silence trims to ~tone+pads; an
    all-silent clip yields n_samples_out 0; re-encoded payload decodes to
    the kept span; deterministic across partitionings."""
    import numpy as np
    import ray.data as rd

    from anomaly_detection_ray import audio
    from anomaly_detection_ray.stages import audio_ops as ao

    sr = 16000
    tone = 0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)  # 1 s
    sig = np.concatenate([np.zeros(sr // 2), tone, np.zeros(sr)])
    rows = {"clip_id": ["a", "b"],
            "bytes": [audio.encode_wav(sig, sr),
                      audio.encode_wav(np.zeros(sr), sr)]}
    import pandas as pd
    ds = rd.from_pandas(pd.DataFrame(rows))

    out = (ao.trim_silence(ds, concurrency=2, emit_bytes=True)
           .to_pandas().set_index("clip_id"))
    a = out.loc["a"]
    # kept span = tone +- (pad + frame) slack on each side
    slack = int(sr * 0.075) + 512
    assert abs(a["n_samples_out"] - sr) <= 2 * slack
    assert 0 < a["trim_lead_ms"] <= 500 and 0 < a["trim_trail_ms"] <= 1000
    dec, dsr = audio.decode_wav(bytes(a["trimmed_bytes"]))
    assert dsr == sr and len(dec) == a["n_samples_out"]
    assert float(np.abs(dec).max()) > 0.4  # the tone survived
    b = out.loc["b"]
    assert b["n_samples_out"] == 0 and bytes(b["trimmed_bytes"]) == b""

    out2 = (ao.trim_silence(ds.repartition(2), concurrency=2,
                            emit_bytes=True).to_pandas()
            .set_index("clip_id"))
    assert out.drop(columns="trimmed_bytes").equals(
        out2.drop(columns="trimmed_bytes"))


# ---------------------------------------------------------------- d-vector


def test_dvector_desaturates_and_separates(clip_ds):
    """The §11 claim: MFCC-stats clip embeddings saturate cosine on the
    tone corpus; the learned d-vector de-saturates it and recovers
    pseudo-speaker (index % 37) structure."""
    from anomaly_detection_ray.stages import dvector as dvm

    w = dvm.train_dvector(clip_ds, n_train=40, epochs=30, seed=0)
    emb = dvm.dvector_embedding_table(clip_ds, w, concurrency=2).to_pandas()
    assert len(emb) > 180                       # every decodable clip
    E = np.stack(emb["embedding"].to_numpy())
    assert E.shape[1] == dvm.DVEC_DIM
    np.testing.assert_allclose(np.linalg.norm(E, axis=1), 1.0, atol=1e-9)

    spk = emb["clip_id"].str[5:].astype(int).to_numpy() % 37
    S = E @ E.T
    np.fill_diagonal(S, -2.0)
    iu = np.triu_indices(len(E), 1)
    same = (spk[:, None] == spk[None, :])[iu]
    diff_cos = S[iu][~same]

    # de-saturation: the MFCC baseline measures p50 ~0.906 on this
    # corpus; the d-vector must push different-speaker cosine far down
    assert np.median(diff_cos) < 0.3
    # speaker structure: nearest neighbor is the same pseudo-speaker far
    # above chance (1/37 ≈ 0.03; measured 0.73 on this 200-clip corpus
    # where each speaker has only ~5 clips)
    nn_acc = (spk[S.argmax(axis=1)] == spk).mean()
    assert nn_acc > 0.6
    # and same-speaker pairs sit well above different-speaker pairs
    # (measured medians 0.49 vs -0.04)
    assert np.median(S[iu][same]) > np.median(diff_cos) + 0.3


def test_dvector_training_sample_is_order_independent(clip_ds):
    """The hash-slice training set must be identical at any partitioning
    (the n_train smallest md5 hashes, sorted) — weights therefore equal."""
    from anomaly_detection_ray.stages import dvector as dvm

    w1 = dvm.train_dvector(clip_ds, n_train=16, epochs=3, seed=0)
    w2 = dvm.train_dvector(clip_ds.repartition(7), n_train=16, epochs=3,
                           seed=0)
    for a, b in zip(w1["W"], w2["W"]):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(w1["mu"], w2["mu"])


# ------------------------------------------------------------------ pitch


def test_pitch_f0_known_tones():
    """ACF pitch on known fundamentals: exact within 1 Hz, harmonic mix
    resolves to the fundamental (not the octave), noise is unvoiced."""
    for f in [200.0, 440.0, 668.0]:
        p = ao.pitch_f0(tone(f), SR)
        assert abs(p["f0_hz"] - f) < 1.0, (f, p)
        assert p["voiced_conf"] > 0.8
    # fundamental + second harmonic (the synth corpus shape)
    mix = tone(260.0) + 0.2 * tone(520.0)
    p = ao.pitch_f0(mix, SR)
    assert abs(p["f0_hz"] - 260.0) < 1.0
    noise = np.random.default_rng(3).uniform(-0.5, 0.5, SR)
    assert ao.pitch_f0(noise, SR)["voiced_conf"] < 0.35


def test_pitch_table_matches_corpus_physics(clip_ds):
    """Over the synth table the estimated f0 must equal the generator's
    200 + (idx % 37)·13 Hz for the vast majority of decodable clips
    (violation classes — corrupt noise, aliasing sr lies — may differ)."""
    out = ao.pitch_table(clip_ds, concurrency=2).to_pandas()
    assert len(out) == 200
    got = out.dropna(subset=["f0_hz"])
    idx = got["clip_id"].str[5:].astype(int).to_numpy()
    want = 200.0 + (idx % 37) * 13.0
    ok = np.abs(got["f0_hz"].to_numpy() - want) < 2.0
    assert ok.mean() > 0.9, f"only {ok.mean():.2f} match physics"


# --------------------------------------------------------------- loudness


def k_response_db(freq: float, sr: int) -> float:
    """|H| of the K-weighting cascade at ``freq``, from the biquads."""
    sb, sa, hb, ha = ao.k_weighting_coeffs(sr)
    z = np.exp(-1j * 2 * np.pi * freq / sr)
    h = (np.polyval(sb[::-1], z) / np.polyval(sa[::-1], z)) \
        * (np.polyval(hb[::-1], z) / np.polyval(ha[::-1], z))
    return float(20.0 * np.log10(abs(h)))


def test_k_weighting_spec_tables():
    """The parametric design must reproduce the 48 kHz coefficient
    tables printed in ITU-R BS.1770-4 itself — two independent public
    sources agreeing pins both the analog parameters and the bilinear
    math, so the design is trustworthy at every other sample rate."""
    sb, sa, hb, ha = ao.k_weighting_coeffs(48000)
    np.testing.assert_allclose(
        sb, [1.53512485958697, -2.69169618940638, 1.19839281085285],
        atol=1e-12)
    np.testing.assert_allclose(
        sa, [1.0, -1.69065929318241, 0.73248077421585], atol=1e-12)
    np.testing.assert_allclose(hb, [1.0, -2.0, 1.0], atol=0)
    np.testing.assert_allclose(
        ha, [1.0, -1.99004745483398, 0.99007225036621], atol=1e-12)


def test_k_weight_fir_matches_direct_recurrence():
    """The truncated-FIR fft path must equal the exact IIR recurrence
    (dsp.lfilter) to float noise at every corpus sample rate."""
    from anomaly_detection_ray.functions import dsp
    for sr in (8000, 16000, 44100, 48000):
        x = np.random.default_rng(sr).normal(size=4000)
        sb, sa, hb, ha = ao.k_weighting_coeffs(sr)
        ref = dsp.lfilter(np.array(hb), np.array(ha),
                          dsp.lfilter(np.array(sb), np.array(sa), x))
        np.testing.assert_allclose(ao.k_weight(x, sr), ref, atol=1e-9)
    # lying sr headers (synth corpus ships them) must not blow up the
    # kernel length — design clamps to the standard audio range
    assert np.isfinite(ao.k_weight(np.ones(100), 2_000_000_000)).all()


def test_lufs_sine_values():
    """A full-scale 997 Hz sine measures amp dBFS - 0.691 + H(997) LUFS
    (the spec's worked construction); H(997) ~ 0 dB at 48 kHz."""
    t = np.arange(48000 * 3) / 48000.0
    r = ao.gated_loudness(np.sin(2 * np.pi * 997 * t), 48000)
    want = 10 * np.log10(0.5) - 0.691 + k_response_db(997.0, 48000)
    assert abs(r["loudness_db"] - want) < 0.05
    # the -0.691 offset exists exactly to cancel H at the 997 Hz
    # reference tone: a full-scale 997 Hz sine reads -3.01 LUFS
    assert abs(k_response_db(997.0, 48000) - 0.691) < 0.01
    assert abs(r["loudness_db"] - 10 * np.log10(0.5)) < 0.05


def test_gated_loudness_silence_immune():
    """THE property gating buys: padding a clip with silence must not
    drag integrated loudness down (ungated RMS would drop ~6 dB here)."""
    sig = tone(300.0, 2.0)                       # amp .5 -> ms=.125
    want = (10.0 * np.log10(0.125) - 0.691      # ≈ -9.03 dBFS -> LUFS
            + k_response_db(300.0, SR))
    base = ao.gated_loudness(sig, SR)
    assert abs(base["loudness_db"] - want) < 0.2
    padded = np.concatenate([np.zeros(2 * SR), sig, np.zeros(2 * SR)])
    pad = ao.gated_loudness(padded, SR)
    # boundary blocks straddling the silence edge survive the relative
    # gate (faithful BS.1770 partial-block behavior): ~0.6 dB here, vs
    # ~4.8 dB for ungated RMS over the same padded signal
    assert abs(pad["loudness_db"] - base["loudness_db"]) < 1.0
    ungated = 10.0 * np.log10((padded ** 2).mean())
    assert base["loudness_db"] - ungated > 3.0
    assert pad["n_gated"] > 0                    # silence blocks gated out
    # gain plan: quieter clip needs more gain, exactly the dB difference
    quiet = ao.gated_loudness(sig * 0.25, SR)    # -12 dB
    assert abs((base["loudness_db"] - quiet["loudness_db"]) - 12.04) < 0.1


def test_gated_loudness_edges():
    assert ao.gated_loudness(np.zeros(0), SR)["loudness_db"] == float("-inf")
    z = ao.gated_loudness(np.zeros(SR), SR)
    assert z["loudness_db"] == float("-inf")     # all blocks under -70
    short = ao.gated_loudness(tone(300.0, 0.05), SR)   # < one block
    assert np.isfinite(short["loudness_db"])


def test_loudness_table(clip_ds):
    out = ao.loudness_table(clip_ds, concurrency=2).to_pandas()
    assert len(out) == 200
    fin = out.dropna(subset=["loudness_db"])
    assert len(fin) > 150
    # synth tones are ~amp .5 (some sr-lied clips shift level slightly)
    assert fin["loudness_db"].between(-20, -3).mean() > 0.9
    # gain plan targets -23 dBFS by construction
    np.testing.assert_allclose(fin["gain_db"],
                               -23.0 - fin["loudness_db"], atol=1e-6)


def test_segment_clips_overlap(ray_session):
    """Sliding-window chunking: hop = seg - overlap; every consecutive
    pair of windows shares exactly overlap_ms of signal."""
    import pyarrow as pa
    sig = tone(440.0, 1.0, sr=8000)
    wav = audio.encode_wav(sig, 8000)
    ds = rd.from_arrow(pa.table({"clip_id": ["a"], "bytes": [wav]}))
    segs = (ao.segment_clips(ds, seg_ms=400, min_ms=400, overlap_ms=100,
                             concurrency=1).to_pandas()
            .sort_values("seg_idx").reset_index(drop=True))
    # hop 300 ms over 1000 ms -> starts 0,300,600 (900 leaves only 100ms)
    assert segs["seg_start_ms"].tolist() == [0.0, 300.0, 600.0]
    assert (segs["seg_dur_ms"] == 400.0).all()
    a, _ = audio.decode_wav(segs["seg_bytes"].iloc[0])
    b, _ = audio.decode_wav(segs["seg_bytes"].iloc[1])
    np.testing.assert_allclose(a[2400:3200], b[:800], atol=2e-4)
    with pytest.raises(ValueError):
        ao.SegmentClips(seg_ms=400, overlap_ms=400)


def _clicks(bpm, dur=8.0, sr=SR, namp=0.0):
    x = np.zeros(int(dur * sr))
    period = int(60.0 / bpm * sr)
    for s in range(0, len(x) - 200, period):
        t = np.arange(200) / sr
        x[s:s + 200] += np.sin(2 * np.pi * 1000 * t) * np.exp(-t * 80)
    if namp:
        x = x + np.random.default_rng(1).normal(0, namp, len(x))
    return x


def test_tempo_estimate_physics():
    """Click tracks at known BPM recover within 1 BPM (noisy within 2);
    steady tones, silence, and white noise honestly report NaN — the
    documented flux and clarity gates."""
    for bpm in (90, 120, 150):
        assert abs(ao.tempo_estimate(_clicks(bpm), SR)["bpm"] - bpm) < 1.0
    r = ao.tempo_estimate(_clicks(120, namp=0.1), SR)
    assert abs(r["bpm"] - 120) < 2.0 and r["pulse_clarity"] > 0.25
    tone = 0.5 * np.sin(2 * np.pi * 440 * np.arange(SR * 4) / SR)
    assert np.isnan(ao.tempo_estimate(tone, SR)["bpm"])
    assert np.isnan(ao.tempo_estimate(np.zeros(SR * 2), SR)["bpm"])
    noise = np.random.default_rng(0).normal(0, 0.1, SR * 4)
    assert np.isnan(ao.tempo_estimate(noise, SR)["bpm"])
    # short input: NaN, no crash
    assert np.isnan(ao.tempo_estimate(np.ones(100), SR)["bpm"])


def test_time_stretch_physics():
    """WSOLA changes duration by 1/rate while preserving pitch — the
    property that distinguishes it from resampling (which scales f0 by
    the rate). Rate 1 is a copy."""
    t = np.arange(SR * 2) / SR
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)
    for rate in (0.8, 1.25):
        y = ao.time_stretch(tone, SR, rate)
        assert abs(len(y) * rate / len(tone) - 1.0) < 0.05
        assert abs(ao.pitch_f0(y, SR)["f0_hz"] - 440.0) < 2.0
        # resampling by the same rate shifts pitch: the contrast case
        rs = ao.resample_linear(tone, SR, int(SR / rate))
        assert abs(ao.pitch_f0(rs, SR)["f0_hz"] - 440.0 * rate) < 5.0
    assert np.array_equal(ao.time_stretch(tone, SR, 1.0), tone)
    with pytest.raises(ValueError):
        ao.time_stretch(tone, SR, 0.0)


def test_codec_telephone_physics():
    """G.711 mu-law round-trip SNR ~38 dB on a half-scale sine with <=
    2^bits distinct levels; the telephone channel keeps the voice band
    (1 kHz survives) and kills out-of-band content (100 Hz, 6 kHz)."""
    t = np.arange(SR * 2) / SR
    sn = 0.5 * np.sin(2 * np.pi * 1000 * t)
    y = ao.mu_law_roundtrip(sn)
    assert 10 * np.log10(np.mean(sn ** 2) / np.mean((y - sn) ** 2)) > 30.0
    assert len(np.unique(y)) <= 256
    # coarse quantizer: worse SNR, fewer levels (monotone sanity)
    y4 = ao.mu_law_roundtrip(sn, bits=4)
    assert len(np.unique(y4)) <= 16
    assert (10 * np.log10(np.mean(sn ** 2) / np.mean((y4 - sn) ** 2))
            < 10 * np.log10(np.mean(sn ** 2) / np.mean((y - sn) ** 2)))

    def ratio(f):
        s = 0.5 * np.sin(2 * np.pi * f * t)
        out = ao.codec_telephone(s, SR)
        return np.mean(out ** 2) / np.mean(s ** 2)

    assert ratio(1000.0) > 0.7
    assert ratio(100.0) < 1e-3
    assert ratio(6000.0) < 1e-3
    assert len(ao.codec_telephone(np.zeros(0), SR)) == 0


def test_tempo_stretch_codec_tables(clip_ds):
    tempo = ao.tempo_table(clip_ds, concurrency=2).to_pandas()
    assert len(tempo) == 200
    # synth corpus is steady tones/noise — no rhythmic content, so the
    # honest answer is NaN bpm everywhere (the gates working at scale)
    assert tempo["bpm"].isna().mean() > 0.9

    st = ao.stretch_table(clip_ds, concurrency=2,
                          rates=(0.9, 1.1)).to_pandas()
    fin = st.dropna(subset=["f0_before"])
    fin = fin[fin["f0_before"] > 0]
    assert len(fin) > 100
    # duration ratio tracks 1/rate and pitch is preserved per variant
    assert ((fin["dur_ratio"] * fin["rate"] - 1.0).abs() < 0.12).all()
    ok = (fin["f0_after"] - fin["f0_before"]).abs() < 0.05 * fin["f0_before"]
    assert ok.mean() > 0.9

    cd = ao.codec_table(clip_ds, concurrency=2).to_pandas()
    fin = cd.dropna(subset=["codec_snr_db"])
    assert len(fin) > 150
    # narrowband channel: energy never grows above the original
    assert (fin["energy_ratio"] < 1.5).all()


# ------------------------------------------------------- audit kernels

def test_hum_stats_detects_planted_mains_hum():
    """50 Hz hum (plus harmonic) planted at -20 dB under broadband noise
    must read near its true level in hum_db_50 and far above hum_db_60;
    clean noise must sit well below any flag threshold."""
    from anomaly_detection_ray.stages.audio_ops import hum_stats

    sr = 16000
    rng = np.random.default_rng(5)
    t = np.arange(sr * 2) / sr
    noise = rng.normal(scale=0.1, size=len(t))
    hum = 0.1 * np.sin(2 * np.pi * 50 * t) + 0.03 * np.sin(2 * np.pi * 100 * t)
    h = hum_stats(noise + hum, sr)
    # planted 50 Hz power ≈ (0.1²+0.03²)/2 vs total ≈ noise 0.01 + hum
    assert h["hum_db_50"] > -6.0
    assert h["hum_db_50"] > h["hum_db_60"] + 10.0
    clean = hum_stats(noise, sr)
    assert clean["hum_db_50"] < -25.0 and clean["hum_db_60"] < -25.0


def test_click_stats_counts_planted_impulses():
    from anomaly_detection_ray.stages.audio_ops import click_stats

    sr = 16000
    t = np.arange(sr) / sr
    sig = 0.3 * np.sin(2 * np.pi * 220 * t)
    for pos in (2000, 7000, 12000):
        sig[pos] += 0.8
    c = click_stats(sig, sr)
    assert c["n_clicks"] == 3
    assert abs(c["clicks_per_sec"] - 3.0) < 1e-9
    smooth = click_stats(0.3 * np.sin(2 * np.pi * 220 * t), sr)
    assert smooth["n_clicks"] == 0
    silent = click_stats(np.zeros(sr), sr)
    assert silent["n_clicks"] == 0


def test_audio_audit_transcript_consistency(ray_session):
    """Cross-modal verdicts: speech+empty transcript => Error; transcript
    over silence => Error; speech+transcript => OK (clean synth tone)."""
    import pyarrow as pa
    import ray.data as rd

    from anomaly_detection_ray import audio
    from anomaly_detection_ray.stages.audio_ops import audio_audit_table

    sr = 16000
    rng = np.random.default_rng(9)
    t = np.arange(sr) / sr
    # speech-like: modulated tone bursts (active frames >> silence)
    speech = (0.4 * np.sin(2 * np.pi * 217 * t)
              * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
              + rng.normal(scale=0.01, size=len(t)))
    silence = rng.normal(scale=1e-5, size=len(t))
    tbl = pa.table({
        "clip_id": ["speech_no_text", "silence_with_text", "clean"],
        "bytes": [audio.encode_wav(speech, sr),
                  audio.encode_wav(silence, sr),
                  audio.encode_wav(speech, sr)],
        "transcript": [None, "a perfectly normal transcript", "hello world"],
    })
    out = (audio_audit_table(rd.from_arrow(tbl), concurrency=2,
                             batch_size=2)
           .to_pandas().set_index("clip_id"))
    assert out.loc["speech_no_text", "audit_code"] == -1
    assert "without transcript" in out.loc["speech_no_text", "audit_status"]
    assert out.loc["silence_with_text", "audit_code"] == -1
    assert "without speech" in out.loc["silence_with_text", "audit_status"]
    assert out.loc["clean", "audit_code"] == 1


def test_bandwidth_check_flags_upsampled_clip(ray_session):
    """A genuinely 16 kHz broadband clip passes; the SAME content
    band-limited to 4 kHz then linearly upsampled back to 16 kHz claims
    the rate but fails the effective-bandwidth audit."""
    import pyarrow as pa
    import ray.data as rd

    from anomaly_detection_ray import audio
    from anomaly_detection_ray.stages.audio_ops import (bandwidth_table,
                                                        resample_sinc)

    sr = 16000
    rng = np.random.default_rng(21)
    broadband = rng.normal(scale=0.2, size=sr * 2)
    low = resample_sinc(broadband, sr, 4000)       # hard 2 kHz ceiling
    upsampled = resample_sinc(low, 4000, sr)       # fake 16 kHz
    tbl = pa.table({
        "clip_id": ["real16k", "fake16k"],
        "bytes": [audio.encode_wav(np.clip(broadband, -0.99, 0.99), sr),
                  audio.encode_wav(np.clip(upsampled, -0.99, 0.99), sr)]})
    out = (bandwidth_table(rd.from_arrow(tbl), concurrency=2, batch_size=2)
           .to_pandas().set_index("clip_id"))
    assert out.loc["real16k", "bw_code"] == 1
    assert out.loc["real16k", "bw_ratio"] > 0.8
    assert out.loc["fake16k", "bw_code"] == 0
    assert out.loc["fake16k", "bw_ratio"] < 0.35
    assert "below Nyquist" in out.loc["fake16k", "bw_status"]


# ----------------------------------------------------------------- reverb


def test_rt60_estimate_physics():
    """Blind RT60 on synthesized exponentially decaying noise recovers
    the planted decay time within 15% across the audit's design range —
    pure physics, no reference to the estimator itself. Energy envelope
    e^{-2t/tau} falls 60 dB at t = tau * 3 ln 10."""
    rng = np.random.default_rng(11)
    for rt60 in [0.25, 0.4, 0.7]:
        tau = rt60 / (3.0 * np.log(10.0))
        n = int(2.0 * SR)
        t = np.arange(n) / SR
        sig = np.concatenate([
            rng.uniform(-0.5, 0.5, SR // 4),              # sustain head
            rng.standard_normal(n) * 0.5 * np.exp(-t / tau)])
        est = ao.rt60_estimate(sig, SR)
        assert abs(est["rt60_s"] - rt60) / rt60 < 0.15, (rt60, est)
        assert est["fit_r2"] > 0.9
        assert est["decay_db"] >= 25.0


def test_rt60_nan_on_sustained_tone():
    """A tone sustained to the last sample has no free-decay region —
    the estimator must say NaN, not invent a number."""
    est = ao.rt60_estimate(tone(300.0, dur_s=1.0), SR)
    assert np.isnan(est["rt60_s"])


def test_synth_rir_schroeder_decay():
    """The synthetic RIR's Schroeder curve (backward-integrated energy)
    must fall 60 dB at t = rt60 within 10% — the augmentation plants
    what it claims to plant."""
    for rt60 in [0.3, 0.6]:
        h = ao.synth_rir(rt60, SR, seed=5)
        tail = h[1:]                       # exclude the unit direct path
        sch = np.cumsum((tail ** 2)[::-1])[::-1]
        db = 10.0 * np.log10(sch / sch[0])
        k = np.flatnonzero(db <= -60.0)
        t60 = (1 + (k[0] if len(k) else len(tail))) / SR
        assert abs(t60 - rt60) / rt60 < 0.10, (rt60, t60)


def test_reverb_table_recovers_planted_rt60(clip_ds):
    """End-to-end on the distributed path: augment each synth clip with
    its seeded RIR, blind-estimate from the wet signal, and require the
    estimate to track the planted RT60 on most decodable clips that are
    long enough to expose the full decay."""
    out = ao.reverb_table(clip_ds, concurrency=2).to_pandas()
    assert out["clip_id"].notna().all()
    got = out.dropna(subset=["rt60_s"])
    # clips shorter than the RIR tail can't show the full decay window
    got = got[got["wet_ms"] >= 1200]
    assert len(got) >= 50
    rel = np.abs(got["rt60_s"] - got["rt60_true_s"]) / got["rt60_true_s"]
    assert (rel < 0.3).mean() > 0.8, rel.describe()
    # determinism across partitioning (seeded RIR, pure kernels); sort
    # by ALL columns — planted 'dup' rows share a clip_id with different
    # metadata/payload, so a single-key sort has undefined tie order
    out2 = ao.reverb_table(clip_ds.repartition(7),
                           concurrency=2).to_pandas()
    cols = list(out.columns)
    a = out.sort_values(cols).reset_index(drop=True)
    b = out2.sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------- hygiene


def test_hygiene_planted_defects():
    """Planted capture defects measured back: DC bias reads as itself,
    subsonic rumble dominates the sub-20 Hz share, limiting raises the
    flat-top ratio and drops the crest factor, and a clean tone passes
    with near-zero offset/rumble."""
    clean = tone(300.0, dur_s=2.0)
    h = ao.hygiene_stats(clean, SR)
    assert abs(h["dc_offset"]) < 1e-6
    assert h["sub20_ratio"] < 1e-6
    assert abs(h["crest_db"] - 3.01) < 0.1          # sine crest = 3.01 dB
    # DC bias
    h = ao.hygiene_stats(clean + 0.05, SR)
    assert abs(h["dc_offset"] - 0.05) < 1e-3
    # 8 Hz rumble at matched amplitude -> roughly half the AC energy
    t = np.arange(len(clean)) / SR
    h = ao.hygiene_stats(clean + 0.5 * np.sin(2 * np.pi * 8.0 * t), SR)
    assert h["sub20_ratio"] > 0.4
    # hard limiting: clamp at 60% of peak
    lim = np.clip(clean, -0.3, 0.3)
    hl = ao.hygiene_stats(lim, SR)
    hc = ao.hygiene_stats(clean, SR)
    assert hl["crest_db"] < hc["crest_db"] - 1.0
    assert hl["flat_top_ratio"] > hc["flat_top_ratio"] + 0.1


def test_hygiene_table_grades(clip_ds):
    """Over the synth table: decodable clips grade OK (the generator
    plants no DC/rumble), undecodable payloads grade Error2, and a
    doctored DC-biased clip grades Warning1."""
    out = ao.hygiene_table(clip_ds, concurrency=2).to_pandas()
    assert len(out) == 200
    ok = out[out["hy_code"] == 1]
    assert len(ok) > 150
    assert (ok["dc_offset"].abs() < 0.02).all()
    # doctored: DC-biased payload through the same stage
    sig = tone(250.0) + 0.1
    t = rd.from_arrow(__import__("pyarrow").table({
        "clip_id": ["biased"], "bytes": [audio.encode_wav(sig, SR)]}))
    row = ao.hygiene_table(t, concurrency=1).to_pandas().iloc[0]
    assert row["hy_code"] == 0 and "DC offset" in row["hy_status"]


def test_true_peak_intersample():
    """A sine whose samples straddle the crest has a sample peak well
    below its true peak: at f = sr/4 with phase pi/4, samples hit
    +-0.7071 while the waveform reaches 1.0 — dBTP must see ~0 dB where
    the sample peak reads -3 dB. A DC-safe low-frequency tone's true
    peak matches its sample peak within the interpolator's ripple."""
    n = np.arange(4 * SR)
    hot = np.sin(2 * np.pi * (SR / 4) * n / SR + np.pi / 4)
    samp_db = 20 * np.log10(np.abs(hot).max())
    tp = ao.true_peak_dbtp(hot, SR)
    assert samp_db < -2.9
    assert abs(tp - 0.0) < 0.2, tp
    low = tone(100.0, dur_s=1.0)                  # crest well-sampled
    assert abs(ao.true_peak_dbtp(low, SR)
               - 20 * np.log10(np.abs(low).max())) < 0.05


def test_wow_flutter_planted_modulation():
    """Planted FM read back through the modulation spectrum: a 3 Hz /
    40-cent vibrato reports in the wow band at its rate and (after the
    sinc-rolloff correction) its depth; a 12 Hz / 25-cent flutter the
    same in the flutter band; a clean tone reports near-zero depth in
    both; noise reports NaN (unpitched), not an invented number."""
    dur = 3.0
    t = np.arange(int(dur * SR)) / SR

    def fm_tone(f0, fm, depth_cents):
        inst = f0 * 2.0 ** (depth_cents / 1200.0
                            * np.sin(2 * np.pi * fm * t))
        return 0.5 * np.sin(2 * np.pi * np.cumsum(inst) / SR)

    r = ao.wow_flutter(fm_tone(220.0, 3.0, 40.0), SR)
    assert abs(r["wow_hz"] - 3.0) < 0.4
    assert abs(r["wow_cents"] - 40.0) < 6.0
    assert r["flutter_cents"] < 5.0

    r = ao.wow_flutter(fm_tone(220.0, 12.0, 25.0), SR)
    assert abs(r["flutter_hz"] - 12.0) < 0.7
    assert abs(r["flutter_cents"] - 25.0) < 5.0
    assert r["wow_cents"] < 5.0

    r = ao.wow_flutter(0.5 * np.sin(2 * np.pi * 220.0 * t), SR)
    assert r["wow_cents"] < 3.0 and r["flutter_cents"] < 3.0
    assert abs(r["f0_med_hz"] - 220.0) < 2.0

    rng = np.random.default_rng(0)
    r = ao.wow_flutter(rng.normal(0, 0.1, int(dur * SR)), SR)
    assert r["f0_med_hz"] != r["f0_med_hz"]          # NaN


def test_wow_flutter_table_grades(clip_ds):
    """Over the synth table (stable tones): pitched clips grade OK with
    low modulation depth; a doctored wobbling clip grades Warning1; an
    undecodable payload grades Error2."""
    out = ao.wow_flutter_table(clip_ds, concurrency=2).to_pandas()
    assert len(out) == 200
    ok = out[out["wf_code"] == 1]
    assert len(ok) > 100
    assert (ok["wow_cents"].dropna() < 20.0).all()

    t = np.arange(3 * SR) / SR
    inst = 300.0 * 2.0 ** (60.0 / 1200.0 * np.sin(2 * np.pi * 2.0 * t))
    wob = 0.5 * np.sin(2 * np.pi * np.cumsum(inst) / SR)
    import pyarrow as _pa
    ds = rd.from_arrow(_pa.table({
        "clip_id": ["wobble", "broken"],
        "bytes": [audio.encode_wav(wob, SR), b"not a wav"]}))
    rows = (ao.wow_flutter_table(ds, concurrency=1).to_pandas()
            .set_index("clip_id"))
    assert rows.loc["wobble", "wf_code"] == 0
    assert "modulation" in rows.loc["wobble", "wf_status"]
    assert rows.loc["broken", "wf_code"] == -1
    assert rows.loc["broken", "wf_status"].startswith("Error2")


def test_full_audit_agrees_with_individual_stages(clip_ds):
    """The fused one-decode battery must reproduce each individual audit
    stage's flags exactly — same kernels, same thresholds, one decode."""
    fused = (ao.full_audit_table(clip_ds, concurrency=2).to_pandas()
             .set_index("clip_id").sort_index())
    assert len(fused) == 200

    aa = (ao.audio_audit_table(
        clip_ds, concurrency=2).to_pandas()
        .set_index("clip_id").sort_index())
    # cross-modal: fused xm_flag=1 <=> AudioAudit graded Error
    assert ((fused["xm_flag"] == 1) == (aa["audit_code"] == -1)).all()

    hy = (ao.hygiene_table(clip_ds.drop_columns(["transcript"]),
                           concurrency=2).to_pandas()
          .set_index("clip_id").sort_index())
    graded = fused["hy_flag"] >= 0
    assert ((fused.loc[graded, "hy_flag"] == 1)
            == (hy.loc[graded, "hy_code"] == 0)).all()

    bw = (ao.bandwidth_table(clip_ds.drop_columns(["transcript"]),
                             concurrency=2).to_pandas()
          .set_index("clip_id").sort_index())
    both = (fused["bw_flag"] >= 0) & (bw["bw_code"] != 2)
    assert ((fused.loc[both, "bw_flag"] == 1)
            == (bw.loc[both, "bw_code"] == 0)).all()

    wf = (ao.wow_flutter_table(clip_ds.drop_columns(["transcript"]),
                               concurrency=2).to_pandas()
          .set_index("clip_id").sort_index())
    both = fused["wf_flag"] >= 0
    assert ((fused.loc[both, "wf_flag"] == 1)
            == (wf.loc[both, "wf_code"] == 0)).all()

    # undecodable payloads stay Undefined everywhere
    assert (fused.loc[fused["qa_code"] == 2,
                      ["xm_flag", "hy_flag", "bw_flag", "wf_flag"]]
            .eq(-1).all().all())
