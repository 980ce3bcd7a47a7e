"""Synthetic clip table + audio codec tests (FIXTURES.md §B)."""

import numpy as np
import pyarrow.compute as pc

from anomaly_detection_ray import audio, synth

SEED = 42
N = 1200
P = 16


def table():
    if not hasattr(table, "_t"):
        table._t = synth.generate_table(SEED, N, P)
    return table._t


def test_wav_roundtrip_snr():
    sig = audio.clip_signal(SEED, 7, 16000, 500)
    wav = audio.encode_wav(sig, 16000)
    dec, sr = audio.decode_wav(wav)
    assert sr == 16000
    assert len(dec) == len(sig)
    assert audio.snr_db(dec, sig) > 40  # 16-bit quantization ≈ 90 dB


def test_snr_detects_noise():
    sig = audio.clip_signal(SEED, 7, 16000, 500)
    rng = np.random.default_rng(0)
    noise = rng.uniform(-0.5, 0.5, len(sig))
    assert audio.snr_db(noise, sig) < 10


def test_determinism():
    t1 = synth.generate_batch(SEED, np.arange(100, 200), P)
    t2 = synth.generate_batch(SEED, np.arange(100, 200), P)
    assert t1.equals(t2)
    # batch-split invariance: generating in two halves gives identical rows
    a = synth.generate_batch(SEED, np.arange(100, 150), P)
    assert t1.slice(0, 50).equals(a)


def test_schema():
    t = table()
    assert t.schema.equals(synth.CLIP_SCHEMA)
    assert t.num_rows == N


def test_ground_truth_matches_table():
    t = table()
    gt = synth.ground_truth(SEED, N, P)
    ids = t["clip_id"].to_pylist()
    # duplicates: every 'dup' row repeats an earlier clip's id
    for i in gt["dup"]:
        src = synth.dup_source(SEED, np.array([i]))[0]
        assert ids[i] == f"clip-{src:09d}" and src < i
    # missing transcripts
    tr = t["transcript"].to_pylist()
    for i in gt["missing_transcript"]:
        assert tr[i] in ("", None)
    # sr out of range
    sr = t["sr_hz"].to_pylist()
    for i in gt["sr_range"]:
        assert sr[i] in (900, 192000)
    for i in gt["null_meta"]:
        assert sr[i] is None
    # truncated bytes: length mismatch vs expected
    for i in gt["truncated"]:
        row_sr, row_dur = sr[i], t["dur_ms"][i].as_py()
        blen = len(t["bytes"][i].as_py())
        exp = audio.WAV_HEADER_BYTES + 2 * min(
            int(round(row_sr * row_dur / 1000.0)), synth.MAX_SAMPLES)
        assert blen != exp


def test_clean_rows_fidelity():
    """Non-corrupted rows decode with SNR >= 30 dB vs the regenerated signal,
    and transcript equals the regenerated token sequence (BASELINE.json
    per-row invariant)."""
    t = table()
    gt = synth.ground_truth(SEED, N, P)
    bad = set(np.concatenate([v for k, v in gt.items() if k != "drift_partition"]))
    checked = 0
    for i in range(0, N, 37):
        if i in bad:
            continue
        sr = t["sr_hz"][i].as_py()
        dur = t["dur_ms"][i].as_py()
        dec, dec_sr = audio.decode_wav(t["bytes"][i].as_py())
        assert dec_sr == sr
        n_samp = min(int(round(sr * dur / 1000.0)), synth.MAX_SAMPLES)
        ref = audio.clip_signal(SEED, i, min(sr, 48000), dur)[:n_samp]
        assert audio.snr_db(dec, ref) >= 30
        assert t["transcript"][i].as_py() == synth.transcript_for(SEED, i, dur)
        checked += 1
    assert checked > 20


def test_drift_partition():
    t = table()
    drift = t.filter(pc.equal(t["partition_id"], P - 1))
    clean_sr = [v for v in drift["sr_hz"].to_pylist() if v is not None and v in (8000, 16000, 22050, 44100)]
    assert clean_sr and all(v == 22050 for v in clean_sr)


def test_codec_skew():
    t = table()
    codecs = t["codec"].to_pylist()
    frac_pcm = codecs.count("pcm_s16le") / len(codecs)
    assert 0.6 < frac_pcm < 0.8  # deliberately skewed hot key
