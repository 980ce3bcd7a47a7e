"""Audio training-data prep pipeline: quality gate, resample, segment,
partitioned write, per-partition resume."""

import os

import numpy as np
import pandas as pd
import pyarrow.dataset as pads
import pytest

from anomaly_detection_ray import audio, synth
from anomaly_detection_ray.pipelines import audio_prep as ap

SEED, N, P = 21, 400, 4


@pytest.fixture(scope="module")
def clip_path(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("prep_clips")
    synth.write_clip_table(str(d), seed=SEED, n=N, P=P, rows_per_file=128)
    return str(d)


@pytest.fixture(scope="module")
def run(clip_path, tmp_path_factory):
    out = tmp_path_factory.mktemp("prep_out")
    cfg = ap.AudioPrepConfig(P=P, target_sr=16000, seg_ms=1000,
                             concurrency=2)
    res = ap.run_audio_prep(clip_path, str(out), cfg, resume=False)
    res["cfg"] = cfg
    return res


def _segments_df(res) -> pd.DataFrame:
    return (pads.dataset(res["segments_path"], partitioning="hive")
            .to_table().to_pandas())


def test_segments_written_partitioned(run):
    seg_dirs = [d for d in os.listdir(run["segments_path"])
                if d.startswith("partition_id=")]
    assert len(seg_dirs) == P
    df = _segments_df(run)
    assert len(df) > 0
    assert (df["sr_hz"] == 16000).all()
    # every segment decodes at the target rate with the declared length
    row = df.iloc[0]
    sig, sr = audio.decode_wav(row["bytes"])
    assert sr == 16000
    assert abs(len(sig) - row["seg_dur_ms"] * 16) < 16


def test_metrics_reconcile(run):
    m = run["metrics"]
    assert int(m["clips"].sum()) == N
    df = _segments_df(run)
    got = df.groupby(df["partition_id"].astype(int)).size()
    for _, r in m.iterrows():
        assert int(r["segments"]) == int(got.get(int(r["partition_id"]), 0))
    # kept + drops == clips
    assert ((m["kept"] + m["drop_quality"] + m["drop_decode"]) <=
            m["clips"]).all()


def test_segment_lengths(run):
    df = _segments_df(run)
    # all full segments are exactly seg_ms; remainders >= min_ms
    assert df["seg_dur_ms"].max() <= 1000.0
    assert df["seg_dur_ms"].min() >= 200.0
    full = df[df["seg_dur_ms"] == 1000.0]
    assert len(full) > len(df) * 0.5


def test_resume_skips_completed(clip_path, run):
    res2 = ap.run_audio_prep(clip_path, run["out_dir"], run["cfg"],
                             resume=True)
    assert res2["skipped_partitions"] == list(range(P))
    assert res2["wall_sec"] == 0.0
    # manifest metrics survive the no-op rerun
    assert int(res2["metrics"]["segments"].sum()) == \
        int(run["metrics"]["segments"].sum())


def test_config_change_invalidates(clip_path, run, tmp_path):
    cfg2 = ap.AudioPrepConfig(P=P, target_sr=8000, seg_ms=1000,
                              concurrency=2)
    res = ap.run_audio_prep(clip_path, run["out_dir"], cfg2, resume=True)
    assert res["skipped_partitions"] == []  # hash mismatch => full rerun
    df = _segments_df(res)
    assert (df["sr_hz"] == 8000).all()


def test_quality_gate_drops_flat_noise(clip_path, tmp_path):
    """max_flatness gate drops the corrupt_pcm noise clips."""
    cfg = ap.AudioPrepConfig(P=P, max_flatness=0.5, min_speech=0.01,
                             concurrency=2)
    res = ap.run_audio_prep(clip_path, str(tmp_path / "o"), cfg, resume=False)
    m = res["metrics"]
    gt = synth.ground_truth(SEED, N, P)
    assert int(m["drop_quality"].sum()) >= len(gt["corrupt_pcm"])


def test_denoise_gate_salvages_band(clip_path, tmp_path):
    """denoise_below_snr processes only the band above the drop gate:
    pure-noise clips still drop (min_snr_db), tonal clips pass through
    bit-identically (their blind SNR sits above the threshold), and the
    config hash changes."""
    from anomaly_detection_ray.pipelines import checkpoint as ckpt
    from dataclasses import asdict

    gt = synth.ground_truth(SEED, N, P)
    cfg = ap.AudioPrepConfig(P=P, min_snr_db=0.0, denoise_below_snr=8.0,
                             concurrency=2)
    assert (ckpt.config_hash(asdict(cfg)) != ckpt.config_hash(asdict(
        ap.AudioPrepConfig(P=P, min_snr_db=0.0))))
    res = ap.run_audio_prep(clip_path, str(tmp_path / "dn"), cfg,
                            resume=False)
    m = res["metrics"]
    # pure-noise corrupt_pcm clips sit far below 0 dB => dropped
    assert int(m["drop_quality"].sum()) >= len(gt["corrupt_pcm"])
    df = _segments_df(res)
    noise_ids = {f"clip-{i:09d}" for i in gt["corrupt_pcm"]}
    assert not (set(df["clip_id"].unique()) & noise_ids)
    # clean tones (>8 dB blind SNR) are byte-identical to the no-denoise
    # run: the gate never touched them
    base = ap.run_audio_prep(clip_path, str(tmp_path / "base"),
                             ap.AudioPrepConfig(P=P, min_snr_db=0.0,
                                                concurrency=2),
                             resume=False)
    # the synth table deliberately repeats clip_ids (the 'dup'
    # violation class), so align on rows whose key is unique per run
    def uniq(frame):
        k = ["clip_id", "seg_idx"]
        return (frame[~frame.duplicated(subset=k, keep=False)]
                .set_index(k)["bytes"])
    got, bse = uniq(df), uniq(_segments_df(base))
    shared = got.index.intersection(bse.index)
    assert len(shared) > 100
    assert (got.loc[shared] == bse.loc[shared]).all()


def test_vad_segmentation_mode(clip_path, tmp_path):
    """seg_mode='vad' cuts at silence boundaries: emitted segments are
    speech-dense (energy-active), durations respect seg_ms/min_ms, and
    the config hash differs from fixed-window mode."""
    from anomaly_detection_ray.pipelines import checkpoint as ckpt
    from anomaly_detection_ray.stages import audio_ops as ao
    from dataclasses import asdict

    cfg = ap.AudioPrepConfig(P=P, seg_mode="vad", concurrency=2)
    assert (ckpt.config_hash(asdict(cfg))
            != ckpt.config_hash(asdict(ap.AudioPrepConfig(P=P))))
    res = ap.run_audio_prep(clip_path, str(tmp_path / "vad"), cfg,
                            resume=False)
    df = _segments_df(res)
    assert len(df) > 100
    assert df["seg_dur_ms"].max() <= 1000.0 + 1e-6
    assert df["seg_dur_ms"].min() >= 200.0
    ratios = []
    for b in df["bytes"].head(50):
        sig, sr = audio.decode_wav(b)
        ratios.append(ao.vad_stats(sig, sr)["speech_ratio"])
    # vad-cut rows are speech-shaped; fixed windows over padded clips
    # would include fully-silent rows (ratio ~0)
    assert float(np.median(ratios)) > 0.7


def test_snr_gate_drops_noise_keeps_tones(clip_path, tmp_path):
    """min_snr_db drops the pure-noise corrupt_pcm clips (blind SNR reads
    them strongly negative) while keeping clean tonal clips — and drops
    nothing when off."""
    gt = synth.ground_truth(SEED, N, P)
    cfg = ap.AudioPrepConfig(P=P, min_snr_db=5.0, concurrency=2)
    res = ap.run_audio_prep(clip_path, str(tmp_path / "snr"), cfg,
                            resume=False)
    m = res["metrics"]
    assert int(m["drop_quality"].sum()) >= len(gt["corrupt_pcm"])
    df = _segments_df(res)
    noise_ids = {f"clip-{i:09d}" for i in gt["corrupt_pcm"]}
    assert not (set(df["clip_id"].unique()) & noise_ids)
    # clean tones survive: most clips still produce segments
    assert int(m["kept"].sum()) > 0.7 * N
    df = _segments_df(res)
    corrupt_ids = {f"clip-{i:09d}" for i in gt["corrupt_pcm"]}
    assert not (set(df["clip_id"].unique()) & corrupt_ids)


def test_sinc_resampler_and_loudness_normalization(clip_path,
                                                   tmp_path_factory):
    """The quality prep config (Kaiser-sinc resample + RMS leveling to
    target_dbfs) produces segments whose decoded RMS sits at the target;
    the config hash differs from the default so checkpoints invalidate."""
    import numpy as np

    from anomaly_detection_ray import audio
    from anomaly_detection_ray.pipelines import checkpoint as ckpt
    from dataclasses import asdict

    out = tmp_path_factory.mktemp("prep_sinc")
    cfg = ap.AudioPrepConfig(P=P, target_sr=16000, seg_ms=1000,
                             concurrency=2, resampler="sinc",
                             target_dbfs=-20.0)
    assert (ckpt.config_hash(asdict(cfg))
            != ckpt.config_hash(asdict(ap.AudioPrepConfig(P=P))))
    # level_mode is part of the config identity (lufs vs rms leveling
    # produces different payloads => must invalidate checkpoints)
    lufs = ap.AudioPrepConfig(P=P, target_dbfs=-20.0, level_mode="lufs")
    assert (ckpt.config_hash(asdict(lufs))
            != ckpt.config_hash(asdict(
                ap.AudioPrepConfig(P=P, target_dbfs=-20.0))))
    res = ap.run_audio_prep(clip_path, str(out), cfg, resume=False)
    df = _segments_df(res)
    assert len(df) > 100
    rms_db = []
    for b in df["bytes"].head(40):
        sig, sr = audio.decode_wav_lenient(b)
        assert sr == 16000
        r = float(np.sqrt(np.mean(sig ** 2)))
        if r > 0:
            rms_db.append(20 * np.log10(r))
    # full-clip leveling, per-second segments: segment RMS scatters around
    # the clip target — the MEDIAN must sit near -20 dBFS
    assert abs(float(np.median(rms_db)) - (-20.0)) < 3.0


def test_dc_gate_and_removal(clip_path, tmp_path):
    """max_dc drops clips whose mean exceeds the limit; remove_dc
    (repair-then-grade, the declip idiom) subtracts the bias first so
    the same gate then keeps them and emitted segments are zero-mean."""
    base = ap.run_audio_prep(
        clip_path, str(tmp_path / "base"),
        ap.AudioPrepConfig(P=P, concurrency=2), resume=False)
    kept_base = int(base["metrics"]["kept"].sum())
    # an absurdly tight gate: every gradeable clip has SOME partial-cycle
    # mean, so most of the corpus drops
    cfg = ap.AudioPrepConfig(P=P, max_dc=1e-12, concurrency=2)
    res = ap.run_audio_prep(clip_path, str(tmp_path / "dc"), cfg,
                            resume=False)
    assert int(res["metrics"]["kept"].sum()) < 0.5 * kept_base
    # with removal the gate passes again (repair precedes grade)
    cfg2 = ap.AudioPrepConfig(P=P, max_dc=1e-12, remove_dc=True,
                              concurrency=2)
    res2 = ap.run_audio_prep(clip_path, str(tmp_path / "dcr"), cfg2,
                             resume=False)
    assert int(res2["metrics"]["kept"].sum()) >= 0.9 * kept_base


def test_wow_gate_drops_wobbling_clips(tmp_path, ray_session):
    """max_wow_cents drops a planted frequency-wobbling clip while the
    stable-tone corpus passes; unpitched clips stay ungated (no pitch,
    no pitch-stability verdict) and the gate is part of the config
    identity (resume-invalidating)."""
    from dataclasses import asdict

    import pyarrow as pa
    import pyarrow.parquet as pq

    from anomaly_detection_ray.pipelines import checkpoint as ckpt

    d = tmp_path / "wow_clips"
    d.mkdir()
    sr = 16000
    t = np.arange(3 * sr) / sr
    inst = 300.0 * 2.0 ** (80.0 / 1200.0 * np.sin(2 * np.pi * 2.0 * t))
    wob = 0.5 * np.sin(2 * np.pi * np.cumsum(inst) / sr)
    clean = 0.5 * np.sin(2 * np.pi * 300.0 * t)
    rng = np.random.default_rng(0)
    noise = rng.normal(0, 0.2, 3 * sr)          # unpitched
    pq.write_table(pa.table({
        "clip_id": ["wobble", "clean", "noise"],
        "partition_id": pa.array([0, 0, 0], type=pa.int32()),
        "bytes": [audio.encode_wav(x, sr) for x in (wob, clean, noise)],
    }), str(d / "clips-00000.parquet"))

    cfg = ap.AudioPrepConfig(P=1, max_wow_cents=30.0, concurrency=1)
    assert (ckpt.config_hash(asdict(cfg))
            != ckpt.config_hash(asdict(ap.AudioPrepConfig(P=1))))
    res = ap.run_audio_prep(str(d), str(tmp_path / "out"), cfg,
                            resume=False)
    df = _segments_df(res)
    kept_ids = set(df["clip_id"])
    assert "clean" in kept_ids and "noise" in kept_ids
    assert "wobble" not in kept_ids
    assert int(res["metrics"]["drop_quality"].sum()) == 1
