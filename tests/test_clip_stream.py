"""Continuous clip-table validation: micro-batch polls, cross-poll
duplicate detection, cumulative drift, restart/offset semantics."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from anomaly_detection_ray import synth
from anomaly_detection_ray.pipelines import validate as vp
from anomaly_detection_ray.pipelines.clip_stream import ClipStreamValidator

SEED, N, P = 42, 1500, 8


def _write_wave(d: str, name: str, idx: np.ndarray) -> None:
    os.makedirs(d, exist_ok=True)
    pq.write_table(synth.generate_batch(SEED, idx, P), os.path.join(d, name),
                   compression="none")


@pytest.fixture(scope="module")
def split_point():
    """A split so wave 2 contains a duplicate whose source is in wave 1."""
    gt = synth.ground_truth(SEED, N, P)
    dups = gt["dup"]
    srcs = synth.dup_source(SEED, dups)
    for cut in range(N // 3, N - 1):
        m = (dups >= cut) & (srcs < cut)
        if m.any():
            return cut, int(dups[m][0]), int(srcs[m][0])
    pytest.fail("no cross-wave dup found")


@pytest.fixture(scope="module")
def stream(tmp_path_factory, ray_session, split_point):
    cut, dup_idx, src_idx = split_point
    watch = str(tmp_path_factory.mktemp("watch"))
    out = str(tmp_path_factory.mktemp("stream_out"))
    cfg = vp.ValidateConfig(seed=SEED, P=P, fidelity_concurrency=2,
                            fidelity_batch_size=128)
    v = ClipStreamValidator(watch, out, cfg, drift_min_rows=256)
    _write_wave(watch, "wave1.parquet", np.arange(0, cut))
    r1 = v.poll_once()
    _write_wave(watch, "wave2.parquet", np.arange(cut, N))
    r2 = v.poll_once()
    return {"v": v, "watch": watch, "out": out, "cfg": cfg,
            "r1": r1, "r2": r2, "cut": cut, "dup_idx": dup_idx,
            "src_idx": src_idx}


def _viols(out_dir: str, poll_id: str) -> pd.DataFrame:
    return (pads.dataset(os.path.join(out_dir, "violations", f"poll={poll_id}"),
                         partitioning="hive").to_table().to_pandas())


def test_polls_cover_all_rows(stream):
    assert stream["r1"]["rows"] == stream["cut"]
    assert stream["r2"]["rows"] == N - stream["cut"]
    assert stream["r2"]["rows_total"] == N


def test_cross_poll_duplicate_flagged(stream):
    """The wave-2 copy of a wave-1 clip is flagged by the ledger."""
    df = _viols(stream["out"], stream["r2"]["poll_id"])
    dup_id = f"clip-{stream['src_idx']:09d}"  # dup rows reuse source's id
    flagged = df[(df["clip_id"] == dup_id) & (df["uq_code"] == -1)]
    assert len(flagged) >= 1


def test_empty_poll_returns_none(stream):
    assert stream["v"].poll_once() is None


def test_restart_resumes_offsets(stream):
    """A new validator on the same dirs skips processed files and keeps
    cumulative state (rows, HLL)."""
    v2 = ClipStreamValidator(stream["watch"], stream["out"], stream["cfg"])
    assert v2.poll_once() is None
    assert v2.state["rows"] == N
    est = v2.state["hll"].estimate()
    assert 0.8 * N < est < 1.1 * N  # distinct ids = N - #dups, HLL ±2%


def test_flags_match_batch_for_stateless_checks(stream):
    """Per-clip rv/bc/cc/tc/fid flags from the two polls equal a one-shot
    batch run over the same rows (these checks carry no cross-poll state)."""
    import ray.data as rd
    full = synth.generate_batch(SEED, np.arange(N), P)
    # batch reference: run the same chain, compare the stateless columns
    batch = vp.build_pass_b(rd.from_arrow(full), stream["cfg"],
                            {"dup_hashes": np.array([], dtype=np.uint64),
                             "dur_stats": stream["v"].state["dur"]}).to_pandas()
    streamed = pd.concat(
        [_viols(stream["out"], stream["r1"]["poll_id"]),
         _viols(stream["out"], stream["r2"]["poll_id"])], ignore_index=True)
    b_err = batch[batch[["rv_code", "bc_code", "cc_code", "tc_code",
                         "fid_code"]].eq(-1).any(axis=1)]
    # every batch-flagged stateless violation appears in a streamed poll
    merged = b_err.merge(streamed, on="clip_id", how="left",
                         suffixes=("_b", "_s"))
    assert merged["status_code_s"].notna().all()
    for c in ("rv_code", "bc_code", "cc_code", "tc_code", "fid_code"):
        same = merged[f"{c}_b"] == merged[f"{c}_s"]
        assert same.mean() == 1.0


def test_drift_detected_on_shifted_wave(stream):
    """A wave drawn from the drifted partition's distribution (sr 22050,
    longer durations) PSI-flags against the cumulative history."""
    t = synth.generate_batch(SEED, np.arange(N, N + 2000), P)
    mask = np.asarray(t["partition_id"].to_numpy(zero_copy_only=False)) == P - 1
    shifted = t.filter(pa_mask(mask))
    pq.write_table(shifted, os.path.join(stream["watch"], "wave3.parquet"),
                   compression="none")
    r3 = stream["v"].poll_once()
    assert r3 is not None
    assert r3["drift_psi"].get("sr_hz", 0) > 0.25
    assert r3["drifted"] is True


def pa_mask(m):
    import pyarrow as pa
    return pa.array(m)


def test_ledger_io_bounded_by_buckets_not_history(tmp_path, ray_session):
    """Per-poll ledger reads are O(touched buckets), not O(poll history):
    across 6 polls the files read per poll never exceed the bucket count
    (the old design re-read every prior poll's ledger file), and each
    bucket holds exactly ONE live compaction afterwards."""
    watch, out = str(tmp_path / "w"), str(tmp_path / "o")
    os.makedirs(watch)
    cfg = vp.ValidateConfig(seed=SEED, P=P, fidelity_concurrency=2,
                            fidelity_batch_size=128)
    v = ClipStreamValidator(watch, out, cfg, ledger_buckets=4)
    reads = []
    for k in range(6):
        _write_wave(watch, f"w{k}.parquet", np.arange(k * 100, (k + 1) * 100))
        r = v.poll_once()
        reads.append(r["ledger_files_read"])
        assert r["ledger_buckets_touched"] <= 4
    # old design: poll k read k files; bucketed design: <= buckets
    assert max(reads) <= 4 and reads[0] == 0
    for b in os.listdir(os.path.join(out, "id_hashes")):
        files = os.listdir(os.path.join(out, "id_hashes", b))
        assert len(files) == 1, files  # compacted, pruned to live gen


def test_crash_before_commit_replays_without_double_count(tmp_path,
                                                          ray_session):
    """A crash AFTER the poll's outputs/state generation are written but
    BEFORE the manifest commit must replay the poll against the pre-poll
    state — Welford/row/histogram state must not double-count."""
    watch, out = str(tmp_path / "w"), str(tmp_path / "o")
    os.makedirs(watch)
    cfg = vp.ValidateConfig(seed=SEED, P=P, fidelity_concurrency=2,
                            fidelity_batch_size=128)
    v = ClipStreamValidator(watch, out, cfg, ledger_buckets=4)
    _write_wave(watch, "w1.parquet", np.arange(0, 200))
    r1 = v.poll_once()
    assert r1["rows"] == 200

    _write_wave(watch, "w2.parquet", np.arange(200, 350))
    orig = v._save_manifest
    v._save_manifest = lambda: (_ for _ in ()).throw(OSError("crash"))
    with pytest.raises(OSError):
        v.poll_once()
    v._save_manifest = orig

    v2 = ClipStreamValidator(watch, out, cfg, ledger_buckets=4)
    assert v2.state["rows"] == 200  # pre-poll generation is live
    r2 = v2.poll_once()  # replays w2
    assert r2["rows"] == 150 and r2["rows_total"] == 350
    assert v2.state["dur"].n == 350  # Welford not double-merged

    # crash-free control over the same waves: identical cumulative state
    out_c = str(tmp_path / "o_ctl")
    vc = ClipStreamValidator(watch, out_c, cfg, ledger_buckets=4)
    vc.poll_once()
    assert vc.state["rows"] == 350
    assert vc.state["dur"].n == v2.state["dur"].n
    # merge ORDER of Welford partials follows batch arrival order, so the
    # mean can differ in the last ulp between runs — never by a count
    np.testing.assert_allclose(vc.state["dur"].mean, v2.state["dur"].mean,
                               rtol=1e-12)
    got = {r["column"]: np.asarray(r["counts"])
           for _, r in v2.state["hist"].iterrows()}
    for _, r in vc.state["hist"].iterrows():
        np.testing.assert_array_equal(got[r["column"]],
                                      np.asarray(r["counts"]))


def test_poison_shard_quarantined(tmp_path, ray_session, split_point):
    """A truncated/garbage parquet shard is quarantined into the ledger
    (error recorded, never retried); healthy shards of the same poll
    still validate."""
    import json as _json

    cut, _, _ = split_point
    watch = str(tmp_path / "watch")
    out = str(tmp_path / "out")
    os.makedirs(watch)
    cfg = vp.ValidateConfig(seed=SEED, P=P, fidelity_concurrency=2,
                            fidelity_batch_size=128)
    v = ClipStreamValidator(watch, out, cfg, drift_min_rows=256)
    _write_wave(watch, "good.parquet", np.arange(0, cut // 2))
    with open(os.path.join(watch, "bad.parquet"), "wb") as f:
        f.write(b"PAR1 this is not a real parquet footer")

    rec = v.poll_once()
    assert rec["quarantined"] == ["bad.parquet"]
    assert rec["rows"] > 0  # the good shard still validated
    man = _json.load(open(os.path.join(out, "_stream_manifest.json")))
    assert "bad.parquet" in man["quarantined"]
    assert v.poll_once() is None  # neither file is pending anymore


def test_hygiene_gate_rides_stream_polls(tmp_path, ray_session):
    """The flagship's optional hygiene gate (ValidateConfig.
    hygiene_limits) is part of pass B, so it rides clip_stream polls
    unchanged: a DC-biased clip arriving mid-stream lands in that
    poll's violations with the hygiene error status, while the bias is
    small enough (+0.008 on an ~0.35-RMS signal, SNR ~33 dB) that the
    fidelity SNR check alone would NOT have caught it."""
    from anomaly_detection_ray import audio

    watch = str(tmp_path / "watch")
    out = str(tmp_path / "out")
    os.makedirs(watch)
    cfg = vp.ValidateConfig(seed=SEED, P=P, fidelity_concurrency=2,
                            fidelity_batch_size=128,
                            hygiene_limits=(0.002, 0.05))
    v = ClipStreamValidator(watch, out, cfg, drift_min_rows=10**9)

    n = 300
    gt = synth.ground_truth(SEED, n, P)
    planted = {int(i) for c in gt.values() for i in np.atleast_1d(c)}
    clean = [i for i in range(n) if i not in planted]
    doctor = clean[0]
    t = synth.generate_batch(SEED, np.arange(n), P)
    df = t.to_pandas()
    sig, sr = audio.decode_wav_lenient(df.loc[doctor, "bytes"])
    assert sig is not None
    df.loc[doctor, "bytes"] = audio.encode_wav(sig + 0.008, sr)
    doctored_id = df.loc[doctor, "clip_id"]
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(watch, "wave1.parquet"),
                   compression="none")
    r = v.poll_once()
    assert r["violations"] > 0
    viol = _viols(out, r["poll_id"])
    row = viol[viol["clip_id"] == doctored_id]
    assert len(row) == 1
    assert row["hy_code"].iloc[0] == vp.ERROR_CODE
    assert "DC offset" in row["hy_status"].iloc[0]
    # and the SNR check alone did NOT flag it (the gate added signal)
    assert row["fid_code"].iloc[0] != vp.ERROR_CODE


def test_qc_audit_rides_polls(tmp_path, ray_session):
    """qc_audit=True appends the fused audio-QC scorecard to each poll's
    manifest entry: a planted mains-hum clip, a planted wobbling clip
    and a planted over-reverberant clip (RT60 ~1.2 s > the 0.8 s audit
    threshold) arriving mid-stream surface as warning counts in THAT
    poll's qc block (advisory — the poll verdict stays with the
    violation/drift gates). The streaming path grades the same QC
    vocabulary as the batch scorecard, reverb included."""
    from anomaly_detection_ray import audio

    watch = str(tmp_path / "watch")
    out = str(tmp_path / "out")
    os.makedirs(watch)
    cfg = vp.ValidateConfig(seed=SEED, P=P, fidelity_concurrency=2,
                            fidelity_batch_size=64)
    v = ClipStreamValidator(watch, out, cfg, drift_min_rows=10**9,
                            qc_audit=True)
    n = 120
    t_ = synth.generate_batch(SEED, np.arange(n), P)
    df = t_.to_pandas()
    sr = 16000
    ts = np.arange(3 * sr) / sr
    hum = 0.4 * np.sin(2 * np.pi * 250.0 * ts) \
        + 0.3 * np.sin(2 * np.pi * 50.0 * ts)
    inst = 300.0 * 2.0 ** (80.0 / 1200.0 * np.sin(2 * np.pi * 2.0 * ts))
    wob = 0.5 * np.sin(2 * np.pi * np.cumsum(inst) / sr)
    # over-reverberant: sustain head then exponential free decay whose
    # energy falls 60 dB at t = 1.2 s (the rt60_estimate physics shape)
    rng = np.random.default_rng(11)
    tau = 1.2 / (3.0 * np.log(10.0))
    td = np.arange(2 * sr) / sr
    rev = np.concatenate([rng.uniform(-0.5, 0.5, sr // 4),
                          rng.standard_normal(2 * sr) * 0.5
                          * np.exp(-td / tau)])
    i_hum, i_wob, i_rev = df.index[5], df.index[7], df.index[9]
    df.loc[i_hum, "bytes"] = audio.encode_wav(hum, sr)
    df.loc[i_wob, "bytes"] = audio.encode_wav(wob, sr)
    df.loc[i_rev, "bytes"] = audio.encode_wav(rev, sr)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(watch, "wave1.parquet"),
                   compression="none")
    r = v.poll_once()
    qc = r["qc"]
    assert qc["n"] == n
    assert qc["n_hum"] >= 1
    assert qc["n_wf"] >= 1
    assert qc["n_rv"] >= 1
    assert qc["n_warning"] >= 3
    # the qc block persists in the committed manifest entry
    m = v.manifest["polls"][r["poll_id"]]
    assert m["qc"]["n_hum"] >= 1
