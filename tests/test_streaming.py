"""Micro-batch streaming source (sources/streaming.py) — the Kafka-loop
equivalent: offsets ledger, per-key state store, exact bounded-window
verdicts vs a batch run."""

import glob
import json
import os

import numpy as np
import pandas as pd
import pytest

rng = np.random.default_rng(31)

CONF = {"anomaly_detection_alg": ["BorderCheck()", "Welford()"],
        "anomaly_detection_conf": [
            {"input_vector_size": 1, "UL": 70.0, "LL": 30.0,
             "warning_stages": []},
            {"N": 20, "X": 3.0, "warning_stages": []}]}


def _make_topic(tmp_path, n_files=3, rows_per_file=200):
    """Message CSVs simulating a topic; ts strictly increasing across
    files so micro-batch order == stream order."""
    topic = tmp_path / "topic"
    topic.mkdir()
    v = rng.normal(50, 5, n_files * rows_per_file)
    v[150] = 200.0        # border + welford error
    v[410] = -100.0
    ts = np.arange(len(v), dtype=np.float64)
    for i in range(n_files):
        sl = slice(i * rows_per_file, (i + 1) * rows_per_file)
        pd.DataFrame({"timestamp": ts[sl], "ftr_vector": v[sl]}).to_csv(
            topic / f"batch-{i:04d}.csv", index=False)
    return str(topic), pd.DataFrame({"ts": ts, "value": v})


def _collect_verdicts(out_dir: str) -> pd.DataFrame:
    import ray.data as rd
    parts = sorted(glob.glob(os.path.join(out_dir, "poll=*")))
    dfs = [rd.read_parquet(p).to_pandas() for p in parts]
    df = pd.concat(dfs, ignore_index=True)
    return (df[~df["__warm__"]].sort_values("ts").reset_index(drop=True))


def test_stream_matches_batch_run(ray_session, tmp_path):
    """Polling file-by-file with a ≥window state store gives verdicts
    IDENTICAL to one batch run over the concatenated history."""
    import ray.data as rd

    from anomaly_detection_ray.pipelines.config import run_reference_config
    from anomaly_detection_ray.sources.streaming import StreamRunner

    topic, full = _make_topic(tmp_path)
    out = str(tmp_path / "out")
    runner = StreamRunner(CONF, topic, out, state_rows=64)

    # feed one file per poll (consumer.py poll loop shape)
    names = sorted(os.listdir(topic))
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    recs = []
    for n in names:
        os.link(os.path.join(topic, n), os.path.join(staged, n))
        runner.watch_dir = staged
        recs.append(runner.poll_once())
    assert sum(r["rows"] for r in recs) == len(full)
    assert sum(r["violations"] for r in recs) >= 2

    got = _collect_verdicts(out)
    batch = (run_reference_config(
        CONF, ds=rd.from_pandas(full.rename(columns={"value": "f0"})))
        .to_pandas().sort_values("ts").reset_index(drop=True))
    for col in ["a0_bordercheck_code", "a1_welford_code"]:
        mism = (got[col].to_numpy() != batch[col].to_numpy()).sum()
        assert mism == 0, f"{col}: {mism} verdicts differ from batch"


def test_stream_offsets_resume_and_idempotence(ray_session, tmp_path):
    from anomaly_detection_ray.sources.streaming import StreamRunner

    topic, full = _make_topic(tmp_path)
    out = str(tmp_path / "out2")
    r1 = StreamRunner(CONF, topic, out, state_rows=64)
    rec1 = r1.poll_once()
    assert rec1["rows"] == len(full)

    # new runner over the same out_dir: ledger says everything is committed
    r2 = StreamRunner(CONF, topic, out, state_rows=64)
    assert r2.poll_once()["rows"] == 0

    # a late-arriving file is picked up alone, warm-started from state
    extra = pd.DataFrame({"timestamp": [1e6, 1e6 + 1],
                          "ftr_vector": [50.0, 300.0]})
    extra.to_csv(os.path.join(topic, "batch-9999.csv"), index=False)
    rec3 = r2.poll_once()
    assert rec3["rows"] == 2 and rec3["violations"] == 1
    with open(os.path.join(out, "_stream_manifest.json")) as f:
        manifest = json.load(f)
    assert len(manifest["polls"]) == 2
    assert "batch-9999.csv" in manifest["processed"]


def test_stream_rejects_training_checks(ray_session, tmp_path):
    from anomaly_detection_ray.sources.streaming import StreamRunner
    conf = {"anomaly_detection_alg": ["IsolationForest()"],
            "anomaly_detection_conf": [{"train_conf": {"max_samples": 64}}]}
    with pytest.raises(NotImplementedError, match="training pass"):
        StreamRunner(conf, str(tmp_path), str(tmp_path / "o"))


def test_stream_watermark_diverts_late_rows(ray_session, tmp_path):
    """With ``allowed_lateness_s``, rows behind the event-time watermark go
    to the late side-output — not graded, not entering kernel state — and
    the watermark itself survives in the manifest."""
    import ray.data as rd

    from anomaly_detection_ray.sources.streaming import StreamRunner

    topic = tmp_path / "topic"
    topic.mkdir()
    out = str(tmp_path / "out")
    # constant in-band values: any violation can only come from a late row
    pd.DataFrame({"timestamp": np.arange(100.0),
                  "ftr_vector": np.full(100, 50.0)}).to_csv(
        topic / "b-0000.csv", index=False)
    runner = StreamRunner(CONF, str(topic), out, state_rows=64,
                          allowed_lateness_s=10.0)
    rec1 = runner.poll_once()
    assert rec1["rows"] == 100 and rec1["late"] == 0
    assert runner.manifest["watermark_ts"] == 99.0

    # poll 2: ts 50/80 are behind watermark(99) - lateness(10) = 89; their
    # value 500 would be a BorderCheck violation IF graded
    ts2 = np.concatenate([[50.0, 80.0], np.arange(100.0, 150.0)])
    v2 = np.concatenate([[500.0, 500.0], np.full(50, 50.0)])
    pd.DataFrame({"timestamp": ts2, "ftr_vector": v2}).to_csv(
        topic / "b-0001.csv", index=False)
    rec2 = runner.poll_once()
    assert rec2["rows"] == 50 and rec2["late"] == 2
    assert rec2["violations"] == 0, "late rows leaked into grading"
    assert runner.manifest["watermark_ts"] == 149.0

    late_dirs = glob.glob(os.path.join(out, "late", "poll=*"))
    assert len(late_dirs) == 1
    late = rd.read_parquet(late_dirs[0]).to_pandas()
    assert sorted(late["ts"].tolist()) == [50.0, 80.0]
    # late ts appear in verdicts only once (from poll 1), never regraded
    got = _collect_verdicts(out)
    assert (got["ts"] == 50.0).sum() == 1 and (got["ts"] == 80.0).sum() == 1

    # poll 3: ENTIRELY late — files committed to the ledger, but state and
    # watermark untouched
    state_before = pd.read_parquet(runner.state_path)["ts"].tolist()
    pd.DataFrame({"timestamp": [10.0, 20.0],
                  "ftr_vector": [999.0, 999.0]}).to_csv(
        topic / "b-0002.csv", index=False)
    rec3 = runner.poll_once()
    assert rec3["rows"] == 0 and rec3["late"] == 2 and rec3["violations"] == 0
    assert runner.manifest["watermark_ts"] == 149.0
    assert "b-0002.csv" in runner.manifest["processed"]
    assert pd.read_parquet(runner.state_path)["ts"].tolist() == state_before
    assert runner.poll_once()["rows"] == 0  # ledger holds: nothing pending

    # stream keeps flowing normally after an all-late poll
    pd.DataFrame({"timestamp": [150.0, 151.0],
                  "ftr_vector": [50.0, 500.0]}).to_csv(
        topic / "b-0003.csv", index=False)
    rec4 = runner.poll_once()
    assert rec4["rows"] == 2 and rec4["violations"] == 1 and rec4["late"] == 0

    # without lateness configured there is no watermark and no 'late' key
    out2 = str(tmp_path / "out_nolate")
    r2 = StreamRunner(CONF, str(topic), out2, state_rows=64)
    recn = r2.poll_once()
    assert "late" not in recn and "watermark_ts" not in r2.manifest


def test_two_phase_file_then_stream(ray_session, tmp_path):
    """ConsumerFileKafka parity (consumer.py:366-412): grade a history file
    fully, then keep consuming the stream — combined verdicts identical to
    one batch run over history + stream, state carried across the phases."""
    import ray.data as rd

    from anomaly_detection_ray.pipelines.config import run_reference_config
    from anomaly_detection_ray.sources.streaming import StreamRunner

    topic, full = _make_topic(tmp_path)
    names = sorted(os.listdir(topic))
    # first file = the "file" phase (lives outside the watch dir)
    history = str(tmp_path / "history.csv")
    os.link(os.path.join(topic, names[0]), history)
    live = str(tmp_path / "live")
    os.makedirs(live)
    for n in names[1:]:
        os.link(os.path.join(topic, n), os.path.join(live, n))

    out = str(tmp_path / "out2")
    runner = StreamRunner(CONF, live, out, state_rows=64)
    warm = runner.warm_start([history])
    assert warm["rows"] == 200 and warm.get("warm_start")
    recs = runner.run(poll_interval_s=0.01)
    assert warm["rows"] + sum(r["rows"] for r in recs) == len(full)

    # warm_start is idempotent across a runner restart
    runner2 = StreamRunner(CONF, live, out, state_rows=64)
    assert runner2.warm_start([history])["rows"] == 0

    got = _collect_verdicts(out)
    batch = (run_reference_config(
        CONF, ds=rd.from_pandas(full.rename(columns={"value": "f0"})))
        .to_pandas().sort_values("ts").reset_index(drop=True))
    for col in ["a0_bordercheck_code", "a1_welford_code"]:
        mism = (got[col].to_numpy() != batch[col].to_numpy()).sum()
        assert mism == 0, f"{col}: {mism} verdicts differ from batch"


def test_crash_replay_is_idempotent(ray_session, tmp_path):
    """Simulated crash AFTER the poll's outputs are written but BEFORE the
    ledger commit: the replay must not double rows (write_parquet appends
    by default — dirs are cleared) and must grade against PRE-batch state
    (the state pointer only advances with the commit)."""
    import ray.data as rd

    topic, full = _make_topic(tmp_path)
    out = str(tmp_path / "out")
    names = sorted(os.listdir(topic))
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    os.link(os.path.join(topic, names[0]), os.path.join(staged, names[0]))
    r = StreamRunnerFactory(staged, out)
    rec1 = r.poll_once()
    manifest_after_1 = open(os.path.join(out, "_stream_manifest.json")).read()

    os.link(os.path.join(topic, names[1]), os.path.join(staged, names[1]))
    rec2 = r.poll_once()

    # crash simulation: outputs of poll 2 exist, but the manifest (ledger +
    # state pointer) is rolled back to the post-poll-1 commit
    with open(os.path.join(out, "_stream_manifest.json"), "w") as f:
        f.write(manifest_after_1)
    r2 = StreamRunnerFactory(staged, out)
    rec2b = r2.poll_once()  # replays poll 2
    assert rec2b["rows"] == rec2["rows"] == 200
    assert rec2b["violations"] == rec2["violations"]

    # poll dir holds exactly one copy of the rows
    polls = sorted(glob.glob(os.path.join(out, "poll=*")))
    total = sum(len(rd.read_parquet(p).to_pandas()) for p in polls)
    graded_rows = len(full[:400])
    warm_rows = 64  # poll 2 replay carries poll 1's 64-row tail
    assert total == graded_rows + warm_rows

    # and the verdicts still match the batch run over the same history
    import ray.data as rdm

    from anomaly_detection_ray.pipelines.config import run_reference_config
    got = _collect_verdicts(out)
    batch = (run_reference_config(
        CONF, ds=rdm.from_pandas(full[:400].rename(columns={"value": "f0"})))
        .to_pandas().sort_values("ts").reset_index(drop=True))
    for col in ["a0_bordercheck_code", "a1_welford_code"]:
        assert (got[col].to_numpy() == batch[col].to_numpy()).all()


def test_warm_start_skips_only_done_files(ray_session, tmp_path):
    """A warm_start call mixing done and new files grades the new ones."""
    topic, full = _make_topic(tmp_path)
    names = sorted(os.listdir(topic))
    out = str(tmp_path / "out")
    live = str(tmp_path / "live")
    os.makedirs(live)
    r = StreamRunnerFactory(live, out)
    h1 = os.path.join(topic, names[0])
    h2 = os.path.join(topic, names[1])
    assert r.warm_start([h1])["rows"] == 200
    rec = r.warm_start([h1, h2])
    assert rec["rows"] == 200 and rec["files"] == [names[1]]
    assert r.warm_start([h1, h2])["rows"] == 0


def StreamRunnerFactory(watch_dir, out_dir):
    from anomaly_detection_ray.sources.streaming import StreamRunner
    return StreamRunner(CONF, watch_dir, out_dir, state_rows=64)


def test_per_key_watermark_tolerates_series_skew(ray_session, tmp_path):
    """Per-key event-time watermarks: a fast series advancing its own
    clock far ahead must NOT make a slow-but-ordered series' rows late
    (the round-2 global watermark did exactly that). A row genuinely late
    for its OWN series still diverts."""
    from anomaly_detection_ray.sources.streaming import StreamRunner

    topic = tmp_path / "topic"
    topic.mkdir()
    out = str(tmp_path / "out")
    dfa = pd.DataFrame({"timestamp": np.arange(100.0, 200.0),
                        "ftr_vector": 50.0, "labelInfo": "A"})
    dfb = pd.DataFrame({"timestamp": np.arange(0.0, 10.0),
                        "ftr_vector": 50.0, "labelInfo": "B"})
    pd.concat([dfa, dfb]).to_csv(topic / "p1.csv", index=False)
    runner = StreamRunner(CONF, str(topic), out, key_col="labelInfo",
                          state_rows=64, allowed_lateness_s=5.0)
    rec1 = runner.poll_once()
    assert rec1["rows"] == 110 and rec1["late"] == 0
    assert runner.manifest["watermark_ts"] == {"A": 199.0, "B": 9.0}

    # B@12 is behind A's clock (199-5) but in time for B -> must grade
    # (value 500 violates the border, proving it graded); A@100 is late
    # for A's own watermark -> diverted
    pd.DataFrame({"timestamp": [12.0, 100.0], "ftr_vector": [500.0, 500.0],
                  "labelInfo": ["B", "A"]}).to_csv(topic / "p2.csv",
                                                   index=False)
    rec2 = runner.poll_once()
    assert rec2["rows"] == 1 and rec2["late"] == 1
    assert rec2["violations"] == 1  # the in-time B row graded (and failed)
    late = pd.concat([pd.read_parquet(p) for p in glob.glob(
        os.path.join(out, "late", "poll=*", "*.parquet"))])
    assert late["labelInfo"].tolist() == ["A"]
    assert runner.manifest["watermark_ts"]["B"] == 12.0
    assert runner.manifest["watermark_ts"]["A"] == 199.0  # untouched by late


def test_late_only_poll_is_not_idle(ray_session, tmp_path):
    """run(): a poll whose files were ALL late rows still committed those
    files — it must reset the idle counter and keep its record instead of
    stopping the loop early."""
    from anomaly_detection_ray.sources.streaming import StreamRunner

    topic = tmp_path / "topic"
    topic.mkdir()
    out = str(tmp_path / "out")
    pd.DataFrame({"timestamp": np.arange(100.0),
                  "ftr_vector": np.full(100, 50.0)}).to_csv(
        topic / "p1.csv", index=False)
    runner = StreamRunner(CONF, str(topic), out, state_rows=64,
                          allowed_lateness_s=5.0)
    runner.poll_once()  # watermark -> 99
    pd.DataFrame({"timestamp": [10.0, 20.0],
                  "ftr_vector": [500.0, 500.0]}).to_csv(
        topic / "p2-late.csv", index=False)
    recs = runner.run(stop_after_idle=1, poll_interval_s=0.01)
    assert len(recs) == 1
    assert recs[0]["rows"] == 0 and recs[0]["late"] == 2
    assert "p2-late.csv" in runner.manifest["processed"]


def test_poison_file_is_quarantined_not_retried(ray_session, tmp_path):
    """A file that cannot parse is committed to the ledger as quarantined
    (with its error), the poll still grades the healthy files, and the
    next poll does not retry the poison file."""
    import json as _json

    from anomaly_detection_ray.sources.streaming import StreamRunner

    watch = tmp_path / "watch"
    out = tmp_path / "out"
    watch.mkdir()
    pd.DataFrame({"timestamp": [0.0, 1.0, 2.0],
                  "ftr_vector": [1.0, 2.0, 3.0]}).to_csv(
        watch / "a.csv", index=False)
    (watch / "garbage.json").write_text("{not json at all")

    r = StreamRunner(CONF, str(watch), str(out), state_rows=16)
    rec = r.poll_once()
    assert rec["quarantined"] == ["garbage.json"]
    assert rec["rows"] == 3
    man = _json.load(open(out / "_stream_manifest.json"))
    assert "garbage.json" in man["quarantined"]
    assert "JSONDecodeError" in man["quarantined"]["garbage.json"]
    assert "garbage.json" in man["processed"]

    # next poll: nothing pending, no retry loop
    rec2 = r.poll_once()
    assert rec2["files"] == [] and "quarantined" not in rec2

    # an all-poison poll commits the quarantine and reports no rows
    (watch / "b.csv").write_bytes(b"\x00\x01\x02 not,a,csv\n\xff" * 3)
    rec3 = r.poll_once()
    assert rec3["rows"] == 0 and rec3["quarantined"] == ["b.csv"]
    rec4 = r.poll_once()
    assert rec4["files"] == []
