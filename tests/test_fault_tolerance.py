"""Fault-tolerance: Ray Data's task retry + actor restart must carry a
pipeline through transient worker deaths with complete, correct output —
the cluster-reality counterpart of the checkpoint/resume tests (a 256-node
run WILL lose workers). A flag file makes the injected crash happen exactly
once; the retried task then succeeds."""

import os

import numpy as np
import pytest


def test_task_pool_survives_worker_crash(ray_session, tmp_path):
    import ray.data as rd

    flag = str(tmp_path / "crashed_task")

    def f(t):
        if not os.path.exists(flag):
            open(flag, "w").close()
            os._exit(1)  # simulate OOM-killed / preempted worker
        return t

    ds = rd.range(1000, override_num_blocks=8).map_batches(
        f, batch_format="pyarrow")
    out = ds.to_pandas()
    assert len(out) == 1000
    assert sorted(out["id"]) == list(range(1000))
    assert os.path.exists(flag)  # the crash really happened


def test_actor_pool_survives_actor_death(ray_session, tmp_path):
    import ray.data as rd

    flag = str(tmp_path / "crashed_actor")

    class Scorer:
        def __call__(self, t):
            if not os.path.exists(flag):
                open(flag, "w").close()
                os._exit(1)  # actor process dies mid-batch
            import pyarrow as pa
            return t.append_column(
                "doubled", pa.array(
                    np.asarray(t["id"].to_numpy(zero_copy_only=False)) * 2))

    ds = rd.range(500, override_num_blocks=4).map_batches(
        Scorer, batch_format="pyarrow", concurrency=2,
        max_task_retries=-1, max_restarts=-1)
    out = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert len(out) == 500
    assert (out["doubled"] == out["id"] * 2).all()
    assert os.path.exists(flag)


def test_read_clips_lance_call_shape(monkeypatch):
    """Pin the one-line Lance switch (sources/clips.py): a .lance path
    must route to ray.data.read_lance with pruned columns and the
    partition filter rendered as the SQL boolean string that API takes —
    pylance is env-blocked, so the call shape is verified via a mock."""
    import ray.data as rd

    from anomaly_detection_ray.sources import clips

    calls = []
    monkeypatch.setattr(rd, "read_lance",
                        lambda uri, **kw: calls.append((uri, kw)) or "DS")
    got = clips.read_clips("/data/clips.lance",
                           columns=["clip_id", "sr_hz"], partitions=[1, 3])
    assert got == "DS"
    uri, kw = calls[0]
    assert uri == "/data/clips.lance"
    assert kw["columns"] == ["clip_id", "sr_hz"]
    assert kw["filter"] == "partition_id IN (1, 3)"
    # no partitions: no filter pushed
    clips.read_clips("/data/clips.lance", columns=["clip_id"])
    assert calls[1][1]["filter"] is None
