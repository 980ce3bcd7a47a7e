"""ORC / Arrow-IPC source+sink conformance (sources/columnar)."""

import os

import numpy as np

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from anomaly_detection_ray.sources import columnar as cs

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_ds(ray_session):
    return rd.read_parquet(os.path.join(SF, "events.parquet"))


@pytest.mark.parametrize("fmt", ["orc", "ipc"])
def test_roundtrip_bit_exact(events_ds, tmp_path_factory, fmt):
    """write → read reproduces the full table bit-exactly (sorted), the
    manifest's row counts sum to the input, and one file exists per
    non-empty block."""
    d = str(tmp_path_factory.mktemp(f"col_{fmt}"))
    man = cs.write_columnar(events_ds, d, fmt=fmt)
    assert int(man["rows"].sum()) == events_ds.count()
    assert all(os.path.exists(p) for p in man["path"])
    assert all(p.endswith(f".{fmt}") for p in man["path"])
    back = (cs.read_orc(d) if fmt == "orc" else cs.read_ipc(d)).to_pandas()
    orig = events_ds.to_pandas()
    key = ["event_id"]
    a = orig.sort_values(key).reset_index(drop=True)
    b = back[orig.columns].sort_values(key).reset_index(drop=True)
    # ORC's timestamp type is nanosecond-based: us -> ns promotion on
    # the roundtrip is a format property; values must still be exact
    pd.testing.assert_frame_equal(a, b, check_dtype=(fmt == "ipc"))


@pytest.mark.parametrize("fmt", ["orc", "ipc"])
def test_column_pruning(events_ds, tmp_path_factory, fmt):
    """columns= reaches the pyarrow reader: the pruned scan returns only
    the requested columns (payload never materializes)."""
    d = str(tmp_path_factory.mktemp(f"prune_{fmt}"))
    cs.write_columnar(events_ds, d, fmt=fmt)
    back = (cs.read_orc(d, columns=["event_id", "value"]) if fmt == "orc"
            else cs.read_ipc(d, columns=["event_id", "value"]))
    t = back.take_batch(10, batch_format="pyarrow")
    assert t.column_names == ["event_id", "value"]


def test_unknown_format_rejected(events_ds, tmp_path_factory):
    with pytest.raises(ValueError, match="columnar sink format"):
        cs.write_columnar(events_ds,
                          str(tmp_path_factory.mktemp("bad")), fmt="avro")


def test_empty_block_manifest(ray_session, tmp_path_factory):
    """Empty blocks write no file and contribute no manifest row."""
    ds = rd.from_arrow(pa.table({"a": pa.array([], type=pa.int64())}))
    d = str(tmp_path_factory.mktemp("empty"))
    man = cs.write_columnar(ds, d, fmt="orc")
    assert len(man) == 0
    assert os.listdir(d) == []


def test_single_huge_orc_file_reads_in_parallel_blocks(ray_session, tmp_path):
    """Sub-file parallelism: ONE multi-stripe ORC file must fan out to
    >1 decode task (one per stripe range) with column pruning intact —
    a single huge shard is no longer a single task."""
    import pyarrow.orc as po

    from anomaly_detection_ray.sources.columnar import read_orc

    df = pd.DataFrame({"a": np.arange(50_000, dtype=np.int64),
                       "b": np.arange(50_000, dtype=np.float64),
                       "wide": ["x" * 20] * 50_000})
    p = str(tmp_path / "one.orc")
    # small stripes so one file holds many
    po.write_table(pa.Table.from_pandas(df), p, stripe_size=64 * 1024)
    assert po.ORCFile(p).nstripes > 8

    ds = read_orc(p, columns=["a", "b"], stripes_per_task=2).materialize()
    assert ds.num_blocks() > 1          # the fan-out criterion
    out = ds.to_pandas().sort_values("a").reset_index(drop=True)
    assert list(out.columns) == ["a", "b"]  # pruning intact
    assert len(out) == 50_000
    assert (out["a"].to_numpy() == np.arange(50_000)).all()


def test_single_huge_ipc_file_reads_in_parallel_blocks(ray_session, tmp_path):
    import pyarrow.feather as pf

    from anomaly_detection_ray.sources.columnar import read_ipc

    df = pd.DataFrame({"a": np.arange(40_000, dtype=np.int64),
                       "b": np.arange(40_000, dtype=np.float64)})
    p = str(tmp_path / "one.feather")
    pf.write_feather(pa.Table.from_pandas(df), p, chunksize=1000)

    ds = read_ipc(p, columns=["a"], batches_per_task=5).materialize()
    assert ds.num_blocks() > 1
    out = ds.to_pandas().sort_values("a").reset_index(drop=True)
    assert list(out.columns) == ["a"]
    assert len(out) == 40_000
