"""ORC / Arrow-IPC source+sink conformance (sources/columnar)."""

import os

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
