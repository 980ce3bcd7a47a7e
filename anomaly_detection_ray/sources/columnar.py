"""ORC and Arrow-IPC (Feather) shard-file sources and sinks.

Ray Data ships parquet/csv/json natively; warehouse estates also carry
ORC and Arrow IPC shards. Both formats get a first-class source here via
``read_binary_files`` + a pyarrow decode (one task per shard file — the
same parallelism contract as the repo's parquet layouts, where shards
are written block-sized) and a partitioned sink that emits one file per
Ray block plus a (path, rows) manifest.

Scale notes (100 TB):
- The source's unit of parallelism is the shard FILE (pyarrow's ORC/IPC
  readers need the footer, so sub-file stripe scheduling would require a
  range-request reader; shard-sized files make that moot — the writers
  here produce exactly that layout).
- ``columns=`` pruning happens inside the pyarrow reader (ORC reads only
  the selected column streams; IPC record batches are column-sliced), so
  a 2-column scan of a wide table does not materialize the row payload.
- Sinks write one file per block into a flat directory — the resumable
  partitioned layout every other sink in this repo uses; the returned
  manifest is O(files) and drives skip-finished-partition logic.
"""

from __future__ import annotations

import io
import os
import uuid

import pyarrow as pa
import ray.data as rd


def read_orc(paths, columns: list[str] | None = None):
    """ORC shard files -> Dataset (one decode task per file)."""
    import pyarrow.orc as po

    bs = rd.read_binary_files(paths)

    def dec(t: pa.Table) -> pa.Table:
        tabs = [po.ORCFile(io.BytesIO(b)).read(columns=columns)
                for b in t["bytes"].to_pylist()]
        return pa.concat_tables(tabs)

    return bs.map_batches(dec, batch_size=1, batch_format="pyarrow")


def read_ipc(paths, columns: list[str] | None = None):
    """Arrow IPC / Feather-v2 shard files -> Dataset (one task per file)."""
    import pyarrow.feather as pf

    bs = rd.read_binary_files(paths)

    def dec(t: pa.Table) -> pa.Table:
        tabs = [pf.read_table(io.BytesIO(b), columns=columns)
                for b in t["bytes"].to_pylist()]
        return pa.concat_tables(tabs)

    return bs.map_batches(dec, batch_size=1, batch_format="pyarrow")


def write_columnar(ds, out_dir: str, fmt: str = "orc"):
    """Partitioned ORC / Arrow-IPC sink: one file per Ray block, flat
    directory, returns the (path, rows) manifest as a pandas frame.
    File names are content-independent (uuid) like Ray's native sinks;
    resume logic belongs to the manifest, not the names."""
    if fmt not in ("orc", "ipc"):
        raise ValueError(f"unknown columnar sink format: {fmt}")
    os.makedirs(out_dir, exist_ok=True)

    def wb(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        p = os.path.join(out_dir, f"{uuid.uuid4().hex}.{fmt}")
        if fmt == "orc":
            import pyarrow.orc as po
            po.write_table(t, p)
        else:
            import pyarrow.feather as pf
            pf.write_feather(t, p)
        return pa.table({"path": pa.array([p], type=pa.string()),
                         "rows": pa.array([t.num_rows], type=pa.int64())})

    return (ds.map_batches(wb, batch_size=None, batch_format="pyarrow")
            .to_pandas())
