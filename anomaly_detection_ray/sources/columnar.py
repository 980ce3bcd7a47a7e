"""ORC and Arrow-IPC (Feather) shard-file sources and sinks.

Ray Data ships parquet/csv/json natively; warehouse estates also carry
ORC and Arrow IPC shards. Both formats get a first-class source here with
TWO levels of parallelism and a partitioned sink that emits one file per
Ray block plus a (path, rows) manifest.

Parallelism contract (100 TB):
- Unit of work = a STRIPE RANGE (ORC) / RECORD-BATCH RANGE (IPC), not the
  file: a single huge shard no longer serializes into one task. Planning
  is a parallel footer-metadata pass (one Ray task per file batch); the
  collected plan is O(total_stripes / stripes_per_task) tiny rows — the
  same cost class as Ray's own parquet metadata fetch — and fans out via
  ``from_items`` with one range per block.
- ``columns=`` pruning happens inside the pyarrow readers (ORC reads only
  the selected column streams per stripe; IPC record batches are
  column-sliced on a memory-mapped file), so a 2-column scan of a wide
  table does not materialize the row payload.
- Paths must be worker-visible (shared FS / NFS — the same contract as
  every other source in this repo).
- Sinks write one file per block into a flat directory — the resumable
  partitioned layout every other sink in this repo uses; the returned
  manifest is O(files) and drives skip-finished-partition logic.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import ray.data as rd


def _expand(paths) -> list[str]:
    if isinstance(paths, (str, os.PathLike)):
        paths = [paths]
    out: list[str] = []
    for p in paths:
        p = os.fspath(p)
        if os.path.isdir(p):
            out.extend(sorted(os.path.join(p, f) for f in os.listdir(p)
                              if not f.startswith("_")))
        else:
            out.append(p)
    return out


def _plan_ranges(files: list[str], count_units, units_per_task: int):
    """Parallel footer pass -> [(path, lo, hi)] unit ranges (driver-held,
    O(units / units_per_task) tiny rows)."""
    src = rd.from_items([{"path": p} for p in files])

    def plan(t: pa.Table) -> pa.Table:
        ps, lo, hi = [], [], []
        for p in t["path"].to_pylist():
            n = count_units(p)
            for s in range(0, max(n, 1), units_per_task):
                ps.append(p)
                lo.append(s)
                hi.append(min(n, s + units_per_task))
        return pa.table({"path": pa.array(ps, pa.string()),
                         "lo": pa.array(lo, pa.int64()),
                         "hi": pa.array(hi, pa.int64())})

    plan_df = src.map_batches(plan, batch_format="pyarrow").to_pandas()
    return list(plan_df.itertuples(index=False, name=None))


def _range_dataset(ranges):
    items = [{"path": p, "lo": int(lo), "hi": int(hi)}
             for p, lo, hi in ranges]
    # one range per block => one decode task per range (full fan-out)
    return rd.from_items(items, override_num_blocks=max(len(items), 1))


def read_orc(paths, columns: list[str] | None = None,
             stripes_per_task: int = 8):
    """ORC shards -> Dataset; one decode task per ``stripes_per_task``
    stripes, so a single multi-stripe file reads in parallel blocks."""
    import pyarrow.orc as po

    ranges = _plan_ranges(_expand(paths),
                          lambda p: po.ORCFile(p).nstripes,
                          stripes_per_task)

    def dec(t: pa.Table) -> pa.Table:
        tabs = []
        for p, lo, hi in zip(t["path"].to_pylist(), t["lo"].to_pylist(),
                             t["hi"].to_pylist()):
            f = po.ORCFile(p)
            if hi <= lo:  # zero-stripe (empty) file: keep the schema
                empty = f.schema.empty_table()
                tabs.append(empty.select(columns) if columns else empty)
            for i in range(lo, hi):
                b = f.read_stripe(i, columns=columns)
                tabs.append(pa.Table.from_batches([b])
                            if isinstance(b, pa.RecordBatch) else b)
        return pa.concat_tables(tabs)

    return _range_dataset(ranges).map_batches(dec, batch_size=1,
                                              batch_format="pyarrow")


def read_ipc(paths, columns: list[str] | None = None,
             batches_per_task: int = 16):
    """Arrow IPC / Feather-v2 shards -> Dataset; one task per
    ``batches_per_task`` record batches over a memory-mapped file."""

    def n_batches(p: str) -> int:
        with pa.memory_map(p) as mm:
            return pa.ipc.open_file(mm).num_record_batches

    ranges = _plan_ranges(_expand(paths), n_batches, batches_per_task)

    def dec(t: pa.Table) -> pa.Table:
        tabs = []
        for p, lo, hi in zip(t["path"].to_pylist(), t["lo"].to_pylist(),
                             t["hi"].to_pylist()):
            with pa.memory_map(p) as mm:
                r = pa.ipc.open_file(mm)
                batches = [r.get_batch(i) for i in range(lo, hi)]
                tab = (pa.Table.from_batches(batches) if batches
                       else r.schema.empty_table())
            tabs.append(tab.select(columns) if columns else tab)
        return pa.concat_tables(tabs)

    return _range_dataset(ranges).map_batches(dec, batch_size=1,
                                              batch_format="pyarrow")


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
