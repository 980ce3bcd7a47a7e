"""Clip-table source.

The north rule names Lance tables; ``pylance`` is not installed in this
sandbox (SURVEY.md §7.5), so the source abstraction reads Parquet with the
identical schema and call shape — switching to ``ray.data.read_lance(uri)``
is a one-line change here and nowhere else.

Always pass ``columns`` — reading all columns (the ``bytes`` payload
dominates) for a metadata-only stage is wrong at any scale.
"""

from __future__ import annotations

import ray.data as rd

META_COLUMNS = ["clip_id", "sr_hz", "dur_ms", "codec", "transcript", "partition_id"]


def read_clips(path: str, columns: list[str] | None = None,
               partitions: list[int] | None = None, **kwargs):
    """Read the clip table, pruning columns at the read and (for resume)
    pushing a partition_id row-group filter down to the scan."""
    import pyarrow.compute as pc

    flt = None
    if partitions is not None:
        flt = pc.field("partition_id").isin(partitions)
    if hasattr(rd, "read_lance") and str(path).endswith(".lance"):
        # ray.data.read_lance takes the row filter as a SQL boolean string
        # (ray 2.49 signature; pylance itself is env-blocked — the call
        # shape is pinned by tests/test_fault_tolerance.py's mock)
        lance_flt = None
        if partitions is not None:
            ids = ", ".join(str(int(p)) for p in partitions)
            lance_flt = f"partition_id IN ({ids})"
        return rd.read_lance(path, columns=columns, filter=lance_flt,
                             **kwargs)
    return rd.read_parquet(path, columns=columns, filter=flt, **kwargs)
