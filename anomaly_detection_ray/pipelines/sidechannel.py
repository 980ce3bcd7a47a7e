"""Sharded side-output sink for per-batch metric partials.

The flagship pipelines stream their data exactly once and publish
per-partition metrics as a SIDE channel from inside ``map_batches`` (the
InfluxOutput analogue without a second pass over the verdicts —
reference src/output.py metric emission re-expressed for one-pass
streaming). Two guarantees carried over from the round-1/2 design:

- **Blocking ack**: a batch's rows are durably inside an actor before the
  block flows downstream, so the driver's ``total()`` after the sink
  write finishes can never outrun an in-flight add (the fire-and-forget
  race).
- **Content-key idempotence**: Ray tasks are at-least-once; a retried
  batch re-adds under the same content key and is dropped, so every batch
  counts exactly once.

New in round 3: the collector is SHARDED. One zero-CPU actor serialized
every pipeline batch through a single round-trip queue — a latency floor
at multi-node width (round-2 verdict finding). ``ShardedSink`` spreads
the ack over ``shards`` actors chosen by the first key byte; workers
route locally on a pickled handle list, so concurrent batches ack against
different shards and no single actor is on every batch's critical path.
"""

from __future__ import annotations

import pandas as pd

import ray


@ray.remote(num_cpus=0)
class _SinkShard:
    """One shard: content-keyed idempotent row collector."""

    def __init__(self):
        self._seen: set[bytes] = set()
        self._rows: list[dict] = []

    def add(self, key: bytes, rows: list[dict]) -> None:
        if key in self._seen:
            return
        self._seen.add(key)
        self._rows.extend(rows)

    def rows(self) -> list[dict]:
        return self._rows


class ShardedSink:
    """K-way sharded side-output collector (see module docstring).

    Picklable into ``map_batches`` closures/actors: workers carry the
    shard handle list and route adds locally by key byte."""

    def __init__(self, shards: int = 8):
        self._shards = [_SinkShard.remote() for _ in range(shards)]

    def add_sync(self, key: bytes, rows: list[dict]) -> None:
        shard = self._shards[key[0] % len(self._shards)]
        ray.get(shard.add.remote(key, rows))

    def total(self, group_col: str = "partition_id") -> pd.DataFrame:
        parts = ray.get([s.rows.remote() for s in self._shards])
        rows = [r for rs in parts for r in rs]
        if not rows:
            return pd.DataFrame()
        return (pd.DataFrame(rows)
                .groupby(group_col, as_index=False).sum())

    def kill(self) -> None:
        for s in self._shards:
            ray.kill(s)
