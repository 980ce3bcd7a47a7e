"""Cardinality-aware merge of per-batch partial aggregates.

Per-batch partials (one row per group per batch, combined inside
``map_batches``) are the engine's standard pre-aggregation shape. Merging
them has two regimes:

- LOW key cardinality: the driver sees O(#batches x #groups) tiny rows; an
  incremental pandas fold (memory O(#groups)) beats a Ray shuffle by its
  ~5-20s fixed cost (measured, ray 2.49).
- HIGH key cardinality: the driver must not hold O(keys); the partials
  re-execute through a Ray ``groupby().aggregate()`` — per-worker memory,
  all-to-all shuffle.

``fold_partials`` switches automatically: it folds incrementally and
abandons to the Ray path the moment the folded key count crosses
``key_threshold`` (the recompute is the rare high-cardinality case).
"""

from __future__ import annotations

import pandas as pd

_RAY_AGGS = {"sum", "max", "min"}


def fold_ray(partials_ds, group_cols, agg: dict, as_dataset: bool = False):
    """All-to-all path: Ray groupby-aggregate over the same partials.

    ``as_dataset=True`` returns the aggregated Dataset WITHOUT collecting —
    the required shape when the fold key is a corpus item (e.g. clip_id):
    the merged table is itself corpus-scaled and must never land on the
    driver."""
    from ray.data.aggregate import Max, Min, Sum

    mk = {"sum": Sum, "max": Max, "min": Min}
    assert all(how in _RAY_AGGS for how in agg.values())
    fns = [mk[how](on=c, alias_name=c) for c, how in agg.items()]
    keys = group_cols if isinstance(group_cols, list) else [group_cols]
    res = partials_ds.groupby(keys).aggregate(*fns)
    return res if as_dataset else res.to_pandas()


def fold_partials(partials_ds, group_cols, agg: dict,
                  key_threshold: int = 200_000, as_dataset: bool = False):
    """Merge per-batch partials; see module docstring for the two regimes.

    ``as_dataset=True``: return a ``ray.data.Dataset`` in BOTH regimes —
    below the threshold the (bounded, <= key_threshold-row) driver fold is
    wrapped via ``from_pandas`` (no extra shuffle at small scale); above
    it the Ray groupby-aggregate streams through untouched. Use for folds
    keyed by a corpus item (clip_id, doc_id): the caller gets a stream
    whose driver footprint is bounded by the threshold at any input size."""
    merged: pd.DataFrame | None = None
    chunks: list[pd.DataFrame] = []

    def combine() -> pd.DataFrame:
        frames = ([merged] if merged is not None else []) + chunks
        if not frames:  # zero batches emitted (e.g. no candidate pairs):
            # keep the declared columns so callers can index them
            keys = group_cols if isinstance(group_cols, list) else [group_cols]
            return pd.DataFrame(columns=[*keys, *agg])
        df = pd.concat(frames, ignore_index=True)
        if df.empty:
            return df
        return df.groupby(group_cols, as_index=False).agg(agg)

    for b in partials_ds.iter_batches(batch_format="pandas", batch_size=None):
        chunks.append(b)
        if len(chunks) >= 32:
            merged, chunks = combine(), []
            if len(merged) > key_threshold:
                return fold_ray(partials_ds, group_cols, agg,
                                as_dataset=as_dataset)
    out = combine()
    if as_dataset:
        import ray.data as rd
        return rd.from_pandas(out)
    return out
