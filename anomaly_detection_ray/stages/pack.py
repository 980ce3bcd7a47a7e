"""Sequence packing by global prefix sum — the concat-and-chunk step of
an LLM pretraining pipeline: documents, taken in a stable global order,
are packed head-to-tail into fixed token-budget bins (``pack_id``), each
doc annotated with its bin and offset.

The global running sum is computed WITHOUT a global sort-and-scan:

1. rows are range-bucketed by id (``bucket = id // range_size``, B
   buckets — contiguous id ranges, so bucket order == global order);
2. pass 1 folds per-batch (bucket, weight-sum) partials driver-side
   (B tiny rows) and prefix-sums them into per-bucket start offsets;
3. pass 2 shuffles each bucket's rows together once
   (``groupby(bucket).map_groups``), sorts the bounded bucket locally,
   and emits local-cumsum + bucket offset.

Each doc's exclusive global prefix is therefore exact and partitioning-
independent; only one bounded shuffle (by bucket) touches the data, and
driver state is O(B). Equivalent SQL: ``SUM(w) OVER (ORDER BY id ROWS
UNBOUNDED PRECEDING)`` — the oracle for the packing queries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def prefix_pack(ds, id_col: str, weight_col: str, budget: int,
                n_buckets: int = 1024):
    """Returns one row per input row: (id, weight, global exclusive prefix
    ``start_tok``, ``pack_id`` = start_tok // budget, ``pack_offset`` =
    start_tok %% budget). Ids must be unique integers; order is ascending
    id."""
    from ..functions.fold import fold_partials

    max_id = int(ds.max(id_col))
    range_size = max(1, (max_id + 1 + n_buckets - 1) // n_buckets)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        b = df[id_col].to_numpy(dtype=np.int64) // range_size
        w = df[weight_col].to_numpy(dtype=np.int64)
        g = pd.DataFrame({"bucket": b, "wsum": w})
        return g.groupby("bucket", as_index=False).sum()

    folded = fold_partials(ds.map_batches(part, batch_format="pandas"),
                           "bucket", {"wsum": "sum"})
    folded = folded.sort_values("bucket").reset_index(drop=True)
    csum = np.concatenate([[0], np.cumsum(folded["wsum"].to_numpy())[:-1]])
    offset = dict(zip(folded["bucket"].astype(np.int64), csum.astype(np.int64)))

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        w = g[weight_col].to_numpy(dtype=np.int64)
        start = int(offset[int(g["_bucket"].iloc[0])]) + \
            np.concatenate([[0], np.cumsum(w)[:-1]])
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            weight_col: w,
            "start_tok": start,
            "pack_id": start // budget,
            "pack_offset": start % budget,
        })

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = df[id_col].to_numpy(dtype=np.int64) // range_size
        return df

    return (ds.map_batches(tag, batch_format="pandas")
            .groupby("_bucket").map_groups(scan, batch_format="pandas"))
