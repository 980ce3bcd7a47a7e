"""clip_id uniqueness — candidate sketching + exact confirmation.

Scale design (SURVEY.md §7.3 step 5): duplicates are rare (~0.5%), so the
engine never shuffles full rows by clip_id. Instead:

 1. per-batch partial counts: one (clip_id, cnt) row per distinct id per
    batch — batches are already mostly unique, so partials ≈ input rows ONLY
    for pathological data; for normal data the groupby that follows moves
    key+count pairs, not rows;
 2. ``groupby(clip_id).sum(cnt) > 1`` confirms exact duplicates (hash shuffle
    over the id+count pairs);
 3. the confirmed-duplicate id set (tiny) is broadcast via ``ray.put`` and
    flagged row-locally in the main pass (stages/checks.flag_duplicates_stage).

HLL gives the cheap distinct estimate (metrics + early-exit: if
|HLL - rowcount| < tolerance the exact pass can be skipped entirely —
``estimate_unique``).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .stats import hll_column


def _batch_id_counts(t: pa.Table, key_col: str) -> pa.Table:
    vc = t[key_col].value_counts()
    return pa.table({key_col: vc.field("values"),
                     "cnt": pc.cast(vc.field("counts"), pa.int64())})


def find_duplicate_keys(ds, key_col: str = "clip_id") -> pd.DataFrame:
    """Exact duplicate keys and their total counts (small result)."""
    partials = ds.map_batches(lambda t: _batch_id_counts(t, key_col),
                              batch_format="pyarrow")
    merged = partials.groupby(key_col).sum("cnt")
    dups = merged.filter(lambda r: r["sum(cnt)"] > 1)
    df = dups.to_pandas()
    return df.rename(columns={"sum(cnt)": "cnt"})


def estimate_unique(ds, key_col: str = "clip_id", p: int = 14) -> float:
    return hll_column(ds, key_col, p=p).estimate()
