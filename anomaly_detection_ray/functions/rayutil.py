"""Small shared Ray Data utilities."""

from __future__ import annotations


def arrowize(ds):
    """Canonicalize block type to Arrow.

    ``Dataset.union`` refuses to mix block types, but join outputs are
    Arrow blocks while pandas-born map_batches/aggregates produce pandas
    blocks — pass every union branch through this first.
    """
    return ds.map_batches(lambda t: t, batch_format="pyarrow")


def ramp_offsets(reps):
    """Vectorized concatenation of per-row ramps 0..reps[i]-1 (the
    replication-offset pattern used by interval joins and sliding
    windows) without a per-row np.arange."""
    import numpy as np
    reps = np.asarray(reps, dtype=np.int64)
    return np.arange(reps.sum()) - np.repeat(np.cumsum(reps) - reps, reps)
