"""Small shared Ray Data utilities."""

from __future__ import annotations


def arrowize(ds):
    """Canonicalize block type to Arrow.

    ``Dataset.union`` refuses to mix block types, but join outputs are
    Arrow blocks while pandas-born map_batches/aggregates produce pandas
    blocks — pass every union branch through this first.
    """
    return ds.map_batches(lambda t: t, batch_format="pyarrow")
