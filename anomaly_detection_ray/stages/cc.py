"""Distributed connected components over a duplicate-pair edge list.

Dedup pipelines (MinHash / SimHash / embedding / fingerprint) emit PAIRS;
turning pairs into duplicate GROUPS is a connected-components problem. For
a near-dup rate ≪ 1 the edge list is tiny and a driver union-find is
optimal — but on a dup-heavy corpus (crawl snapshots, boilerplate farms)
the edge list is unbounded, the round-1 verdict's one remaining
driver-side liability. Both regimes live here behind one call, switched by
edge count like functions/fold.fold_partials:

- small: path-compressed union-find on the driver (exact, O(E α(E))).
- large: min-label propagation as Ray Data iterations — labels start as
  each node's own id; the edge list is symmetrized ONCE (both directions,
  2|E| rows), then every iteration ships labels across it with a single
  hash join, takes the min per node, and stops when the global label sum
  stops falling (the sum is strictly decreasing until fixed point, so
  convergence needs one cheap aggregate, no driver diff).
  O(diameter) iterations; per-iteration state is the (node, label) table —
  worker-resident, never on the driver.

Both regimes return component = MIN node id, so they are bit-identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _union_find(pairs: pd.DataFrame, a_col: str, b_col: str) -> pd.DataFrame:
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs[a_col], pairs[b_col]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    nodes = sorted(set(pairs[a_col]) | set(pairs[b_col]))
    return pd.DataFrame({"node": nodes,
                         "component": [find(n) for n in nodes]})


def _label_propagation(edges, a_col: str, b_col: str,
                       max_iters: int,
                       num_partitions: int = 8,
                       as_dataset: bool = False):
    from ray.data.aggregate import Min, Sum

    from ..functions.rayutil import arrowize

    def symmetrize(df: pd.DataFrame) -> pd.DataFrame:
        a, b = df[a_col].to_numpy(), df[b_col].to_numpy()
        return pd.DataFrame({"src": np.concatenate([a, b]),
                             "dst": np.concatenate([b, a])})

    # both directions materialized ONCE (2|E| rows): the loop then needs a
    # single edges⋈labels join per iteration instead of one per direction —
    # half the join operations and label-side hash builds per hop
    sym = (arrowize(edges.map_batches(symmetrize, batch_format="pandas"))
           .materialize())
    labels = (sym.groupby("src").aggregate(Min("src", alias_name="label"))
              .map_batches(lambda t: t.rename_columns(["node", "label"]),
                           batch_format="pyarrow")
              .materialize())
    # the Sum convergence check needs numeric node ids; the union-find
    # regime handles strings — pre-map string ids to ints to use this path
    first = labels.take(1)
    if first and not np.issubdtype(np.asarray([first[0]["node"]]).dtype,
                                   np.number):
        raise TypeError("label propagation requires numeric node ids; "
                        "map string ids to ints first (the union-find "
                        "regime accepts strings)")
    def hop_project(t):
        import pyarrow as pa
        return pa.table({"node": t["dst"], "label": t["label"]})

    prev_sum = None
    # +1: a graph converging exactly at iteration max_iters still needs one
    # confirming pass to observe the unchanged sum — don't false-alarm
    for it in range(max_iters + 1):
        # ship labels across the pre-symmetrized edges (one join covers
        # both directions), then min per node
        hop = (sym.join(labels, join_type="inner", num_partitions=num_partitions,
                        on=("src",), right_on=("node",))
               .map_batches(hop_project, batch_format="pyarrow"))
        labels = (arrowize(labels).union(arrowize(hop))
                  .groupby("node").aggregate(Min("label", alias_name="label"))
                  .materialize())
        # pointer jumping: label <- label(label). Every label is itself a
        # node (a min over node ids), so the self-join is total; this
        # contracts chains geometrically — O(log diameter) iterations
        # instead of O(diameter) for the edge hops alone.
        lbl_map = labels.rename_columns(["jnode", "jlabel"])

        def relabel(t):
            import pyarrow as pa
            return pa.table({"node": t["node"], "label": t["jlabel"]})

        labels = (labels.join(lbl_map, join_type="inner", num_partitions=num_partitions,
                              on=("label",), right_on=("jnode",))
                  .map_batches(relabel, batch_format="pyarrow")
                  .materialize())
        s = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if s == prev_sum:
            break
        prev_sum = s
    else:
        # exhausting the cap without the sum stabilizing would silently
        # return split components — refuse instead
        raise RuntimeError(
            f"connected components did not converge in {max_iters} "
            f"iterations; raise max_iters")
    if as_dataset:
        # worker-resident result: (node, component) stays a Dataset so a
        # dup-heavy corpus's cluster table never transits the driver
        return labels.map_batches(
            lambda t: t.rename_columns(["node", "component"]),
            batch_format="pyarrow")
    out = labels.to_pandas().rename(columns={"label": "component"})
    return out.sort_values("node").reset_index(drop=True)


def connected_components(pairs, a_col: str = "id_a", b_col: str = "id_b",
                         edge_threshold: int = 200_000,
                         max_iters: int = 50,
                         num_partitions: int = 8,
                         as_dataset: bool = False):
    """(node, component=min id in component) from an edge list — pandas
    DataFrame or Ray Dataset. Small edge lists fold on the driver; past
    ``edge_threshold`` edges the Ray label-propagation path runs.

    ``as_dataset=True`` returns a Ray Dataset in BOTH regimes (the small
    regime's exact union-find result is wrapped) so callers in the
    anti-join curation path never hold O(dup-cluster) rows on the driver.
    A Dataset input is counted to pick the regime — pass it materialized
    so the count doesn't re-execute the upstream plan."""
    import ray.data as rd

    if isinstance(pairs, pd.DataFrame):
        small = len(pairs) <= edge_threshold
    else:
        small = pairs.count() <= edge_threshold
        if small:
            pairs = pairs.to_pandas()
    if small:
        out = (_union_find(pairs, a_col, b_col)
               .sort_values("node").reset_index(drop=True))
        return rd.from_pandas(out) if as_dataset else out
    if isinstance(pairs, pd.DataFrame):
        pairs = rd.from_pandas(pairs)
    return _label_propagation(pairs, a_col, b_col, max_iters,
                              num_partitions, as_dataset=as_dataset)
