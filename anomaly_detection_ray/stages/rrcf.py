"""Robust Random Cut Forest — from scratch (Guha, Mishra, Roy & Schrijvers,
ICML 2016), re-expressing the reference's rrcf-lib scorer
(/root/reference/src/algorithms/rrcf_trees.py:21-127):

- a forest of ``num_trees`` random cut trees over a sliding window of the
  last ``tree_size`` points per tree;
- per record: forget the oldest point once the window is full, insert the
  new point, score = mean CoDisp across trees;
- score > threshold ⇒ Error, and (faithfully reproducing the reference's
  quirk at rrcf_trees.py:115-117) ``status_code`` is set to the float score
  on anomalies — the engine keeps the int8 verdict in ``rr_code`` and the
  float score in ``rr_score`` so the quirk is representable columnar-ly.

The sketch is inherently sequential (insert/forget mutate the trees), so it
runs as a per-group ordered kernel — the same shape as the reference's
single stream, but one bounded group per task across the cluster. Tree ops
are O(depth) per point with numpy bounding boxes; the per-record loop is the
algorithm, not an implementation shortcut.

CoDisp(x) = max over ancestors S of leaf(x) of |sibling(S)| / |S|.
"""

from __future__ import annotations

import numpy as np

from ..functions.grading import ERROR_CODE, OK_CODE, UNDEFINED_CODE


class _Node:
    __slots__ = ("left", "right", "parent", "dim", "cut", "size",
                 "bmin", "bmax", "index")

    def __init__(self, bmin, bmax, size=1, index=None):
        self.left = self.right = self.parent = None
        self.dim = -1
        self.cut = 0.0
        self.size = size
        self.bmin = bmin
        self.bmax = bmax
        self.index = index  # leaf only


class RandomCutTree:
    """One RCT with insert_point / forget_point / codisp (paper Fig. 2/4)."""

    def __init__(self, rng: np.random.Generator):
        self.rng = rng
        self.root: _Node | None = None
        self.leaves: dict[int, _Node] = {}

    def insert_point(self, p: np.ndarray, index: int) -> None:
        p = np.asarray(p, dtype=np.float64)
        leaf = _Node(p.copy(), p.copy(), size=1, index=index)
        self.leaves[index] = leaf
        if self.root is None:
            self.root = leaf
            return
        node = self.root
        parent = None
        from_left = False
        while True:
            # propose a random cut over the box extended with p
            bmin = np.minimum(node.bmin, p)
            bmax = np.maximum(node.bmax, p)
            span = bmax - bmin
            total = span.sum()
            if total <= 0:  # duplicate point: descend to any leaf side
                if node.index is not None:
                    break
                parent, node, from_left = node, node.left, True
                continue
            r = self.rng.uniform(0, total)
            dim = int(np.searchsorted(np.cumsum(span), r))
            dim = min(dim, len(span) - 1)
            cut = bmin[dim] + r - np.cumsum(span)[dim] + span[dim]
            # does the cut separate p from the existing box?
            if cut < node.bmin[dim]:   # p on the left of the cut
                if p[dim] <= cut:
                    self._split_here(node, parent, from_left, leaf, dim, cut,
                                     new_on_left=True)
                    return
            if cut >= node.bmax[dim]:  # p on the right
                if p[dim] > cut:
                    self._split_here(node, parent, from_left, leaf, dim, cut,
                                     new_on_left=False)
                    return
            # no separation at this node: grow the box and descend
            if node.index is not None:
                break  # reached a leaf without separating -> split by value
            node.bmin, node.bmax = bmin, bmax
            node.size += 1
            parent = node
            from_left = p[node.dim] <= node.cut
            node = node.left if from_left else node.right
        # split against the leaf: deterministic fallback cut between values
        q = node.bmin  # leaf point
        span = np.abs(p - q)
        if span.sum() <= 0:
            dim, cut = 0, float(p[0])
            new_on_left = False
        else:
            w = span / span.sum()
            dim = int(self.rng.choice(len(p), p=w))
            lo, hi = min(p[dim], q[dim]), max(p[dim], q[dim])
            cut = self.rng.uniform(lo, hi) if hi > lo else lo
            new_on_left = p[dim] <= cut
        self._split_here(node, parent, from_left, leaf, dim, cut, new_on_left)

    def _split_here(self, node, parent, from_left, leaf, dim, cut,
                    new_on_left):
        branch = _Node(np.minimum(node.bmin, leaf.bmin),
                       np.maximum(node.bmax, leaf.bmax),
                       size=node.size + 1)
        branch.dim, branch.cut = dim, float(cut)
        if new_on_left:
            branch.left, branch.right = leaf, node
        else:
            branch.left, branch.right = node, leaf
        leaf.parent = branch
        node.parent = branch
        branch.parent = parent
        if parent is None:
            self.root = branch
        elif from_left:
            parent.left = branch
        else:
            parent.right = branch

    def forget_point(self, index: int) -> None:
        leaf = self.leaves.pop(index, None)
        if leaf is None:
            return
        parent = leaf.parent
        if parent is None:
            self.root = None
            return
        sibling = parent.left if parent.right is leaf else parent.right
        grand = parent.parent
        sibling.parent = grand
        if grand is None:
            self.root = sibling
        elif grand.left is parent:
            grand.left = sibling
        else:
            grand.right = sibling
        # shrink ancestor boxes / sizes
        node = grand
        while node is not None:
            node.size -= 1
            node.bmin = np.minimum(node.left.bmin, node.right.bmin)
            node.bmax = np.maximum(node.left.bmax, node.right.bmax)
            node = node.parent

    def codisp(self, index: int) -> float:
        leaf = self.leaves.get(index)
        if leaf is None or leaf.parent is None:
            return 0.0
        best = 0.0
        node = leaf
        while node.parent is not None:
            parent = node.parent
            sibling = parent.left if parent.right is node else parent.right
            best = max(best, sibling.size / max(node.size, 1))
            node = parent
        return best


def rrcf_check(values: np.ndarray, num_trees: int = 10, tree_size: int = 64,
               threshold: float = 3.0, seed: int = 0) -> dict[str, np.ndarray]:
    """Series kernel (stages/series.py KERNELS shape): stream one sorted
    series through the forest; rr_code Error where mean CoDisp > threshold,
    rr_score carries the float score (the reference's status_code quirk)."""
    n = len(values)
    code = np.full(n, OK_CODE, dtype=np.int8)
    status = np.full(n, "OK", dtype=object)
    score = np.zeros(n)
    rng = np.random.default_rng(seed)
    trees = [RandomCutTree(np.random.default_rng(rng.integers(2**63)))
             for _ in range(num_trees)]
    for i in range(n):
        p = np.atleast_1d(values[i]).astype(np.float64)
        s = 0.0
        for tree in trees:
            if len(tree.leaves) >= tree_size:
                tree.forget_point(i - tree_size)
            tree.insert_point(p, index=i)
            s += tree.codisp(i) / num_trees
        score[i] = s
        if s > threshold:
            code[i] = ERROR_CODE
            status[i] = f"Error: Anomaly detected: {s}"
    return {"status_code": code, "status": status, "rr_score": score}
