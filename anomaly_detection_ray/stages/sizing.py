"""Stage-sizing helpers."""

from __future__ import annotations


def pool_size(requested: int, reserve: int = 2) -> int:
    """Fixed actor-pool size that leaves ``reserve`` CPUs for upstream read /
    task operators. Fixed pools beat autoscaling ``(1, N)`` here: the
    autoscaler ramps far too slowly for short stages (measured 5x wall), while
    a full-cluster fixed pool starves the read and deadlocks — so: all CPUs
    minus headroom, capped at the requested size."""
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", requested + reserve))
    except Exception:
        cpus = requested + reserve
    return max(1, min(requested, cpus - reserve))
