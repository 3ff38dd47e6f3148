"""Stage package + shared actor-pool sizing.

``pool_bounds`` is used by every actor-pool stage: an actor pool sized to
every CPU of the cluster starves downstream tasks of the same streaming
pipeline (write/aggregate tasks can't schedule) and wedges execution —
observed both in the synthetic-corpus generator and in the feature stage on
small ``ray.init(num_cpus=4)`` test sessions.  Pools therefore always leave
``headroom`` CPUs free, and start at half the cluster so autoscaling ramp-up
doesn't serialize early tasks.
"""

from __future__ import annotations


def auto_parts(lo: int = 8, per_cpu: int = 4) -> int:
    """Shuffle width for hash-partitioned groupby/join stages: ``per_cpu``
    partitions per cluster CPU (parallelism + straggler smoothing), floor
    ``lo``.  Every stage that hash-partitions derives its width from the
    cluster through this — a fixed 16/32 constant runs 16-wide shuffles on
    a 512-core cluster.  Partition count never changes results (hash
    partition + per-group reduce), only task granularity."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(lo, cpus * per_cpu)


def pool_bounds(hi_cap: int = 64, headroom: int = 2) -> tuple[int, int]:
    """(min_actors, max_actors) for a 1-CPU-per-actor pool on this cluster."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    hi = max(1, min(hi_cap, cpus - headroom))
    lo = max(1, min(cpus // 2, hi))
    return lo, hi
