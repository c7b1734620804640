"""Cluster-size-derived fan-out constants.

Fixed bucket/partition counts tuned on one host become wrong at 8× the
cluster (too few groups → idle reducers) or at 1/8th (too many groups
→ per-group overhead dominates).  Every stage that fans out derives
its constant from the cluster's CPU count through these helpers — on
the driver, once, so all producers of a shuffle agree on the value
(worker-side computation could race an autoscaler).
"""

from __future__ import annotations


def cluster_cpus(default: int = 32) -> int:
    """Total CPUs Ray currently sees (``default`` when Ray is down —
    callers building plans before ``ray.init`` get a sane constant)."""
    try:
        import ray

        if ray.is_initialized():
            return max(1, int(ray.cluster_resources().get("CPU", default)))
    except Exception:
        pass
    return default


def parallelism(per_cpu: float = 4.0, *, lo: int = 8, hi: int = 4096) -> int:
    """Target group/bucket count for a fan-out stage: ``per_cpu``
    groups per CPU (waves that interleave around stragglers), clamped
    to [lo, hi]."""
    return max(lo, min(hi, int(per_cpu * cluster_cpus())))
