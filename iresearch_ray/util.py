"""Small shared helpers."""

from __future__ import annotations


def pool_size(requested: int | None = None, reserve: int = 2, floor: int = 1) -> int:
    """Actor-pool size that leaves CPUs for the read/reduce stages.

    A pool that reserves every CPU starves the rest of the pipeline and the
    streaming executor serializes (or deadlocks behind backpressure) — so
    cap at cluster CPUs minus ``reserve``.
    """
    import ray

    try:
        total = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        total = 4
    cap = max(floor, total - reserve)
    return cap if requested is None else max(floor, min(requested, cap))
