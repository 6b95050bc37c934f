"""Catalyst plan-statistics probes shared by the estimate-driven guards.

Two operators gate a physical strategy on the optimizer's size estimate
(knn.ensure_parallelism's repartition guard; graph q_pagerank's
state-broadcast gate). The probe lives here once so an API change or a
decision to read a different plan stage cannot be fixed in one guard and
silently missed in the other.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's optimized-plan size estimate in bytes, None when the
    probe is unavailable (no JVM plan handle, API drift)."""
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return None
