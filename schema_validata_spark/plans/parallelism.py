"""Input-parallelism guard for CPU-heavy scans.

Small/unsplittable inputs (a single parquet row group, a one-file
table) give Spark one task no matter how many cores exist, which
serializes expression-heavy passes (per-cell profiling, wide predicate
scans). ``ensure_min_parallelism`` repartitions ONLY when the scan
would otherwise use fewer tasks than the cluster has cores — at real
scale (many files / row groups, partitions ≫ cores) it is a no-op and
costs nothing; when it does trigger, the one round-robin shuffle is
repaid many times over by the parallel compute that follows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, min_factor: float = 1.0) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` iff its current scan
    has fewer than ``min_factor * defaultParallelism`` partitions."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        nparts = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — planning-only failure: leave as-is
        return df
    if nparts < max(1, int(target * min_factor)):
        return df.repartition(target)
    return df
