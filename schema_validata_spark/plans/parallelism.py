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
    """Repartition ``df`` to ``defaultParallelism`` iff its scan would
    otherwise use fewer tasks than ``min_factor * defaultParallelism``.

    For file-backed sources the decision uses ``inputFiles()`` — pure
    metadata, no ``.rdd`` materialization (converting to RDD forces an
    extra analysis/conversion per call on the hot orchestration path).
    Small single-row-group files plan one task per file, so the file
    count IS the effective parallelism there; at real scale (files ≥
    cores) this returns immediately. Non-file sources (in-memory frames,
    post-shuffle) fall back to the exact partition count."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    floor = max(1, int(target * min_factor))
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — planning-only failure: leave as-is
        files = []
    if files and len(files) >= floor:
        # many files → at least one task each; metadata-only fast exit
        return df
    # few (or unknown) files: a few LARGE parquet files still split into
    # many tasks via maxPartitionBytes, so confirm with the planner's
    # actual partition count before paying a full repartition shuffle —
    # repartitioning an 8×1 GB table that already planned 64 scan tasks
    # would be a pure regression
    try:
        nparts = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — planning-only failure: leave as-is
        return df
    if nparts < floor:
        return df.repartition(target)
    return df
