"""File-layout QA: the small-file problem, quantified from inside the
scan. At 100 TB the difference between 128 MB parquet files and a
million 200 KB ones is the difference between a working table and one
that spends its runtime opening footers; this profiles the ACTUAL
row-to-file distribution a DataFrame reads, using ``input_file_name()``
so it needs no filesystem listing permissions and sees exactly what
Spark sees (post partition-pruning).

The reference reads single spreadsheets (src/schema_validata.py:862-953)
and has no layout concept; this is a north-rule scale addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def file_skew_profile(df: DataFrame,
                      small_file_rows: int = 10_000) -> DataFrame:
    """Rows-per-file distribution of whatever ``df`` scans.

    Output ONE row: n_files, total_rows, min_rows, max_rows, avg_rows
    (2dp), skew_ratio (max/avg, 2dp — >2 means AQE-visible imbalance),
    small_files (files under ``small_file_rows`` rows — compaction
    candidates), small_file_share (2dp). Empty input → n_files 0 and
    NULL stats (no fabricated zeros).

    SCALE: ONE hash aggregate keyed by file name (map-side combined —
    each task emits one partial per file it touched, so the shuffle is
    #files-sized), then one global roll-up of the #files frame. This is
    the audit you run BEFORE choosing ``maxPartitionBytes`` /
    compaction targets; pair with a writer using
    ``df.repartition(target)`` when skew_ratio says the layout is bad.
    """
    per_file = (df.groupBy(F.input_file_name().alias("__f"))
                .agg(F.count(F.lit(1)).cast("bigint").alias("rows")))
    return per_file.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("rows").cast("bigint").alias("total_rows"),
        F.min("rows").alias("min_rows"),
        F.max("rows").alias("max_rows"),
        F.round(F.avg("rows"), 2).alias("avg_rows"),
        F.round(F.max("rows") / F.avg("rows"), 2).alias("skew_ratio"),
        F.sum(F.when(F.col("rows") < small_file_rows, 1).otherwise(0))
         .cast("bigint").alias("small_files"),
        F.round(F.sum(F.when(F.col("rows") < small_file_rows, 1.0)
                      .otherwise(0.0)) / F.count(F.lit(1)), 2)
         .alias("small_file_share"))
