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


def _interleave_expr(xq, yq, bits):
    """Morton/Z-value Column: interleave ``bits`` bits of xq (even
    positions) and yq (odd) — built as a closed-form shift/or chain so
    the identical expression renders in Spark and ANSI SQL."""
    # NOTE: Column.__or__ is LOGICAL or in PySpark — bitwiseOR() is the
    # bit operator
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xq, i) % 2, 2 * i).cast("bigint")
        ).bitwiseOR(
            F.shiftleft(F.shiftright(yq, i) % 2, 2 * i + 1)
             .cast("bigint"))
    return z


def zorder_preview(df: DataFrame, x_col: str, y_col: str,
                   x_lo: float, x_hi: float, y_lo: float, y_hi: float,
                   bits: int = 8, buckets_log2: int = 4) -> DataFrame:
    """Preview of a Z-ORDER (Morton-curve) layout on two columns: how
    would rows cluster if the table were rewritten sorted by the
    interleaved-bit value? Per Z-bucket, report the row count and the
    x/y bounding box — tight boxes mean a z-sorted rewrite gives real
    min/max-pruning on BOTH columns; one giant box means don't bother.
    This is the cheap dry-run before an expensive re-layout (Delta
    OPTIMIZE ZORDER-style) of a 100 TB table.

    Columns are quantized to ``bits`` bits on the caller's fixed
    [lo, hi) ranges (fixed, not data-derived — deterministic across
    engines and snapshots); values clamp at the edges. The bucket is
    the top ``buckets_log2`` bits of the 2·bits-bit Z-value (2^b_log2
    buckets).

    Output per non-empty bucket: zbucket (int), n (bigint), x_min,
    x_max, y_min, y_max (6dp).

    SCALE: the Z-value is a pure bit-arithmetic projection (codegen'd,
    no UDF) and the aggregate is keyed by ≤2^buckets_log2 ints — one
    map-side-combined pass. The preview never sorts; only an actual
    rewrite would."""
    if bits < 1 or bits > 16 or buckets_log2 < 1 \
            or buckets_log2 > 2 * bits:
        raise ValueError("need 1 <= bits <= 16 and "
                         "1 <= buckets_log2 <= 2*bits")
    if not (x_hi > x_lo and y_hi > y_lo):
        raise ValueError("need hi > lo for both ranges")
    n_q = (1 << bits) - 1
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")

    def quant(c, lo, hi):
        scaled = F.floor((c - F.lit(lo)) / F.lit((hi - lo))
                         * F.lit(1 << bits)).cast("bigint")
        return F.least(F.greatest(scaled, F.lit(0).cast("bigint")),
                       F.lit(n_q).cast("bigint"))

    z = _interleave_expr(quant(x, x_lo, x_hi), quant(y, y_lo, y_hi),
                         bits)
    bucket = F.shiftright(z, 2 * bits - buckets_log2).cast("int")
    return (df.where(x.isNotNull() & y.isNotNull())
            .groupBy(bucket.alias("zbucket"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.round(F.min(x), 6).alias("x_min"),
                 F.round(F.max(x), 6).alias("x_max"),
                 F.round(F.min(y), 6).alias("y_min"),
                 F.round(F.max(y), 6).alias("y_max")))
