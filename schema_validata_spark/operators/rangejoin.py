"""Range (interval-containment) join — match point rows to the interval
rows that contain them, without a nested-loop plan.

A plain ``p.v >= i.lo AND p.v < i.hi`` join has no equi-key, so Catalyst
plans BroadcastNestedLoopJoin (fine only while the interval side
broadcasts) or a cartesian product (never fine). The scale path is the
standard BUCKETIZED range join (the same design Databricks documents as
"range join optimization" and Flink/Trino implement for interval
matching): quantize the value domain into fixed-width buckets, explode
each interval onto every bucket it overlaps, map each point to its
single bucket, equi-join on (bucket [, by-keys]) and apply the exact
containment predicate as a post-filter.

COST MODEL: interval side emits ceil(length/width)+1 rows per interval;
point side 1 row each. The equi-join shuffles on 8-byte bucket ids —
pick ``bucket_width`` near the TYPICAL interval length so most
intervals land in O(1) buckets (width ≪ length explodes the interval
side; width ≫ length makes buckets coarse and the post-filter drop
rate high, not wrong). A (point, interval) pair can meet in at most
ONE bucket — the point's own — so the output needs no dedup. Heavily
skewed value distributions concentrate points in few buckets; AQE's
skew-join split handles the join-side imbalance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(points: DataFrame, intervals: DataFrame,
                  point_col: str, lo_col: str, hi_col: str,
                  by_cols: list[str] | None = None,
                  bucket_width: float | None = None) -> DataFrame:
    """Inner join of each point row to every interval row with
    ``lo <= point < hi`` (half-open, the unambiguous convention for
    adjacent bands) and equal ``by_cols``. Output: all point columns +
    all interval columns (names must not collide — rename upstream).

    ``bucket_width`` defaults to the mean interval length (one
    aggregate over the intervals frame — a plan-time scalar, same
    spirit as AQE statistics; pass it explicitly in hot paths to skip
    that job). NULL points / NULL-bounded intervals never match
    (SQL comparison semantics — they quantize to no bucket)."""
    by_cols = list(by_cols or [])
    clash = set(intervals.columns) & set(points.columns) - set(by_cols)
    if clash:
        raise ValueError(f"interval columns collide with point columns:"
                         f" {sorted(clash)}; rename upstream")
    if bucket_width is None:
        row = intervals.agg(
            F.avg(F.col(hi_col) - F.col(lo_col)).alias("w")).first()
        bucket_width = float(row["w"]) if row["w"] else 1.0
    w = float(bucket_width)
    if w <= 0:
        raise ValueError(f"bucket_width must be positive, got {w}")

    iv = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(
            F.floor(F.col(lo_col) / w).cast("bigint"),
            F.floor(F.col(hi_col) / w).cast("bigint"))))
    pt = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / w).cast("bigint"))
    joined = pt.join(iv, ["__bucket"] + by_cols)
    return (joined.where((F.col(point_col) >= F.col(lo_col))
                         & (F.col(point_col) < F.col(hi_col)))
                  .drop("__bucket"))
