"""Round-5 (VERDICT r4 #5): the composite-uniqueness salt modulus is
derived (session parallelism, or a measured key_skew_stats screen)
instead of the constant 32, and a mega-key fixture shows the salt
actually bounds per-group rows at 10% skew."""

import math

from pyspark.sql import functions as F

from schema_validata_spark.operators.uniqueness import (
    _salt_col, adaptive_salt_width, composite_duplicates,
    duplicate_stats, key_skew_stats)


def _skewed(spark, n=20_000, hot_share=0.10):
    """One mega key holding ``hot_share`` of all rows; the rest
    uniform over many keys."""
    hot = int(n * hot_share)
    return spark.range(n).select(
        F.when(F.col("id") < hot, F.lit("MEGA"))
         .otherwise(F.concat(F.lit("k"), (F.col("id") % 1800)
                             .cast("string"))).alias("k"),
        F.col("id").alias("i"))


def test_width_defaults_to_session_parallelism(spark):
    # the test session runs shuffle.partitions=4; floor=8 wins, pow2
    assert adaptive_salt_width(spark.range(10)) == 8
    # a big-cluster session (thousands of reducers) widens with it
    spark.conf.set("spark.sql.shuffle.partitions", "500")
    try:
        assert adaptive_salt_width(spark.range(10)) == 512
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "4")


def test_width_from_measured_skew(spark):
    df = _skewed(spark)
    stats = key_skew_stats(df, ["k"], persist=False)
    need = max(r["skew_ratio"] for r in stats.collect())
    assert need > 50            # the mega key really is skewed
    spark.conf.set("spark.sql.shuffle.partitions", "2048")
    try:
        w = adaptive_salt_width(df, skew_stats=stats)
        # measured requirement, rounded to pow2, not the full ceiling
        assert w >= need and w <= 2 * (int(need) + 1)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
    # clamped by the reducer-count ceiling when the skew outruns it
    w4 = adaptive_salt_width(df, skew_stats=stats, floor=2)
    assert w4 == 4


def test_salt_bounds_per_group_rows_at_10pct_skew(spark):
    """The phase-1 groups of the MEGA key each hold ≈ hot_rows/width —
    no reducer-side group sees the whole hot key."""
    df = _skewed(spark)
    width = 32
    per_group = (df.select("k", _salt_col(width).alias("__s"))
                   .groupBy("k", "__s")
                   .agg(F.count(F.lit(1)).alias("c"))
                   .where(F.col("k") == "MEGA")
                   .agg(F.max("c").alias("mx"),
                        F.count(F.lit(1)).alias("groups"))
                   .collect()[0])
    hot_rows = 2000
    assert per_group["groups"] == width
    assert per_group["mx"] <= math.ceil(hot_rows / width) * 2


def test_adaptive_results_equal_fixed(spark):
    df = _skewed(spark, n=5000)
    fixed = duplicate_stats(df, ["k"], n_salts=32)
    auto = duplicate_stats(df, ["k"])
    assert fixed == auto
    a = {(r["k"], r["i"]) for r in
         composite_duplicates(df, ["k", "i"], n_salts=32).collect()}
    b = {(r["k"], r["i"]) for r in
         composite_duplicates(df, ["k", "i"]).collect()}
    assert a == b == set()      # (k, i) is unique by construction
    # and genuine duplicates still surface identically
    dup = df.unionByName(df.limit(50))
    assert duplicate_stats(dup, ["k", "i"]) \
        == duplicate_stats(dup, ["k", "i"], n_salts=16)
