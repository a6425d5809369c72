"""Mergeable HLL distinct sketches: merge invariance, incremental
update equivalence, accuracy regimes (operators/sketches.py)."""

import pytest
from pyspark.sql import Row, functions as F

from schema_validata_spark.operators.sketches import (
    incremental_update, load_sketches, partition_sketches,
    save_sketches, union_estimates)


def _events(spark, rows):
    return spark.createDataFrame([Row(day=d, uid=u, kind=k)
                                  for d, u, k in rows])


BASE = ([("d1", i % 7, "a") for i in range(20)]
        + [("d2", 100 + (i % 5), "b") for i in range(10)]
        + [("d3", i % 7, "c") for i in range(15)])


def test_union_of_partition_sketches_equals_whole_table(spark):
    df = _events(spark, BASE)
    per = partition_sketches(df, ["uid", "kind"], "day")
    est = {r["column_name"]: r for r in union_estimates(per).collect()}
    assert est["uid"]["n_distinct_est"] == 12      # 7 + 5 disjoint
    assert est["kind"]["n_distinct_est"] == 3
    assert est["uid"]["n_rows"] == len(BASE)
    # merge-invariance: any partition subset split unions identically
    whole = df.agg(F.hll_sketch_estimate(
        F.hll_sketch_agg("uid", F.lit(12)))).collect()[0][0]
    assert est["uid"]["n_distinct_est"] == whole


def test_incremental_update_matches_full_recompute(spark, tmp_path):
    df = _events(spark, BASE)
    cached = partition_sketches(df, ["uid"], "day")
    path = str(tmp_path / "sk")
    save_sketches(cached, path)
    # d2's data changes: two new uids appear
    changed = [("d2", 100 + (i % 5), "b") for i in range(10)] + [
        ("d2", 500, "b"), ("d2", 501, "b")]
    new_table = _events(spark, [r for r in BASE if r[0] != "d2"] + changed)
    fresh = partition_sketches(
        new_table.where(F.col("day") == "d2"), ["uid"], "day")
    merged = incremental_update(load_sketches(spark, path), fresh, ["d2"])
    inc = union_estimates(merged).collect()[0]
    full = union_estimates(
        partition_sketches(new_table, ["uid"], "day")).collect()[0]
    assert inc["n_distinct_est"] == full["n_distinct_est"] == 14
    assert inc["n_rows"] == full["n_rows"] == new_table.count()


def test_nulls_are_not_coupons(spark):
    df = spark.createDataFrame(
        [Row(day="d1", uid=None), Row(day="d1", uid=1),
         Row(day="d1", uid=None), Row(day="d2", uid=2)])
    est = union_estimates(
        partition_sketches(df, ["uid"], "day")).collect()[0]
    assert est["n_distinct_est"] == 2   # NULLs excluded, rows counted
    assert est["n_rows"] == 4


def test_high_cardinality_within_tolerance(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 4).cast("string").alias("day"),
        F.col("id").alias("uid"))
    est = union_estimates(
        partition_sketches(df, ["uid"], "day")).collect()[0]
    assert abs(est["n_distinct_est"] - 10_000) / 10_000 < 0.02


def test_empty_cols_rejected(spark):
    df = spark.createDataFrame([Row(day="d1", uid=1)])
    with pytest.raises(ValueError):
        partition_sketches(df, [], "day")
