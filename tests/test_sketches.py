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


# ---------------------------------------------------------- quantiles


def _qdata(spark, n=50000, parts=10):
    from pyspark.sql import functions as F
    return spark.range(n).select(
        (F.col("id") % parts).cast("string").alias("p"),
        F.col("id").cast("double").alias("x"),
        # heavy-tailed second column so interpolation actually matters
        (F.pow(F.col("id") % 1000, 2.0)).alias("y"))


def test_quantile_merge_rank_error_bound(spark):
    """Flat merge of per-partition summaries answers quantiles within
    the documented n/(2k) rank bound (asserted at 2x slack)."""
    from pyspark.sql import functions as F

    from schema_validata_spark.operators.sketches import (
        merge_quantile_estimates, quantile_summaries)

    n, k = 50000, 64
    df = _qdata(spark, n)
    est = merge_quantile_estimates(
        quantile_summaries(df, ["x"], "p", k=k),
        [0.25, 0.5, 0.75, 0.95]).collect()[0]
    # x is exactly 0..n-1, so a value IS its rank
    for frac, col in [(0.25, "q_25"), (0.5, "q_50"),
                      (0.75, "q_75"), (0.95, "q_95")]:
        rank_err = abs(est[col] - frac * (n - 1))
        assert rank_err <= n / k, (frac, est[col], rank_err)


def test_quantile_incremental_equals_full(spark):
    """Resume property: recompute ONLY changed partitions, splice via
    incremental_update → merged estimates identical to a full
    recompute under the same partitioning."""
    from pyspark.sql import functions as F

    from schema_validata_spark.operators.sketches import (
        incremental_update, merge_quantile_estimates, quantile_summaries)

    df = _qdata(spark)
    full = quantile_summaries(df, ["x", "y"], "p", k=32)
    fresh = quantile_summaries(
        df.where(F.col("p").isin("2", "7")), ["x", "y"], "p", k=32)
    spliced = incremental_update(full, fresh, ["2", "7"])
    a = sorted(map(tuple, merge_quantile_estimates(
        spliced, [0.5, 0.9]).collect()))
    b = sorted(map(tuple, merge_quantile_estimates(
        full, [0.5, 0.9]).collect()))
    assert a == b


def test_quantile_summary_null_and_empty_partitions(spark):
    """NULL values don't weight the merge; an all-NULL partition
    contributes no summary row at all."""
    from pyspark.sql import functions as F

    from schema_validata_spark.operators.sketches import (
        merge_quantile_estimates, quantile_summaries)

    df = spark.range(1000).select(
        (F.col("id") % 4).cast("string").alias("p"),
        F.when(F.col("id") % 4 == 3, F.lit(None))
         .otherwise(F.col("id").cast("double")).alias("x"))
    s = quantile_summaries(df, ["x"], "p", k=16)
    assert s.where(F.col("partition_key") == "3").count() == 0
    est = merge_quantile_estimates(s, [0.5]).collect()[0]
    # median of the non-null values only (uniform 0..999 minus the
    # 3-mod residue class) stays near 500, never dragged by NULL rows
    assert 400 <= est["q_50"] <= 600


# ---------------------------------------------------------- sketch_overlap

def test_sketch_overlap_exact_in_sparse_regime(spark):
    from schema_validata_spark.operators.sketches import (partition_sketches,
                                                          sketch_overlap)
    a = spark.createDataFrame(
        [(i, f"u{i % 10}", "p0") for i in range(40)],
        "id: bigint, uid: string, part: string")
    # b shares u0..u4, adds u10..u14 -> |A|=10 |B|=10 |A∪B|=15 ∩=5
    b = spark.createDataFrame(
        [(i, f"u{i % 5}", "p0") for i in range(20)]
        + [(100 + i, f"u{10 + i}", "p1") for i in range(5)],
        "id: bigint, uid: string, part: string")
    sa = partition_sketches(a, ["uid"], "part")
    sb = partition_sketches(b, ["uid"], "part")
    out = sketch_overlap(sa, sb).collect()[0]
    assert (out["est_a"], out["est_b"], out["est_union"]) == (10, 10, 15)
    assert out["est_intersection"] == 5
    assert out["jaccard"] == round(5 / 15, 6)
    assert out["containment_a"] == 0.5


def test_sketch_overlap_identical_disjoint_and_missing(spark):
    from schema_validata_spark.operators.sketches import (partition_sketches,
                                                          sketch_overlap)
    a = spark.createDataFrame([(i, f"v{i}", f"w{i}", "p") for i in range(8)],
                              "id: bigint, x: string, y: string, part: string")
    b = spark.createDataFrame([(i, f"v{i}", "p") for i in range(8)],
                              "id: bigint, x: string, part: string")
    c = spark.createDataFrame([(i, f"z{i}", "p") for i in range(8)],
                              "id: bigint, x: string, part: string")
    sa = partition_sketches(a, ["x", "y"], "part")
    sb = partition_sketches(b, ["x"], "part")
    sc = partition_sketches(c, ["x"], "part")
    # identical universes -> J = 1; column tracked only in A stays
    # visible with an empty B side
    out = {r["column_name"]: r for r in sketch_overlap(sa, sb).collect()}
    assert out["x"]["jaccard"] == 1.0 and out["x"]["containment_a"] == 1.0
    assert out["y"]["est_b"] == 0 and out["y"]["est_intersection"] == 0
    assert out["y"]["jaccard"] == 0.0 and out["y"]["est_union"] == 8
    # disjoint -> J = 0
    dis = {r["column_name"]: r for r in sketch_overlap(sb, sc).collect()}
    assert dis["x"]["jaccard"] == 0.0 and dis["x"]["est_union"] == 16


def test_sketch_overlap_merge_invariant(spark):
    """Overlap computed from per-partition sketch frames equals the
    overlap from pre-unioned single-partition frames — the resume
    story's guarantee carried through to the overlap layer."""
    from schema_validata_spark.operators.sketches import (partition_sketches,
                                                          sketch_overlap)
    rows = [(i, f"u{i % 30}", f"p{i % 4}") for i in range(200)]
    df = spark.createDataFrame(rows, "id: bigint, uid: string, part: string")
    flat = df.withColumn("part", F.lit("all"))
    s_parts = partition_sketches(df, ["uid"], "part")
    s_flat = partition_sketches(flat, ["uid"], "part")
    r1 = sketch_overlap(s_parts, s_flat).collect()[0]
    assert r1["jaccard"] == 1.0 and r1["est_a"] == r1["est_b"] == 30


# ---------------------------------------------------------- summary_drift

def test_summary_drift_shift_and_identity(spark):
    from schema_validata_spark.operators.sketches import (quantile_summaries,
                                                          summary_drift)
    a = spark.createDataFrame([(float(i), f"p{i % 2}") for i in range(100)],
                              "v: double, part: string")
    b = a.select((F.col("v") + 100.0).alias("v"), "part")
    sa = quantile_summaries(a, ["v"], "part", k=8)
    sb = quantile_summaries(b, ["v"], "part", k=8)
    out = summary_drift(sa, sb, probes=4).collect()[0]
    # a pure +100 location shift moves EVERY quantile by exactly 100
    assert out["w1_est"] == 100.0 and out["max_q_gap"] == 100.0
    assert out["n_a"] == 100 and out["n_b"] == 100
    same = summary_drift(sa, sa, probes=4).collect()[0]
    assert same["w1_est"] == 0.0 and same["max_q_gap"] == 0.0


def test_summary_drift_one_sided_column_stays_visible(spark):
    from schema_validata_spark.operators.sketches import (quantile_summaries,
                                                          summary_drift)
    a = spark.createDataFrame([(1.0, 2.0, "p")], "x: double, y: double, part: string")
    b = spark.createDataFrame([(1.0, "p")], "x: double, part: string")
    sa = quantile_summaries(a, ["x", "y"], "part", k=4)
    sb = quantile_summaries(b, ["x"], "part", k=4)
    out = {r["column_name"]: r for r in summary_drift(sa, sb).collect()}
    assert out["y"]["n_b"] == 0 and out["y"]["w1_est"] is None
    assert out["x"]["w1_est"] == 0.0
