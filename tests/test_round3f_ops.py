"""Round-3f operators: exact-k weighted sampling (Efraimidis–Spirakis),
per-slice null-rate significance, and last-digit uniformity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schema_validata_spark.functions.sampling import weighted_k_sample
from schema_validata_spark.operators.statqa import (last_digit_uniformity,
                                                    null_rate_by_slice)


# --------------------------------------------------------- weighted-k

def _wdf(spark, parts=4):
    return (spark.range(0, 1000, 1, parts)
                 .select(F.col("id"),
                         (F.col("id") % 100 + 1).cast("double").alias("w")))


def test_weighted_k_exact_k_and_deterministic(spark):
    a = {r["id"] for r in weighted_k_sample(_wdf(spark), "id", "w",
                                            25).collect()}
    b = {r["id"] for r in weighted_k_sample(_wdf(spark, parts=13), "id",
                                            "w", 25).collect()}
    assert len(a) == 25
    assert a == b                      # partitioning-independent


def test_weighted_k_overrepresents_heavy_rows(spark):
    kept = [r["w"] for r in weighted_k_sample(_wdf(spark), "id", "w",
                                              100).collect()]
    assert sum(kept) / len(kept) > 60  # corpus mean is 50.5


def test_weighted_k_null_and_nonpositive_weights_never_sample(spark):
    df = spark.createDataFrame(
        [(1, None), (2, 0.0), (3, -5.0), (4, 1.0)], "id int, w double")
    rows = weighted_k_sample(df, "id", "w", 10).collect()
    assert {r["id"] for r in rows} == {4}


def test_weighted_k_salt_changes_sample(spark):
    a = {r["id"] for r in weighted_k_sample(_wdf(spark), "id", "w", 25,
                                            salt="s1").collect()}
    b = {r["id"] for r in weighted_k_sample(_wdf(spark), "id", "w", 25,
                                            salt="s2").collect()}
    assert a != b


def test_weighted_k_plan_is_take_ordered(spark, tmp_path):
    src = str(tmp_path / "wk")
    _wdf(spark).write.parquet(src)
    out = weighted_k_sample(spark.read.parquet(src), "id", "w", 10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


# ------------------------------------------------------ null-by-slice

def test_null_rate_by_slice_hand_computed(spark):
    df = spark.createDataFrame(
        [("a", None, 1.0), ("a", "x", None), ("b", "y", 2.0)] * 50,
        "g string, c1 string, c2 double")
    out = {(r["group"], r["column_name"]): r
           for r in null_rate_by_slice(df, ["c1", "c2"], "g").collect()}
    a1 = out[("a", "c1")]
    assert (a1["n"], a1["n_null"], a1["rate"]) == (100, 50, 0.5)
    assert a1["rest_rate"] == 0.0 and a1["significant"]
    b1 = out[("b", "c1")]
    assert b1["z"] == -a1["z"]         # pooled z is antisymmetric


def test_null_rate_by_slice_null_group_and_degenerate(spark):
    df = spark.createDataFrame(
        [(None, None), (None, None), ("b", None)], "g string, c1 string")
    out = {r["group"]: r
           for r in null_rate_by_slice(df, ["c1"], "g").collect()}
    assert set(out) == {None, "b"}     # NULL group is a real slice
    # pooled rate is 1.0 -> no variance -> z undefined
    assert out[None]["z"] is None and out["b"]["z"] is None


def test_null_rate_by_slice_single_scan(spark, tmp_path):
    src = str(tmp_path / "nr")
    spark.range(10_000).select(
        (F.col("id") % 5).cast("string").alias("g"),
        F.when(F.col("id") % 3 == 0, F.col("id")).alias("v1"),
        F.when(F.col("id") % 7 == 0, F.col("id")).alias("v2")) \
        .write.parquet(src)
    out = null_rate_by_slice(spark.read.parquet(src), ["v1", "v2"], "g")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("+- == Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1, final


# ------------------------------------------------------- last digit

def test_last_digit_uniform_fixture(spark):
    df = spark.range(10, 1010).select(F.col("id").cast("double").alias("v"))
    out = {r["digit"]: r for r in last_digit_uniformity(df, "v").collect()}
    assert len(out) == 10
    assert all(r["share"] == 0.1 for r in out.values())
    assert all(r["chi2_term"] == 0.0 for r in out.values())


def test_last_digit_biased_fixture(spark):
    # every value ends in 0: digit 0 gets everything
    df = spark.range(1, 101).select((F.col("id") * 10).cast("double")
                                    .alias("v"))
    out = {r["digit"]: r for r in last_digit_uniformity(df, "v").collect()}
    assert set(out) == {0}
    assert out[0]["share"] == 1.0
    assert out[0]["chi2_term"] == pytest.approx(810.0)  # (100-10)^2/10


def test_last_digit_min_magnitude_excludes_single_digit(spark):
    df = spark.createDataFrame([(3.0,), (7.0,), (12.0,), (None,)],
                               "v double")
    out = last_digit_uniformity(df, "v").collect()
    assert len(out) == 1 and out[0]["digit"] == 2 and out[0]["n"] == 1
