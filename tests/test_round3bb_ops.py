"""Round-3bb: pairwise slice PSI matrix."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from schema_validata_spark.operators.drift import (EPS, numeric_histogram,
                                                   pairwise_psi)


def _hist(spark, rows):
    return spark.createDataFrame(
        rows, "partition_key string, column_name string, bucket string,"
              " count bigint")


def test_pairwise_psi_hand_case(spark):
    rows = [("a", "v", "1", 50), ("a", "v", "2", 50),
            ("b", "v", "1", 90), ("b", "v", "2", 10),
            ("c", "v", "1", 50), ("c", "v", "2", 50)]
    got = {(r["part_a"], r["part_b"]): r
           for r in pairwise_psi(_hist(spark, rows)).collect()}
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    ac = got[("a", "c")]
    assert ac["psi"] == 0.0                      # identical slices
    ab = got[("a", "b")]

    def term(pa, pb):
        return (pa - pb) * math.log((pa + EPS) / (pb + EPS))
    expect = round(term(0.5, 0.9) + term(0.5, 0.1), 6)
    assert abs(ab["psi"] - expect) < 1e-9
    assert ab["psi"] > 0.3                       # clearly drifted pair
    assert (ab["n_a"], ab["n_b"]) == (100, 100)
    # symmetric construction: (b,c) mirrors (a,b)
    assert abs(got[("b", "c")]["psi"] - ab["psi"]) < 1e-9


def test_pairwise_psi_dense_union_handles_missing_buckets(spark):
    rows = [("a", "v", "1", 100),
            ("b", "v", "2", 100)]                # disjoint support
    got = pairwise_psi(_hist(spark, rows)).collect()
    assert len(got) == 1
    # each side puts mass 1 where the other has ~0 -> large finite PSI
    assert got[0]["psi"] > 10


def test_pairwise_psi_from_numeric_histogram(spark):
    df = spark.createDataFrame(
        [(float(i % 10), "x") for i in range(100)]
        + [(float(90 + i % 10), "y") for i in range(100)],
        "v double, g string")
    h = numeric_histogram(df, "v", "g", 0.0, 100.0, 10)
    got = pairwise_psi(h).collect()
    assert len(got) == 1
    assert got[0]["psi"] > 5                     # disjoint ranges
