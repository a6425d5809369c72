"""Round-3n: per-key volume outliers, pre-flight join size/skew
estimate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schema_validata_spark.operators.uniqueness import (
    join_size_estimate, key_volume_outliers)


# ------------------------------------------------- key_volume_outliers

def _keys(spark, pairs):
    rows = [(k,) for k, n in pairs for _ in range(n)]
    return spark.createDataFrame(rows, "k string")


def test_key_volume_outliers_hand_case(spark):
    # counts: 9 keys at 10 +/- 2, one runaway at 500
    pairs = [(f"k{i}", 10 + (i % 3) - 1) for i in range(9)] \
        + [("runaway", 500)]
    got = key_volume_outliers(_keys(spark, pairs), ["k"]).collect()
    assert len(got) == 1
    r = got[0]
    assert r["k"] == "runaway" and r["n_rows"] == 500
    assert r["median_rows"] == 10.0
    assert r["mad_rows"] == 1.0
    assert abs(r["robust_z"] - round(490 / 1.4826, 6)) < 1e-6


def test_key_volume_outliers_zero_mad_no_flags(spark):
    pairs = [(f"k{i}", 1) for i in range(20)] + [("big", 50)]
    # MAD of [1]*20+[50] = 0 -> z undefined -> nothing flags
    got = key_volume_outliers(_keys(spark, pairs), ["k"]).collect()
    assert got == []


def test_key_volume_outliers_symmetric(spark):
    """Low-volume outliers flag too (|z|)."""
    pairs = [(f"k{i}", 100 + (i % 5)) for i in range(20)] + [("dead", 1)]
    got = {r["k"] for r in key_volume_outliers(
        _keys(spark, pairs), ["k"]).collect()}
    assert got == {"dead"}


# -------------------------------------------------- join_size_estimate

def test_join_size_exact_when_heads_cover(spark):
    """k >= distinct keys on both sides -> the estimate IS the exact
    join size and the tail term is 0."""
    a = _keys(spark, [("x", 3), ("y", 2), ("z", 4)])
    b = _keys(spark, [("x", 5), ("y", 1), ("w", 7)])
    r = join_size_estimate(a, "k", b, "k", k=10).collect()[0]
    exact = 3 * 5 + 2 * 1
    assert r["heavy_pairs"] == float(exact)
    assert r["tail_pairs_est"] == 0.0
    assert r["est_rows"] == float(exact)
    assert r["heavy_share"] == 1.0
    assert (r["left_rows"], r["right_rows"]) == (9, 13)
    assert (r["left_keys"], r["right_keys"]) == (3, 3)
    assert r["n_heavy_keys"] == 2          # x, y present on BOTH sides
    # ground truth
    assert a.join(b, "k").count() == exact


def test_join_size_tail_estimate(spark):
    """One heavy key + a uniform tail: heavy is exact, the tail uses
    rows_l*rows_r/max(keys)."""
    a = _keys(spark, [("hot", 100)] + [(f"t{i}", 1) for i in range(10)])
    b = _keys(spark, [("hot", 100)] + [(f"t{i}", 1) for i in range(10)])
    r = join_size_estimate(a, "k", b, "k", k=1).collect()[0]
    assert r["heavy_pairs"] == 10000.0
    assert r["tail_pairs_est"] == round(10.0 * 10.0 / 10.0, 2)
    assert r["est_rows"] == 10010.0
    # true join = 10000 + 10 -> estimate within 0.01%
    assert abs(r["est_rows"] - a.join(b, "k").count()) < 1
    assert r["heavy_share"] == round(10000.0 / 10010.0, 6)


def test_join_size_nulls_and_empty(spark):
    a = spark.createDataFrame([("x",), (None,)], "k string")
    b = spark.createDataFrame([("x",), (None,), (None,)], "k string")
    r = join_size_estimate(a, "k", b, "k").collect()[0]
    assert (r["left_rows"], r["right_rows"]) == (1, 1)  # NULLs excluded
    assert r["est_rows"] == 1.0
    empty = spark.createDataFrame([], "k string")
    r2 = join_size_estimate(a, "k", empty, "k").collect()[0]
    assert r2["est_rows"] == 0.0 and r2["heavy_share"] is None
    with pytest.raises(ValueError):
        join_size_estimate(a, "k", b, "k", k=0)


def test_join_size_head_uses_heap_not_global_sort(spark):
    """The top-k head must plan as TakeOrderedAndProject (per-task
    heaps), never a full Exchange rangepartitioning sort of the
    counts frame."""
    import contextlib
    import io
    a = _keys(spark, [(f"k{i}", i + 1) for i in range(20)])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        join_size_estimate(a, "k", a, "k", k=3).explain("formatted")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
