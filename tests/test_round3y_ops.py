"""Round-3y: mergeable per-partition profiles, rules coverage report."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schema_validata_spark.operators.profile import (
    merge_partition_profiles, partition_profile_stats)
from schema_validata_spark.rules import Rules, rules_coverage


def _df(spark, rows):
    return spark.createDataFrame(rows, "p string, v double, s string")


def test_partition_profile_hand_case(spark):
    rows = [("a", 1.0, "xx"), ("a", 3.0, "yyyy"), ("a", None, None),
            ("b", -2.0, "z")]
    got = {(r["partition_key"], r["column_name"]): r
           for r in partition_profile_stats(
               _df(spark, rows), "p").collect()}
    av = got[("a", "v")]
    assert (av["n_rows"], av["n_null"]) == (3, 1)
    assert (av["min_value"], av["max_value"]) == (1.0, 3.0)
    a_s = got[("a", "s")]
    assert a_s["max_length"] == 4
    assert a_s["min_value"] is None            # non-numeric: no range
    bv = got[("b", "v")]
    assert (bv["min_value"], bv["max_value"]) == (-2.0, -2.0)


def test_merge_invariance(spark):
    """profile(all) == merge(profile(partition subsets)) — the
    incremental-resume contract."""
    rows = [("p%d" % (i % 4), float(i % 17), "s" * (i % 9 + 1))
            for i in range(200)]
    df = _df(spark, rows)
    full = merge_partition_profiles(
        partition_profile_stats(df, "p")).collect()
    half1 = partition_profile_stats(
        df.where(F.col("p").isin("p0", "p1")), "p")
    half2 = partition_profile_stats(
        df.where(~F.col("p").isin("p0", "p1")), "p")
    merged = merge_partition_profiles(half1.unionByName(half2)).collect()
    key = lambda rows_: {r["column_name"]: tuple(r) for r in rows_}
    assert key(full) == key(merged)


def test_partition_profile_null_key_and_validation(spark):
    rows = [(None, 1.0, "x"), ("a", 2.0, "y")]
    got = partition_profile_stats(_df(spark, rows), "p").collect()
    assert {r["partition_key"] for r in got} == {None, "a"}
    with pytest.raises(ValueError):
        partition_profile_stats(
            spark.createDataFrame([("a",)], "p string"), "p")


def test_partition_profile_single_exchange(spark):
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        partition_profile_stats(
            _df(spark, [("a", 1.0, "x")]), "p").explain("formatted")
    assert buf.getvalue().count("Arguments: hashpartitioning") == 1


# ------------------------------------------------------- rules_coverage

def test_rules_coverage_report():
    r = Rules.from_nested_dict("g", {
        "a": {"allow_null": False, "range_max": 5.0},
        "b": {},                                  # no active attrs
        "ghost": {"length": 3}})
    cov = rules_coverage(["a", "b", "c"], r)
    assert cov["per_column"]["a"] == ["allow_null", "range_max"]
    assert cov["per_column"]["b"] == []
    assert cov["covered"] == ["a"]
    assert cov["uncovered"] == ["b", "c"]
    assert cov["orphan_rules"] == ["ghost"]
    assert cov["n_checks"] == 2
    assert cov["coverage_share"] == round(1 / 3, 6)


def test_rules_coverage_empty():
    cov = rules_coverage([], Rules.from_nested_dict("g", {}))
    assert cov["coverage_share"] == 0.0 and cov["n_checks"] == 0
