"""Round-3g operators: Mann–Whitney U rank-sum screen, rater confusion
matrix, and lag-k volume autocorrelation."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from schema_validata_spark.operators.expectations import \
    volume_autocorrelation
from schema_validata_spark.operators.statqa import (mann_whitney,
                                                    rater_confusion)


# ------------------------------------------------------ mann-whitney

def _mw(spark, rows):
    return spark.createDataFrame(rows, "v double, s string")


def test_mw_textbook_no_ties(spark):
    # A=[1,2,3], B=[4,5,6]: U_a=0, U_b=9, z=(0-4.5)/sqrt(5.25)
    df = _mw(spark, [(1.0, "a"), (2.0, "a"), (3.0, "a"),
                     (4.0, "b"), (5.0, "b"), (6.0, "b")])
    r = mann_whitney(df, "v", "s", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert r["u_a"] == 0.0 and r["u_b"] == 9.0
    assert r["mean_rank_a"] == 2.0 and r["mean_rank_b"] == 5.0
    assert r["z"] == pytest.approx(-4.5 / 5.25 ** 0.5, abs=1e-6)
    assert r["significant"] is False


def test_mw_tie_correction_exact(spark):
    # A=[1,1], B=[1,2]: U_a=1, tie-corrected var=1, z=-1 exactly
    df = _mw(spark, [(1.0, "a"), (1.0, "a"), (1.0, "b"), (2.0, "b")])
    r = mann_whitney(df, "v", "s", "a", "b").collect()[0]
    assert r["u_a"] == 1.0 and r["u_b"] == 3.0
    assert r["z"] == -1.0


def test_mw_shift_is_significant(spark):
    rows = [(float(i), "a") for i in range(100)] + \
           [(float(i) + 50.0, "b") for i in range(100)]
    r = mann_whitney(_mw(spark, rows), "v", "s", "a", "b").collect()[0]
    assert r["z"] < -3.0 and r["significant"] is True


def test_mw_empty_side_and_all_tied(spark):
    r = mann_whitney(_mw(spark, [(1.0, "a"), (2.0, "a")]),
                     "v", "s", "a", "b").collect()[0]
    assert r["n_b"] == 0 and r["z"] is None and r["u_a"] is None
    r2 = mann_whitney(_mw(spark, [(5.0, "a"), (5.0, "a"), (5.0, "b")]),
                      "v", "s", "a", "b").collect()[0]
    assert r2["z"] is None          # zero variance: every value tied
    assert r2["u_a"] == r2["u_b"] == 1.0


def test_mw_null_nan_and_other_sides_excluded(spark):
    df = _mw(spark, [(1.0, "a"), (None, "a"), (float("nan"), "b"),
                     (2.0, "b"), (99.0, "c")])
    r = mann_whitney(df, "v", "s", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"]) == (1, 1)


def test_mw_partitioning_independent(spark):
    rows = [(float(i % 13), "a" if i % 3 else "b") for i in range(200)]
    a = mann_whitney(_mw(spark, rows).repartition(1),
                     "v", "s", "a", "b").collect()[0]
    b = mann_whitney(_mw(spark, rows).repartition(7),
                     "v", "s", "a", "b").collect()[0]
    assert a == b


def test_mw_single_scan_plan(spark, tmp_path):
    src = str(tmp_path / "mw")
    _mw(spark, [(float(i % 5), "a" if i % 2 else "b")
                for i in range(50)]).write.parquet(src)
    out = mann_whitney(spark.read.parquet(src), "v", "s", "a", "b")
    out.collect()                       # materialize the AQE final plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("+- == Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1, final


# --------------------------------------------------- rater confusion

def _rat(spark, rows):
    return spark.createDataFrame(rows, "item int, rater string, lab string")


def test_confusion_cells_and_shares(spark):
    df = _rat(spark, [
        (1, "a", "x"), (2, "a", "x"), (3, "a", "y"), (4, "a", "y"),
        (5, "a", "x"),                      # item 5: only rater a → drops
        (1, "b", "x"), (2, "b", "y"), (3, "b", "y"), (4, "b", "x")])
    rows = {(r["label_a"], r["label_b"]): r
            for r in rater_confusion(df, "item", "rater", "lab",
                                     "a", "b").collect()}
    assert set(rows) == {("x", "x"), ("x", "y"), ("y", "y"), ("y", "x")}
    for cell in rows.values():
        assert cell["n"] == 1 and cell["share"] == 0.25
        assert cell["row_share"] == 0.5 and cell["col_share"] == 0.5
    assert rows[("x", "x")]["agree"] is True
    assert rows[("x", "y")]["agree"] is False


def test_confusion_duplicate_rating_greatest_wins(spark):
    df = _rat(spark, [(1, "a", "x"), (1, "a", "z"), (1, "b", "z")])
    rows = rater_confusion(df, "item", "rater", "lab", "a", "b").collect()
    assert len(rows) == 1
    assert (rows[0]["label_a"], rows[0]["label_b"]) == ("z", "z")


def test_confusion_null_labels_unrated(spark):
    df = _rat(spark, [(1, "a", None), (1, "b", "x"), (2, "a", "x"),
                      (2, "b", "x")])
    rows = rater_confusion(df, "item", "rater", "lab", "a", "b").collect()
    assert len(rows) == 1 and rows[0]["n"] == 1


# ----------------------------------------------- volume autocorrelation

def _ev(spark, day_counts):
    """events with day_counts[i] rows on day i (None = missing day)."""
    rows = []
    for d, c in enumerate(day_counts):
        for k in range(c or 0):
            rows.append((datetime.datetime(2024, 1, 1 + d, 12, 0, k),))
    return spark.createDataFrame(rows, "ts timestamp")


def test_acf_alternating_series(spark):
    # [2,4,2,4,2,4]: lag-1 acf = -1, lag-2 acf = +1
    out = {r["lag"]: r for r in
           volume_autocorrelation(_ev(spark, [2, 4, 2, 4, 2, 4]), "ts",
                                  max_lag=2).collect()}
    assert out[1]["acf"] == -1.0 and out[1]["n_pairs"] == 5
    assert out[2]["acf"] == 1.0 and out[2]["n_pairs"] == 4


def test_acf_gap_counts_as_zero(spark):
    # observed [3,3,3,_,3] → filled [3,3,3,0,3]; lag-1 r = -1/3
    out = {r["lag"]: r for r in
           volume_autocorrelation(_ev(spark, [3, 3, 3, None, 3]), "ts",
                                  max_lag=1).collect()}
    assert out[1]["n_pairs"] == 4
    assert out[1]["acf"] == pytest.approx(-1.0 / 3.0, abs=1e-6)


def test_acf_constant_series_null(spark):
    out = volume_autocorrelation(_ev(spark, [5, 5, 5, 5]), "ts",
                                 max_lag=2).collect()
    assert all(r["acf"] is None for r in out)
    assert [r["n_pairs"] for r in sorted(out, key=lambda r: r["lag"])] \
        == [3, 2]


def test_acf_empty_and_validation(spark):
    out = volume_autocorrelation(_ev(spark, []), "ts", max_lag=3).collect()
    assert [r["n_pairs"] for r in out] == [0, 0, 0]
    assert all(r["acf"] is None for r in out)
    with pytest.raises(ValueError):
        volume_autocorrelation(_ev(spark, [1]), "ts", max_lag=0)
    with pytest.raises(ValueError):
        volume_autocorrelation(_ev(spark, [1]), "ts", granularity="fortnight")


def test_acf_single_scan_plan(spark, tmp_path):
    src = str(tmp_path / "acf")
    _ev(spark, [2, 4, 2, 4]).write.parquet(src)
    out = volume_autocorrelation(spark.read.parquet(src), "ts", max_lag=3)
    out.collect()                       # materialize the AQE final plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("+- == Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1, final
