"""Round-3u: contingency-cell residual drill-down, rolling distinct
active users."""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import functions as F

from schema_validata_spark.operators.sequence import rolling_active_users
from schema_validata_spark.operators.statqa import crosstab_residuals


def _ts(s):
    return datetime.datetime.fromisoformat(s)


# --------------------------------------------------- crosstab_residuals

def test_crosstab_hand_case(spark):
    # strong diagonal association: (x, 1) and (y, 2) over-represented
    rows = [("x", "1")] * 20 + [("y", "2")] * 20 \
        + [("x", "2")] * 5 + [("y", "1")] * 5
    df = spark.createDataFrame(rows, "a string, b string")
    got = {(r["value_a"], r["value_b"]): r
           for r in crosstab_residuals(df, "a", "b").collect()}
    x1 = got[("x", "1")]
    assert x1["n"] == 20
    assert x1["expected"] == 12.5              # 25*25/50
    e, ra, cb, t = 12.5, 25.0, 25.0, 50.0
    den = math.sqrt(e * (1 - ra / t) * (1 - cb / t))
    assert abs(x1["residual"] - round((20 - e) / den, 6)) < 1e-9
    assert x1["flagged"]
    # symmetric under-represented cell mirrors the residual
    assert abs(got[("x", "2")]["residual"] + x1["residual"]) < 1e-9
    # residuals of a 2x2 table all share magnitude
    assert got[("y", "2")]["flagged"] and got[("y", "1")]["flagged"]


def test_crosstab_independent_not_flagged(spark):
    rows = [(a, b) for a in ("x", "y") for b in ("1", "2")] * 10
    df = spark.createDataFrame(rows, "a string, b string")
    got = crosstab_residuals(df, "a", "b").collect()
    assert all(not r["flagged"] for r in got)
    assert all(abs(r["residual"]) < 1e-6 for r in got)


def test_crosstab_nulls_excluded(spark):
    rows = [("x", "1"), ("x", None), (None, "1")]
    df = spark.createDataFrame(rows, "a string, b string")
    got = crosstab_residuals(df, "a", "b").collect()
    assert len(got) == 1 and got[0]["n"] == 1
    # single-cell table: den = 0 -> residual NULL, not flagged
    assert got[0]["residual"] is None and got[0]["flagged"] is False


# ------------------------------------------------- rolling_active_users

def _ev(spark, rows):
    return spark.createDataFrame(rows, "u string, ts timestamp")


def test_rolling_hand_case(spark):
    rows = [("u1", _ts("2024-01-01T05:00")),
            ("u2", _ts("2024-01-01T06:00")),
            ("u1", _ts("2024-01-03T05:00")),
            ("u3", _ts("2024-01-03T06:00"))]
    got = {r["bucket"]: r for r in rolling_active_users(
        _ev(spark, rows), "u", "ts", window_days=3).collect()}
    assert set(got) == {"2024-01-01", "2024-01-03"}
    d1 = got["2024-01-01"]
    assert (d1["n_active_day"], d1["n_active_window"]) == (2, 2)
    d3 = got["2024-01-03"]
    # trailing 3 days of Jan 3 = Jan 1..3: users u1, u2, u3
    assert (d3["n_active_day"], d3["n_active_window"]) == (2, 3)


def test_rolling_window_expires(spark):
    rows = [("u1", _ts("2024-01-01T00:00")),
            ("u2", _ts("2024-01-09T00:00"))]
    got = {r["bucket"]: r["n_active_window"]
           for r in rolling_active_users(
               _ev(spark, rows), "u", "ts", window_days=7).collect()}
    assert got["2024-01-09"] == 1               # u1 aged out


def test_rolling_dau_equals_window1(spark):
    rows = [("u%d" % (i % 5), _ts("2024-01-01T00:00")
             + datetime.timedelta(days=i % 4, hours=i)) for i in range(40)]
    df = _ev(spark, rows)
    got = rolling_active_users(df, "u", "ts", window_days=1).collect()
    assert all(r["n_active_day"] == r["n_active_window"] for r in got)
    with pytest.raises(ValueError):
        rolling_active_users(df, "u", "ts", window_days=0)
