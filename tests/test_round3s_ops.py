"""Round-3s: monotone counter regression screen, new-value arrival
trend."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from schema_validata_spark.operators.expectations import (
    monotone_trend_check, value_novelty_trend)


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def _rows(spark, rows, schema="ts timestamp, v double"):
    return spark.createDataFrame(rows, schema)


# ------------------------------------------------- monotone_trend_check

def test_monotone_max_hand_case(spark):
    rows = [(_ts("2024-01-01T01:00"), 10.0),
            (_ts("2024-01-01T09:00"), 15.0),   # day1 max 15
            (_ts("2024-01-02T01:00"), 20.0),   # day2 max 20: ok
            (_ts("2024-01-03T01:00"), 12.0)]   # day3 max 12: REGRESSED
    got = {r["bucket"]: r for r in monotone_trend_check(
        _rows(spark, rows), "ts", "v").collect()}
    assert got["2024-01-01"]["prev_value"] is None
    assert got["2024-01-01"]["regressed"] is False
    assert got["2024-01-02"]["delta"] == 5.0
    assert got["2024-01-02"]["regressed"] is False
    assert got["2024-01-03"]["regressed"] is True
    assert got["2024-01-03"]["delta"] == -8.0


def test_monotone_sum_mode_and_nulls(spark):
    rows = [(_ts("2024-01-01T01:00"), 5.0),
            (_ts("2024-01-01T02:00"), 5.0),
            (_ts("2024-01-02T01:00"), 3.0),
            (_ts("2024-01-02T02:00"), None),
            (None, 99.0)]
    got = {r["bucket"]: r for r in monotone_trend_check(
        _rows(spark, rows), "ts", "v", agg="sum").collect()}
    assert got["2024-01-01"]["value"] == 10.0
    assert got["2024-01-02"]["value"] == 3.0
    assert got["2024-01-02"]["regressed"] is True


def test_monotone_validation(spark):
    df = _rows(spark, [])
    with pytest.raises(ValueError):
        monotone_trend_check(df, "ts", "v", granularity="minute")
    with pytest.raises(ValueError):
        monotone_trend_check(df, "ts", "v", agg="median")


# -------------------------------------------------- value_novelty_trend

def test_novelty_hand_case(spark):
    rows = [(_ts("2024-01-01T05:00"), "alpha"),
            (_ts("2024-01-01T06:00"), "beta"),
            (_ts("2024-01-02T05:00"), "alpha"),      # seen before
            (_ts("2024-01-02T06:00"), "gamma"),      # NEW on day 2
            (_ts("2024-01-02T07:00"), "gamma")]      # same-day dup
    got = {r["bucket"]: r for r in value_novelty_trend(
        _rows(spark, rows, "ts timestamp, v string"), "v",
        "ts").collect()}
    d1, d2 = got["2024-01-01"], got["2024-01-02"]
    assert (d1["n_values"], d1["n_new"]) == (2, 2)
    assert d1["share_new"] == 1.0
    assert sorted(d1["first_values"]) == ["alpha", "beta"]
    assert (d2["n_values"], d2["n_new"]) == (2, 1)
    assert d2["share_new"] == 0.5
    assert d2["first_values"] == ["gamma"]


def test_novelty_sample_capped_at_10(spark):
    rows = [(_ts("2024-01-01T00:00"), f"v{i:02d}") for i in range(25)]
    r = value_novelty_trend(
        _rows(spark, rows, "ts timestamp, v string"), "v",
        "ts").collect()[0]
    assert r["n_new"] == 25
    assert len(r["first_values"]) == 10
    assert r["first_values"] == sorted(r["first_values"])


def test_novelty_nulls_and_validation(spark):
    rows = [(_ts("2024-01-01T00:00"), None), (None, "x"),
            (_ts("2024-01-01T00:00"), "y")]
    df = _rows(spark, rows, "ts timestamp, v string")
    got = value_novelty_trend(df, "v", "ts").collect()
    assert len(got) == 1 and got[0]["n_values"] == 1
    with pytest.raises(ValueError):
        value_novelty_trend(df, "v", "ts", granularity="week")
