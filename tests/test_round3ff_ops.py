"""Round-3ff: extrema exemplar rows, hour-of-day profile."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from schema_validata_spark.operators.statqa import (extrema_exemplars,
                                                    hourly_profile)


def test_extrema_hand_case(spark):
    rows = [(i, float(v)) for i, v in enumerate([5, 1, 9, 3, 9, -2])]
    df = spark.createDataFrame(rows, "id long, v double")
    got = extrema_exemplars(df, "v", ["id"], k=2).collect()
    mx = sorted([r for r in got if r["end"] == "max"],
                key=lambda r: r["rank"])
    mn = sorted([r for r in got if r["end"] == "min"],
                key=lambda r: r["rank"])
    assert [(r["id"], r["value"]) for r in mx] == [(2, 9.0), (4, 9.0)]
    assert [(r["id"], r["value"]) for r in mn] == [(5, -2.0), (1, 1.0)]


def test_extrema_nulls_and_validation(spark):
    df = spark.createDataFrame([(1, None), (2, 4.0)], "id long, v double")
    got = extrema_exemplars(df, "v", ["id"], k=3).collect()
    assert {r["end"] for r in got} == {"min", "max"}
    assert all(r["value"] == 4.0 for r in got)
    with pytest.raises(ValueError):
        extrema_exemplars(df, "v", ["id"], k=0)
    with pytest.raises(ValueError):
        extrema_exemplars(df, "v", [], k=1)


def test_extrema_heap_plan(spark):
    import contextlib
    import io
    df = spark.createDataFrame([(i, float(i)) for i in range(50)],
                               "id long, v double")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        extrema_exemplars(df, "v", ["id"], k=3).explain("formatted")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan, plan


def _ev(spark, rows):
    return spark.createDataFrame(rows, "g string, ts timestamp")


def test_hourly_profile_hand_case(spark):
    def at(h):
        return datetime.datetime(2024, 1, 1, h, 30)
    rows = ([("site", at(9))] * 6 + [("site", at(14))] * 3
            + [("site", at(23))] * 1 + [("bot", at(3))] * 5)
    got = {(r["group"], r["hour"]): r for r in hourly_profile(
        _ev(spark, rows), "ts", "g").collect()}
    s9 = got[("site", 9)]
    assert (s9["n"], s9["share"], s9["is_peak"]) == (6, 0.6, True)
    assert got[("site", 14)]["is_peak"] is False
    assert got[("bot", 3)]["is_peak"] is True
    assert len([k for k in got if k[0] == "site"]) == 3


def test_hourly_profile_peak_tie_earliest(spark):
    rows = [("g", datetime.datetime(2024, 1, 1, 8, 0)),
            ("g", datetime.datetime(2024, 1, 1, 17, 0))]
    got = {r["hour"]: r["is_peak"] for r in hourly_profile(
        _ev(spark, rows), "ts", "g").collect()}
    assert got == {8: True, 17: False}
