"""Round-3o: role-transition latency, conversation-size histogram."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from schema_validata_spark.operators.sequence import (transition_latency,
                                                      turn_count_histogram)


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def _tr(spark, rows):
    return spark.createDataFrame(
        rows, "conv string, idx int, role string, ts timestamp")


# --------------------------------------------------- transition_latency

def test_transition_latency_hand_case(spark):
    b = _ts("2024-01-01T00:00:00")
    s = lambda x: b + datetime.timedelta(seconds=x)
    rows = [("c1", 1, "user", s(0)), ("c1", 2, "assistant", s(4)),
            ("c1", 3, "user", s(10)), ("c1", 4, "assistant", s(12)),
            ("c2", 1, "user", s(0)), ("c2", 2, "assistant", s(8))]
    got = {(r["from_role"], r["to_role"]): r
           for r in transition_latency(
               _tr(spark, rows), "conv", ["idx"], "role", "ts"
           ).collect()}
    ua = got[("user", "assistant")]
    assert ua["n"] == 3                       # 4s, 2s, 8s
    assert abs(ua["mean_s"] - round(14 / 3, 6)) < 1e-9
    assert ua["p50_s"] == 4.0 and ua["max_s"] == 8.0
    au = got[("assistant", "user")]
    assert (au["n"], au["mean_s"]) == (1, 6.0)
    assert set(got) == {("user", "assistant"), ("assistant", "user")}


def test_transition_latency_null_roles_and_ts(spark):
    b = _ts("2024-01-01T00:00:00")
    s = lambda x: b + datetime.timedelta(seconds=x)
    rows = [("c1", 1, "user", s(0)), ("c1", 2, None, s(5)),
            ("c1", 3, "user", s(9)),
            ("c1", 4, "assistant", None)]      # untimed: excluded
    got = {(r["from_role"], r["to_role"]): r["n"]
           for r in transition_latency(
               _tr(spark, rows), "conv", ["idx"], "role", "ts"
           ).collect()}
    assert got == {("user", None): 1, (None, "user"): 1}


def test_transition_latency_single_exchange_plan(spark):
    import contextlib
    import io
    rows = [("c%d" % (i % 3), i, "user",
             _ts("2024-01-01T00:00") + datetime.timedelta(seconds=i))
            for i in range(30)]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        transition_latency(_tr(spark, rows), "conv", ["idx"], "role",
                           "ts").explain("formatted")
    plan = buf.getvalue()
    # lag window exchange on conv + the tiny (role, role) agg exchange
    assert plan.count("Arguments: hashpartitioning") == 2, plan


# ------------------------------------------------- turn_count_histogram

def test_turn_histogram_hand_case(spark):
    rows = ([("a", i) for i in range(1)]        # 1 turn  -> bucket 0
            + [("b", i) for i in range(3)]      # 3 turns -> bucket 1
            + [("c", i) for i in range(3)]      # 3 turns -> bucket 1
            + [("d", i) for i in range(9)])     # 9 turns -> bucket 3
    df = spark.createDataFrame(rows, "conv string, i int")
    got = {r["bucket"]: r for r in turn_count_histogram(
        df, "conv").collect()}
    assert set(got) == {0, 1, 3}
    assert (got[0]["min_turns"], got[0]["max_turns"]) == (1, 1)
    assert (got[1]["min_turns"], got[1]["max_turns"]) == (2, 3)
    assert (got[3]["min_turns"], got[3]["max_turns"]) == (8, 15)
    assert got[1]["n_groups"] == 2 and got[1]["n_rows"] == 6
    assert got[1]["share_groups"] == 0.5
    assert got[3]["share_rows"] == round(9 / 16, 6)


def test_turn_histogram_null_keys_excluded(spark):
    df = spark.createDataFrame([("a", 1), (None, 2), (None, 3)],
                               "conv string, i int")
    got = turn_count_histogram(df, "conv").collect()
    assert len(got) == 1 and got[0]["n_groups"] == 1
    assert got[0]["share_rows"] == 1.0
