"""asof_join semantics (pandas merge_asof / DuckDB ASOF JOIN model):
backward match per key, exact-match toggle, tolerance, NULL-value
carry, and the one-shuffle plan contract."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from schema_validata_spark.operators.asof import asof_join


def T(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [("u1", T("2024-01-01 10:00:00"), 1),
         ("u1", T("2024-01-01 12:00:00"), 2),
         ("u1", T("2024-01-01 09:00:00"), 3),
         ("u2", T("2024-01-01 10:00:00"), 4)],
        ["k", "ts", "event_id"])
    right = spark.createDataFrame(
        [("u1", T("2024-01-01 09:30:00"), "cfgA"),
         ("u1", T("2024-01-01 11:00:00"), None),
         ("u1", T("2024-01-01 12:00:00"), "cfgB"),
         ("u3", T("2024-01-01 08:00:00"), "cfgX")],
        ["k", "ts", "cfg"])
    return left, right


def _by_event(df):
    return {r["event_id"]: (r["cfg"], r["asof_ts"]) for r in df.collect()}


def test_asof_backward_default(frames):
    left, right = frames
    got = _by_event(asof_join(left, right, "ts", ["k"]))
    assert got[3] == (None, None)                     # nothing before 09:00
    assert got[1] == ("cfgA", T("2024-01-01 09:30:00"))
    # exact match allowed: 12:00 left row sees the 12:00 right row
    assert got[2] == ("cfgB", T("2024-01-01 12:00:00"))
    assert got[4] == (None, None)                     # key with no right rows


def test_asof_strict_inequality(frames):
    left, right = frames
    got = _by_event(asof_join(left, right, "ts", ["k"],
                              allow_exact_matches=False))
    # 12:00 left row must NOT see the same-instant right row; it falls
    # back to the 11:00 row whose value is a REAL NULL (not skipped to
    # the older cfgA — the carried-struct contract)
    assert got[2] == (None, T("2024-01-01 11:00:00"))


def test_asof_tolerance(frames):
    left, right = frames
    got = _by_event(asof_join(left, right, "ts", ["k"], tolerance_s=1800))
    assert got[1] == ("cfgA", T("2024-01-01 09:30:00"))   # 30 min: kept
    got = _by_event(asof_join(left, right, "ts", ["k"], tolerance_s=600))
    assert got[1] == (None, None)                         # 10 min: too old


def test_asof_forward(frames):
    left, right = frames
    got = _by_event(asof_join(left, right, "ts", ["k"],
                              direction="forward"))
    # earliest right row AT or AFTER each left ts
    assert got[3] == ("cfgA", T("2024-01-01 09:30:00"))   # 09:00 → 09:30
    assert got[1] == (None, T("2024-01-01 11:00:00"))     # 10:00 → 11:00 (NULL value)
    assert got[2] == ("cfgB", T("2024-01-01 12:00:00"))   # exact match
    assert got[4] == (None, None)
    # strict: the 12:00 left row has nothing strictly after it
    strict = _by_event(asof_join(left, right, "ts", ["k"],
                                 direction="forward",
                                 allow_exact_matches=False))
    assert strict[2] == (None, None)
    # tolerance in the forward direction
    tol = _by_event(asof_join(left, right, "ts", ["k"],
                              direction="forward", tolerance_s=600))
    assert tol[3] == (None, None)                         # 30 min > 10 min
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, "ts", ["k"], direction="nearest")


def test_asof_left_rows_preserved_exactly(frames):
    left, right = frames
    out = asof_join(left, right, "ts", ["k"])
    assert out.count() == left.count()
    assert sorted(r["event_id"] for r in out.collect()) == [1, 2, 3, 4]


def test_asof_value_col_collision_raises(frames):
    left, right = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("cfg", "event_id"),
                  "ts", ["k"])
    with pytest.raises(ValueError, match="matched_ts_col"):
        asof_join(left, right, "ts", ["k"], matched_ts_col="event_id")


def test_asof_single_shuffle_plan(frames):
    left, right = frames
    plan = asof_join(left, right, "ts", ["k"]) \
        ._jdf.queryExecution().executedPlan().toString()
    # union + one keyed window: exactly one hash-partitioning exchange,
    # never a per-row inequality join
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
