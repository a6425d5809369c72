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


def test_asof_null_ts_left_rows_never_match(spark, frames):
    # ADVICE r2 (medium): forward's DESC order placed NULL ts LAST, so a
    # NULL-ts left row inherited the min-ts right row. Both directions
    # must yield no match for a NULL-ts left row.
    _, right = frames
    left = spark.createDataFrame(
        [("u1", None, 1), ("u1", T("2024-01-01 10:00:00"), 2)],
        "k string, ts timestamp, event_id int")
    for d in ("backward", "forward"):
        got = _by_event(asof_join(left, right, "ts", ["k"], direction=d))
        assert got[1] == (None, None), f"direction={d}"
        assert got[2][1] is not None          # real-ts row still matches
    # strict-inequality variants flip the side ordering — same contract
    for d in ("backward", "forward"):
        got = _by_event(asof_join(left, right, "ts", ["k"], direction=d,
                                  allow_exact_matches=False))
        assert got[1] == (None, None), f"strict direction={d}"


def test_asof_null_ts_right_rows_never_matched(spark, frames):
    left, _ = frames
    right = spark.createDataFrame(
        [("u1", None, "ghost")], "k string, ts timestamp, cfg string")
    for d in ("backward", "forward"):
        got = _by_event(asof_join(left, right, "ts", ["k"], direction=d))
        assert all(v == (None, None) for v in got.values()), f"direction={d}"


def test_asof_tiebreak_deterministic(spark):
    # duplicate (key, ts) right rows: greatest tiebreak value wins,
    # stable across repartitionings (VERDICT r2 #5)
    left = spark.createDataFrame(
        [("u1", T("2024-01-01 10:00:00"), 1)], ["k", "ts", "event_id"])
    rows = [("u1", T("2024-01-01 09:00:00"), f"cfg{i}", i)
            for i in range(8)]
    import random
    rng = random.Random(7)
    for trial in range(3):
        shuffled = rows[:]
        rng.shuffle(shuffled)
        right = spark.createDataFrame(shuffled, ["k", "ts", "cfg", "seq"]) \
                     .repartition(trial + 1)
        got = _by_event(asof_join(left, right, "ts", ["k"],
                                  value_cols=["cfg"], tiebreak_col="seq"))
        assert got[1] == ("cfg7", T("2024-01-01 09:00:00"))
    with pytest.raises(ValueError, match="tiebreak_col"):
        asof_join(left, spark.createDataFrame(rows, ["k", "ts", "cfg", "seq"]),
                  "ts", ["k"], tiebreak_col="nope")


def test_asof_single_shuffle_plan(frames):
    left, right = frames
    plan = asof_join(left, right, "ts", ["k"]) \
        ._jdf.queryExecution().executedPlan().toString()
    # union + one keyed window: exactly one hash-partitioning exchange,
    # never a per-row inequality join
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
