"""interval_join: containment semantics, half-open bounds, by-keys,
bucket-width independence, and the no-nested-loop plan contract."""

import pytest
from pyspark.sql import functions as F

from schema_validata_spark.operators.rangejoin import interval_join


@pytest.fixture()
def frames(spark):
    pts = spark.createDataFrame(
        [(1, 0.0), (2, 5.0), (3, 9.99), (4, 10.0), (5, -3.0), (6, None)],
        ["pid", "v"])
    iv = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 5.0, 15.0), ("c", -10.0, -1.0)],
        ["iid", "lo", "hi"])
    return pts, iv


def _pairs(out):
    return sorted((r["pid"], r["iid"]) for r in out.collect())


EXPECT = [(1, "a"), (2, "a"), (2, "b"), (3, "a"), (3, "b"),
          (4, "b"), (5, "c")]


def test_interval_join_halfopen_and_overlap(frames):
    pts, iv = frames
    # v=0 in [0,10); v=5 in both; v=10 NOT in [0,10) but in [5,15);
    # negative point matches the negative interval; NULL never matches
    assert _pairs(interval_join(pts, iv, "v", "lo", "hi")) == EXPECT


@pytest.mark.parametrize("w", [0.5, 3.0, 100.0])
def test_interval_join_bucket_width_independent(frames, w):
    pts, iv = frames
    assert _pairs(interval_join(pts, iv, "v", "lo", "hi",
                                bucket_width=w)) == EXPECT


def test_interval_join_by_cols(spark):
    pts = spark.createDataFrame([(1, "x", 5.0), (2, "y", 5.0)],
                                ["pid", "g", "v"])
    iv = spark.createDataFrame([("a", "x", 0.0, 10.0)],
                               ["iid", "g", "lo", "hi"])
    out = interval_join(pts, iv, "v", "lo", "hi", by_cols=["g"])
    assert _pairs(out) == [(1, "a")]        # same value, wrong key → no match


def test_interval_join_collision_and_bad_width(frames):
    pts, iv = frames
    with pytest.raises(ValueError, match="collide"):
        interval_join(pts, iv.withColumnRenamed("iid", "pid"),
                      "v", "lo", "hi")
    with pytest.raises(ValueError, match="positive"):
        interval_join(pts, iv, "v", "lo", "hi", bucket_width=0)


def test_interval_join_plan_no_nested_loop(frames):
    pts, iv = frames
    plan = interval_join(pts, iv, "v", "lo", "hi", bucket_width=5.0) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
