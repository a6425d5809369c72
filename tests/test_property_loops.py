"""Property-based check of loop_runs against a plain-Python oracle:
random short value sequences (with NULLs and repeats), every (period,
max_run, n_repeats, n_loops) row must match an independent
island-counting implementation. Small frames; the point is edge
coverage (NULL breaks, runs at sequence boundaries, overlapping
periods), not volume."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row

from schema_validata_spark.operators.sequence import loop_runs

VALS = st.lists(
    st.one_of(st.none(), st.sampled_from(["A", "B", "C"])),
    min_size=0, max_size=18)


def _oracle(values, max_period=3, min_repeats=3):
    out = {}
    for p in range(1, max_period + 1):
        runs, cur = [], 0
        for i in range(len(values)):
            m = (i >= p and values[i] is not None
                 and values[i] == values[i - p])
            if m:
                cur += 1
            else:
                if cur:
                    runs.append(cur)
                cur = 0
        if cur:
            runs.append(cur)
        if not runs:
            continue
        max_run = max(runs)
        n_repeats = max_run // p + 1
        if n_repeats < min_repeats:
            continue
        n_loops = sum(1 for r in runs if r // p + 1 >= min_repeats)
        out[p] = (max_run, n_repeats, n_loops)
    return out


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(values=VALS)
def test_loop_runs_matches_python_oracle(spark, values):
    df = spark.createDataFrame(
        [Row(conv="c", idx=i, v=v) for i, v in enumerate(values)] or
        [Row(conv="c", idx=0, v="X")],
        "conv string, idx int, v string")
    if not values:
        df = df.where("idx < 0")   # empty frame path
    got = {r["period"]: (r["max_run"], r["n_repeats"], r["n_loops"])
           for r in loop_runs(df, "conv", ["idx"], "v").collect()}
    assert got == _oracle(values)


def test_new_ops_empty_inputs(spark):
    """Empty frames flow through (no crash, empty result)."""
    from schema_validata_spark.operators.dedup import conversation_forks
    from schema_validata_spark.operators.statqa import robust_outliers
    empty_seq = spark.createDataFrame(
        [], "conv string, idx int, text string")
    assert conversation_forks(empty_seq, "conv", ["idx"],
                              "text").count() == 0
    assert loop_runs(empty_seq, "conv", ["idx"], "text").count() == 0
    empty_feats = spark.createDataFrame([], "id string, x double")
    assert robust_outliers(empty_feats, "id", ["x"]).count() == 0
