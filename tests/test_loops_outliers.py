"""Cycle (loop) detection and the multivariate robust outlier screen."""

import pytest
from pyspark.sql import Row

from schema_validata_spark.operators.sequence import loop_runs
from schema_validata_spark.operators.statqa import robust_outliers


def _seq(spark, values, part="c1"):
    rows = [Row(conv=part, idx=i, v=v) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "conv string, idx int, v string")


def _runs(spark, values, **kw):
    out = loop_runs(_seq(spark, values), "conv", ["idx"], "v", **kw)
    return {r["period"]: (r["max_run"], r["n_repeats"], r["n_loops"])
            for r in out.collect()}


def test_period2_alternation_detected(spark):
    got = _runs(spark, list("ABABAB"))
    # period 2 matches at idx 2..5 -> run 4 -> floor(4/2)+1 = 3 cycles
    assert got == {2: (4, 3, 1)}


def test_period3_cycle_detected(spark):
    got = _runs(spark, list("ABCABCABC"))
    assert got == {3: (6, 3, 1)}


def test_constant_run_degenerate_every_period(spark):
    # AAAAAA: period1 run5 (6 reps), period2 run4 (3 reps),
    # period3 run3 (2 reps -> below min_repeats=3)
    got = _runs(spark, list("AAAAAA"))
    assert got == {1: (5, 6, 1), 2: (4, 3, 1)}


def test_nulls_never_match(spark):
    got = _runs(spark, ["A", None, "A", None, "A", None])
    assert got == {}


def test_min_repeats_threshold(spark):
    vals = list("ABAB")  # period-2 run 2 -> 2 repeats
    assert _runs(spark, vals) == {}
    assert _runs(spark, vals, min_repeats=2) == {2: (2, 2, 1)}


def test_n_loops_counts_distinct_runs(spark):
    # two separate ABABAB stretches split by an X
    vals = list("ABABAB") + ["X"] + list("CDCDCD")
    got = _runs(spark, vals)
    assert got[2] == (4, 3, 2)


def test_partition_invariance(spark):
    import pyspark.sql.functions as F
    rows = [Row(conv=f"c{i % 5}", idx=i, v="AB"[(i // 5) % 2])
            for i in range(200)]
    df = spark.createDataFrame(rows)
    a = sorted(map(tuple, loop_runs(df, "conv", ["idx"], "v",
                                    min_repeats=2).collect()))
    b = sorted(map(tuple, loop_runs(df.repartition(7), "conv", ["idx"], "v",
                                    min_repeats=2).collect()))
    assert a == b and a


def test_bad_period_raises(spark):
    with pytest.raises(ValueError):
        loop_runs(_seq(spark, ["A"]), "conv", ["idx"], "v", max_period=0)


# --------------------------------------------------------- robust_outliers

def _feats(spark, rows):
    return spark.createDataFrame(rows, "id string, x double, y double")


def test_outlier_flagged_with_feature_named(spark):
    rows = [Row(id=f"e{i}", x=1.0, y=float(i)) for i in range(9)]
    rows.append(Row(id="bad", x=100.0, y=4.0))
    out = robust_outliers(_feats(spark, rows), "id", ["x", "y"],
                          k=5.0, mad_floor=1.0, exact=True).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id"], r["feature"]) == ("bad", "x")
    # median(x)=1, MAD=0 -> floor 1 -> deviation 99
    assert r["deviation"] == pytest.approx(99.0)


def test_null_feature_values_skipped(spark):
    rows = [Row(id="a", x=1.0, y=None), Row(id="b", x=1.0, y=None),
            Row(id="c", x=50.0, y=None)]
    out = robust_outliers(_feats(spark, rows), "id", ["x", "y"],
                          k=3.0, mad_floor=1.0, exact=True).collect()
    assert [(r["id"], r["feature"]) for r in out] == [("c", "x")]


def test_approx_mode_flags_clear_outlier(spark):
    rows = [Row(id=f"e{i}", x=float(i % 7), y=1.0) for i in range(50)]
    rows.append(Row(id="bad", x=3.0, y=1000.0))
    got = robust_outliers(_feats(spark, rows), "id", ["x", "y"],
                          k=5.0, mad_floor=1.0).collect()
    assert ("bad", "y") in {(r["id"], r["feature"]) for r in got}


def test_empty_features_raise(spark):
    with pytest.raises(ValueError):
        robust_outliers(_feats(spark, [Row(id="a", x=1.0, y=1.0)]),
                        "id", [])


# --------------------------------------------------------------- plan guards

def test_loop_runs_plan_single_exchange(spark, sf_dir):
    import pyspark.sql.functions as F
    from schema_validata_spark.plans import plan_audit
    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .where(F.col("user_id").isNotNull())
    a = plan_audit(loop_runs(ev, "user_id", ["ts", "event_id"],
                             "event_type"))
    # the islands window + both aggs reuse the part-key partitioning:
    # ONE exchange total, window sorts only (no global sort)
    assert a.n_exchanges == 1
    assert a.n_range_exchanges == 0
    assert a.n_nested_loop_joins == 0 and a.n_python_evals == 0
    assert max(a.scan_widths) <= 4  # part + 2 order cols + value


def test_robust_outliers_plan_reuses_input_exchange(spark, sf_dir):
    import pyspark.sql.functions as F
    from schema_validata_spark.plans import plan_audit
    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .where(F.col("user_id").isNotNull())
    feats = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("n_events"))
    ro = robust_outliers(feats, "user_id", ["n_events"], k=3.0)
    a = plan_audit(ro)
    assert a.n_range_exchanges == 0  # never a global sort
    assert a.n_nested_loop_joins == 0 and a.n_python_evals == 0
    # the four melted-frame branches dedupe at runtime via AQE
    # exchange reuse: the upstream agg computes once
    ro.collect()
    plan = ro._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ReusedExchange") >= 1
