"""Expectations layer: conditional (cross-column) rules, table-level
aggregate expectations, freshness/completeness, IQR outliers — plus the
Rules/validate()/partition_verdicts() wiring."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from schema_validata_spark import (ConditionalRule, Expectation,
                                   check_expectations, completeness_gaps,
                                   conditional_counts, conditional_violations,
                                   freshness_stats, iqr_outlier_stats,
                                   validate, partition_verdicts)
from schema_validata_spark.datagen import gen_transcripts, transcript_rules


TS = dt.datetime(2024, 1, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        # (id, role, tool, value, ts)
        (1, "tool", "search", 5.0, TS),
        (2, "tool", None, 3.0, TS + dt.timedelta(hours=1)),      # violates tool-set
        (3, "assistant", None, 100.0, TS + dt.timedelta(hours=1)),
        (4, "user", None, None, TS + dt.timedelta(hours=4)),     # hours 2,3 missing
        (5, "tool", "code", -1.0, TS + dt.timedelta(hours=4)),   # violates val>=0
    ]
    return spark.createDataFrame(
        rows, "id bigint, role string, tool string, value double, ts timestamp")


RULES = [
    ConditionalRule("tool_set_when_tool_role",
                    "role = 'tool'", "tool IS NOT NULL"),
    ConditionalRule("tool_value_nonneg",
                    "role = 'tool'", "value >= 0"),
    ConditionalRule("never_triggers", "role = 'nope'", "false"),
]


def test_conditional_violations_rows(frame):
    out = conditional_violations(frame, RULES, ["id"]).collect()
    got = {(r["id"], r["column_name"]) for r in out}
    assert got == {(2, "tool_set_when_tool_role"), (5, "tool_value_nonneg")}
    # frame schema matches the value_errors_df contract
    assert [c for c in conditional_violations(frame, RULES, ["id"]).columns] == \
        ["id", "error_type", "column_name", "error_value",
         "lookup_column", "lookup_value"]


def test_conditional_null_semantics(frame):
    # NULL when -> not triggered; NULL then on a triggered row -> violation
    rules = [ConditionalRule("null_when", "tool = 'search'", "value > 0"),
             ConditionalRule("null_then", "role = 'user'", "value > 0")]
    out = conditional_violations(frame, rules, ["id"]).collect()
    got = {(r["id"], r["column_name"]) for r in out}
    # row 4: tool IS NULL -> 'tool=search' is NULL -> null_when not triggered
    # row 4: role='user' AND value NULL -> then is NULL -> violation
    assert got == {(4, "null_then")}


def test_conditional_counts_global_and_partitioned(frame):
    glob = {r["rule_name"]: (r["violation_count"], r["status"])
            for r in conditional_counts(frame, RULES).collect()}
    assert glob["tool_set_when_tool_role"] == (1, "fail")
    assert glob["tool_value_nonneg"] == (1, "fail")
    assert glob["never_triggers"] == (0, "pass")
    per = conditional_counts(frame, RULES, partition_col="role").collect()
    by = {(r["partition_key"], r["rule_name"]): r["violation_count"]
          for r in per}
    assert by[("tool", "tool_set_when_tool_role")] == 1
    assert by[("user", "tool_set_when_tool_role")] == 0


def test_expectations_pass_fail(frame):
    exps = [
        Expectation("row_count_min", "count(*)", ">=", 5),
        Expectation("null_frac_tool_max",
                    "avg(case when tool is null then 1.0 else 0.0 end)",
                    "<=", 0.2),                      # observed 0.6 -> fail
        Expectation("max_value", "max(value)", "<=", 100),
        Expectation("distinct_roles", "count(distinct role)", "==", 3),
    ]
    out = {r["expectation"]: (r["observed"], r["status"])
           for r in check_expectations(frame, exps).collect()}
    assert out["row_count_min"] == (5.0, "pass")
    assert out["null_frac_tool_max"][1] == "fail"
    assert out["max_value"] == (100.0, "pass")
    assert out["distinct_roles"] == (3.0, "pass")


def test_expectations_null_observed_fails(spark):
    empty = spark.createDataFrame([], "v double")
    out = check_expectations(
        empty, [Expectation("max_v", "max(v)", "<=", 10)]).collect()
    assert out[0]["status"] == "fail" and out[0]["observed"] is None


def test_freshness_stats(frame):
    out = {r["bucket"]: r for r in
           freshness_stats(frame, "ts", "hour").collect()}
    assert len(out) == 3
    newest = out[TS + dt.timedelta(hours=4)]
    assert newest["lag_seconds"] == 0 and newest["row_count"] == 2
    oldest = out[TS]
    assert oldest["lag_seconds"] == 4 * 3600
    # day granularity collapses to one bucket
    day = freshness_stats(frame, "ts", "day").collect()
    assert len(day) == 1 and day[0]["row_count"] == 5


def test_completeness_gaps(frame):
    gaps = sorted(r["bucket"] for r in
                  completeness_gaps(frame, "ts", "hour").collect())
    assert gaps == [TS + dt.timedelta(hours=2), TS + dt.timedelta(hours=3)]
    # no gaps at day granularity
    assert completeness_gaps(frame, "ts", "day").count() == 0


def test_completeness_gaps_empty_input(spark):
    empty = spark.createDataFrame([], "ts timestamp")
    assert completeness_gaps(empty, "ts", "hour").count() == 0


def test_iqr_outlier_stats(spark):
    import numpy as np
    vals = [float(v) for v in range(1, 101)] + [1000.0, -1000.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = iqr_outlier_stats(df, ["x"], k=1.5, exact=True).collect()[0]
    q1, q3 = np.percentile(np.array(vals), [25, 75])
    assert out["q1"] == pytest.approx(q1)
    assert out["q3"] == pytest.approx(q3)
    lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
    expect_n = sum(1 for v in vals if v < lo or v > hi)
    assert out["n_outliers"] == expect_n == 2


def test_iqr_all_null_column(spark):
    df = spark.createDataFrame([(None,), (None,)], "x double")
    out = iqr_outlier_stats(df, ["x"], exact=True).collect()[0]
    assert out["q1"] is None and out["n_outliers"] == 0


def test_validate_wires_conditionals(spark):
    df = gen_transcripts(spark, 2000, seed=7)
    rules = transcript_rules()
    rules.conditional = [
        ConditionalRule("tool_turns_have_tool",
                        "role = 'tool'", "tool IS NOT NULL"),
        ConditionalRule("never", "role = 'zzz'", "false"),
    ]
    res = validate(spark, df, rules, dataset_name="t",
                   key_cols=["conv_id", "turn_idx"])
    try:
        assert set(res.conditional) == {"tool_turns_have_tool", "never"}
        assert res.conditional["never"] == 0
        # count matches a direct evaluation
        direct = df.where((F.col("role") == "tool")
                          & F.col("tool").isNull()).count()
        assert res.conditional["tool_turns_have_tool"] == direct
        if direct:
            assert not res.passed()
            listed = res.violations.where(
                F.col("column_name") == "tool_turns_have_tool").count()
            assert listed == direct
    finally:
        res.unpersist()


def test_volume_anomalies(spark):
    # 9 steady days of 100 rows, one day with a 10x spike
    rows = []
    for d in range(10):
        n = 1000 if d == 5 else 100
        for i in range(n):
            rows.append((TS + dt.timedelta(days=d, seconds=i),))
    df = spark.createDataFrame(rows, "ts timestamp")
    from schema_validata_spark import volume_anomalies
    out = {r["bucket"]: r for r in
           volume_anomalies(df, "ts", "day", k=5.0).collect()}
    assert len(out) == 10
    spike = out[TS + dt.timedelta(days=5)]
    assert spike["is_anomaly"] and spike["row_count"] == 1000
    assert spike["median_count"] == 100.0 and spike["mad"] == 0.0
    normals = [r for b, r in out.items() if b != TS + dt.timedelta(days=5)]
    assert all(not r["is_anomaly"] for r in normals)


def test_get_byte_units_reference_parity():
    import sys
    import types
    fake = types.ModuleType("chardet")
    fake.detect = lambda b: {"encoding": "utf-8", "confidence": 1.0}
    sys.modules.setdefault("chardet", fake)
    sys.path.insert(0, "/root/reference/src")
    import schema_validata as ref
    from schema_validata_spark import get_byte_units  # sources.tableio
    for v in (0, 1, 999, 1000, 1536, 10**6, 2 * 10**9, 123456789012345):
        assert get_byte_units(v) == ref.get_byte_units(v)


def test_stream_validate_conditionals(spark, tmp_path):
    from schema_validata_spark.streaming import stream_validate
    from schema_validata_spark.datagen import (gen_transcripts,
                                               transcript_rules)
    # seed 42 / 20k seeds tool-role turns with NULL tool (7 of them)
    t = gen_transcripts(spark, 20000, seed=42).drop("ts_date")
    src = str(tmp_path / "cond_stream")
    t.write.parquet(src)
    rules = transcript_rules()
    rules.conditional = [
        ConditionalRule("tool_turns_have_tool",
                        "role = 'tool'", "tool IS NOT NULL")]
    stream = spark.readStream.schema(t.schema).parquet(src)
    out = stream_validate(stream, rules, ["conv_id", "turn_idx"])
    q = (out.writeStream.format("memory").queryName("cond_v")
            .outputMode("append").start())
    q.processAllAvailable(); q.stop()
    got = spark.sql("select * from cond_v where column_name ="
                    " 'tool_turns_have_tool'").count()
    direct = (spark.read.parquet(src)
              .where((F.col("role") == "tool") & F.col("tool").isNull())
              .count())
    assert got == direct > 0


def test_conditional_violations_column_pruned(spark, tmp_path):
    """The conditional scan must not read columns the rules never
    reference (ReadSchema check on a parquet-backed frame)."""
    from schema_validata_spark.datagen import gen_transcripts
    src = str(tmp_path / "cond_prune")
    gen_transcripts(spark, 1000, seed=5).drop("ts_date").write.parquet(src)
    t = spark.read.parquet(src)
    out = conditional_violations(
        t, [ConditionalRule("r", "role = 'tool'", "tool IS NOT NULL")],
        ["conv_id", "turn_idx"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    read = next(ln for ln in plan.splitlines() if "ReadSchema" in ln)
    assert "role" in read and "tool" in read and "conv_id" in read
    assert "text" not in read and "ts" not in read


def test_partition_verdicts_include_conditionals(spark):
    df = gen_transcripts(spark, 2000, seed=7)
    rules = transcript_rules()
    rules.conditional = [
        ConditionalRule("tool_turns_have_tool",
                        "role = 'tool'", "tool IS NOT NULL")]
    pv = partition_verdicts(df, rules, "role")
    rows = [r for r in pv.collect() if r["check"] == "conditional"]
    assert rows, "conditional rows missing from partition verdicts"
    tot = sum(r["violation_count"] for r in rows)
    direct = df.where((F.col("role") == "tool")
                      & F.col("tool").isNull()).count()
    assert tot == direct


def test_expectation_threshold_must_be_finite():
    with pytest.raises(ValueError, match="finite"):
        Expectation("bad", "count(*)", "<=", float("inf"))


def test_iqr_nan_heavy_column_reported_unmeasurable(spark):
    # >25% NaN: q3 lands on NaN -> column is unmeasurable, not a crash
    vals = [1.0, 2.0, 3.0] + [float("nan")] * 7
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = iqr_outlier_stats(df, ["x"], exact=True).collect()[0]
    assert out["q3"] is None and out["n_outliers"] == 0


def test_derived_mismatches_null_safe(spark):
    from schema_validata_spark.operators.expectations import (
        derived_mismatches)
    rows = [
        (1, "abc", 3),      # consistent
        (2, "abcd", 3),     # stale stored value
        (3, "ab", None),    # NULL stored vs 2 -> mismatch
        (4, None, None),    # NULL vs NULL -> consistent
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, n_chars bigint")
    got = {r["doc_id"]: r
           for r in derived_mismatches(
               df, "doc_id", "n_chars",
               F.length("text").cast("bigint")).collect()}
    assert set(got) == {2, 3}
    assert got[2]["stored"] == 3 and got[2]["recomputed"] == 4
    assert got[3]["stored"] is None and got[3]["recomputed"] == 2


def test_check_group_expectations_per_group(spark):
    """Per-group contracts: failures only by default, NULL aggregate
    observed fails, pass rows available with failures_only=False."""
    from schema_validata_spark.operators.expectations import (
        Expectation, check_group_expectations)
    df = spark.createDataFrame(
        [("c1", 1.0), ("c1", 2.0), ("c1", 3.0),
         ("c2", 10.0), ("c3", None)],
        "conv string, v double")
    exps = [Expectation("max_turns", "count(*)", "<=", 2),
            Expectation("v_cap", "max(v)", "<=", 5.0)]
    fails = {(r["conv"], r["expectation"]) for r in
             check_group_expectations(df, ["conv"], exps).collect()}
    # c1: 3 turns > 2; c2: v=10 > 5; c3: max(NULL)=NULL → fails v_cap
    assert fails == {("c1", "max_turns"), ("c2", "v_cap"),
                     ("c3", "v_cap")}
    both = check_group_expectations(df, ["conv"], exps,
                                    failures_only=False)
    assert both.count() == 6          # 3 groups × 2 expectations
    assert both.where("status = 'pass'").count() == 3


def test_seasonal_volume_anomalies_dow_baseline(spark):
    import datetime as dt
    from pyspark.sql import functions as F
    from schema_validata_spark.operators.expectations import (
        seasonal_volume_anomalies, volume_anomalies)
    # 4 weeks: weekdays carry 100 rows/day, weekends 10 — plus ONE
    # broken Monday at 10 rows (normal for a weekend, wrong for Monday)
    start = dt.date(2024, 1, 1)  # a Monday
    rows = []
    for d in range(28):
        day = start + dt.timedelta(days=d)
        n = 10 if day.weekday() >= 5 else 100
        if d == 21:                     # the fourth Monday breaks
            n = 10
        rows += [(dt.datetime.combine(day, dt.time(9, 0)),)] * n
    df = spark.createDataFrame(rows, "ts: timestamp")
    out = seasonal_volume_anomalies(df, "ts", k=3.0)
    flagged = [r for r in out.collect() if r["is_anomaly"]]
    assert len(flagged) == 1
    assert flagged[0]["bucket"].date() == start + dt.timedelta(days=21)
    assert flagged[0]["dow"] == 0 and flagged[0]["dow_median"] == 100.0
    # the global-median screen cannot isolate it: weekends sit exactly
    # as far from the global median as the broken Monday does
    glob = volume_anomalies(df, "ts", k=3.0)
    g_flagged = {r["bucket"].date() for r in glob.collect()
                 if r["is_anomaly"]}
    assert g_flagged != {start + dt.timedelta(days=21)}
