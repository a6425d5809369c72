"""Round-4: append-mode rolling run-log sink (VERDICT r3 #5) — the
reference example's accumulating error/metadata log tables
("schema_validata example (reports).py":395-400, 459-465) as
run_uid-partitioned parquet with dynamic-partition-overwrite upserts."""

import json

import pytest
from pyspark.sql import functions as F

from schema_validata_spark.report import append_run_log
from schema_validata_spark.validate import ValidationResult


def _result(uid, dataset="ds", errs=True):
    sv = {}
    if errs:
        sv = {
            "role": {"status": "fail", "required": True,
                     "allowed_value_list": {
                         "expected": ["a"], "observed": ["a", "b"],
                         "errors": "Column 'role' contains values that "
                                   "are not allowed: ['b'] ."}},
            "text": {"status": "fail", "required": True,
                     "length": {"expected": 10, "observed": 20,
                                "errors": "too long"}},
        }
    return ValidationResult(
        uid=uid, dataset_name=dataset, observed_schema={},
        schema_violations=sv, violations=None, composite_uniqueness={},
        referential={})


def test_two_runs_accumulate_and_rerun_is_idempotent(spark, tmp_path):
    d = str(tmp_path / "log")
    append_run_log(_result("run1"), d, spark=spark,
                   extra={"state": "WV"})
    append_run_log(_result("run2"), d, spark=spark)
    el = spark.read.parquet(f"{d}/error_log")
    rl = spark.read.parquet(f"{d}/run_log")
    assert el.count() == 4                       # 2 errors × 2 runs
    assert rl.count() == 2
    # re-log run1 — partition replaced, nothing duplicated
    append_run_log(_result("run1"), d, spark=spark,
                   extra={"state": "WV"})
    el2 = spark.read.parquet(f"{d}/error_log")
    rl2 = spark.read.parquet(f"{d}/run_log")
    assert el2.count() == 4
    assert rl2.count() == 2
    assert {r.run_uid for r in rl2.collect()} == {"run1", "run2"}
    row1 = rl2.where("run_uid = 'run1'").first()
    assert row1.error_count == 2 and row1.has_schema_errors
    assert not row1.passed
    assert json.loads(row1.extra) == {"state": "WV"}


def test_error_rows_match_reference_loop(spark, tmp_path):
    """Rows carry (column, error_type, error_message) exactly as the
    reference's k2/k3/errors extraction loop emits them."""
    d = str(tmp_path / "log2")
    append_run_log(_result("r"), d, spark=spark)
    rows = {(r.column, r.error_type)
            for r in spark.read.parquet(f"{d}/error_log").collect()}
    assert rows == {("role", "allowed_value_list"), ("text", "length")}


def test_clean_run_logs_metadata_only(spark, tmp_path):
    d = str(tmp_path / "log3")
    append_run_log(_result("clean", errs=False), d, spark=spark)
    rl = spark.read.parquet(f"{d}/run_log").first()
    assert rl.passed and rl.error_count == 0
    import os
    assert not os.path.exists(f"{d}/error_log")


def test_requires_spark_when_no_violations_frame(tmp_path):
    with pytest.raises(ValueError, match="spark"):
        append_run_log(_result("x"), str(tmp_path / "log4"))


def test_run_log_regressions_hand_computed(spark):
    """Two datasets interleaved; hand-checked new/resolved kind counts
    and NULL prev/delta on each dataset's first run."""
    from schema_validata_spark.report import run_log_regressions
    el = spark.createDataFrame(
        [("a1", "A", "c1", "nulls", "m", None),
         ("a1", "A", "c2", "range", "m", None),
         ("a2", "A", "c2", "range", "m", None),     # c1:nulls resolved
         ("a2", "A", "c3", "regex", "m", None),     # new
         ("b1", "B", "c9", "length", "m", None)],
        "run_uid string, dataset string, column string, "
        "error_type string, error_message string, ts timestamp")
    rl = spark.createDataFrame(
        [("a1", "A", 5, "2024-01-01 00:00:00"),
         ("a2", "A", 3, "2024-01-02 00:00:00"),
         ("b1", "B", 1, "2024-01-01 12:00:00")],
        "run_uid string, dataset string, error_count int, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = {(r.dataset, r.run_uid): r
           for r in run_log_regressions(el, rl).collect()}
    a1 = out[("A", "a1")]
    assert a1.prev_error_count is None and a1.delta is None
    assert a1.n_new_kinds == 2 and a1.n_resolved_kinds == 0
    a2 = out[("A", "a2")]
    assert a2.prev_error_count == 5 and a2.delta == -2
    assert a2.n_new_kinds == 1 and a2.n_resolved_kinds == 1
    b1 = out[("B", "b1")]
    assert b1.n_new_kinds == 1 and b1.prev_error_count is None
