"""End-to-end: full constraint suite over the synthetic transcripts
fixture — the engine's flagship path (SURVEY §7 slice 2-6)."""

import pytest
from pyspark.sql import functions as F

from schema_validata_spark import validate
from schema_validata_spark.datagen import (gen_conversations, gen_transcripts,
                                           transcript_rules)

N = 30_000


@pytest.fixture(scope="module")
def result(spark):
    t = gen_transcripts(spark, N, seed=42).cache()
    c = gen_conversations(spark, N, seed=42)
    res = validate(spark, t.drop("ts_date"), transcript_rules(),
                   dataset_name="transcripts",
                   dims={"conversations": c},
                   key_cols=["conv_id", "turn_idx"],
                   ignore_errors=[])
    yield res, t
    t.unpersist()


def test_verdicts_flag_seeded_violations(result):
    res, _ = result
    sv = res.schema_violations
    assert "role" in sv and "allowed_value_list" in sv["role"]
    assert "text" in sv and "length" in sv["text"]
    assert "turn_idx" in sv and "range_min" in sv["turn_idx"]
    assert "conv_id" in sv  # regex / nulls
    assert sv["missing_col"]["required_column"]["errors"] == \
        "Column by name 'missing_col' is required, but missing in dataset."
    assert "optional_column" in sv["optional_missing"]


def test_uid_content_token_sees_row_value_swap(spark):
    """VERDICT r2 #3: without a snapshot_id the uid's content token must
    be CONTENT-derived, not stats-derived — swapping two values between
    rows moves no column-level stat, but must change the uid (reference
    semantics: content md5, src/schema_validata.py:190-219)."""
    from schema_validata_spark.rules import FieldRule, Rules
    rules = Rules(name="SWAP", fields=[
        FieldRule("id", required=True, data_type="Integer",
                  unique_value=False),
        FieldRule("v", required=True, data_type="String",
                  unique_value=False),
    ])

    def run(rows):
        df = spark.createDataFrame(rows, "id int, v string")
        return validate(spark, df, rules, dataset_name="swap",
                        list_errors=False).uid

    base = run([(1, "aa"), (2, "bb")])
    swapped = run([(1, "bb"), (2, "aa")])       # same per-column multisets
    assert base != swapped
    assert base == run([(1, "aa"), (2, "bb")])  # deterministic
    # melt path (>16 cols) carries the same token: pad with constants
    wide_schema = ("id int, v string, " +
                   ", ".join(f"c{i} int" for i in range(16)))

    def run_wide(rows):
        pad = tuple(range(16))
        df = spark.createDataFrame([r + pad for r in rows], wide_schema)
        return validate(spark, df, rules, dataset_name="swap",
                        list_errors=False).uid

    assert run_wide([(1, "aa"), (2, "bb")]) != \
        run_wide([(1, "bb"), (2, "aa")])


def test_composite_uniqueness_and_ri(result):
    res, _ = result
    assert res.composite_uniqueness["conv_id+turn_idx"]["duplicate_rows"] > 0
    assert res.referential["conv_id->conversations.conv_id"] > 0
    assert not res.passed()


def test_violation_rows_satisfy_predicates(result):
    """Property: every emitted violation re-evaluates true (SURVEY §5.2.6)."""
    res, t = result
    v = res.violations.cache()
    # every 'operator' role row is listed
    op_rows = t.where(F.col("role") == "operator").count()
    listed = v.where((F.col("column_name") == "role")
                     & (F.col("error_type") == "Unallowed Value")).count()
    assert listed == op_rows
    # over-length text rows listed exactly
    long_rows = t.where(F.length("text") > 4000).count()
    listed = v.where((F.col("column_name") == "text")
                     & F.col("error_type").startswith("Value Exceeds")).count()
    assert listed == long_rows
    # negative turn_idx listed
    neg = t.where(F.col("turn_idx") < 0).count()
    listed = v.where((F.col("column_name") == "turn_idx")
                     & F.col("error_type").startswith("Below Minimum")).count()
    assert listed == neg
    v.unpersist()


def test_report_structure(result):
    res, _ = result
    rep = res.report(max_value_errors=50)
    assert res.uid in rep
    inner = rep[res.uid]
    assert set(inner.keys()) == {"run_metadata", "dataset_metadata",
                                 "data_dict_metadata", "results"}
    ds = inner["results"]["transcripts"]
    assert "schema_violations" in ds and "value_errors" in ds
    # value_errors is the reference's columnar to_json shape (:2595-2602)
    ve = ds["value_errors"]
    if ve:
        assert all(isinstance(colmap, dict) for colmap in ve.values())
        assert "error_type" in ve


def test_partition_verdicts(spark):
    t = gen_transcripts(spark, 10_000, seed=42)
    from schema_validata_spark.validate import partition_verdicts
    pv = partition_verdicts(t, transcript_rules(), "ts_date")
    rows = pv.collect()
    assert len(rows) > 0
    assert {"partition_key", "column_name", "check", "violation_count",
            "status"} == set(pv.columns)
    assert any(r["status"] == "fail" for r in rows)
    # per-partition counts must sum to the global count for a check
    glob = t.where(F.col("role") == "operator").count()
    got = sum(r["violation_count"] for r in rows
              if r["column_name"] == "role" and r["check"] == "allowed_value_list")
    assert got == glob
