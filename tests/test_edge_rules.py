"""Degenerate-rules and odd-header edges (code-review round 2 findings):
rules with ZERO per-row checks, composite keys overlapping the partition
column, apostrophes in headers, max_value_errors=0, and dot-safe
length_percentiles — every one of these previously crashed or silently
mis-behaved."""

import pytest
from pyspark.sql import functions as F

from schema_validata_spark import validate
from schema_validata_spark.rules import Rules
from schema_validata_spark.validate import partition_verdicts


def _df(spark):
    return spark.createDataFrame(
        [("a", 1, "d1"), ("a", 1, "d1"), ("b", 2, "d2"), ("c", 3, "d2")],
        "k string, n int, part string")


def test_validate_rules_with_only_composite_unique(spark):
    """Rules carrying ONLY a composite key (no allow_null/length/range/
    allowed/regex on any field): the speculative violations scan has
    zero row-level specs — must not crash on None.persist(), and the
    composite duplicate must still be found."""
    rules = Rules.from_nested_dict("edge", {
        "k": {"data_type": "String"},
        "n": {"data_type": "Integer"},
    })
    rules.composite_unique = [("k", "n")]
    res = validate(spark, _df(spark), rules, dataset_name="edge",
                   key_cols=["k", "n"], ignore_errors=[])
    assert res.composite_uniqueness["k+n"]["duplicate_rows"] == 2
    # report() with a zero cap must return ZERO rows, not all of them
    rpt = res.report(max_value_errors=0)
    ve = rpt[res.uid]["results"]["edge"]["value_errors"]
    assert ve == {} or not any(ve.values())


def test_partition_verdicts_zero_row_specs(spark):
    """No per-row checks at all -> typed EMPTY verdicts (no stack(0,)
    parse error, no zero-agg crash); composite-only rules still emit
    uniqueness verdicts."""
    bare = Rules.from_nested_dict("edge", {"k": {"data_type": "String"}})
    pv = partition_verdicts(_df(spark), bare, "part")
    assert pv.columns == ["partition_key", "column_name", "check",
                          "violation_count", "status"]
    assert pv.count() == 0

    bare.composite_unique = [("k", "n")]
    pv2 = partition_verdicts(_df(spark), bare, "part")
    rows = {(r["partition_key"], r["check"]): r["violation_count"]
            for r in pv2.collect()}
    assert rows[("d1", "unique_value")] == 2


def test_partition_verdicts_key_contains_partition_col(spark):
    """composite_unique including the partition column itself must not
    select the column twice (ambiguous reference)."""
    rules = Rules.from_nested_dict("edge", {
        "k": {"data_type": "String", "allow_null": False}})
    rules.composite_unique = [("part", "k")]
    pv = partition_verdicts(_df(spark), rules, "part")
    rows = {(r["partition_key"], r["check"]): r["violation_count"]
            for r in pv.collect()}
    assert rows[("d1", "unique_value")] == 2      # ('d1','a') twice


def test_partition_verdicts_apostrophe_header(spark):
    """A header containing an apostrophe must survive the stack()
    literal (SQL '' escaping)."""
    df = spark.createDataFrame([("x", "p")], "`o'clock` string, part string")
    rules = Rules.from_nested_dict("edge", {
        "o'clock": {"data_type": "String", "allow_null": False}})
    pv = partition_verdicts(df, rules, "part")
    r = pv.collect()
    assert len(r) == 1 and r[0]["column_name"] == "o'clock"
    assert r[0]["status"] == "pass"


def test_length_percentiles_dotted_column(spark):
    from schema_validata_spark.operators.profile import length_percentiles
    df = spark.createDataFrame([("abc", "g"), ("abcde", "g")],
                               "`text.body` string, `grp.id` string")
    out = length_percentiles(df, "text.body", percentiles=(0.5,),
                             group_col="grp.id", exact=True).collect()
    assert len(out) == 1 and out[0]["p_5"] == 4.0


def test_manifest_missing_path_is_fresh_run(spark, tmp_path):
    """A manifest path that does not exist yet (any scheme) reads as a
    fresh run — empty completed/identities/metrics, no crash — and the
    file:// spelling of a local path behaves like the bare path."""
    from schema_validata_spark.manifest import Manifest
    missing = Manifest(spark, str(tmp_path / "never_written"))
    assert missing.completed("r1") == set()
    assert missing.done_identities("r1") == {}
    assert missing.metrics("r1") == {}

    m = Manifest(spark, "file://" + str(tmp_path / "m1"))
    assert m.completed("r1") == set()
    m.mark_done("r1", "p1", metrics={"n": 1}, rows=10, wall_s=0.1)
    assert m.completed("r1") == {"p1"}
    assert m.metrics("r1")["p1"] == {"n": 1}


def test_rules_config_roundtrip():
    from schema_validata_spark import ConditionalRule, FieldRule, Rules
    r = Rules("T", fields=[
        FieldRule("a", required=True, data_type="Integer",
                  allow_null=False, unique_value=True, range_min=0.0),
        FieldRule("b", data_type="String",
                  allowed_value_list=["x", "y"], regex_pattern=r"^\w+$"),
    ], composite_unique=[("a", "b")],
       foreign_keys=[("a", "dim", "k")])
    r.conditional = [ConditionalRule("c1", "b = 'x'", "a > 0")]
    import json
    cfg = json.loads(json.dumps(r.to_config()))   # through real JSON
    back = Rules.from_config(cfg)
    assert back.name == "T"
    assert back.to_nested_dict() == r.to_nested_dict()
    assert back.composite_unique == [("a", "b")]
    assert back.foreign_keys == [("a", "dim", "k")]
    assert back.conditional == r.conditional
    # bare nested dict (reference shape) still loads without extras
    bare = Rules.from_config({"fields": r.to_nested_dict()})
    assert bare.composite_unique == [] and bare.conditional == []
