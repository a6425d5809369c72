"""Round-5 (VERDICT r4 #4): conditional-rule counts ride the profile
scan inside validate() instead of paying a separate full input pass.

The fold: profile() grows ``extra_aggs``/``out_extras`` — caller
aggregate expressions that ride the wide aggregate on narrow tables
(one compact extra agg job on >16-col melt tables, where the explode
makes ride-along impossible). validate() feeds its conditional-rule
count(when(...)) expressions through it and no longer calls
conditional_counts() at all.
"""

import pytest
from pyspark.sql import functions as F

from schema_validata_spark import validate
from schema_validata_spark.operators import expectations as expect_mod
from schema_validata_spark.operators.expectations import (
    ConditionalRule, conditional_counts)
from schema_validata_spark.operators.profile import profile
from schema_validata_spark.rules import Rules


def _df(spark):
    return spark.createDataFrame(
        [(f"c{i % 5}", i, "tool" if i % 3 == 0 else "user",
          None if i % 6 == 0 else "search", i % 10)
         for i in range(400)],
        "conv_id string, turn_idx int, role string, tool string, "
        "value int")


def _rules():
    r = Rules.from_nested_dict("R", {
        "conv_id": {"data_type": "String", "allow_null": False},
        "turn_idx": {"data_type": "Integer", "allow_null": False}})
    r.conditional = [
        ConditionalRule("tool_has_tool", "role = 'tool'",
                        "tool IS NOT NULL"),
        ConditionalRule("never", "role = 'zzz'", "false")]
    return r


def test_validate_conditionals_match_standalone_counts(spark):
    df, rules = _df(spark), _rules()
    res = validate(spark, df, rules, key_cols=["conv_id", "turn_idx"])
    exp = {r["rule_name"]: int(r["violation_count"])
           for r in conditional_counts(df, rules.conditional).collect()}
    assert res.conditional == exp and exp["tool_has_tool"] > 0
    res.unpersist()


def test_validate_no_longer_calls_conditional_counts(spark, monkeypatch):
    """The separate conditional scan is GONE: validate() must not call
    conditional_counts (the counts ride the profile aggregate)."""
    def _boom(*a, **k):
        raise AssertionError("validate() paid a separate conditional "
                             "scan — the fold regressed")
    monkeypatch.setattr(expect_mod, "conditional_counts", _boom)
    res = validate(spark, _df(spark), _rules(),
                   key_cols=["conv_id", "turn_idx"])
    assert res.conditional["tool_has_tool"] > 0
    assert res.conditional["never"] == 0
    res.unpersist()


def test_melt_path_pays_one_compact_extra_agg(spark):
    """>16 columns routes profile to the melt; extras still come back
    identical (via the documented one-compact-agg fallback)."""
    df, rules = _df(spark), _rules()
    for j in range(15):
        df = df.withColumn(f"x{j}", F.lit(j))
    res = validate(spark, df, rules, key_cols=["conv_id", "turn_idx"])
    n = df.where("role = 'tool' AND tool IS NULL").count()
    assert res.conditional == {"tool_has_tool": n, "never": 0} and n > 0
    res.unpersist()


def test_profile_extra_aggs_surface(spark):
    """extra_aggs is a general rider: any aggregate expression over the
    original columns lands in out_extras under its given name."""
    df = _df(spark)
    out: dict = {}
    profile(df, extra_aggs=[
        ("n_tool_rows", F.count(F.when(F.col("role") == "tool", 1))),
        ("max_value", F.max("value"))], out_extras=out)
    assert out["n_tool_rows"] == df.where("role = 'tool'").count()
    assert out["max_value"] == 9


def test_profile_extra_aggs_empty_frame(spark):
    df = _df(spark).where("1 = 0")
    out: dict = {}
    profile(df, extra_aggs=[
        ("n", F.count(F.when(F.col("role") == "tool", 1)))],
        out_extras=out)
    assert int(out["n"] or 0) == 0
