"""Row-level violation listing: per-check predicates and the combined
single-scan emitter (reference §2.5 ops, src/schema_validata.py:2158-2604)."""

from pyspark.sql import functions as F

from schema_validata_spark.operators.violations import (CheckSpec,
                                                        value_errors_df,
                                                        violation_plan_for,
                                                        with_sheet_row)
from schema_validata_spark.rules import FieldRule, Rules


def _df(spark):
    rows = [
        # id, name, qty, code
        (1, "alpha", 5.0, "A1"),
        (2, "N/A", 60.0, "B2"),       # null-pattern name; qty over max
        (3, "gamma", -1.0, "bad"),    # qty under min; code regex fail
        (4, "alpha", 5.0, "C3"),      # name dup with row 1
        (5, None, 2.0, "D4"),         # real null name
        (6, "epsilon-very-long-name", 3.0, "E5"),  # length violation
    ]
    return spark.createDataFrame(rows, "id: long, name: string, qty: double, code: string")


def test_null_check_extended_vocabulary(spark):
    df = _df(spark)
    v = value_errors_df(df, [CheckSpec("name", "allow_null")], ["id"])
    got = {(r["id"], r["error_type"]) for r in v.collect()}
    assert got == {(2, "Null Value"), (5, "Null Value")}


def test_duplicates_keep_false(spark):
    df = _df(spark)
    v = value_errors_df(df, [CheckSpec("name", "unique_value")], ["id"])
    ids = sorted(r["id"] for r in v.collect())
    assert ids == [1, 4]  # both members of the duplicate group
    assert all(r["error_type"] == "Duplicate Value" for r in v.collect())


def test_length_check(spark):
    df = _df(spark)
    v = value_errors_df(df, [CheckSpec("name", "length", 10)], ["id"])
    rows = v.collect()
    assert [r["id"] for r in rows] == [6]
    assert rows[0]["error_type"] == "Value Exceeds Max Length (10)"
    assert rows[0]["error_value"] == "epsilon-very-long-name"


def test_range_checks(spark):
    df = _df(spark)
    v = value_errors_df(df, [CheckSpec("qty", "range_min", 0.0),
                             CheckSpec("qty", "range_max", 50.0)], ["id"])
    got = {(r["id"], r["error_type"]) for r in v.collect()}
    assert got == {(3, "Below Minimum Allowed Value (0.0)"),
                   (2, "Exceeds Maximum Allowed Value (50.0)")}


def test_regex_anchoring_matches_python_re_match(spark):
    # re.match anchors at start only: pattern 'A\d' must match 'A1x' too
    df = spark.createDataFrame([(1, "A1x"), (2, "xA1"), (3, "A2")],
                               "id: long, code: string")
    v = value_errors_df(df, [CheckSpec("code", "regex_pattern", r"A\d")], ["id"])
    assert sorted(r["id"] for r in v.collect()) == [2]


def test_allowed_values_numeric_and_string(spark):
    df = spark.createDataFrame([(1, 1.0, "x"), (2, 9.0, "y"), (3, 2.0, "z")],
                               "id: long, n: double, s: string")
    v = value_errors_df(df, [CheckSpec("n", "allowed_value_list", [1, 2]),
                             CheckSpec("s", "allowed_value_list", ["x", "z"])],
                        ["id"])
    got = {(r["id"], r["column_name"]) for r in v.collect()}
    assert got == {(2, "n"), (2, "s")}


def test_combined_scan_with_lookup(spark):
    df = _df(spark)
    specs = [CheckSpec("name", "allow_null"),
             CheckSpec("qty", "range_max", 50.0)]
    v = value_errors_df(df, specs, ["id"], lookup_col="code")
    rows = {(r["id"], r["error_type"], r["lookup_column"], r["lookup_value"])
            for r in v.collect()}
    assert (2, "Null Value", "code", "B2") in rows
    assert (2, "Exceeds Maximum Allowed Value (50.0)", "code", "B2") in rows


def test_plan_respects_ignore_and_always_on_regex(spark):
    rules = Rules("S", [
        FieldRule("name", required=True, data_type="String", allow_null=False),
        FieldRule("code", required=True, data_type="String",
                  regex_pattern=r"[A-Z]\d"),
    ])
    sv = {"name": {"status": "fail", "required": True,
                   "allow_null": {"expected": False, "observed": "True",
                                  "errors": "..."}}}
    specs = violation_plan_for(rules, sv, ["id", "name", "code"],
                               ignore_errors=["allow_null"])
    # allow_null suppressed by ignore; regex always on for 'code'
    assert [(s.column, s.check) for s in specs] == [("code", "regex_pattern")]
    specs = violation_plan_for(rules, sv, ["id", "name", "code"],
                               ignore_errors=[])
    assert ("name", "allow_null") in [(s.column, s.check) for s in specs]


def test_sheet_row_parity(spark):
    df = _df(spark)
    v = value_errors_df(df, [CheckSpec("name", "length", 10)], ["id"])
    vr = with_sheet_row(v, df, ["id"]).collect()
    # id=6 is the 6th row in id order → pandas idx 5 → Sheet Row 7
    assert vr[0]["sheet_row"] == 7


def test_empty_plan_returns_none(spark):
    assert value_errors_df(_df(spark), [], ["id"]) is None


def test_allowed_values_numeric_nan_not_flagged(spark):
    """NaN in a numeric column is not an 'unallowed value' (pandas isin
    parity — same masking the range checks already have)."""
    from schema_validata_spark.operators.violations import (CheckSpec,
                                                            value_errors_df)
    df = spark.createDataFrame(
        [(1, 1.0), (2, float("nan")), (3, 9.0)], "id long, v double")
    out = value_errors_df(
        df, [CheckSpec("v", "allowed_value_list", [1.0, 2.0])], ["id"])
    assert sorted(r["id"] for r in out.collect()) == [3]


def test_quarantine_split(spark):
    from schema_validata_spark import FieldRule, Rules, quarantine
    df = spark.createDataFrame(
        [(1, "click", 10.0), (2, "bogus", 10.0), (3, "click", 500.0),
         (4, "bogus", 500.0), (5, None, 10.0)],
        "id bigint, et string, v double")
    rules = Rules("Q", fields=[
        FieldRule("et", allow_null=False,
                  allowed_value_list=["click", "view"]),
        FieldRule("v", range_max=400.0),
    ])
    clean, bad = quarantine(df, rules, ignore_errors=[])
    assert sorted(r["id"] for r in clean.collect()) == [1]
    got = {r["id"]: list(r["violation_reasons"]) for r in bad.collect()}
    assert got[2] == ["Unallowed Value"]
    assert got[3] == ["Exceeds Maximum Allowed Value (400)"]
    assert got[4] == ["Unallowed Value",
                      "Exceeds Maximum Allowed Value (400)"]
    assert got[5] == ["Null Value"]
    # clean + bad partition the input exactly
    assert clean.count() + bad.count() == df.count()


def test_quarantine_conditional_and_empty_rules(spark):
    from schema_validata_spark import (ConditionalRule, FieldRule, Rules,
                                       quarantine)
    df = spark.createDataFrame(
        [(1, "tool", None), (2, "tool", "search"), (3, "user", None)],
        "id bigint, role string, tool string")
    rules = Rules("C", fields=[])
    rules.conditional = [ConditionalRule(
        "tool_set", "role = 'tool'", "tool IS NOT NULL")]
    clean, bad = quarantine(df, rules)
    assert sorted(r["id"] for r in bad.collect()) == [1]
    assert bad.collect()[0]["violation_reasons"] == \
        ["Conditional Rule Failed: tool_set"]
    # rules with no applicable checks: everything clean, bad is empty
    clean2, bad2 = quarantine(df, Rules("E", fields=[]))
    assert clean2.count() == 3 and bad2.count() == 0
    assert "violation_reasons" in bad2.columns
