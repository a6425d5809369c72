"""Profiling parity: the wide-agg profile reproduces the reference's
build_data_dictionary semantics (src/schema_validata.py:1344-1473),
including its quirks, on hand-built micro-frames."""

import pytest
from pyspark.sql import types as T

from schema_validata_spark.operators.profile import profile


def make_df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_all_null_column(spark):
    df = make_df(spark, [(None,), (None,), (None,)], "a: string")
    p = profile(df)["a"]
    assert p["data_type"] == "Null-Unknown"
    assert p["null_count"] == 3
    assert p["duplicate_count"] == 0
    assert p["required"] == "False"
    assert p["allow_null"] == "True"
    assert p["length"] is None and p["range_min"] is None


def test_duplicate_count_keep_false_semantics(spark):
    # group of 3 counts 3, group of 2 counts 2, single counts 0 → 5
    df = make_df(spark, [("x",), ("x",), ("x",), ("y",), ("y",), ("z",)],
                 "a: string")
    p = profile(df)["a"]
    assert p["duplicate_count"] == 5
    assert p["unique_value"] == "False"


def test_unique_column(spark):
    df = make_df(spark, [("a",), ("b",), ("c",)], "v: string")
    p = profile(df)["v"]
    assert p["duplicate_count"] == 0
    assert p["unique_value"] == "True"


def test_na_pattern_nulls_counted(spark):
    # 'N/A', ' - ', '', whitespace are null-like (reference NA vocabulary)
    df = make_df(spark, [("ok",), ("N/A",), (" - ",), ("",), ("   ",)],
                 "a: string")
    p = profile(df)["a"]
    assert p["null_count"] == 4
    assert p["allow_null"] == "True"


def test_string_numeric_inference(spark):
    df = make_df(spark, [("1",), ("2",), ("30",)], "a: string")
    p = profile(df)["a"]
    assert p["data_type"] == "Integer"
    assert p["range_min"] == 1 and p["range_max"] == 30
    assert isinstance(p["range_min"], int)  # int-downcast quirk
    assert p["length"] == 2
    assert p["allowed_value_list"] == [1, 2, 30]  # numeric sort


def test_leading_zero_forces_string(spark):
    df = make_df(spark, [("01",), ("02",), ("10",)], "a: string")
    p = profile(df)["a"]
    assert p["data_type"] == "String"
    assert p["allowed_value_list"] == ["01", "02", "10"]


def test_float_column(spark):
    df = make_df(spark, [(1.5,), (2.25,), (None,)], "a: double")
    p = profile(df)["a"]
    assert p["data_type"] == "Float"
    assert p["null_count"] == 1
    assert p["range_min"] == 1.5 and p["range_max"] == 2.25


def test_whole_number_floats_measure_int_lengths(spark):
    # reference casts all-whole numeric series to int before length
    df = make_df(spark, [(10.0,), (500.0,)], "a: double")
    p = profile(df)["a"]
    assert p["length"] == 3
    assert p["range_min"] == 10 and p["range_max"] == 500
    assert p["allowed_value_list"] == [10, 500]


def test_datetime_string_inference(spark):
    df = make_df(spark, [("2023-01-01",), ("2023-06-15",)], "a: string")
    p = profile(df)["a"]
    assert p["data_type"] == "Datetime"


def test_boolean_string_inference(spark):
    df = make_df(spark, [("true",), ("False",), ("TRUE",)], "a: string")
    p = profile(df)["a"]
    assert p["data_type"] == "Boolean"


def test_allowed_list_capped_at_100(spark):
    rows = [(f"v{i:03d}",) for i in range(150)]
    df = make_df(spark, rows, "a: string")
    p = profile(df)["a"]
    assert p["allowed_value_list"] is None


def test_typed_timestamp_column(spark):
    import datetime
    schema = T.StructType([T.StructField("ts", T.TimestampType())])
    df = make_df(spark, [(datetime.datetime(2023, 1, 1),),
                         (datetime.datetime(2024, 1, 1),)], schema)
    p = profile(df)["ts"]
    assert p["data_type"] == "Datetime"


@pytest.mark.parametrize("col,expected", [
    ("mixed", "String"),
])
def test_mixed_column_is_string(spark, col, expected):
    df = make_df(spark, [("1",), ("x",), ("2.5",)], f"{col}: string")
    assert profile(df)[col]["data_type"] == expected


def test_hll_screened_profile(spark):
    """exact_unique_cols gates the exact value aggregate (VERDICT r1 #3):
    ruled columns stay exact, low-cardinality columns pass the HLL screen
    and stay exact (allowed-list capture intact), high-cardinality
    unruled columns report unmeasured dup stats + HLL distinct."""
    from pyspark.sql import functions as F
    df = spark.range(2_000).select(
        F.col("id").alias("uid"),
        F.concat(F.lit("txt-"), F.col("id")).alias("text"),
        (F.col("id") % 4).cast("string").alias("cat"))
    # duplicate one uid value
    df = df.union(df.limit(1))

    p_exact = {}
    prof = profile(df, exact_unique_cols=["uid"], out_distincts=p_exact)
    assert prof["uid"]["duplicate_count"] == 2          # exact (ruled)
    assert prof["uid"]["unique_value"] == "False"
    assert prof["cat"]["allowed_value_list"] == [0, 1, 2, 3]  # screened
    assert prof["text"]["duplicate_count"] is None       # unmeasured
    assert prof["text"]["unique_value"] is None
    est = p_exact["text"]
    assert 0.8 * 2001 <= est <= 1.2 * 2001               # HLL estimate

    # default mode unchanged: exact everywhere
    full = profile(df)
    assert full["text"]["duplicate_count"] == 2
    assert full["text"]["unique_value"] == "False"


def test_screened_profile_verdicts_match_exact(spark):
    """Verdicts from a screened profile equal verdicts from a full exact
    profile when unique rules cover the exact set."""
    from schema_validata_spark.operators.verdicts import verdicts_for
    from schema_validata_spark.rules import FieldRule, Rules
    from pyspark.sql import functions as F
    df = spark.range(500).select(
        F.col("id").alias("uid"),
        F.concat(F.lit("t"), F.col("id") % 400).alias("text"))
    rules = Rules(name="S", fields=[
        FieldRule("uid", required=True, data_type="Integer",
                  unique_value=True, allow_null=False),
        FieldRule("text", required=True, data_type="String",
                  unique_value=False, length=2),
    ])
    v_exact = verdicts_for(rules, profile(df), "d")
    v_scr = verdicts_for(rules, profile(df, exact_unique_cols=["uid"]), "d")
    assert v_exact == v_scr
    assert "length" in v_scr["text"]


def test_wide_and_melt_paths_identical(spark, sf_dir):
    """The narrow-table wide-aggregate fast path must be output-
    identical to the melt across types, NA sentinels, and screen
    modes — downstream cannot tell which ran."""
    import json
    import sys as _sys
    P = _sys.modules["schema_validata_spark.operators.profile"]
    rows = [("1", "2.5", "true", "n/a", "2023-01-01", None, 7, 2.0, True),
            ("02", "x", "false", "", "14-Nov-2023", "txt", None, None, False),
            (None, "3", None, "-", None, "y", 9, 3.5, None)]
    mixed = spark.createDataFrame(
        rows, "s_int string, s_num string, s_bool string, s_na string, "
              "s_date string, s_txt string, i bigint, d double, b boolean")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    saved = P.WIDE_PROFILE_MAX_COLS
    try:
        for df in (mixed, docs):
            for kw in ({}, {"exact_unique_cols": []},
                       {"exact_unique_cols": [df.columns[0]]}):
                P.WIDE_PROFILE_MAX_COLS = 999
                wide = P.profile(df, **kw)
                P.WIDE_PROFILE_MAX_COLS = -1
                melt = P.profile(df, **kw)
                assert json.dumps(wide, sort_keys=True, default=str) == \
                    json.dumps(melt, sort_keys=True, default=str)
    finally:
        P.WIDE_PROFILE_MAX_COLS = saved


def test_profile_inf_string_column(spark):
    """'inf' strings parse as numeric (pandas to_numeric parity) and
    must not crash the int-downcast of range stats."""
    from schema_validata_spark.operators.profile import profile
    df = spark.createDataFrame([("1",), ("2",), ("inf",)], "v string")
    out = profile(df)
    assert out["v"]["range_max"] == float("inf")


def test_profile_diff(spark):
    from schema_validata_spark import profile, profile_diff
    old_df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id bigint, s string, v double")
    new_df = spark.createDataFrame(
        [(1, "a", None), (2, "a", None), (3, "verylongstring", None)],
        "id bigint, s string, v double")
    d = profile_diff(profile(old_df), profile(new_df))
    assert d["added"] == [] and d["removed"] == []
    assert "s" in d["changed"]           # length + uniqueness changed
    assert d["changed"]["v"]["data_type"]["new"] == "Null-Unknown"
    # identical profiles -> empty diff
    p = profile(old_df)
    d2 = profile_diff(p, p)
    assert d2 == {"added": [], "removed": [], "changed": {}}
    # column add/remove detection
    d3 = profile_diff(profile(old_df.drop("v")), profile(new_df))
    assert d3["added"] == ["v"]
