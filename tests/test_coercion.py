"""coerce_frame / coercion_failures: the casting-lattice-as-transform
layer."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F, types as T

from schema_validata_spark.functions.typing import (coerce_frame,
                                                    coercion_failures)
from schema_validata_spark.rules import Rules

RULES = Rules.from_nested_dict("co", {
    "i": {"data_type": "Integer"},
    "f": {"data_type": "Float"},
    "b": {"data_type": "Boolean"},
    "d": {"data_type": "Datetime"},
    "s": {"data_type": "String"},
})


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "i string, f string, b string, d string, s string")


def test_coerce_happy_path_types_and_values(spark):
    rows = [("42", "2.5", "Yes", "2024-01-02", "keep"),
            ("-7", "1e3", "false", "01/02/2024", "x")]
    out = coerce_frame(_df(spark, rows), RULES)
    sch = dict((f.name, f.dataType) for f in out.schema.fields)
    assert isinstance(sch["i"], T.LongType)
    assert isinstance(sch["f"], T.DoubleType)
    assert isinstance(sch["b"], T.BooleanType)
    assert isinstance(sch["d"], T.TimestampType) \
        or sch["d"].typeName().startswith("timestamp")
    assert isinstance(sch["s"], T.StringType)
    a, b = out.orderBy(F.desc("i")).collect()
    assert (a["i"], a["f"], a["b"]) == (42, 2.5, True)
    assert a["d"].date() == datetime.date(2024, 1, 2)
    assert (b["i"], b["f"], b["b"]) == (-7, 1000.0, False)
    assert b["d"].date() == datetime.date(2024, 1, 2)  # US format too
    assert a["s"] == "keep"


def test_coerce_failures_become_null(spark):
    rows = [("x42", "4.2.1", "maybe", "not a date", "ok")]
    r = coerce_frame(_df(spark, rows), RULES).collect()[0]
    assert (r["i"], r["f"], r["b"], r["d"]) == (None,) * 4
    assert r["s"] == "ok"


def test_coerce_untyped_and_nonstring_pass_through(spark):
    df = spark.createDataFrame([(1, "5")], "already long, i string")
    out = coerce_frame(df, RULES)
    assert dict((f.name, f.dataType.typeName())
                for f in out.schema.fields)["already"] == "long"
    assert out.collect()[0]["i"] == 5


def test_coercion_failures_counts(spark):
    rows = [("1", "1.0", "true", "2024-01-01", "a"),
            ("2", "bad", "true", "2024-01-01", "a"),
            ("x", "3.0", "nah", "junk", "a"),
            (None, None, None, None, None)]
    got = {r["column_name"]: r for r in coercion_failures(
        _df(spark, rows), RULES).collect()}
    assert set(got) == {"i", "f", "b", "d"}     # "s" not coercible
    assert (got["i"]["n_values"], got["i"]["n_failed"]) == (3, 1)
    assert (got["f"]["n_failed"], got["b"]["n_failed"]) == (1, 1)
    assert got["d"]["n_failed"] == 1
    assert got["i"]["fail_rate"] == round(1 / 3, 6)


def test_coercion_failures_requires_targets(spark):
    df = spark.createDataFrame([(1,)], "z long")
    with pytest.raises(ValueError):
        coercion_failures(df, RULES)


def test_coerce_is_map_only(spark):
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        coerce_frame(_df(spark, [("1", "1", "t", "2024-01-01", "s")]),
                     RULES).explain("formatted")
    assert "Exchange" not in buf.getvalue()
