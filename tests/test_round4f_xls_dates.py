"""Round-4: BIFF8 date detection (VERDICT r3 #7) — XF/FORMAT records
tag date-formatted cells and serials convert to datetimes, matching
the reference's pandas/xlrd behavior (src/schema_validata.py:862-953).
Fixtures come from the independent writer (tests/biff_writer.py)."""

from __future__ import annotations

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from biff_writer import write_xls  # noqa: E402

from schema_validata_spark.sources.xls import (  # noqa: E402
    _is_date_format_string, _xl_serial_to_dt, read_xls)


def test_builtin_and_custom_date_xfs(tmp_path):
    """NUMBER cells under the built-in m/d/yy XF and a custom
    yyyy-mm-dd hh:mm:ss format decode to datetimes; a plain number in
    the same row stays numeric."""
    p = str(tmp_path / "d.xls")
    # 45292 = 2024-01-01; +0.5 = noon
    write_xls(p, {"S": [["when", "stamp", "plain"],
                        [("date", 45292.0), ("datetime", 45292.5), 7.25]]})
    rows = read_xls(p)["S"]
    assert rows[1][0] == dt.datetime(2024, 1, 1)
    assert rows[1][1] == dt.datetime(2024, 1, 1, 12, 0, 0)
    assert rows[1][2] == 7.25


def test_time_only_and_rk_date(tmp_path):
    p = str(tmp_path / "t.xls")
    write_xls(p, {"S": [[("time", 0.75), ("date_rk", 44927)]]})
    rows = read_xls(p)["S"]
    assert rows[0][0] == dt.time(18, 0)            # 0.75 day = 18:00
    assert rows[0][1] == dt.datetime(2023, 1, 1)   # RK path date-tags too


def test_date1904_mode(tmp_path):
    p = str(tmp_path / "m.xls")
    write_xls(p, {"S": [[("date", 366.0)]]}, date1904=True)
    assert read_xls(p)["S"][0][0] == dt.datetime(1905, 1, 1)


def test_serial_conversion_leap_bug_and_rounding():
    assert _xl_serial_to_dt(59) == dt.datetime(1900, 2, 28)
    assert _xl_serial_to_dt(60) == dt.datetime(1900, 2, 28)  # phantom
    assert _xl_serial_to_dt(61) == dt.datetime(1900, 3, 1)
    assert _xl_serial_to_dt(1) == dt.datetime(1900, 1, 1)
    # float fuzz rounds to nearest second
    got = _xl_serial_to_dt(45292 + 3661.4999 / 86400)
    assert got == dt.datetime(2024, 1, 1, 1, 1, 1)
    assert _xl_serial_to_dt(-5.0) == -5.0          # nonsense stays numeric


def test_format_string_heuristic():
    assert _is_date_format_string("yyyy-mm-dd")
    assert _is_date_format_string("[h]:mm:ss")     # elapsed time
    assert _is_date_format_string('dd"d" hh"h"')
    assert not _is_date_format_string("#,##0.00")
    assert not _is_date_format_string('0.0"mph"')  # quoted m/h not tokens
    assert not _is_date_format_string("General")
    assert not _is_date_format_string(r"0.0\h")    # escaped h not a token


def test_profile_roundtrip_to_datetime(spark, tmp_path):
    """The reference-parity contract: a template-style workbook with a
    date column ingests to a Datetime-typed column through the normal
    spreadsheet path."""
    from schema_validata_spark.functions.typing import \
        spark_type_to_logical
    from schema_validata_spark.sources.readers import read_spreadsheet

    p = str(tmp_path / "tpl.xls")
    write_xls(p, {"Sheet1": [
        ["conv_id", "started"],
        ["c1", ("datetime", 45292.25)],
        ["c2", ("datetime", 45293.5)],
    ]})
    df = read_spreadsheet(spark, p, sheet_name="Sheet1")
    row = df.orderBy("conv_id").first()
    assert row["started"] == dt.datetime(2024, 1, 1, 6, 0, 0)
    logical = spark_type_to_logical(df.schema["started"].dataType)
    assert logical == "Datetime"


def test_out_of_range_serial_degrades_per_cell(tmp_path):
    """A yyyymmdd integer in a date-formatted cell must come back as
    the raw NUMBER (per-cell degrade like xlrd/pandas), not kill the
    whole workbook read with OverflowError."""
    p = str(tmp_path / "o.xls")
    write_xls(p, {"S": [[("date", 20250815.0), ("date", 45292.0)]]})
    rows = read_xls(p)["S"]
    assert rows[0][0] == 20250815.0
    assert rows[0][1] == dt.datetime(2024, 1, 1)


def test_color_codes_are_not_time_tokens():
    assert not _is_date_format_string("[Magenta]0.00")
    assert not _is_date_format_string("[Red]#,##0;[Blue](#,##0)")
    assert _is_date_format_string("[h]:mm")
    assert _is_date_format_string("[mm]:ss")
