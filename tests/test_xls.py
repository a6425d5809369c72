"""Legacy ``.xls`` (OLE2/BIFF8) reader tests — VERDICT r2 missing #1.

The production reader (schema_validata_spark/sources/xls.py) is
exercised against an independent minimal BIFF8 encoder
(tests/biff_writer.py) so reader and fixtures don't share code paths:
the writer deliberately emits SST CONTINUE splits inside character
data, compressed and UTF-16 strings, RK int/x100, MULRK runs, inline
LABEL, BOOLERR, cached FORMULA results, and both the mini-stream and
regular-FAT OLE2 layouts.
"""

from __future__ import annotations

import os
import struct
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from biff_writer import build_ole2, build_workbook_stream, write_xls  # noqa: E402

from schema_validata_spark.sources.xls import (XlsFormatError, read_xls,  # noqa: E402
                                               read_xls_records)
from schema_validata_spark.sources.xlsx import read_xlsx  # noqa: E402


SHEETS = {
    "Data Dict": [
        ["field_name", "data_type", "allow_null", "max_len", "ratio", "ok"],
        ["conv_id", "String", False, 64, 0.25, True],
        ["turn_idx", ("label", "Int"), True, 10, 1.5, False],
        ["héllo_ünïcode", "数据字段", None, -5, 12345.678, True],
    ],
    "Notes": [
        ["note"],
        [("formula_str", "computed")],
        [("formula_num", 42.5)],
        [1, 2, 3, 4, 5],
    ],
}

EXPECT_DD = [
    ["field_name", "data_type", "allow_null", "max_len", "ratio", "ok"],
    ["conv_id", "String", False, 64, 0.25, True],
    ["turn_idx", "Int", True, 10, 1.5, False],
    ["héllo_ünïcode", "数据字段", None, -5, 12345.678, True],
]


def test_mini_stream_roundtrip_all_cell_types(tmp_path):
    """Small workbook lives in the OLE2 mini stream (the layout real
    Excel uses under 4096 bytes) — every cell record type round-trips."""
    p = str(tmp_path / "mini.xls")
    write_xls(p, SHEETS)
    assert os.path.getsize(p) < 8192
    got = read_xls(p)
    assert list(got.keys()) == ["Data Dict", "Notes"]
    assert got["Data Dict"] == EXPECT_DD
    notes = got["Notes"]
    assert notes[0][0] == "note"
    assert notes[1][0] == "computed"       # FORMULA + STRING cached result
    assert notes[2][0] == 42.5             # FORMULA numeric cached result
    assert notes[3] == [1, 2, 3, 4, 5]     # MULRK run
    # rows padded to sheet width
    assert all(len(r) == 5 for r in notes)


def test_regular_fat_layout_and_sst_continue_split(tmp_path):
    """>4096-byte workbook (regular FAT chain) with the SST forced to
    split mid-string across CONTINUE records — both compressed and
    UTF-16 strings must survive the re-emitted flag byte, and a split
    may land inside a 2-byte UTF-16 code unit."""
    rows = [["c0", "c1", "c2", "c3"]]
    for i in range(300):
        rows.append([f"latin_string_{i % 37:04d}", f"züü_{i}", i, -i])
    p = str(tmp_path / "big.xls")
    write_xls(p, {"S1": rows}, sst_split_at=41, force_big=True)
    assert os.path.getsize(p) > 4096 + 512
    got = read_xls(p)["S1"]
    assert len(got) == 301
    assert got[0] == ["c0", "c1", "c2", "c3"]
    assert got[1] == ["latin_string_0000", "züü_0", 0, 0]
    assert got[151] == ["latin_string_%04d" % (150 % 37), "züü_150", 150, -150]
    assert got[300] == ["latin_string_%04d" % (299 % 37), "züü_299", 299, -299]


def test_read_xlsx_magic_dispatch(tmp_path):
    """read_xlsx() detects OLE2 magic regardless of extension and
    routes to the BIFF reader — one chokepoint for every consumer."""
    p = str(tmp_path / "misnamed.xlsx")
    write_xls(p, SHEETS)
    assert read_xlsx(p)["Data Dict"] == EXPECT_DD


def test_read_xls_records_header_contract(tmp_path):
    p = str(tmp_path / "rec.xls")
    write_xls(p, {"T": [["  a  ", "b", None],
                        [1, "x", "keep"],
                        [2, None, None]]})
    recs = read_xls_records(p)["T"]
    # header names trimmed; empty-header column dropped — same contract
    # as read_xlsx_records
    assert recs == [{"a": 1, "b": "x"}, {"a": 2, "b": None}]


def test_data_dict_loads_from_legacy_xls(tmp_path):
    """The reference's data_dict_to_json accepts .xls workbooks
    (src/schema_validata.py:862-953); the Rules loader must too."""
    from schema_validata_spark.rules import data_dict_xlsx_to_json

    header = ["field_name", "required", "data_type", "allow_null",
              "length", "range_min", "range_max", "regex_pattern",
              "unique_value", "allowed_value_list"]
    rows = [
        header,
        ["conv_id", True, "String", False, 64, None, None,
         "^c_[0-9]+$", True, None],
        ["turn_idx", True, "Integer", False, None, 0.0, 10000.0,
         None, False, None],
        ["role", False, "String", True, 16, None, None, None, False,
         "['user', 'assistant', 'tool']"],
        [None, None, "skipped — no field_name", None, None, None, None,
         None, None, None],
    ]
    p = str(tmp_path / "dict.xls")
    write_xls(p, {"transcripts": rows, "NotASchema": [["x"], [1]]})
    dd = data_dict_xlsx_to_json(p)
    assert list(dd.keys()) == ["transcripts"]
    t = dd["transcripts"]
    assert set(t.keys()) == {"conv_id", "turn_idx", "role"}
    assert t["conv_id"]["regex_pattern"] == "^c_[0-9]+$"
    assert t["turn_idx"]["range_max"] == 10000.0
    assert t["role"]["allowed_value_list"] == ["user", "assistant", "tool"]


def test_spreadsheet_ingest_xls_to_dataframe(spark, tmp_path):
    """read_spreadsheet() ingests .xls into a typed DataFrame exactly
    like the .xlsx path (reference ext dispatch :899)."""
    from schema_validata_spark.sources.readers import read_spreadsheet

    p = str(tmp_path / "data.xls")
    write_xls(p, {"Sheet1": [["id", "score", "name"],
                             [1, 0.5, "alpha"],
                             [2, 1.25, "beta"],
                             [3, None, "gamma"]]})
    df = read_spreadsheet(spark, p, sheet_name="Sheet1")
    rows = sorted((r["id"], r["score"], r["name"]) for r in df.collect())
    assert rows == [(1, 0.5, "alpha"), (2, 1.25, "beta"),
                    (3, None, "gamma")]


def test_biff5_and_encrypted_fail_clearly(tmp_path):
    # BIFF5 BOF version word 0x0500
    stream = struct.pack("<HH", 0x0809, 16) + struct.pack(
        "<HHHHII", 0x0500, 0x0005, 0, 0, 0, 0)
    stream += struct.pack("<HH", 0x000A, 0)
    p = str(tmp_path / "old.xls")
    with open(p, "wb") as f:
        f.write(build_ole2("Workbook", stream))
    with pytest.raises(XlsFormatError, match="BIFF8"):
        read_xls(p)

    # FILEPASS (encryption) right after a BIFF8 BOF
    stream2 = struct.pack("<HH", 0x0809, 16) + struct.pack(
        "<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0)
    stream2 += struct.pack("<HH", 0x002F, 4) + b"\x01\x00\x01\x00"
    stream2 += struct.pack("<HH", 0x000A, 0)
    p2 = str(tmp_path / "enc.xls")
    with open(p2, "wb") as f:
        f.write(build_ole2("Workbook", stream2))
    with pytest.raises(XlsFormatError, match="encrypted"):
        read_xls(p2)


def test_missing_workbook_stream_fails_clearly(tmp_path):
    p = str(tmp_path / "weird.xls")
    with open(p, "wb") as f:
        f.write(build_ole2("NotAWorkbook", b"\x00" * 64))
    with pytest.raises(XlsFormatError, match="no Workbook/Book stream"):
        read_xls(p)


def test_book_stream_name_accepted(tmp_path):
    """Excel 5/95-era files name the stream ``Book``; BIFF8 content
    under that name must still read."""
    stream = build_workbook_stream({"S": [["a"], [7]]})
    p = str(tmp_path / "book.xls")
    with open(p, "wb") as f:
        f.write(build_ole2("Book", stream))
    assert read_xls(p)["S"] == [["a"], [7]]
