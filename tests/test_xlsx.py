"""XLSX ingest + report parity (VERDICT r1 #5 / missing #2, #4): the
stdlib OOXML reader/writer, Rules.from_xlsx against the reference's REAL
template file, and the schema_validation_to_xlsx report shape."""

from __future__ import annotations

import os
import zipfile

import pytest

from schema_validata_spark import report as report_mod
from schema_validata_spark.report import (schema_validation_to_xlsx,
                                          write_dataframes_to_xlsx)
from schema_validata_spark.rules import Rules, data_dict_xlsx_to_json
from schema_validata_spark.sources.xlsx import (read_xlsx, read_xlsx_records,
                                                write_xlsx)

TEMPLATE = "/root/reference/data_dictionary_template.xlsx"


def test_read_reference_template():
    """The reader handles a real-world workbook (shared strings, typed
    cells, multiple sheets)."""
    recs = read_xlsx_records(TEMPLATE)
    assert set(recs) == {"MOVIES_SCHEMA", "THEATERS_SCHEMA", "Lists",
                         "Column Descriptions"}
    movies = {r["field_name"]: r for r in recs["MOVIES_SCHEMA"]}
    # raw cell: quoted, newline-wrapped literal — revival happens later
    raw = movies["genre"]["allowed_value_list"]
    assert raw.startswith('"[') and "'Drama'" in raw
    assert movies["id"]["length"] == 7 and movies["id"]["range_max"] == 9999999


def test_data_dict_xlsx_to_json_reference_semantics():
    """Sheet filter (:827), field_name drop/index (:831-839), literal
    revival (:842): non-rule sheets (Lists / Column Descriptions) are
    excluded, list cells become Python lists."""
    dd = data_dict_xlsx_to_json(TEMPLATE)
    assert set(dd) == {"MOVIES_SCHEMA", "THEATERS_SCHEMA"}
    g = dd["MOVIES_SCHEMA"]["genre"]
    assert g["allowed_value_list"] == ["Drama", "Action", "Comedy", "Sci-Fi"]
    assert g["field_name"] == "genre"
    st = dd["THEATERS_SCHEMA"]["state"]
    assert st["allowed_value_list"] == ["US", "CA", "UK", "AU", "NZ"]


def test_rules_from_xlsx_matches_json_path(spark):
    """Round-trip done-criterion: template-xlsx → Rules → verdicts equal
    the dict-loaded path's verdicts."""
    import pandas as pd

    from schema_validata_spark.operators.profile import profile
    from schema_validata_spark.operators.verdicts import verdicts_for

    rx = Rules.from_xlsx(TEMPLATE, sheet="MOVIES_SCHEMA")
    assert rx["genre"].allowed_value_list == ["Drama", "Action", "Comedy",
                                              "Sci-Fi"]
    assert rx["id"].unique_value is True and rx["id"].allow_null is False
    # same rules via the nested-dict path
    rj = Rules.from_nested_dict("MOVIES_SCHEMA",
                                data_dict_xlsx_to_json(TEMPLATE)
                                ["MOVIES_SCHEMA"])
    pdf = pd.DataFrame({
        "id": [1, 1, 3], "title": ["Heat", "Alien", "Up"],
        "genre": ["Drama", "Horror", "Comedy"],
    })
    obs = profile(spark.createDataFrame(pdf))
    vx = verdicts_for(rx, obs, "movies")
    vj = verdicts_for(rj, obs, "movies")
    assert vx == vj
    assert "unique_value" in vx["id"]
    assert "allowed_value_list" in vx["genre"]


def test_write_read_roundtrip(tmp_path):
    sheets = {
        "S1": [["a", "b", "c"],
               [1, "x", True],
               [2.5, "hello <&> \"world\"", False],
               [None, "multi\nline", 7]],
        "S2": [["only"], ["row"]],
    }
    p = str(tmp_path / "t.xlsx")
    write_xlsx(p, sheets)
    back = read_xlsx(p)
    assert list(back) == ["S1", "S2"]
    assert back["S1"][0] == ["a", "b", "c"]
    assert back["S1"][1] == [1, "x", True]
    assert back["S1"][2] == [2.5, 'hello <&> "world"', False]
    assert back["S1"][3] == [None, "multi\nline", 7]
    # a well-formed OOXML package (zip with the required parts)
    with zipfile.ZipFile(p) as z:
        assert "[Content_Types].xml" in z.namelist()
        assert "xl/workbook.xml" in z.namelist()


def test_sheet_chunking(tmp_path, monkeypatch):
    """Reference :1574-1620: sheets beyond the Excel row limit split into
    numbered chunks."""
    monkeypatch.setattr(report_mod, "MAX_ROWS_EXCEL", 10)
    recs = [{"i": i, "v": f"r{i}"} for i in range(25)]
    p = write_dataframes_to_xlsx({"big": recs, "small": recs[:3]},
                                 str(tmp_path), "chunked")
    back = read_xlsx_records(p)
    assert set(back) == {"1_big", "2_big", "3_big", "small"}
    assert len(back["1_big"]) == 10 and len(back["3_big"]) == 5
    assert [r["i"] for r in back["2_big"]][0] == 10
    assert len(back["small"]) == 3


def test_schema_validation_to_xlsx_shape(spark, tmp_path):
    """End-to-end: validate → report dict → xlsx with Metadata, Errors
    Overview, and a per-dataset value-errors sheet."""
    from schema_validata_spark.datagen import (gen_transcripts,
                                               transcript_rules)
    from schema_validata_spark.validate import validate

    t = gen_transcripts(spark, 3000, seed=5)
    res = validate(spark, t.drop("ts_date"), transcript_rules(),
                   dataset_name="transcripts",
                   key_cols=["conv_id", "turn_idx"], ignore_errors=[])
    rpt = res.report(max_value_errors=50)
    path = schema_validation_to_xlsx(rpt, str(tmp_path), "validation")
    assert os.path.basename(path) == f"validation_({res.uid}).xlsx"
    back = read_xlsx_records(path)
    assert "Metadata" in back and "Errors Overview" in back
    assert "transcripts" in back
    ov = back["Errors Overview"]
    assert {"Dataset", "Column", "Status", "Required", "Error Type",
            "Error"} <= set(ov[0].keys())
    assert all(r["Status"] == "Fail" for r in ov)
    ve = back["transcripts"]
    assert {"error_type", "column_name"} <= set(ve[0].keys())
    assert 0 < len(ve) <= 50


def test_read_xlsx_validated_and_dispatch(spark, tmp_path):
    """XLSX dataset ingest: all-string sheet rows through the same
    cleanup + inference pipeline as CSV (typed columns out)."""
    from schema_validata_spark.sources.readers import read_spreadsheet
    p = str(tmp_path / "ds.xlsx")
    write_xlsx(p, {"DATA": [
        [" id ", "amount", "note"],
        ["1", "10.5", "ok"],
        ["2", "N/A", "line\nbreak"],
        ["3", "7", None],
    ]})
    df = read_spreadsheet(spark, p, sheet_name="DATA")
    assert df.columns == ["id", "amount", "note"]     # header trimmed
    d = dict(df.dtypes)
    assert d["id"] == "bigint" and d["amount"] == "double"
    rows = {r["id"]: r for r in df.collect()}
    assert rows[2]["amount"] is None                   # NA canonicalized
    assert rows[2]["note"] == "linebreak"              # newline stripped


def test_dataset_schema_to_xlsx_roundtrip(spark, tmp_path):
    """Profile → starter dictionary xlsx → Rules round-trip (reference
    :1632-1685 bootstrap flow)."""
    from schema_validata_spark.operators.profile import profile
    from schema_validata_spark.report import dataset_schema_to_xlsx
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], "k: bigint, cat: string")
    obs = profile(df)
    p = dataset_schema_to_xlsx(obs, str(tmp_path), "starter",
                               sheet_name="T_SCHEMA")
    rules = Rules.from_xlsx(p, sheet="T_SCHEMA")
    assert rules["k"].data_type == "Integer"
    assert rules["k"].unique_value is True
    assert rules["cat"].allowed_value_list == ["a", "b"]


def test_sheet_name_with_quotes_roundtrips(spark, tmp_path):
    """A '"' in a dataset/sheet name must not corrupt workbook.xml
    (attribute context needs quote escaping)."""
    from schema_validata_spark.sources.xlsx import read_xlsx, write_xlsx
    p = str(tmp_path / "q.xlsx")
    write_xlsx(p, {'q3 "final" load': [["a", "b"], [1, 2]]})
    got = read_xlsx(p)
    assert list(got) == ['q3 "final" load']
    assert got['q3 "final" load'][1] == [1, 2]
