"""Round-5 (VERDICT r4 #2): WHOLE-REPORT golden parity vs the
reference's ``validate_dataset`` end-to-end.

Runs the ACTUAL reference (in-process from /root/reference/src) on a
MOVIES-shaped CSV + the REAL ``data_dictionary_template.xlsx``, and the
engine's :func:`schema_validata_spark.validate.validate_files` drop-in
on the same files, then diffs the COMPLETE nested result dict:

* uid (``{csv_md5}_{xlsx_md5}``) — byte-identical;
* dataset_metadata / data_dict_metadata — byte-identical (same keys,
  same thousands-separated formatting, same hashes/stamps);
* results.<sheet>.schema_violations — byte-identical nested dict,
  messages included;
* results.<sheet>.value_errors — identical record MULTISETS after
  de-columnarizing (divergence: row order — the reference appends in
  per-check order, we emit deterministic (Sheet Row, Column) order).

Explicit divergence whitelist (each asserted, not ignored):
* run_metadata.start_time — wall clock on both sides; asserted present
  and ISO-parseable, values not compared.

The sandbox has no openpyxl/xlrd, so the reference's two pandas Excel
entry points (``pd.ExcelFile``, ``pd.read_excel``) are shimmed over
this repo's stdlib OOXML reader — the reference still performs all its
own NA handling, dtype inference, datetime inference, profiling, and
verdict logic; only the zip/XML decode is substituted (same spirit as
the chardet stub the component parity tests use).
"""

from __future__ import annotations

import copy
import csv
import sys
import types
from datetime import datetime

import numpy as np
import pandas as pd
import pytest

# --- reference import with chardet stub -----------------------------------
_fake = types.ModuleType("chardet")
_fake.detect = lambda b: {"encoding": "utf-8", "confidence": 1.0}
sys.modules.setdefault("chardet", _fake)
sys.path.insert(0, "/root/reference/src")

from schema_validata_spark.sources.xlsx import read_xlsx  # noqa: E402

TEMPLATE = "/root/reference/data_dictionary_template.xlsx"

ROWS = [
    (1, "Heat", 1995, "Mann", "Action", 170, "Heist epic", "True"),
    (2, "Alien", 1979, "Scott", "Sci-Fi", 117, "", "False"),
    (3, "Up", 2009, "Docter", "Comedy", 96, "Balloons", "True"),
    (4, "Tron", 1982, "Lisberger", "Sci-Fi", 96, "Grid", "True"),
    (5, "Bad Year", 2300, "Nobody", "Drama", 100, "future", "True"),
    (6, "Long Run", 2001, "Dir", "Drama", 6000, "too long", "True"),
    (7, "Weird Genre", 2002, "Dir", "Romance", 90, "nope", "True"),
    (8, "", 2003, "Dir", "Drama", 90, "no title", "True"),
    (9, "Okay", 2004, "Dir", "Drama", 90, None, "maybe"),
    (10, "Early", 1800, "Dir", "Drama", 90, "too early", "False"),
]
HEADER = ["id", "title", "release_year", "director", "genre",
          "runtime_minutes", "synopsis", "available"]


class _ShimExcelFile:
    def __init__(self, path, *a, **k):
        self.sheet_names = list(read_xlsx(str(path)))


def _shim_read_excel(path, sheet_name=0, dtype=None, na_values=None, **k):
    sheets = read_xlsx(str(path))
    if sheet_name is None:
        names = list(sheets)
    elif isinstance(sheet_name, int):
        names = [list(sheets)[sheet_name]]
    else:
        names = [sheet_name]
    out = {}
    nv = set(na_values or [])
    for nm in names:
        rows = sheets[nm]
        header = [str(c) if c is not None else "" for c in rows[0]]
        cols = {}
        for j, cname in enumerate(header):
            vals = []
            for r in rows[1:]:
                v = r[j] if j < len(r) else None
                if v is None or (isinstance(v, str) and v in nv) or \
                        (not isinstance(v, str) and str(v) in nv):
                    vals.append(np.nan)
                    continue
                dt = dtype if not isinstance(dtype, dict) \
                    else dtype.get(cname)
                if dt in (str, "str"):
                    if isinstance(v, bool):
                        v = str(v)
                    elif isinstance(v, float) and v.is_integer():
                        v = str(int(v))
                    elif not isinstance(v, str):
                        v = str(v)
                vals.append(v)
            cols[cname] = vals
        df = pd.DataFrame(cols)
        if isinstance(dtype, dict):
            for cname, dt in dtype.items():
                if cname in df.columns and dt not in (str, "str", object):
                    try:
                        df[cname] = df[cname].astype(dt)
                    except (ValueError, TypeError):
                        pass
        out[nm] = df
    return out if sheet_name is None else out[names[0]]


@pytest.fixture(scope="module")
def movies_csv(tmp_path_factory):
    path = tmp_path_factory.mktemp("golden") / "movies.csv"
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(HEADER)
        for r in ROWS:
            w.writerow(["" if v is None else v for v in r])
    return str(path)


@pytest.fixture(scope="module")
def ref_report(movies_csv):
    import schema_validata as ref
    orig_ef, orig_re = pd.ExcelFile, pd.read_excel
    pd.ExcelFile, pd.read_excel = _ShimExcelFile, _shim_read_excel
    try:
        return copy.deepcopy(ref.validate_dataset(
            movies_csv, TEMPLATE,
            schema_mapping=[{"dataset": "movies",
                             "data_dict": "MOVIES_SCHEMA"}],
            list_errors=True, ignore_errors=["allow_null"]))
    finally:
        pd.ExcelFile, pd.read_excel = orig_ef, orig_re


@pytest.fixture(scope="module")
def our_report(spark, movies_csv):
    from schema_validata_spark.validate import validate_files
    return validate_files(
        spark, movies_csv, TEMPLATE,
        schema_mapping=[{"dataset": "movies",
                         "data_dict": "MOVIES_SCHEMA"}],
        list_errors=True, ignore_errors=["allow_null"])


def _records(columnar) -> list[tuple]:
    if not columnar:
        return []
    cols = sorted(columnar)
    idxs = list(columnar[cols[0]])
    return sorted(tuple((c, columnar[c].get(i)) for c in cols)
                  for i in idxs)


def test_whole_report_full_dict_equality(ref_report, our_report):
    assert list(ref_report) == list(our_report)      # identical uid
    uid = list(ref_report)[0]
    r, o = ref_report[uid], our_report[uid]

    # --- run_metadata: schema_mapping identical; start_time is the
    # whitelisted wall-clock divergence (asserted, not ignored)
    assert r["run_metadata"]["schema_mapping"] \
        == o["run_metadata"]["schema_mapping"]
    for side in (r, o):
        datetime.fromisoformat(side["run_metadata"]["start_time"])

    # --- file metadata: byte-identical dicts
    assert r["dataset_metadata"] == o["dataset_metadata"]
    assert r["data_dict_metadata"] == o["data_dict_metadata"]

    # --- results: same sheets
    assert list(r["results"]) == list(o["results"]) == ["movies"]
    rres, ores = r["results"]["movies"], o["results"]["movies"]

    # schema_violations: FULL nested byte equality (messages included)
    assert rres["schema_violations"] == ores["schema_violations"]

    # value_errors: identical record multisets (order is the
    # documented divergence; both sides carry the same 6 columns)
    assert _records(rres["value_errors"]) == _records(ores["value_errors"])
    assert sorted(rres["value_errors"]) == sorted(ores["value_errors"]) \
        == ["Column Name", "Error Type", "Error Value", "Lookup Column",
            "Lookup Value", "Sheet Row"]

    # nothing unexpected on either side beyond the engine's documented
    # result-section additions (none are present in file mode unless
    # composite/RI rules exist — the template has neither)
    assert set(rres) == {"schema_violations", "value_errors"}
    assert set(ores) == {"schema_violations", "value_errors"}


def test_whole_report_flags_every_seeded_violation(our_report):
    uid = list(our_report)[0]
    sv = our_report[uid]["results"]["movies"]["schema_violations"]
    assert {"title", "release_year", "genre", "runtime_minutes",
            "available"} <= set(sv)
    ve = our_report[uid]["results"]["movies"]["value_errors"]
    types = set(ve["Error Type"].values())
    assert {"Exceeds Maximum Allowed Value (2025)",
            "Below Minimum Allowed Value (1895)",
            "Unallowed Value",
            "Value Exceeds Max Length (3)",
            "Exceeds Maximum Allowed Value (5220)"} == types
    # Sheet Rows point at the seeded rows (1-based + header)
    assert set(ve["Sheet Row"].values()) == {6, 7, 8, 11}


def test_validate_files_multi_sheet_workbook(spark, tmp_path):
    """validate_files over an XLSX dataset WORKBOOK: each mapped sheet
    validates against its own dictionary section and lands its own
    results entry (reference loop over sheet keys, :2254-2257 /
    :2679)."""
    from schema_validata_spark.sources.xlsx import write_xlsx
    from schema_validata_spark.validate import validate_files

    ds = str(tmp_path / "catalog.xlsx")
    write_xlsx(ds, {
        "movies": [
            ["id", "title", "release_year", "director", "genre",
             "runtime_minutes", "synopsis", "available"],
            [1, "Heat", 1995, "Mann", "Action", 170, "x", "True"],
            [2, "Late", 2300, "Dir", "Drama", 90, "y", "True"],
        ],
        "theaters": [
            ["tid", "name", "address", "city", "state"],
            [1, "Rex", "1 Main St", "Springfield", "US"],
            [2, "Lux", "2 Side St", "Shelbyville", "XX"],
        ],
    })
    rep = validate_files(
        spark, ds, TEMPLATE,
        [{"dataset": "movies", "data_dict": "MOVIES_SCHEMA"},
         {"dataset": "theaters", "data_dict": "THEATERS_SCHEMA"}])
    uid = next(iter(rep))
    res = rep[uid]["results"]
    assert set(res) == {"movies", "theaters"}
    assert "release_year" in res["movies"]["schema_violations"]
    assert "state" in res["theaters"]["schema_violations"]
    ve = res["theaters"]["value_errors"]
    vals = set(ve["Error Value"].values())
    assert "XX" in vals                      # unallowed state listed
    assert set(ve["Lookup Column"].values()) == {"tid"}


DUP_ROWS = [
    # duplicate id=3 triggers unique_value → BOTH engines must list
    # the duplicate rows and agree on every record
    (1, "Heat", 1995, "Mann", "Action", 170, "a", "True"),
    (2, "Alien", 1979, "Scott", "Sci-Fi", 117, "b", "False"),
    (3, "Up", 2009, "Docter", "Comedy", 96, "c", "True"),
    (3, "Up Again", 2010, "Docter", "Comedy", 97, "d", "True"),
    # 'maybe' keeps available String-typed in BOTH engines — a pure
    # True/False text column is a DOCUMENTED divergence (see
    # test_boolean_text_inference_divergence)
    (5, "Tron", 1982, "Lisberger", "Sci-Fi", 96, "e", "maybe"),
]


def test_whole_report_parity_with_duplicate_uid_listing(spark,
                                                        tmp_path):
    """unique_value violations: the dup id degrades id's distinctness,
    both engines run their best-uid fallback, and the duplicate ROWS
    must be listed identically (reference value_errors_duplicates
    keep=False ↔ our agg+join-back)."""
    import os
    path = str(tmp_path / "movies.csv")
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(HEADER)
        for r in DUP_ROWS:
            w.writerow(["" if v is None else v for v in r])

    import schema_validata as ref
    orig_ef, orig_re = pd.ExcelFile, pd.read_excel
    pd.ExcelFile, pd.read_excel = _ShimExcelFile, _shim_read_excel
    try:
        theirs = copy.deepcopy(ref.validate_dataset(
            path, TEMPLATE,
            schema_mapping=[{"dataset": "movies",
                             "data_dict": "MOVIES_SCHEMA"}],
            list_errors=True, ignore_errors=["allow_null"]))
    finally:
        pd.ExcelFile, pd.read_excel = orig_ef, orig_re

    from schema_validata_spark.validate import validate_files
    ours = validate_files(
        spark, path, TEMPLATE,
        schema_mapping=[{"dataset": "movies",
                         "data_dict": "MOVIES_SCHEMA"}],
        list_errors=True, ignore_errors=["allow_null"])

    assert list(theirs) == list(ours)
    uid = list(theirs)[0]
    t = theirs[uid]["results"]["movies"]
    o = ours[uid]["results"]["movies"]
    assert t["schema_violations"] == o["schema_violations"]
    assert "unique_value" in t["schema_violations"]["id"]
    assert _records(t["value_errors"]) == _records(o["value_errors"])
    # the duplicate id rows really are in the listing
    dup_rows = [i for i, v in t["value_errors"]["Error Type"].items()
                if v == "Duplicate Value"]
    assert len(dup_rows) == 2


def test_boolean_text_inference_divergence(spark, tmp_path):
    """EXPLICIT DIVERGENCE: a CSV column of pure 'True'/'False' TEXT.
    The reference's string path can never yield Boolean
    (is_bool_dtype is False for str, to_numeric raises → 'String',
    src/schema_validata.py:1175-1208), so it flags data_type
    String != Boolean; this engine's bool-word probe infers Boolean
    (functions/typing.py:decide_logical_type) and reports the column
    clean — the deliberate improvement, asserted here so the
    whole-report diff stays complete."""
    path = str(tmp_path / "movies.csv")
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(HEADER)
        w.writerow([1, "Heat", 1995, "Mann", "Action", 170, "x",
                    "True"])
        w.writerow([2, "Alien", 1979, "Scott", "Sci-Fi", 117, "y",
                    "False"])

    import schema_validata as ref
    orig_ef, orig_re = pd.ExcelFile, pd.read_excel
    pd.ExcelFile, pd.read_excel = _ShimExcelFile, _shim_read_excel
    try:
        theirs = copy.deepcopy(ref.validate_dataset(
            path, TEMPLATE,
            schema_mapping=[{"dataset": "movies",
                             "data_dict": "MOVIES_SCHEMA"}],
            list_errors=False, ignore_errors=["allow_null"]))
    finally:
        pd.ExcelFile, pd.read_excel = orig_ef, orig_re
    from schema_validata_spark.validate import validate_files
    ours = validate_files(
        spark, path, TEMPLATE,
        schema_mapping=[{"dataset": "movies",
                         "data_dict": "MOVIES_SCHEMA"}],
        list_errors=False, ignore_errors=["allow_null"])
    uid = next(iter(theirs))
    t = theirs[uid]["results"]["movies"]["schema_violations"]
    o = ours[uid]["results"]["movies"]["schema_violations"]
    assert t["available"]["data_type"]["observed"] == "String"
    assert "available" not in o           # ours: clean Boolean column
    # every OTHER column agrees byte-for-byte
    assert {k: v for k, v in t.items() if k != "available"} == o
