"""Ingestion: typed readers with the reference's cleanup semantics.

The reference's CSV/XLSX readers (read_spreadsheets,
src/schema_validata.py:630-702; read_df_with_optimal_dtypes, :1041-1146)
do three full re-reads to infer types. Here ingest is ONE scan:
all-string read → NA canonicalization expression → per-column
``try_cast`` to the profiled/declared type. Newline stripping
(:438-460) and header trimming (:694-696) are expressions / renames.
XLSX datasets load through the stdlib OOXML reader (sources/xlsx.py) —
a workbook is driver-small by Excel's own 1,048,575-row limit, so the
rows parallelize from the driver; Parquet/Iceberg/CSV are the scale
formats.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.colref import qcol
from ..functions.nulls import canonicalize_na
from ..functions.typing import decide_logical_type, type_probe_aggs

_LOGICAL_TO_SPARK = {
    "Boolean": "boolean",
    "Integer": "bigint",
    "Float": "double",
    "Datetime": "timestamp",
    "String": "string",
    "Null-Unknown": "string",
    "Other": "string",
}


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Parquet (typed) read — the fast path; no inference needed."""
    return spark.read.parquet(path)


def read_xlsx_validated(spark: SparkSession, path: str,
                        sheet_name: str | None = None,
                        rm_newlines: bool = True, replace_char: str = "",
                        infer: bool = True
                        ) -> "DataFrame | dict[str, DataFrame]":
    """XLSX dataset ingest (reference read_csv_or_excel_to_df /
    xlsx_tabs_to_pd_dataframes, src/schema_validata.py:706-776,
    :862-953): every sheet → one DataFrame keyed by sheet name (pass
    ``sheet_name`` for exactly one), values read all-string then pushed
    through the SAME cleanup + inference pipeline as CSV ingest
    (``_clean_and_infer``) — header trim, newline strip, NA
    canonicalization, probe-agg typed casts."""
    from pyspark.sql import types as T

    from .xlsx import read_xlsx

    sheets = read_xlsx(path)
    if sheet_name is not None and sheet_name not in sheets:
        raise ValueError(
            f"sheet {sheet_name!r} not found in {path!r}; "
            f"workbook has: {sorted(sheets)}")
    out: dict[str, DataFrame] = {}
    for name, rows in sheets.items():
        if sheet_name is not None and name != sheet_name:
            continue
        # pandas skips fully-blank leading rows before the header
        while rows and all(v is None for v in rows[0]):
            rows = rows[1:]
        if not rows:
            if sheet_name is not None:  # explicit ask → empty DF
                return spark.createDataFrame([], T.StructType([]))
            continue
        # header cleanup (reference :694-696) + pandas-style mangling:
        # blank cells → _c{i}, duplicates → name.1, name.2 …
        hdr, seen = [], {}
        for i, h in enumerate(rows[0]):
            name_i = str(h).strip() if h is not None else ""
            if not name_i:
                name_i = f"_c{i}"
            if name_i in seen:
                k = seen[name_i]
                while f"{name_i}.{k + 1}" in seen:
                    k += 1
                seen[name_i] = k + 1
                name_i = f"{name_i}.{k + 1}"
            seen.setdefault(name_i, 0)
            hdr.append(name_i)
        data = [tuple(None if v is None else str(v)
                      for v in (r + [None] * (len(hdr) - len(r)))[:len(hdr)])
                for r in rows[1:]]
        # explicit StructType: a DDL string would need escaping for
        # backticks/odd chars in header cells
        schema = T.StructType(
            [T.StructField(h, T.StringType(), True) for h in hdr])
        df = spark.createDataFrame(data, schema)
        out[name] = _clean_and_infer(df, rm_newlines, replace_char, infer)
    if sheet_name is not None:
        return out[sheet_name]
    return out


def read_spreadsheet(spark: SparkSession, path: str,
                     sheet_name: str | None = None, **kw):
    """Dispatch CSV vs XLSX by extension (reference
    read_csv_or_excel_to_df :862-953)."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".xlsx", ".xlsm"):
        return read_xlsx_validated(spark, path, sheet_name=sheet_name, **kw)
    return read_csv_validated(spark, path, **kw)


def read_csv_validated(spark: SparkSession, path: str,
                       rm_newlines: bool = True, replace_char: str = "",
                       infer: bool = True,
                       encoding: str = "UTF-8",
                       multiline: bool = True) -> DataFrame:
    """CSV ingest with reference cleanup semantics in ONE scan + one
    stats job: header-trimmed column names, newline stripping, extended
    NA canonicalization, then per-column logical-type try_cast (replaces
    the reference's three re-reads).

    ``multiline=True`` (default) parses RFC-4180 quoted fields that
    contain newlines — the reference's pandas reader does, and without
    it such rows split into corrupt records before ``rm_newlines`` can
    strip anything. Scale note: multiLine CSV is NOT splittable (one
    task per file); pass ``multiline=False`` for big known-clean
    machine-written CSVs, or better, use Parquet for the scale path."""
    reader = (spark.read.option("header", "true")
              .option("encoding", encoding)
              # RFC 4180 doubled-quote escaping ("" inside a quoted
              # field), pandas' default dialect
              .option("escape", '"'))
    if multiline:
        reader = reader.option("multiLine", "true")
    return _clean_and_infer(reader.csv(path), rm_newlines, replace_char,
                            infer)


def _clean_and_infer(df: DataFrame, rm_newlines: bool, replace_char: str,
                     infer: bool) -> DataFrame:
    # qcol(c) (not F.col / df[c]) throughout: spreadsheet headers
    # legally contain dots ('No.', 'price.usd') which F.col parses as
    # struct access and Dataset.apply rejects as invalid syntax
    df = df.toDF(*[c.strip() for c in df.columns])
    if rm_newlines:
        df = df.select([
            F.regexp_replace(qcol(c), r"[\r\n]", replace_char).alias(c)
            for c in df.columns])
    df = canonicalize_na(df)
    if not infer:
        return df
    aggs = []
    for c in df.columns:
        aggs += type_probe_aggs(c, qcol(c))
    row = df.agg(*aggs).collect()[0].asDict()
    casts = []
    dt_candidates: list[str] = []
    for c in df.columns:
        probes = {p: row.get(f"{c}__{p}") or 0
                  for p in ["nonnull", "int_ok", "float_ok", "bool_ok",
                            "ts_ok", "lead0"]}
        logical = decide_logical_type(probes)
        target = _LOGICAL_TO_SPARK[logical]
        if target == "string":
            casts.append(qcol(c))
        elif target == "timestamp":
            # COLUMN-level format election (reference
            # infer_datetime_column :508-579): ONE format is elected for
            # the whole column and every cell parses with it. A per-cell
            # first-match over COMMON_DATETIMES would silently mix
            # M/d-vs-d/M interpretations within one column ('03/04/2024'
            # → Mar 4 but '25/12/2024' → day-first) — the election keeps
            # the column self-consistent, converted below.
            dt_candidates.append(c)
            casts.append(qcol(c))
        elif target == "boolean":
            casts.append(F.lower(F.trim(qcol(c))).try_cast("boolean").alias(c))
        else:
            casts.append(F.trim(qcol(c)).try_cast(target).alias(c))
    out = df.select(casts)
    if dt_candidates:
        # ONE chunked election job for every candidate column + one
        # select with the elected parses (a per-column election would
        # pay k serial scans); no-format columns stay string
        from ..functions.datetimes import convert_datetime_columns
        out = convert_datetime_columns(out, dt_candidates)
    return out
