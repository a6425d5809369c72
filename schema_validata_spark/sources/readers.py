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
    from .xlsx import read_xlsx

    out: dict[str, DataFrame] = {}
    for name, rows in read_xlsx(path).items():
        if sheet_name is not None and name != sheet_name:
            continue
        if not rows:
            continue
        hdr = [str(h).strip() if h is not None else f"_c{i}"
               for i, h in enumerate(rows[0])]
        data = [tuple(None if v is None else str(v)
                      for v in (r + [None] * (len(hdr) - len(r)))[:len(hdr)])
                for r in rows[1:]]
        df = spark.createDataFrame(data, ", ".join(
            f"`{h}` string" for h in hdr))
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
                       encoding: str = "UTF-8") -> DataFrame:
    """CSV ingest with reference cleanup semantics in ONE scan + one
    stats job: header-trimmed column names, newline stripping, extended
    NA canonicalization, then per-column logical-type try_cast (replaces
    the reference's three re-reads)."""
    df = (spark.read.option("header", "true").option("encoding", encoding)
          .csv(path))
    return _clean_and_infer(df, rm_newlines, replace_char, infer)


def _clean_and_infer(df: DataFrame, rm_newlines: bool, replace_char: str,
                     infer: bool) -> DataFrame:
    df = df.toDF(*[c.strip() for c in df.columns])
    if rm_newlines:
        df = df.select([
            F.regexp_replace(F.col(c), r"[\r\n]", replace_char).alias(c)
            for c in df.columns])
    df = canonicalize_na(df)
    if not infer:
        return df
    aggs = []
    for c in df.columns:
        aggs += type_probe_aggs(c, F.col(c))
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
            casts.append(F.col(c))
        elif target == "timestamp":
            # COLUMN-level format election (reference
            # infer_datetime_column :508-579): ONE format is elected for
            # the whole column and every cell parses with it. A per-cell
            # first-match over COMMON_DATETIMES would silently mix
            # M/d-vs-d/M interpretations within one column ('03/04/2024'
            # → Mar 4 but '25/12/2024' → day-first) — the election keeps
            # the column self-consistent, converted below.
            dt_candidates.append(c)
            casts.append(F.col(c))
        elif target == "boolean":
            casts.append(F.lower(F.trim(F.col(c))).try_cast("boolean").alias(c))
        else:
            casts.append(F.trim(F.col(c)).try_cast(target).alias(c))
    out = df.select(casts)
    if dt_candidates:
        # ONE chunked election job for every candidate column + one
        # select with the elected parses (a per-column election would
        # pay k serial scans); no-format columns stay string
        from ..functions.datetimes import convert_datetime_columns
        out = convert_datetime_columns(out, dt_candidates)
    return out
