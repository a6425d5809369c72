"""Ingestion: typed readers with the reference's cleanup semantics.

The reference's CSV/XLSX readers (read_spreadsheets,
src/schema_validata.py:630-702; read_df_with_optimal_dtypes, :1041-1146)
do three full re-reads to infer types. Here ingest is ONE scan:
all-string read → NA canonicalization expression → per-column
``try_cast`` to the profiled/declared type. Newline stripping
(:438-460) and header trimming (:694-696) are expressions / renames.
XLSX ingestion is out of scope for a distributed engine (use Parquet /
Iceberg / CSV); the rules loader accepts JSON/dict/DataFrame instead.
"""

from __future__ import annotations

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
    for c in df.columns:
        probes = {p: row.get(f"{c}__{p}") or 0
                  for p in ["nonnull", "int_ok", "float_ok", "bool_ok",
                            "ts_ok", "lead0"]}
        logical = decide_logical_type(probes)
        target = _LOGICAL_TO_SPARK[logical]
        if target == "string":
            casts.append(F.col(c))
        elif target == "timestamp":
            # full multi-format parse (reference COMMON_DATETIMES + ISO);
            # a format election (functions/datetimes.py:
            # infer_datetime_format) is available when one-parse-per-cell
            # matters more than the extra election job
            from ..functions.datetimes import parse_datetime_multi
            casts.append(parse_datetime_multi(F.col(c)).alias(c))
        elif target == "boolean":
            casts.append(F.lower(F.trim(F.col(c))).try_cast("boolean").alias(c))
        else:
            casts.append(F.trim(F.col(c)).try_cast(target).alias(c))
    return df.select(casts)
