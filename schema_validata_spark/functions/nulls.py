"""Null canonicalization as pure Column expressions.

The reference classifies a value as null if it is NaN/None, a sentinel
string (NA_VALUES), matches a null regex (NA_PATTERNS), or is empty after
strip (reference src/schema_validata.py:1216-1263, check_na_value). The
reference applies this per element with ``series.apply`` (:1295) and by
re-reading files with extended null lists (:1086-1104).

Here it is ONE whole-stage-codegen'd expression evaluated in a single
scan — no UDF, no re-read. Applied up front, every downstream check sees
canonical NULLs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..config import NA_PATTERNS, NA_VALUES


def is_na_expr(col: Column | str,
               na_values: list[str] | None = None,
               na_patterns: list[str] | None = None) -> Column:
    """Boolean Column: value is null-like per the reference's two-tier
    vocabulary (sentinels ∨ patterns ∨ empty-after-trim ∨ real NULL)."""
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")
    na_values = NA_VALUES if na_values is None else na_values
    na_patterns = NA_PATTERNS if na_patterns is None else na_patterns
    expr = c.isNull() | (F.trim(s) == "") | F.trim(s).isin(
        [v for v in na_values if v is not None])
    for p in na_patterns:
        expr = expr | s.rlike(p)
    return expr


def canonicalize_na(df: DataFrame,
                    columns: list[str] | None = None,
                    na_values: list[str] | None = None,
                    na_patterns: list[str] | None = None) -> DataFrame:
    """Replace null-like values with real NULLs in all (or given) string
    columns. Non-string columns pass through — Parquet/Iceberg typed columns
    already carry real NULLs; the sentinel/pattern tier only applies to
    strings (matching the reference, whose NA discovery operates on raw
    string reads)."""
    cols = []
    target = set(columns) if columns is not None else None
    for f in df.schema.fields:
        if f.dataType.simpleString() == "string" and (
                target is None or f.name in target):
            cols.append(
                F.when(is_na_expr(F.col(f.name), na_values, na_patterns),
                       F.lit(None).cast("string"))
                .otherwise(F.col(f.name)).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(cols)
