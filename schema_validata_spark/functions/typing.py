"""Logical type inference as aggregate expressions.

The reference's 7-way classifier (reference src/schema_validata.py:
1150-1212, infer_data_types) walks a pandas Series in Python. Here the
per-column evidence is gathered inside the SAME single wide aggregate
pass as the profiling stats (operators/profile.py): ``try_cast`` success
counts, boolean-vocabulary counts and timestamp-parse counts — all
JVM-side — and the 7-way decision is a tiny driver-side function over
those counts.

For declared-schema inputs (Parquet/Iceberg) the physical type already
answers the question (spark_type_to_logical); the probe path exists for
string-typed columns (CSV-style ingest) where inference still matters.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F
from pyspark.sql import types as T

BOOL_WORDS = ["true", "false"]  # reference treats bool dtype; string "true"/"false"

# Shape gates evaluated BEFORE any try_cast: under ANSI mode (Spark 4
# default) try_cast is implemented as catch-per-failure — a JVM exception
# with stack-trace fill per non-conforming cell (~10-30µs). Ungated, a
# single profiling scan over a text table pays millions of exceptions and
# runs 10-30× slower; a pre-compiled regex gate costs ~0.3µs and makes
# the parse all-but-infallible.
NUMERIC_SHAPE = r"^\s*[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?\s*$"
INT_SHAPE = r"^\s*[-+]?\d+\s*$"
# pandas to_numeric (the reference's coercion, src/schema_validata.py:
# 1299-1340) accepts 'inf'/'Infinity' spellings — matched here explicitly
# (no cast needed; 'NaN'/'nan' are NA-canonicalized upstream so they never
# reach numeric coercion, matching the reference's null vocabulary).
_INF_SHAPE = r"(?i)^[-+]?inf(?:inity)?$"


def safe_double(s: Column) -> Column:
    """Exception-free string→double: NULL unless numeric-shaped. The
    O(1) octet_length pre-gate short-circuits long values (document
    text) before any O(n) trim/length/regex; the trimmed-length gate
    then admits padded numerics up to ~100 bytes of padding."""
    gate = F.octet_length(s) <= 150
    t = F.trim(s)
    return (F.when(gate & (F.length(t) <= 48) & t.rlike(NUMERIC_SHAPE),
                   t.try_cast("double"))
             .when(gate & (F.length(t) <= 9) & t.rlike(_INF_SHAPE),
                   F.when(t.startswith("-"), F.lit(float("-inf")))
                    .otherwise(F.lit(float("inf")))))


def safe_bigint(s: Column) -> Column:
    """Exception-free string→bigint: NULL unless integer-shaped (the
    residual try_cast only excepts on int64 overflow)."""
    t = F.trim(s)
    return F.when((F.octet_length(s) <= 150)
                  & (F.length(t) <= 32) & t.rlike(INT_SHAPE),
                  t.try_cast("bigint"))


def type_probe_aggs(col_name: str, canonical: Column) -> list[Column]:
    """Aggregate expressions probing the logical type of one column.

    ``canonical`` is the NA-canonicalized column (string-typed input).
    Emits counts named ``<col>__<probe>``.
    """
    s = F.trim(canonical.cast("string"))
    n = F.count(canonical).alias(f"{col_name}__nonnull")
    as_long = F.count(safe_bigint(s)).alias(f"{col_name}__int_ok")
    as_double = F.count(safe_double(s)).alias(f"{col_name}__float_ok")
    as_bool = F.count(F.when(F.lower(s).isin(BOOL_WORDS), 1)) \
        .alias(f"{col_name}__bool_ok")
    # full COMMON_DATETIMES probe battery (reference src/schema_validata
    # .py:93-115), shape-gated per format (functions/datetimes.py) —
    # non-date strings never attempt a parse
    from .datetimes import datetime_probe_expr
    as_ts = F.coalesce(F.sum(datetime_probe_expr(s)), F.lit(0)) \
        .alias(f"{col_name}__ts_ok")
    # leading zeros force String (reference src/schema_validata.py:957-971)
    lead0 = F.max(F.when(s.rlike(r"^0\d"), 1).otherwise(0)) \
        .alias(f"{col_name}__lead0")
    return [n, as_long, as_double, as_bool, as_ts, lead0]


def decide_logical_type(probes: dict[str, int]) -> str:
    """7-way decision from probe counts — mirrors the reference's
    precedence (src/schema_validata.py:1150-1212): nulls-only →
    Null-Unknown; all boolean words → Boolean; leading zeros → String;
    all-int → Integer; all-float → Float; all-datetime → Datetime;
    else String."""
    n = probes["nonnull"]
    if n == 0:
        return "Null-Unknown"
    if probes["bool_ok"] == n:
        return "Boolean"
    # leading zeros veto the NUMERIC interpretations only ('07' stays
    # String, reference :957-971/1113-1114) — a date like '01/02/2024'
    # still reaches the datetime probe (reference classifier re-probes
    # strings as numeric THEN datetime, :1194-1206)
    if not probes.get("lead0", 0):
        if probes["int_ok"] == n:
            return "Integer"
        if probes["float_ok"] == n:
            return "Float"
    if probes["ts_ok"] == n:
        return "Datetime"
    return "String"


def spark_type_to_logical(dt: T.DataType) -> str:
    """Declared Spark type → logical type (Iceberg/Parquet fast path)."""
    if isinstance(dt, T.BooleanType):
        return "Boolean"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "Integer"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "Float"
    if isinstance(dt, (T.TimestampType, T.DateType)):
        return "Datetime"
    if isinstance(dt, T.StringType):
        return "String"
    return "Other"
