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
    else String.

    DOCUMENTED DIVERGENCE: the reference's STRING path can never
    reach Boolean (``is_bool_dtype`` is False for str values and
    ``to_numeric('True')`` raises, :1175-1208), so a file column of
    pure 'True'/'False' TEXT reports String there and Boolean here —
    the deliberate improvement; asserted explicitly in
    tests/test_round5e_whole_report_parity.py."""
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


_TRUE_TOKENS = ("true", "t", "yes", "y", "1")
_FALSE_TOKENS = ("false", "f", "no", "n", "0")


def coerce_expr(col: Column, logical: str) -> Column:
    """String → engine-typed value for one LOGICAL_TYPES entry, NULL on
    anything that doesn't parse (exception-free: the same gated
    try_cast / format-battery expressions the profiler probes with).
    String/Other/Null-Unknown pass through unchanged."""
    if logical == "Integer":
        return safe_bigint(col)
    if logical == "Float":
        return safe_double(col)
    if logical == "Boolean":
        t = F.lower(F.trim(col))
        return (F.when(t.isin(*_TRUE_TOKENS), F.lit(True))
                 .when(t.isin(*_FALSE_TOKENS), F.lit(False)))
    if logical == "Datetime":
        from .datetimes import parse_datetime_multi
        return parse_datetime_multi(col)
    return col


def coerce_frame(df, rules):
    """The coerced table: every STRING column with a data_type rule is
    cast to its logical type's engine type (Integer→bigint,
    Float→double, Boolean→boolean, Datetime→timestamp) with NULL on
    parse failure — the reference applies its casting lattice at CSV
    read time (read_df_with_optimal_dtypes, src/schema_validata.py:
    1045-1118); this applies the SAME lattice to any already-loaded
    frame so downstream math runs on real types instead of strings.
    Run ``coercion_failures`` first (or alongside) to see what NULL-on-
    failure will eat; the violations layer still owns the row-level
    audit trail.

    Map-only — pure scan-stage expressions, no shuffle, column names
    and order preserved. Non-string columns and un-ruled columns pass
    through untouched."""
    from ..rules import Rules  # noqa: F401 — type documented only
    by_name = {f.field_name: f for f in rules.fields}
    out = []
    for field in df.schema.fields:
        r = by_name.get(field.name)
        if (r is None or r.data_type is None
                or not isinstance(field.dataType, T.StringType)):
            out.append(F.col(field.name))
            continue
        out.append(coerce_expr(F.col(field.name), r.data_type)
                   .alias(field.name))
    return df.select(*out)


def coercion_failures(df, rules):
    """What ``coerce_frame`` will eat: per coercible column, how many
    non-null source values fail to parse into the ruled type. Output:
    (column_name, data_type, n_values, n_failed, fail_rate 6dp) —
    one WIDE aggregate over a single scan (source count + coerced
    count per column), unpivoted after. A fail_rate of 1.0 usually
    means the rule's type is wrong, not the data."""
    by_name = {f.field_name: f for f in rules.fields}
    targets = []
    for field in df.schema.fields:
        r = by_name.get(field.name)
        if (r is not None and r.data_type is not None
                and r.data_type not in ("String", "Other",
                                        "Null-Unknown")
                and isinstance(field.dataType, T.StringType)):
            targets.append((field.name, r.data_type))
    if not targets:
        raise ValueError("no coercible (string + typed-rule) columns")
    aggs = []
    for i, (name, logical) in enumerate(targets):
        c = F.col(name)
        aggs.append(F.count(c).cast("bigint").alias(f"__n{i}"))
        aggs.append(F.count(coerce_expr(c, logical)).cast("bigint")
                     .alias(f"__ok{i}"))
    wide = df.agg(*aggs)
    rows = F.array(*[
        F.struct(F.lit(name).alias("column_name"),
                 F.lit(logical).alias("data_type"),
                 F.col(f"__n{i}").alias("n_values"),
                 (F.col(f"__n{i}") - F.col(f"__ok{i}")).cast("bigint")
                  .alias("n_failed"))
        for i, (name, logical) in enumerate(targets)])
    long = wide.select(F.explode(rows).alias("e")).select("e.*")
    return long.withColumn(
        "fail_rate",
        F.when(F.col("n_values") > 0,
               F.round(F.col("n_failed").cast("double")
                       / F.col("n_values").cast("double"), 6)))
