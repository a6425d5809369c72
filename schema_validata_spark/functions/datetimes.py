"""Datetime format coverage: the reference's ``COMMON_DATETIMES`` /
``COMMON_TIMESTAMPS`` probe sets as shape-gated Spark expressions.

Reference semantics (src/schema_validata.py):

* ``Config.COMMON_DATETIMES`` (:93-115) — 11 strptime formats tried in
  order by ``infer_datetime_column`` (:508-579), which refuses
  integer-like columns (:544-551) and time-only columns (:552-558,
  via ``column_is_timestamp`` :464-504 over ``COMMON_TIMESTAMPS``
  :81-90), then falls back to per-value ``dateutil.parser.parse``
  (:570-576).

Spark re-expression:

* every format carries a SHAPE GATE regex — under ANSI mode a failed
  parse is a JVM exception (~10-30µs); gated, a typical cell attempts
  ~1 parse and prose/JSON attempts none;
* month-name formats go through ``initcap`` first (Python strptime is
  case-insensitive for month names; Java's DateTimeFormatter is not);
* the dateutil fallback is the ONE semantically-required Python UDF in
  the engine (SURVEY §2.7): a vectorized Arrow-batched pandas UDF, never
  per-row Python.
"""

from __future__ import annotations

import pandas as pd

from .colref import qcol
from pyspark.sql import Column, DataFrame, functions as F

# (spark format, shape-gate regex, needs_initcap) in the REFERENCE's try
# order (src/schema_validata.py:93-115). Single-letter field patterns
# (M/d/H) accept 1-2 digits, matching strptime's permissiveness.
COMMON_DATETIMES_SPARK: list[tuple[str, str, bool]] = [
    ("M/d/yyyy",          r"^\d{1,2}/\d{1,2}/\d{4}$", False),   # %m/%d/%Y
    ("d/M/yyyy",          r"^\d{1,2}/\d{1,2}/\d{4}$", False),   # %d/%m/%Y
    ("MMM-d-yyyy",        r"^[A-Za-z]{3}-\d{1,2}-\d{4}$", True),  # %b-%d-%Y
    ("MMMM d, yyyy",      r"^[A-Za-z]{3,9} \d{1,2}, \d{4}$", True),  # %B %d, %Y
    ("yyyy-M-d",          r"^\d{4}-\d{1,2}-\d{1,2}$", False),   # %Y-%m-%d
    ("d-M-yyyy",          r"^\d{1,2}-\d{1,2}-\d{4}$", False),   # %d-%m-%Y
    ("M/d/yyyy H:mm:ss",
     r"^\d{1,2}/\d{1,2}/\d{4} \d{1,2}:\d{2}:\d{2}$", False),    # %m/%d/%Y %H:%M:%S
    ("yyyy-M-d H:mm:ss",
     r"^\d{4}-\d{1,2}-\d{1,2} \d{1,2}:\d{2}:\d{2}$", False),    # %Y-%m-%d %H:%M:%S
    ("d-M-yyyy H:mm:ss",
     r"^\d{1,2}-\d{1,2}-\d{4} \d{1,2}:\d{2}:\d{2}$", False),    # %d-%m-%Y %H:%M:%S
    ("yyyy-M",            r"^\d{4}-\d{1,2}$", False),            # %Y-%m
    ("yyyy-M-d'T'H:mm:ss'Z'",
     r"^\d{4}-\d{1,2}-\d{1,2}T\d{1,2}:\d{2}:\d{2}Z$", False),   # …%SZ
    ("yyyy-M-d'T'H:mm:ssxx",
     r"^\d{4}-\d{1,2}-\d{1,2}T\d{1,2}:\d{2}:\d{2}[-+]\d{4}$",
     False),                                                     # …%S%z
]

# Time-only formats (reference COMMON_TIMESTAMPS :81-90). A column whose
# values are ALL time-only is refused as Datetime (it stays String) —
# these exist for that refusal test and for the standalone
# column_is_timestamp op.
COMMON_TIMESTAMPS_SPARK: list[tuple[str, str]] = [
    ("h:mm:ss a",  r"^\d{1,2}:\d{2}:\d{2} [AaPp][Mm]$"),  # %I:%M:%S %p
    ("h:mm:ssa",   r"^\d{1,2}:\d{2}:\d{2}[AaPp][Mm]$"),   # %I:%M:%S%p
    ("h:mm a",     r"^\d{1,2}:\d{2} [AaPp][Mm]$"),        # %I:%M %p
    ("h:mma",      r"^\d{1,2}:\d{2}[AaPp][Mm]$"),         # %I:%M%p
    ("H:mm:ss",    r"^\d{1,2}:\d{2}:\d{2}$"),             # %H:%M:%S
    ("H:mm:ss a",  r"^\d{1,2}:\d{2}:\d{2} [AaPp][Mm]$"),  # %H:%M:%S %p
]

# cheap first-tier screen: no string longer than this is a common
# datetime; keeps the per-format gates off document text entirely
_MAX_DT_LEN = 35

# month-name PREFIXES anchor the word-date screen: a generic
# letters-separator-digit shape would false-positive identifier columns
# ('conv-00000042' is letters-dash-digit), sending millions of ids into
# the confirmation parse battery. The prefix test is a 3-char substring
# + 12-way isin — NO regex: two case-insensitive rlike alternations here
# cost ~20s alone on an 8M-row × 6-column melt (measured); the isin
# screen is ~free. False positives ('january sales dipped…' prose) are
# demoted by the confirmation parse aggregate, which only runs when
# EVERY non-null value in the column passes this screen.
_MONTHS3 = ["jan", "feb", "mar", "apr", "may", "jun",
            "jul", "aug", "sep", "oct", "nov", "dec"]


def _dateish_screen(t: Column) -> Column:
    """Tier-1 screen (cheap ops only): worth running format gates on?
    Digit-first dates need a -/ separator ('14-Nov-2023' included via
    '-'); word-first dates need a month-name prefix."""
    first = F.substring(t, 1, 1)
    return (F.length(t) <= _MAX_DT_LEN) & (
        (first.between("0", "9") & (t.contains("-") | t.contains("/")))
        | F.lower(F.substring(t, 1, 3)).isin(_MONTHS3)
    )


def dateish_shape_expr(col: Column | str) -> Column:
    """1/0: the value merely LOOKS like a common date (tier-1 screen
    only — no parse). Cheap enough to run per cell inside wide melt
    projections; columns where every non-null value passes are CANDIDATE
    datetime columns, confirmed by one tiny aggregate running the real
    format battery (operators/profile.py) — keeping the 13-probe parse
    chain out of the hot projection's generated code entirely."""
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")
    # octet_length is O(1) (byte count, no scan) — document text short-
    # circuits here before paying the O(n) trim/length/regex tier
    t = F.trim(s)
    return ((F.octet_length(s) <= 150) & _dateish_screen(t)).cast("int")


def parse_datetime_multi(col: Column | str) -> Column:
    """Per-cell multi-format parse: first matching format in reference
    order wins; NULL when nothing matches. Shape-gated throughout —
    non-date strings never attempt a parse."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c.cast("string"))
    probes = []
    for fmt, gate, needs_initcap in COMMON_DATETIMES_SPARK:
        v = F.initcap(t) if needs_initcap else t
        probes.append(F.when(t.rlike(gate), F.try_to_timestamp(v, F.lit(fmt))))
    # default ISO parser last: catches 'yyyy-MM-dd HH:mm:ss.SSS' etc.
    probes.append(F.when(
        t.rlike(r"^\d{4}-\d{1,2}-\d{1,2}([ T]|$)"), F.try_to_timestamp(t)))
    return F.when(_dateish_screen(t), F.coalesce(*probes))


def datetime_probe_expr(col: Column | str) -> Column:
    """1/0: the value parses under some COMMON_DATETIMES format — the
    ``ts_ok`` probe feeding the 7-way logical-type decision. Time-only
    values do NOT count (the reference refuses time-only columns as
    Datetime, :552-558 — every gate here requires a date part)."""
    return parse_datetime_multi(col).isNotNull().cast("int")


def time_only_probe_expr(col: Column | str) -> Column:
    """1/0: the value parses under some time-only COMMON_TIMESTAMPS
    format (reference column_is_timestamp, :464-504)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c.cast("string"))
    probes = [F.when(t.rlike(gate),
                     F.try_to_timestamp(F.upper(t), F.lit(fmt)))
              for fmt, gate in COMMON_TIMESTAMPS_SPARK]
    return F.when(F.length(t) <= 12, F.coalesce(*probes)) \
            .isNotNull().cast("int")


def column_is_timestamp(df: DataFrame, column_name: str) -> bool:
    """True iff every non-null value is time-only (reference
    column_is_timestamp :464-504 generalized over all COMMON_TIMESTAMPS
    formats). One aggregate job."""
    c = F.col(column_name)
    row = df.agg(
        F.count(c).alias("n"),
        F.coalesce(F.sum(time_only_probe_expr(c)), F.lit(0)).alias("ok"),
    ).collect()[0]
    return row["n"] > 0 and row["ok"] == row["n"]


def infer_datetime_formats(df: DataFrame,
                           columns: list[str]) -> dict[str, str | None]:
    """COLUMN-level format election for MANY columns at once with the
    reference's per-column semantics (infer_datetime_column :508-579):
    refuse integer-like and time-only columns, then elect the FIRST
    format under which every non-null value parses; ``'dateutil'`` when
    only the per-value fallback covers the column; None when the column
    is not datetime-convertible.

    The election counts are independent aggregations over one scan, so
    ALL columns share one aggregate job (chunked at 8 columns — 13
    try_to_timestamp probes each — to stay inside generated-method
    limits), plus at most one batched dateutil-UDF job for the columns
    every format failed on (rare). k candidate columns cost ~ceil(k/8)
    jobs instead of the k serial scans of a per-column election."""
    from .typing import safe_bigint
    out: dict[str, str | None] = {}
    fallback: list[tuple[str, int]] = []
    chunk = 8
    for lo in range(0, len(columns), chunk):
        cols = columns[lo:lo + chunk]
        aggs = []
        for col in cols:
            c = qcol(col)  # dot-safe resolution (spreadsheet headers)
            t = F.trim(c.cast("string"))
            aggs += [
                F.count(c).alias(f"{col}__n"),
                F.count(safe_bigint(t)).alias(f"{col}__int"),
                F.coalesce(F.sum(time_only_probe_expr(c)), F.lit(0))
                 .alias(f"{col}__to"),
            ]
            for i, (fmt, gate, needs_initcap) in \
                    enumerate(COMMON_DATETIMES_SPARK):
                v = F.initcap(t) if needs_initcap else t
                ok = F.when(t.rlike(gate), F.try_to_timestamp(v, F.lit(fmt)))
                aggs.append(F.count(ok).alias(f"{col}__f{i}"))
        row = df.agg(*aggs).collect()[0]
        for col in cols:
            n = row[f"{col}__n"]
            if n == 0 or row[f"{col}__int"] == n or row[f"{col}__to"] == n:
                out[col] = None
                continue
            for i, (fmt, _, _) in enumerate(COMMON_DATETIMES_SPARK):
                if row[f"{col}__f{i}"] == n:
                    out[col] = fmt
                    break
            else:
                fallback.append((col, n))
    if fallback:
        frow = df.agg(*[
            F.count(dateutil_parse(qcol(col))).alias(f"{col}__ok")
            for col, _ in fallback]).collect()[0]
        for col, n in fallback:
            out[col] = "dateutil" if frow[f"{col}__ok"] == n else None
    return out


def infer_datetime_format(df: DataFrame, column_name: str) -> str | None:
    """Single-column election (reference infer_datetime_column
    :508-579) — thin wrapper over the batched ``infer_datetime_formats``."""
    return infer_datetime_formats(df, [column_name])[column_name]


def _dateutil_series(s: pd.Series) -> pd.Series:
    from dateutil import parser as duparser

    def one(v):
        if v is None or (isinstance(v, float) and v != v):
            return None
        try:
            dt = duparser.parse(str(v))
        except (ValueError, OverflowError, TypeError):
            return None
        if dt.tzinfo is not None:
            import datetime as _dt
            dt = dt.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return dt

    return s.map(one)


_DATEUTIL_UDF = None


def dateutil_parse(col: Column | str) -> Column:
    """Vectorized dateutil fallback (reference :570-576) — the one
    semantically-required Python UDF (SURVEY §2.7). Arrow-batched
    Series→Series; tz-aware results are normalized to naive UTC."""
    global _DATEUTIL_UDF
    if _DATEUTIL_UDF is None:
        from pyspark.sql.functions import pandas_udf
        _DATEUTIL_UDF = pandas_udf(_dateutil_series, "timestamp")
    c = F.col(col) if isinstance(col, str) else col
    return _DATEUTIL_UDF(c.cast("string"))


def _elected_parse_expr(c: Column, fmt: str) -> Column:
    """One parse per cell under an elected format (no probe battery)."""
    t = F.trim(c.cast("string"))
    if fmt == "dateutil":
        return dateutil_parse(c)
    needs_initcap = any(f == fmt and ic
                        for f, _, ic in COMMON_DATETIMES_SPARK)
    return F.try_to_timestamp(F.initcap(t) if needs_initcap else t,
                              F.lit(fmt))


def convert_datetime_column(df: DataFrame, column_name: str) -> DataFrame | None:
    """The full ``infer_datetime_column`` op (reference :508-579): elect
    a format, convert the column to timestamp with ONE parse per cell
    (no waste — the election already knows the format), or return None
    when the column should stay as-is."""
    fmt = infer_datetime_format(df, column_name)
    if fmt is None:
        return None
    return df.withColumn(column_name,
                         _elected_parse_expr(qcol(column_name), fmt))


def convert_datetime_columns(df: DataFrame,
                             columns: list[str]) -> DataFrame:
    """Batched ``convert_datetime_column`` over candidate columns: ONE
    chunked election job for all of them (infer_datetime_formats), then
    ONE select applying every elected conversion; columns with no
    coherent format stay as-is."""
    fmts = infer_datetime_formats(df, columns)
    sel = [_elected_parse_expr(qcol(c), fmts[c]).alias(c)
           if fmts.get(c) else qcol(c) for c in df.columns]
    if all(not fmts.get(c) for c in columns):
        return df
    return df.select(sel)
