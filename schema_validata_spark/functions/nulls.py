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

import re
from functools import lru_cache

from pyspark.sql import Column, DataFrame, functions as F

from ..config import NA_PATTERNS, NA_VALUES
from .colref import qcol


@lru_cache(maxsize=64)
def _na_gate_length(na_values: tuple, na_patterns: tuple) -> int | None:
    """Trimmed-length cutoff above which a value cannot be NA-like, or
    None when no safe cutoff exists.

    The DEFAULT patterns all match only short separator/sentinel tokens
    after trim (the whitespace-run patterns trim to length 0), so a
    cutoff of max(24, longest trimmed sentinel) is exact. With
    caller-supplied *patterns* the match reach is unknowable — a custom
    pattern may match arbitrarily long strings — so the gate is disabled
    rather than silently never classifying long values as NA."""
    if na_patterns != tuple(NA_PATTERNS):
        return None
    longest = max((len(v.strip()) for v in na_values if v), default=0)
    return max(24, longest)


@lru_cache(maxsize=64)
def _combined_na_regex(na_values: tuple, na_patterns: tuple) -> str:
    """ONE alternation regex equivalent to
    ``trim(s)=='' ∨ trim(s) IN na_values ∨ any(rlike(p))``.

    A single regex pass per value matters: the null classifier is inlined
    into many aggregate/filter expressions, and a tree of isin(21 values)
    + 4 rlikes evaluated per reference blew generated methods past the
    JIT limit (interpreted fallback, ~30× slower). Sentinels are matched
    with surrounding whitespace permitted — exactly trim() + isin
    semantics. The user patterns keep their own (?i)/anchors; Java scopes
    inline flags to the enclosing group."""
    sentinels = "|".join(re.escape(v) for v in na_values if v and v.strip())
    parts = [r"^\s*$"]
    if sentinels:
        parts.append(rf"^\s*(?:{sentinels})\s*$")
    parts.extend(f"(?:{p})" for p in na_patterns)
    return "|".join(parts)


def is_na_expr(col: Column | str,
               na_values: list[str] | None = None,
               na_patterns: list[str] | None = None) -> Column:
    """Boolean Column: value is null-like per the reference's two-tier
    vocabulary (sentinels ∨ patterns ∨ empty-after-trim ∨ real NULL) —
    compiled to ``isNull ∨ rlike(one combined regex)``.

    Documented bound: with the default vocabulary, a value whose total
    byte length exceeds ~4×(gate+64) is never NA-classified — i.e. a
    sentinel drowned in >~270 bytes of whitespace padding. The O(1)
    byte gate is what keeps the classifier off document text entirely;
    custom na_patterns disable all gating (unknown match reach)."""
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")
    na_values = NA_VALUES if na_values is None else na_values
    na_patterns = NA_PATTERNS if na_patterns is None else na_patterns
    vals_t = tuple(v for v in na_values if v is not None)
    pats_t = tuple(na_patterns)
    pattern = _combined_na_regex(vals_t, pats_t)
    # length gate: long values (document text) skip the regex with one
    # trim + int compare. The cutoff derives from the supplied vocabulary
    # and is dropped entirely for custom patterns (unknown match reach).
    gate = _na_gate_length(vals_t, pats_t)
    if gate is None:
        return c.isNull() | s.rlike(pattern)
    # octet_length is O(1) (byte count) — document text short-circuits
    # before the O(n) trim; ×4 covers multibyte sentinels, and the gate
    # itself allows arbitrary whitespace padding (trim first). Values
    # PAST the byte gate get one trim-only check so a long
    # whitespace-only cell (padded fixed-width exports) still
    # NA-classifies — trim is a byte scan, the regex never runs on
    # long text.
    return c.isNull() | F.when(
        F.octet_length(s) <= (gate + 64) * 4,
        (F.length(F.trim(s)) <= gate) & s.rlike(pattern)
    ).otherwise(s.rlike(r"^\s*$"))
    # past-gate branch: one linear anchored regex (no alternation) so a
    # long whitespace-ONLY cell of tabs/newlines/spaces NA-classifies
    # the same as a short one — F.trim strips only ' ' and would miss
    # '\t'/'\n' padding; this branch runs only on long values (rare)


def discover_na_values(df: DataFrame,
                       na_values: list[str] | None = None,
                       na_patterns: list[str] | None = None
                       ) -> dict[str, list[str]]:
    """Per-column NA vocabulary discovered FROM THE DATA — the
    reference's read_df_with_optimal_dtypes discovery pass
    (src/schema_validata.py:1086-1104): distinct raw values that
    classify as NA-like under the pattern tier (beyond the literal
    sentinels) per column, e.g. ``{'status': [' - ', 'NOT_AVAILABLE']}``.

    The engine's canonicalization expression already nullifies these
    inline (no re-read needed — the reference re-reads the file with the
    extended list); this op exists to SURFACE the discovered vocabulary
    for reports and dictionary bootstrapping. ONE melt scan; the result
    is tiny by construction (NA-like tokens are short and few)."""
    na_values = NA_VALUES if na_values is None else na_values
    string_cols = [f.name for f in df.schema.fields
                   if f.dataType.simpleString() == "string"]
    if not string_cols:
        return {}
    m = df.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("cname"), F.col(c).alias("v"))
        for c in string_cols])).alias("m")).select("m.*")
    # exclusion is EXACT membership in the literal sentinel list (the
    # reference extends read_as_na with every NA-classified unique value,
    # :1089-1096 — already-listed sentinels add nothing); pattern-tier
    # hits like ' - ' or '  ' are the discovery's whole point
    hits = m.where(
        F.col("v").isNotNull()
        & is_na_expr(F.col("v"), na_values, na_patterns)
        & ~F.col("v").isin([v for v in na_values if v is not None]))
    rows = (hits.groupBy("cname")
                .agg(F.sort_array(F.collect_set("v")).alias("vals"))
                .collect())
    return {r["cname"]: list(r["vals"]) for r in rows}


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
    # qcol(name), not F.col(name)/df[name]: spreadsheet headers may
    # contain dots, which F.col parses as struct access and
    # Dataset.apply rejects
    for f in df.schema.fields:
        if f.dataType.simpleString() == "string" and (
                target is None or f.name in target):
            cols.append(
                F.when(is_na_expr(qcol(f.name), na_values, na_patterns),
                       F.lit(None).cast("string"))
                .otherwise(qcol(f.name)).alias(f.name))
        else:
            cols.append(qcol(f.name))
    return df.select(cols)
