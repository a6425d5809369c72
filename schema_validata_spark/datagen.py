"""Deterministic synthetic transcripts generator (FIXTURES.md §1-§3).

Input shape comes from BASELINE.json input_hint:
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` plus a ``ts_date`` partition column (Iceberg
``days(ts)`` identity fallback).

Everything is a pure function of ``(row id, seed)`` built from Column
expressions (xxhash64-based pseudo-randomness) — no wall clock, no Python
per-row code, no driver-side materialization — so the same generator
produces the 6k-row unit fixture and the 10^7-row bench input, and the
per-turn ``text`` bytes are reproducible from (conv_id, turn_idx, seed)
as the parity invariant requires.

Seeded violations (rates from FIXTURES.md §1):
  - ~0.1%  conv_id absent from the conversations dim (RI violations)
  - ~0.05% conv_id NA-pattern strings ("N/A", "not available", "-")
  - ~0.1%  duplicated (conv_id, turn_idx) pairs; ~0.02% negative turn_idx
  - ~0.2%  role = 'operator' (allowed_value_list violations)
  - ~0.1%  text > 4000 chars; ~0.1% empty/whitespace-only text
  - ~0.1%  role='tool' rows with NULL tool; ~0.02% 'unknown_tool'
  - ~0.05% ts before the valid range; occasional non-monotonic ts
Skew fixture: conversation "conv-00000000" holds ~10% of all turns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

BASE_EPOCH = 1_700_000_000  # fixed, not wall-clock
ROLES = ["system", "user", "assistant", "tool"]
TOOLS = ["bash", "read", "write", "grep", "web"]

# Fixed corpus the text column is sliced out of (deterministic bytes).
_WORDS = (
    "the fast key order sort table scan merge part window small hash join "
    "batch stream spark group query row data slow filter customer line value "
    "agg column big vector a dup plan stage task shuffle skew salt broadcast "
)
LOREM = (_WORDS * 64)[:8192]


def _h(seed: int, *cols) -> "F.Column":
    """Deterministic non-negative pseudo-random int64 from columns + seed."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def gen_transcripts(spark: SparkSession, n_turns: int, seed: int = 42,
                    n_convs: int | None = None) -> DataFrame:
    """Synthetic transcripts table, ``n_turns`` rows, fully deterministic."""
    n_convs = n_convs or max(1, n_turns // 8)
    mega = max(1, n_turns // 10)  # turns in the mega conversation
    rest_convs = max(1, n_convs - 1)

    df = spark.range(0, n_turns, 1)  # id: 0..n-1

    conv_num = F.when(F.col("id") < mega, F.lit(0)).otherwise(
        (F.col("id") - mega) % rest_convs + 1)
    base_turn = F.when(F.col("id") < mega, F.col("id").cast("int")).otherwise(
        ((F.col("id") - mega) / rest_convs).cast("int"))

    df = df.withColumn("conv_num", conv_num).withColumn("base_turn", base_turn)
    h0 = _h(seed, F.col("id"))

    # conv_id with RI + NA-pattern violations
    conv_id = F.format_string("conv-%08d", F.col("conv_num"))
    m = F.pmod(h0, F.lit(10000))
    conv_id = (
        F.when(m == 0, F.format_string("conv-9%07d", F.pmod(h0, F.lit(100))))
        .when(m == 1, F.format_string("conv-9%07d", F.pmod(h0, F.lit(100)) + 100))
        # NA-pattern sentinels (~0.05%)
        .when(m == 2, F.lit("N/A"))
        .when(m == 3, F.lit("not available"))
        .when(m == 4, F.lit("-"))
        .otherwise(conv_id)
    )

    # turn_idx: duplicates (~0.1% → collide with turn 0 of same conv),
    # negatives (~0.02%)
    h1 = _h(seed + 1, F.col("id"))
    m1 = F.pmod(h1, F.lit(10000))
    turn_idx = (
        F.when((m1 < 10) & (F.col("base_turn") > 0), F.lit(0))
        .when(m1.between(10, 11), F.lit(-1))
        .otherwise(F.col("base_turn"))
    ).cast("int")

    # role: cycle, ~0.2% 'operator'
    h2 = _h(seed + 2, F.col("id"))
    role = F.when(F.pmod(h2, F.lit(1000)) < 2, F.lit("operator")).otherwise(
        F.element_at(F.array(*[F.lit(r) for r in ROLES]),
                     F.pmod(F.col("base_turn"), F.lit(4)).cast("int") + 1))

    # text: deterministic slice of LOREM; length ≈ N(200,120) via sum of
    # three uniform draws (Irwin-Hall), truncated to ≥1; seeded violations.
    hk = _h(seed + 3, conv_id, turn_idx)  # function of (conv_id, turn_idx, seed)
    u1, u2, u3 = [F.pmod(_h(seed + 3 + i, conv_id, turn_idx), F.lit(1000)) / 1000.0
                  for i in (0, 1, 2)]
    length = F.greatest(
        F.lit(1),
        (F.lit(200) + (u1 + u2 + u3 - F.lit(1.5)) * F.lit(240)).cast("int"))
    start = (F.pmod(hk, F.lit(4000)) + 1).cast("int")
    m3 = F.pmod(_h(seed + 6, F.col("id")), F.lit(10000))
    text = (
        F.when(m3 < 10, F.substring(F.lit(LOREM * 2), 1, 4500))   # over-length
        .when(m3.between(10, 14), F.lit(""))                       # empty
        .when(m3.between(15, 19), F.lit("   "))                    # whitespace
        .otherwise(F.substring(F.lit(LOREM), 1, 8000).substr(start, length))
    )

    # tool: null unless role='tool'; seeded null/unknown violations
    h4 = _h(seed + 7, F.col("id"))
    m4 = F.pmod(h4, F.lit(10000))
    tool = (
        F.when(role != "tool", F.lit(None).cast("string"))
        .when(m4 < 10, F.lit(None).cast("string"))                # missing tool
        .when(m4.between(10, 11), F.lit("unknown_tool"))
        .otherwise(F.element_at(F.array(*[F.lit(t) for t in TOOLS]),
                                F.pmod(h4, F.lit(5)).cast("int") + 1))
    )

    # ts: base + conv offset + turn seconds; early/non-monotonic violations
    h5 = _h(seed + 8, F.col("id"))
    m5 = F.pmod(h5, F.lit(10000))
    ts_secs = (
        F.lit(BASE_EPOCH) + F.col("conv_num") * 3600
        + F.col("base_turn") * 7
        + F.when(m5 < 5, F.lit(-500_000_000))        # far before range_min
        .when(m5.between(5, 9), F.lit(-13))        # non-monotonic
        .otherwise(F.lit(0))
    )
    ts = F.timestamp_seconds(ts_secs)

    return (df.select(
        conv_id.alias("conv_id"),
        turn_idx.alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    ).withColumn("ts_date", F.to_date("ts")))


def gen_conversations(spark: SparkSession, n_turns: int, seed: int = 42,
                      n_convs: int | None = None) -> DataFrame:
    """Referential-integrity dimension (FIXTURES.md §2): one row per
    legitimate conversation id produced by :func:`gen_transcripts`."""
    n_convs = n_convs or max(1, n_turns // 8)
    return spark.range(0, n_convs, 1).select(
        F.format_string("conv-%08d", F.col("id")).alias("conv_id"),
        F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("id") * 3600)
         .alias("started_ts"),
    )


def transcript_rules():
    """Rules fixture mirroring FIXTURES.md §1a."""
    from .rules import FieldRule, Rules

    return Rules(
        name="TRANSCRIPTS_SCHEMA",
        fields=[
            FieldRule("conv_id", required=True, data_type="String",
                      allow_null=False, length=16,
                      regex_pattern=r"^conv-\d{8}$", unique_value=False),
            FieldRule("turn_idx", required=True, data_type="Integer",
                      allow_null=False, range_min=0.0, range_max=100000.0,
                      unique_value=False),
            FieldRule("role", required=True, data_type="String",
                      allow_null=False, length=16, unique_value=False,
                      allowed_value_list=["system", "user", "assistant", "tool"]),
            FieldRule("text", required=True, data_type="String",
                      allow_null=True, length=4000, unique_value=False),
            FieldRule("tool", required=False, data_type="String",
                      allow_null=True, length=32,
                      regex_pattern=r"^[a-z_]{1,32}$", unique_value=False,
                      allowed_value_list=list(TOOLS)),
            FieldRule("ts", required=True, data_type="Datetime",
                      allow_null=False, unique_value=False),
            # exercises required_column (reference src/schema_validata.py:2132-2138)
            FieldRule("missing_col", required=True, data_type="String"),
            # exercises optional_column (reference src/schema_validata.py:2139-2145)
            FieldRule("optional_missing", required=False, data_type="String"),
        ],
        composite_unique=[("conv_id", "turn_idx")],
        foreign_keys=[("conv_id", "conversations", "conv_id")],
    )
