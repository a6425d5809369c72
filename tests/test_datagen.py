"""Generator invariants: determinism, schema, seeded violations, skew."""

from pyspark.sql import functions as F

from schema_validata_spark.datagen import (gen_conversations, gen_transcripts,
                                           transcript_rules)

N = 4000


def test_schema_matches_input_hint(spark):
    df = gen_transcripts(spark, N)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("conv_id", "string"), ("turn_idx", "int"), ("role", "string"),
        ("text", "string"), ("tool", "string"), ("ts", "timestamp"),
        ("ts_date", "date"),
    ]
    assert df.count() == N


def test_deterministic(spark):
    a = gen_transcripts(spark, 500, seed=7).orderBy("conv_id", "turn_idx", "text")
    b = gen_transcripts(spark, 500, seed=7).orderBy("conv_id", "turn_idx", "text")
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_text_reproducible_from_keys(spark):
    """Per-turn text bytes are a pure function of (conv_id, turn_idx, seed):
    the per-row invariant from BASELINE.json input_hint."""
    df = gen_transcripts(spark, 1000, seed=42)
    dup = (df.groupBy("conv_id", "turn_idx")
             .agg(F.count_distinct("text").alias("n"))
             .where(F.col("n") > 1))
    assert dup.count() == 0


def test_seeded_violations_present(spark):
    df = gen_transcripts(spark, 50_000, seed=42).cache()
    assert df.where(F.col("role") == "operator").count() > 0
    assert df.where(F.length("text") > 4000).count() > 0
    assert df.where(F.col("turn_idx") < 0).count() > 0
    assert df.where((F.col("role") == "tool") & F.col("tool").isNull()).count() > 0
    dups = (df.groupBy("conv_id", "turn_idx").count()
              .where(F.col("count") > 1).count())
    assert dups > 0
    convs = gen_conversations(spark, 50_000, seed=42)
    missing = df.join(convs, "conv_id", "left_anti") \
                .where(F.col("conv_id").rlike("^conv-9")).count()
    assert missing > 0
    df.unpersist()


def test_skew_fixture(spark):
    df = gen_transcripts(spark, 20_000)
    mega = df.where(F.col("conv_id") == "conv-00000000").count()
    assert mega >= 20_000 * 0.08


def test_rules_fixture_roundtrip(spark):
    rules = transcript_rules()
    df = rules.to_spark_df(spark)
    assert df.count() == len(rules.fields)
    from schema_validata_spark.rules import Rules
    back = Rules.from_spark_df("TRANSCRIPTS_SCHEMA", df)
    assert back["role"].allowed_value_list == ["system", "user", "assistant", "tool"]
    assert back["conv_id"].regex_pattern == r"^conv-\d{8}$"
