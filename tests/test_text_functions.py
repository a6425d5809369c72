"""Text-analysis expressions: token counts, quality, lang-id,
fingerprints, shingles."""

from pyspark.sql import functions as F

from schema_validata_spark.functions.text import (bpe_ish_token_count,
                                                  fingerprint, lang_id,
                                                  quality_score, shingles,
                                                  token_count)


def _one(spark, text, expr):
    return spark.createDataFrame([(text,)], "t: string") \
        .select(expr.alias("v")).collect()[0]["v"]


def test_token_count(spark):
    assert _one(spark, "a b  c", token_count("t")) == 3
    assert _one(spark, "", token_count("t")) == 0
    assert _one(spark, "single", token_count("t")) == 1


def test_bpe_ish_count_scales_with_length(spark):
    short = _one(spark, "hello", bpe_ish_token_count("t"))
    long = _one(spark, "hello world, this is 1 test!", bpe_ish_token_count("t"))
    assert long > short > 0


def test_quality_score_ordering(spark):
    good = _one(spark, "the quick brown fox jumps over the lazy dog and "
                       "keeps running for a while in the field", quality_score("t"))
    junk = _one(spark, "!!! ??? ### $$$ %%%", quality_score("t"))
    empty = _one(spark, "", quality_score("t"))
    assert 0.0 <= junk < good <= 1.0
    assert empty == 0.0


def test_lang_id(spark):
    assert _one(spark, "the cat and the dog is in the house", lang_id("t")) == "en"
    assert _one(spark, "der hund und die katze ist nicht da", lang_id("t")) == "de"
    assert _one(spark, "zzz qqq xxx", lang_id("t")) == "und"


def test_fingerprint_normalizes_case_and_space(spark):
    a = _one(spark, "Hello   World", fingerprint("t"))
    b = _one(spark, "hello world", fingerprint("t"))
    c = _one(spark, "hello there", fingerprint("t"))
    assert a == b != c


def test_shingles(spark):
    got = _one(spark, "a b c d", shingles("t", 3))
    assert got == ["a b c", "b c d"]
    assert _one(spark, "a b", shingles("t", 3)) == ["a b"]
