"""Tests for the corpus-analysis additions (top_tokens, gopher_rules)
and the semi-structured JSON payload validators."""

import pytest
from pyspark.sql import Row, functions as F

from schema_validata_spark.functions.text import gopher_rules, top_tokens
from schema_validata_spark.operators.semistructured import (
    json_is_valid, json_payload_stats, json_payload_violations)


# --- top_tokens -------------------------------------------------------------

def test_top_tokens_counts_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "b a a"), (2, "B c  a"), (3, None), (4, "   ")],
        ["doc_id", "text"])
    out = top_tokens(df, "text", 10).collect()
    # a:3 (case-folded 'a' twice in doc1, once each in doc2), b:2, c:1;
    # null/blank docs contribute nothing; multi-space runs don't make
    # empty tokens
    assert [(r["token"], r["n"]) for r in out] == [("a", 3), ("b", 2),
                                                   ("c", 1)]


def test_top_tokens_limit_and_tie_order(spark):
    df = spark.createDataFrame([(1, "z y x")], ["doc_id", "text"])
    out = top_tokens(df, "text", 2).collect()
    # all tie at 1 → ascending token breaks the tie deterministically
    assert [r["token"] for r in out] == ["x", "y"]


def test_top_tokens_plan_is_partial_agg_topk(spark):
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    plan = top_tokens(df, "text", 5)._jdf.queryExecution().executedPlan() \
        .toString()
    # top-k must be a per-task heap (TakeOrderedAndProject), never a
    # global Sort, and the count must partial-aggregate before the
    # exchange
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan


# --- gopher_rules -----------------------------------------------------------

def test_gopher_rules_pass_and_stats(spark):
    text = "the quick brown fox jumps over the lazy dog and runs on"
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = gopher_rules(df, "text", "doc_id").collect()[0]
    assert r["n_words"] == 12
    assert r["stop_hits"] >= 2          # the, and, on, over
    assert r["ok_word_count"] == 1 and r["ok_alpha"] == 1
    assert r["ok_stop"] == 1 and r["passes"] == 1
    # mean word len = squashed length / words
    squashed = len(text.replace(" ", ""))
    assert r["mean_word_len"] == pytest.approx(squashed / 12, abs=1e-6)


def test_gopher_rules_null_and_empty_fail_everything(spark):
    df = spark.createDataFrame([(1, None), (2, ""), (3, "   ")],
                               ["doc_id", "text"])
    for r in gopher_rules(df, "text", "doc_id").collect():
        assert r["n_words"] == 0
        assert r["mean_word_len"] is None and r["alpha_frac"] is None
        assert r["passes"] == 0
        assert r["ok_word_count"] == 0 and r["ok_mean_word_len"] == 0
        assert r["ok_alpha"] == 0


def test_gopher_rules_symbol_soup_fails_alpha(spark):
    df = spark.createDataFrame(
        [(1, "the 123 456 789 $$$ %%% ### 000 111 a on")],
        ["doc_id", "text"])
    r = gopher_rules(df, "text", "doc_id").collect()[0]
    assert r["alpha_frac"] < 0.8 and r["ok_alpha"] == 0
    assert r["passes"] == 0


def test_gopher_rules_word_count_bounds(spark):
    df = spark.createDataFrame([(1, "too few the on")], ["doc_id", "text"])
    r = gopher_rules(df, "text", "doc_id", min_words=5).collect()[0]
    assert r["n_words"] == 4 and r["ok_word_count"] == 0
    r2 = gopher_rules(df, "text", "doc_id", min_words=3).collect()[0]
    assert r2["ok_word_count"] == 1


# --- JSON payload validation -------------------------------------------------

POISON = [
    Row(event_id=1, event_type="click", props='{"k": 1.5}'),
    Row(event_id=2, event_type="click", props='{"k": "oops"}'),
    Row(event_id=3, event_type="click", props='{"other": 1}'),
    Row(event_id=4, event_type="view", props='{broken'),
    Row(event_id=5, event_type="view", props=None),
]


def test_json_is_valid(spark):
    df = spark.createDataFrame(POISON)
    got = {r["event_id"]: r["v"] for r in
           df.select("event_id",
                     json_is_valid("props").alias("v")).collect()}
    assert got == {1: True, 2: True, 3: True, 4: False, 5: False}


def test_json_payload_stats_poison(spark):
    df = spark.createDataFrame(POISON)
    rows = {r["event_type"]: r for r in
            json_payload_stats(df, "props", "event_type", "k").collect()}
    click = rows["click"]
    assert click["n_rows"] == 3 and click["n_valid_json"] == 3
    assert click["n_with_key"] == 2       # events 1 and 2
    assert click["n_numeric"] == 1        # only event 1 casts
    assert click["avg_value"] == pytest.approx(1.5)
    view = rows["view"]
    assert view["n_rows"] == 2 and view["n_valid_json"] == 0
    assert view["n_with_key"] == 0 and view["avg_value"] is None


def test_json_payload_violations_reasons(spark):
    df = spark.createDataFrame(POISON)
    out = json_payload_violations(df, "props", "event_id",
                                  required_keys=["k"], numeric_keys=["k"])
    got = sorted((r["event_id"], r["reason"]) for r in out.collect())
    assert got == [
        (2, "non_numeric:k"),
        (3, "missing:k"),
        (4, "invalid_json"),
        (4, "missing:k"),
        (5, "missing:k"),
    ]


def test_json_payload_violations_clean_is_empty(spark):
    df = spark.createDataFrame([Row(event_id=1, props='{"k": 2}')])
    assert json_payload_violations(df, "props", "event_id",
                                   ["k"], ["k"]).count() == 0


def test_json_ops_single_scan_no_shuffle_before_agg(spark):
    df = spark.createDataFrame(POISON)
    plan = json_payload_stats(df, "props", "event_type", "k") \
        ._jdf.queryExecution().executedPlan().toString()
    # extraction happens inside the scan stage: exactly one exchange
    # for the final group-by (plus the orderBy's range exchange)
    assert plan.count("Exchange") <= 2
