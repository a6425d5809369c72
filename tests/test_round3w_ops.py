"""Round-3w: per-group exact-k weighted sampling, Unicode script-mix
stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schema_validata_spark.functions.sampling import (
    weighted_k_sample, weighted_k_sample_per_group)
from schema_validata_spark.functions.text import script_mix_stats


# ----------------------------------------- weighted_k_sample_per_group

def _docs(spark, rows):
    return spark.createDataFrame(rows, "g string, k string, w double")


def test_per_group_exact_k_and_determinism(spark):
    rows = [(g, f"{g}-{i}", float(i + 1))
            for g in ("en", "fr") for i in range(20)]
    df = _docs(spark, rows)
    a = weighted_k_sample_per_group(df, "g", "k", "w", 5)
    b = weighted_k_sample_per_group(df.repartition(13), "g", "k", "w", 5)
    sa = {(r["g"], r["k"]) for r in a.collect()}
    sb = {(r["g"], r["k"]) for r in b.collect()}
    assert sa == sb                          # partitioning-independent
    from collections import Counter
    per = Counter(g for g, _ in sa)
    assert per == {"en": 5, "fr": 5}


def test_per_group_matches_global_within_group(spark):
    """Restricted to one group, the per-group selection IS the global
    A-ES selection (same draw, same score, same tiebreak)."""
    rows = [("only", f"d{i}", float((i % 7) + 1)) for i in range(30)]
    df = _docs(spark, rows)
    per = {r["k"] for r in weighted_k_sample_per_group(
        df, "g", "k", "w", 8).collect()}
    glob = {r["k"] for r in weighted_k_sample(
        df, "k", "w", 8).collect()}
    assert per == glob


def test_per_group_small_groups_and_exclusions(spark):
    rows = [("small", "a", 1.0), ("small", "b", 2.0),
            ("bad", "c", 0.0), ("bad", "d", None),
            (None, "e", 1.0)]
    got = weighted_k_sample_per_group(
        _docs(spark, rows), "g", "k", "w", 5).collect()
    assert {(r["g"], r["k"]) for r in got} \
        == {("small", "a"), ("small", "b")}
    with pytest.raises(ValueError):
        weighted_k_sample_per_group(_docs(spark, rows), "g", "k", "w", 0)


def test_per_group_window_group_limit_plan(spark):
    import contextlib
    import io
    rows = [("g%d" % (i % 3), "k%d" % i, 1.0 + i) for i in range(60)]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        weighted_k_sample_per_group(_docs(spark, rows), "g", "k", "w",
                                    4).explain("formatted")
    plan = buf.getvalue()
    assert "WindowGroupLimit" in plan, plan


# ------------------------------------------------------ script_mix_stats

def _texts(spark, rows):
    return spark.createDataFrame(rows, "text string, g string")


def test_script_mix_hand_case(spark):
    df = _texts(spark, [("abc де 12", "mix")])   # 3 latin, 2 cyr,
    got = {r["script"]: r for r in script_mix_stats(  # 2 digit, 2 sp
        df, "text", "g").collect()}
    assert got["latin"]["n_chars"] == 3
    assert got["cyrillic"]["n_chars"] == 2
    assert got["digit"]["n_chars"] == 2
    assert got["space"]["n_chars"] == 2
    assert got["other"]["n_chars"] == 0
    assert got["latin"]["share"] == round(3 / 9, 6)
    assert sum(r["n_chars"] for r in got.values()) == 9


def test_script_mix_other_catches_unclassified(spark):
    df = _texts(spark, [("a€€", "g1")])          # euro sign: other
    got = {r["script"]: r["n_chars"] for r in script_mix_stats(
        df, "text", "g").collect()}
    assert got["other"] == 2 and got["latin"] == 1


def test_script_mix_nulls_and_empty_group(spark):
    df = _texts(spark, [(None, "g1"), ("ab", None), ("xy", "g1")])
    got = script_mix_stats(df, "text", "g").collect()
    assert {r["group"] for r in got} == {"g1"}
    total = {r["script"]: r["n_chars"] for r in got}
    assert total["latin"] == 2
