"""Round-3e operators: blocked fuzzy duplicate detection, inter-rater
agreement (Cohen's / Fleiss' kappa), Simpson's-paradox screen,
two-proportion rate significance, and CUSUM volume changepoint."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from schema_validata_spark.operators.dedup import fuzzy_duplicate_values
from schema_validata_spark.operators.expectations import volume_changepoint
from schema_validata_spark.operators.statqa import (cohens_kappa,
                                                    fleiss_kappa,
                                                    rate_significance,
                                                    simpsons_flips)


# ----------------------------------------------------------------- fuzzy

def test_fuzzy_values_normalize_count_and_distance(spark):
    df = spark.createDataFrame(
        [("Acme Corp",), ("acme corp ",), ("Acme Crop",), ("Zeta",),
         ("Beta",), ("  ",), (None,)], "v string")
    out = fuzzy_duplicate_values(df, "v", max_dist=2, prefix_len=2)
    rows = {(r["value_a"], r["value_b"]): r for r in out.collect()}
    # case/whitespace variants collapse BEFORE pairing (n_rows_a = 2)
    assert set(rows) == {("acme corp", "acme crop")}
    r = rows[("acme corp", "acme crop")]
    assert (r["n_rows_a"], r["n_rows_b"], r["dist"]) == (2, 1, 2)


def test_fuzzy_values_prefix_blocking_recall_contract(spark):
    # "zeta" vs "beta" are dist 1 but share no 2-char prefix: never
    # compared (the documented blocking trade-off)
    df = spark.createDataFrame([("zeta",), ("beta",)], "v string")
    assert fuzzy_duplicate_values(df, "v", max_dist=2).count() == 0
    # prefix_len=0 disables blocking (empty prefix, one block)
    out = fuzzy_duplicate_values(df, "v", max_dist=1, prefix_len=0)
    assert out.count() == 1


def test_fuzzy_values_length_band_and_threshold(spark):
    df = spark.createDataFrame([("ab",), ("abcdefgh",)], "v string")
    # same block "ab" but |len delta| = 6 > max_dist: pruned pre-DP
    assert fuzzy_duplicate_values(df, "v", max_dist=2).count() == 0


def test_fuzzy_values_block_cap_telemetry(spark):
    vals = [(f"k{i:03d}",) for i in range(50)]
    df = spark.createDataFrame(vals, "v string")
    tel: dict = {}
    out = fuzzy_duplicate_values(df, "v", max_dist=1, prefix_len=1,
                                 max_block=10, telemetry_out=tel)
    assert out.count() == 0            # the single "k" block was dropped
    assert tel["capped_buckets"] == 1
    assert tel["capped_rows"] == 50


def test_fuzzy_values_dist_zero_is_case_fold_dup(spark):
    df = spark.createDataFrame([("ABC",), ("abc",), ("AbC",)], "v string")
    # all normalize to one value -> no pair (distinct frame has 1 row)
    assert fuzzy_duplicate_values(df, "v", max_dist=1).count() == 0


# ----------------------------------------------------------------- kappa

def _kappa_fixture(spark):
    rows, i = [], 0
    for cnt, la, lb in [(20, "y", "y"), (15, "n", "n"),
                        (10, "y", "n"), (5, "n", "y")]:
        for _ in range(cnt):
            rows += [(i, "A", la), (i, "B", lb)]
            i += 1
    return spark.createDataFrame(rows, "item int, rater string, label string")


def test_cohens_kappa_textbook(spark):
    r = cohens_kappa(_kappa_fixture(spark), "item", "rater", "label",
                     "A", "B").first()
    assert (r["n_items"], r["n_agree"]) == (50, 35)
    assert (r["po"], r["pe"], r["kappa"]) == (0.7, 0.5, 0.4)


def test_cohens_kappa_constant_raters_null(spark):
    df = spark.createDataFrame(
        [(i, r, "y") for i in range(5) for r in ("A", "B")],
        "item int, rater string, label string")
    r = cohens_kappa(df, "item", "rater", "label", "A", "B").first()
    assert r["po"] == 1.0 and r["pe"] == 1.0
    assert r["kappa"] is None          # pe = 1: undefined, not 0/0


def test_cohens_kappa_unshared_items_drop(spark):
    df = spark.createDataFrame(
        [(1, "A", "y"), (2, "B", "y"), (3, "A", "y"), (3, "B", "n"),
         (4, "A", None), (4, "B", "y")],
        "item int, rater string, label string")
    r = cohens_kappa(df, "item", "rater", "label", "A", "B").first()
    assert r["n_items"] == 1           # only item 3 rated by both
    assert r["n_agree"] == 0


def test_fleiss_kappa_hand_computed(spark):
    # item 1: x,x,y -> P=1/3 ; item 2: y,y,y -> P=1
    # P_bar=2/3 ; T=(2,4), pe=20/36=5/9 ; kappa=(1/9)/(4/9)=0.25
    rows = [(1, 0, "x"), (1, 1, "x"), (1, 2, "y"),
            (2, 0, "y"), (2, 1, "y"), (2, 2, "y"),
            (3, 0, "x")]               # panel size 1: excluded
    df = spark.createDataFrame(rows, "item int, rater int, label string")
    r = fleiss_kappa(df, "item", "rater", "label", 3).first()
    assert (r["n_items"], r["n_items_excluded"]) == (2, 1)
    assert r["p_bar"] == pytest.approx(2 / 3, abs=1e-6)
    assert r["p_e"] == pytest.approx(5 / 9, abs=1e-6)
    assert r["kappa"] == 0.25


# -------------------------------------------------------------- simpsons

def test_simpsons_flip_detected(spark):
    rows = ([("a", float(x), float(10 - x)) for x in range(5)]
            + [("b", float(x + 10), float(30 - x)) for x in range(5)])
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["group"]: r for r in simpsons_flips(df, "x", "y", "g").collect()}
    assert out["a"]["slope"] == -1.0 and out["b"]["slope"] == -1.0
    assert out["a"]["pooled_slope"] > 0
    assert out["a"]["flipped"] and out["b"]["flipped"]


def test_simpsons_no_flip_and_null_group(spark):
    rows = [("a", 1.0, 1.0), ("a", 2.0, 2.0),
            (None, 3.0, 3.0), (None, 4.0, 4.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["group"]: r for r in simpsons_flips(df, "x", "y", "g").collect()}
    assert set(out) == {"a", None}     # NULL group is a real slice
    assert not out["a"]["flipped"] and not out[None]["flipped"]


def test_simpsons_constant_x_slope_null(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 1.0, 2.0)], "g string, x double, y double")
    r = simpsons_flips(df, "x", "y", "g").first()
    assert r["slope"] is None and not r["flipped"]


# ------------------------------------------------------------------ rate

def test_rate_significance_symmetric_z(spark):
    rows = ([("big", i < 100) for i in range(10000)]
            + [("small", i < 5) for i in range(10)])
    df = spark.createDataFrame([(g, bool(f)) for g, f in rows],
                               "g string, f boolean")
    out = {r["group"]: r
           for r in rate_significance(df, F.col("f"), "g").collect()}
    assert out["big"]["rate"] == 0.01 and out["small"]["rate"] == 0.5
    assert out["big"]["z"] == -out["small"]["z"]
    assert out["big"]["significant"] and out["small"]["significant"]


def test_rate_significance_degenerate_pool_and_null_flag(spark):
    df = spark.createDataFrame(
        [("a", True), ("b", True), ("b", None)], "g string, f boolean")
    out = {r["group"]: r
           for r in rate_significance(df, F.col("f"), "g").collect()}
    assert out["a"]["z"] is None       # pooled rate 1.0: no variance
    assert out["b"]["n"] == 1          # NULL predicate rows excluded


# ----------------------------------------------------------- changepoint

def _step_series(spark, pre, post, split=15, days=30):
    base = dt.datetime(2026, 1, 1)
    rows, eid = [], 0
    for d in range(days):
        for i in range(pre if d < split else post):
            rows.append((eid, base + dt.timedelta(days=d, seconds=i)))
            eid += 1
    return spark.createDataFrame(rows, "id long, ts timestamp")


def test_volume_changepoint_finds_step(spark):
    r = volume_changepoint(_step_series(spark, 100, 40), "ts").first()
    assert r["n_buckets"] == 30
    assert r["change_point"] == dt.datetime(2026, 1, 15)
    assert r["pre_mean"] == 100.0 and r["post_mean"] == 40.0
    assert r["shifted"]


def test_volume_changepoint_stable_series_not_shifted(spark):
    r = volume_changepoint(_step_series(spark, 50, 50), "ts").first()
    # constant counts: sd = 0, nothing can have shifted
    assert r["shifted"] is None and r["cusum_stat"] is None


def test_volume_changepoint_single_bucket(spark):
    df = spark.createDataFrame(
        [(1, dt.datetime(2026, 1, 1))], "id long, ts timestamp")
    r = volume_changepoint(df, "ts").first()
    assert r["n_buckets"] == 1 and r["change_point"] is None


# ------------------------------------------------------------ plan shape

def _tree(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_fuzzy_values_plan_no_cartesian(spark, tmp_path):
    """The block self-join is an equi-join — never a nested-loop /
    cartesian product, whatever AQE picks for the build side."""
    src = str(tmp_path / "fz")
    spark.range(5_000).select(
        F.concat(F.lit("name"), (F.col("id") % 500).cast("string"))
         .alias("v")).write.parquet(src)
    out = fuzzy_duplicate_values(spark.read.parquet(src), "v",
                                 max_dist=1, prefix_len=4)
    plan = _tree(out)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_simpsons_row_data_shuffles_once(spark, tmp_path):
    """simpsons_flips shuffles the row data ONCE: the pooled moments
    re-aggregate the groups frame through a ReusedExchange of the same
    per-group aggregate — the executed plan must not scan the source
    twice (AQE resolves the reuse, so check the final plan)."""
    src = str(tmp_path / "sp")
    spark.range(20_000).select(
        (F.col("id") % 7).cast("string").alias("g"),
        (F.col("id") % 13).cast("double").alias("x"),
        (F.col("id") % 17).cast("double").alias("y")) \
        .write.parquet(src)
    out = simpsons_flips(spark.read.parquet(src), "x", "y", "g")
    out.collect()                       # materialize the AQE final plan
    plan = _tree(out)
    final = plan.split("+- == Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1, final
    assert "ReusedExchange" in final, final
    assert "Window" not in final, final
