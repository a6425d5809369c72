"""Round-3 operators: snapshot diff, filter funnel, turn echo,
winsorized stats, equi-depth histogram."""

import pytest
from pyspark.sql import Row, functions as F


# ------------------------------------------------------------ snapshot_diff

def _snap_frames(spark):
    old = spark.createDataFrame(
        [Row(conv_id="a", turn_idx=1, text="hello", tool=None),
         Row(conv_id="a", turn_idx=2, text="world", tool="calc"),
         Row(conv_id="b", turn_idx=1, text="gone", tool=None),
         Row(conv_id="c", turn_idx=1, text="same", tool="x")])
    new = spark.createDataFrame(
        [Row(conv_id="a", turn_idx=1, text="hello", tool="calc"),  # tool chg
         Row(conv_id="a", turn_idx=2, text="WORLD", tool="calc"),  # text chg
         Row(conv_id="c", turn_idx=1, text="same", tool="x"),      # same
         Row(conv_id="d", turn_idx=1, text="new", tool=None)])     # added
    return old, new


def test_snapshot_diff_classification(spark):
    from schema_validata_spark.operators.snapshot import snapshot_diff
    old, new = _snap_frames(spark)
    out = {(r["conv_id"], r["turn_idx"]): r for r in
           snapshot_diff(old, new, ["conv_id", "turn_idx"]).collect()}
    assert out[("a", 1)]["change"] == "changed"
    assert out[("a", 1)]["changed_cols"] == "tool"
    assert out[("a", 2)]["changed_cols"] == "text"
    assert out[("b", 1)]["change"] == "removed"
    assert out[("b", 1)]["changed_cols"] is None
    assert out[("d", 1)]["change"] == "added"
    assert ("c", 1) not in out            # unchanged rows emit nothing
    assert len(out) == 4


def test_snapshot_diff_null_vs_value_and_null_null(spark):
    from schema_validata_spark.operators.snapshot import snapshot_diff
    old = spark.createDataFrame(
        [Row(k=1, v=None), Row(k=2, v=None)], "k int, v string")
    new = spark.createDataFrame(
        [Row(k=1, v="x"), Row(k=2, v=None)], "k int, v string")
    out = {r["k"]: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out[1]["change"] == "changed"        # NULL -> value is a change
    assert 2 not in out                         # NULL == NULL is unchanged


def test_snapshot_diff_summary_counts(spark):
    from schema_validata_spark.operators.snapshot import (
        snapshot_diff_summary)
    old, new = _snap_frames(spark)
    out = {r["change"]: r["n"] for r in
           snapshot_diff_summary(old, new,
                                 ["conv_id", "turn_idx"]).collect()}
    assert out == {"added": 1, "removed": 1, "changed": 2, "unchanged": 1}


def test_snapshot_diff_missing_column_raises(spark):
    from schema_validata_spark.operators.snapshot import snapshot_diff
    old, new = _snap_frames(spark)
    with pytest.raises(ValueError, match="absent"):
        snapshot_diff(old, new, ["conv_id"], compare_cols=["nope"])


# ------------------------------------------------------------ filter_funnel

def test_filter_funnel_counts_and_order(spark):
    from schema_validata_spark.operators.selection import filter_funnel
    df = spark.createDataFrame(
        [Row(x=i, s="aa" * (i % 4)) for i in range(100)])
    out = filter_funnel(df, [
        ("nonempty", F.length("s") > 0),        # 75 pass
        ("x_even", F.col("x") % 2 == 0),        # 50 alone
        ("x_small", F.col("x") < 50),           # 50 alone
    ]).collect()
    assert [r["stage"] for r in out] == ["nonempty", "x_even", "x_small"]
    assert [r["stage_idx"] for r in out] == [1, 2, 3]
    assert [r["n_pass"] for r in out] == [75, 50, 50]
    # cumulative: nonempty -> 75; & even -> x%4 == 2 -> 25; & <50 ->
    # {2,6,...,46} -> 12
    assert [r["n_cum"] for r in out] == [75, 25, 12]
    assert out[0]["share_cum"] == 0.75


def test_filter_funnel_null_predicate_and_empty(spark):
    from schema_validata_spark.operators.selection import filter_funnel
    df = spark.createDataFrame(
        [Row(v=1.0), Row(v=None), Row(v=3.0)], "v double")
    out = filter_funnel(df, [("v_big", F.col("v") > 2)]).collect()
    assert out[0]["n_pass"] == 1                # NULL predicate = not pass
    empty = df.where(F.lit(False))
    r = filter_funnel(empty, [("any", F.lit(True))]).collect()[0]
    assert r["n_cum"] == 0 and r["share_cum"] is None
    with pytest.raises(ValueError):
        filter_funnel(df, [])


# ---------------------------------------------------------------- turn_echo

def test_turn_echo_scores(spark):
    from schema_validata_spark.operators.sequence import turn_echo
    df = spark.createDataFrame([
        Row(conv="c1", i=1, text="the quick brown fox"),
        Row(conv="c1", i=2, text="The QUICK brown fox!"),   # echo = 1.0
        Row(conv="c1", i=3, text="something else entirely"),
        Row(conv="c2", i=1, text="alpha beta"),
        Row(conv="c2", i=2, text="beta gamma"),             # 1/3
    ])
    out = {(r["conv"], r["i"]): r["echo_jaccard"] for r in
           turn_echo(df, "conv", ["i"], "text").collect()}
    assert out[("c1", 2)] == 1.0
    assert out[("c1", 3)] == 0.0
    assert abs(out[("c2", 2)] - 1 / 3) < 1e-6
    assert ("c1", 1) not in out and ("c2", 1) not in out    # openers


def test_turn_echo_empty_and_min_tokens(spark):
    from schema_validata_spark.operators.sequence import turn_echo
    df = spark.createDataFrame([
        Row(conv="c", i=1, text="..."),
        Row(conv="c", i=2, text="!!!"),       # both tokenless -> union 0
        Row(conv="c", i=3, text="word"),
    ])
    out = {r["i"]: r["echo_jaccard"] for r in
           turn_echo(df, "conv", ["i"], "text", min_tokens=0).collect()}
    assert out[2] == 0.0                      # 0/0 reported as no echo
    filtered = turn_echo(df, "conv", ["i"], "text", min_tokens=1).collect()
    assert [r["i"] for r in filtered] == [3]  # tokenless turns drop out


# ---------------------------------------------------------- winsorized_stats

def test_winsorized_stats_tames_outlier(spark):
    from schema_validata_spark.operators.statqa import winsorized_stats
    vals = [float(i) for i in range(1, 100)] + [100000.0]
    df = spark.createDataFrame([Row(v=v) for v in vals])
    r = winsorized_stats(df, "v", 0.01, 0.99).collect()[0]
    assert r["n"] == 100
    assert r["std_wins"] < r["std_raw"] / 10    # outlier mass removed
    # interpolated p99 sits between 99 and the outlier (~1098), so the
    # winsorized mean lands near 60 while the raw mean is ~1050
    assert r["mean_wins"] < 100 < r["mean_raw"]
    # clamp bounds are the exact interpolated percentiles
    assert r["p_lo"] == pytest.approx(1.99, abs=1e-6)


def test_winsorized_stats_nulls_excluded(spark):
    from schema_validata_spark.operators.statqa import winsorized_stats
    df = spark.createDataFrame(
        [Row(v=1.0), Row(v=None), Row(v=3.0)], "v double")
    r = winsorized_stats(df, "v", 0.0, 1.0).collect()[0]
    assert r["n"] == 2
    assert r["mean_raw"] == r["mean_wins"] == 2.0


# -------------------------------------------------------- equidepth_histogram

def test_equidepth_histogram_uniform(spark):
    from schema_validata_spark.operators.statqa import equidepth_histogram
    df = spark.createDataFrame([Row(v=float(i)) for i in range(1, 101)])
    out = equidepth_histogram(df, "v", bins=4).collect()
    assert [r["bin"] for r in out] == [1, 2, 3, 4]
    assert [r["n"] for r in out] == [25, 25, 25, 25]
    assert out[0]["lo"] == 1.0 and out[-1]["hi"] == 100.0
    assert abs(sum(r["share"] for r in out) - 1.0) < 1e-6


def test_equidepth_histogram_point_mass_and_min(spark):
    from schema_validata_spark.operators.statqa import equidepth_histogram
    # 80% of mass at a single value -> interior duplicate edges
    rows = [Row(v=5.0)] * 80 + [Row(v=float(i)) for i in range(10)] \
        + [Row(v=float(i)) for i in range(90, 100)]
    df = spark.createDataFrame(rows)
    out = equidepth_histogram(df, "v", bins=5).collect()
    assert sum(r["n"] for r in out) == 100
    by_bin = {r["bin"]: r for r in out}
    # the exact minimum lands in bin 1, not below it
    assert min(by_bin) == 1
    # point-mass bins collapse into the FIRST bin sharing the edge
    mass_bin = max(by_bin.values(), key=lambda r: r["n"])
    assert mass_bin["n"] >= 80
    with pytest.raises(ValueError):
        equidepth_histogram(df, "v", bins=0)


def test_equidepth_histogram_empty_input(spark):
    from schema_validata_spark.operators.statqa import equidepth_histogram
    df = spark.createDataFrame([], "v double")
    assert equidepth_histogram(df, "v", bins=3).count() == 0
