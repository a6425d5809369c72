"""Round-3 curation operators: quality-aware near-dup resolution,
exact-n per-group sampling, per-slice embedding dispersion."""

import pytest
from pyspark.sql import Row


# ------------------------------------------------------------ dedup_keep_best

def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, score=s) for i, s in rows],
        "doc_id int, score int")


def _pairs(spark, pairs):
    return spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in pairs],
        "id_a int, id_b int")


def test_keep_best_keeps_highest_score_per_cluster(spark):
    from schema_validata_spark.operators.dedup import dedup_keep_best
    df = _docs(spark, [(1, 10), (2, 30), (3, 20), (4, 5), (9, 99)])
    pairs = _pairs(spark, [(1, 2), (2, 3)])  # cluster {1,2,3}
    kept = sorted(r["doc_id"] for r in
                  dedup_keep_best(df, pairs, "doc_id", "score").collect())
    assert kept == [2, 4, 9]  # 2 wins its cluster; 4, 9 unpaired


def test_keep_best_tie_breaks_to_min_id_and_null_loses(spark):
    from schema_validata_spark.operators.dedup import dedup_keep_best
    df = spark.createDataFrame(
        [Row(doc_id=1, score=7), Row(doc_id=2, score=7),
         Row(doc_id=3, score=None)],
        "doc_id int, score int")
    pairs = _pairs(spark, [(1, 2), (2, 3)])
    kept = sorted(r["doc_id"] for r in
                  dedup_keep_best(df, pairs, "doc_id", "score").collect())
    assert kept == [1]  # tie 1v2 -> min id; NULL score never wins


def test_keep_best_matches_canonical_when_score_is_neg_id(spark):
    # score = -id makes "best" == "min id" == dedup_keep_canonical
    from schema_validata_spark.operators.dedup import (
        dedup_keep_best, dedup_keep_canonical)
    import pyspark.sql.functions as F
    df = _docs(spark, [(i, 0) for i in range(1, 11)]) \
        .withColumn("neg", -F.col("doc_id"))
    pairs = _pairs(spark, [(1, 2), (3, 4), (4, 5), (7, 8)])
    a = sorted(r["doc_id"] for r in
               dedup_keep_best(df, pairs, "doc_id", "neg").collect())
    b = sorted(r["doc_id"] for r in
               dedup_keep_canonical(df, pairs, "doc_id").collect())
    assert a == b


# -------------------------------------------------------- sample_n_per_group

def test_sample_n_per_group_exact_n_and_small_groups_whole(spark):
    from schema_validata_spark.functions.sampling import sample_n_per_group
    rows = [Row(k=f"k{i}", g="big") for i in range(50)] \
        + [Row(k=f"s{i}", g="small") for i in range(3)]
    out = sample_n_per_group(spark.createDataFrame(rows), "k", "g", 5)
    counts = {r["g"]: r["n"] for r in
              out.groupBy("g").agg(
                  __import__("pyspark").sql.functions.count("*").alias("n")
              ).collect()}
    assert counts == {"big": 5, "small": 3}


def test_sample_n_per_group_partitioning_invariant(spark):
    from schema_validata_spark.functions.sampling import sample_n_per_group
    rows = [Row(k=f"k{i}", g=f"g{i % 4}") for i in range(200)]
    df = spark.createDataFrame(rows)
    a = sorted((r["g"], r["k"]) for r in
               sample_n_per_group(df, "k", "g", 7).collect())
    b = sorted((r["g"], r["k"]) for r in
               sample_n_per_group(df.repartition(13), "k", "g", 7).collect())
    assert a == b and len(a) == 28


def test_sample_n_per_group_null_group_sampled_not_dropped(spark):
    from schema_validata_spark.functions.sampling import sample_n_per_group
    rows = [Row(k=f"k{i}", g=None) for i in range(20)] \
        + [Row(k=f"x{i}", g="a") for i in range(20)]
    df = spark.createDataFrame(rows, "k string, g string")
    out = sample_n_per_group(df, "k", "g", 4).collect()
    by_g = {}
    for r in out:
        by_g[r["g"]] = by_g.get(r["g"], 0) + 1
    assert by_g == {None: 4, "a": 4}


def test_sample_n_per_group_salt_changes_pick(spark):
    from schema_validata_spark.functions.sampling import sample_n_per_group
    rows = [Row(k=f"k{i}", g="g") for i in range(100)]
    df = spark.createDataFrame(rows)
    a = {r["k"] for r in sample_n_per_group(df, "k", "g", 10).collect()}
    b = {r["k"] for r in
         sample_n_per_group(df, "k", "g", 10, salt="v2").collect()}
    assert len(a) == len(b) == 10 and a != b


# ------------------------------------------------------ embedding_dispersion

def test_dispersion_tight_vs_spread_groups(spark):
    from schema_validata_spark.operators.similarity import (
        embedding_dispersion)
    rows = (
        # tight: identical unit vectors -> cosine 1 to centroid
        [Row(vec_id=i, label="tight", embedding=[1.0, 0.0]) for i in range(4)]
        # spread: orthogonal pair -> centroid (0.5,0.5), cos = ~0.7071
        + [Row(vec_id=10, label="spread", embedding=[1.0, 0.0]),
           Row(vec_id=11, label="spread", embedding=[0.0, 1.0])])
    out = {r["group"]: r for r in
           embedding_dispersion(spark.createDataFrame(rows), "label",
                                low_cos=0.9).collect()}
    assert out["tight"]["mean_cos"] == pytest.approx(1.0)
    assert out["tight"]["n_low"] == 0
    assert out["spread"]["mean_cos"] == pytest.approx(0.707107, abs=1e-4)
    assert out["spread"]["n_low"] == 2
    assert out["tight"]["n_vectors"] == 4


def test_dispersion_null_vectors_excluded_null_group_kept(spark):
    from schema_validata_spark.operators.similarity import (
        embedding_dispersion)
    rows = [Row(vec_id=1, label=None, embedding=[1.0, 0.0]),
            Row(vec_id=2, label=None, embedding=[1.0, 0.0]),
            Row(vec_id=3, label="a", embedding=None)]
    df = spark.createDataFrame(
        rows, "vec_id int, label string, embedding array<double>")
    out = {r["group"]: r["n_vectors"]
           for r in embedding_dispersion(df, "label").collect()}
    assert out == {None: 2}  # NULL group real; NULL vector excluded
