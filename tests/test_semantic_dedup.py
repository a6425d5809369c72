"""SemDeDup-style semantic dedup (operators/dedup.py:
semantic_near_duplicates / semantic_dedup — Abbas et al. 2023).

Approximate by design (cross-cluster pairs are missed), so the checks
are: no false positives (exact cosine verify), recall vs the exact
all-pairs baseline on the testdata embeddings, determinism, planted
tight clusters recovered, cap telemetry, and centroid reuse.
"""

import pytest
from pyspark.sql import functions as F

from schema_validata_spark.operators.dedup import (semantic_dedup,
                                                   semantic_near_duplicates)


def _planted(spark):
    """3 tight semantic clusters (tiny jitter on one dim) + 3 isolated
    vectors; every within-cluster pair has cos > 0.999."""
    import itertools
    base = {
        10: [1.0, 0.0, 0.0, 0.0],
        20: [0.0, 1.0, 0.0, 0.0],
        30: [0.0, 0.0, 1.0, 0.0],
    }
    rows = []
    for b, (start, v) in enumerate(base.items()):
        for j in range(4):
            jit = [x + (0.001 * j if i == 3 else 0.0)
                   for i, x in enumerate(v)]
            rows.append((start + j, jit))
    iso = [[0.5, 0.5, 0.5, 0.5], [-1.0, 0.2, 0.3, 0.1],
           [0.2, -0.9, 0.1, 0.4]]
    for n, v in enumerate(iso):
        rows.append((900 + n, v))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_planted_clusters_recovered(spark):
    pairs = semantic_near_duplicates(_planted(spark), threshold=0.999,
                                     n_clusters=4, n_iters=4).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    # every within-cluster pair, no cross-cluster / isolated pair
    want = set()
    for start in (10, 20, 30):
        ids = [start + j for j in range(4)]
        want |= {(a, b) for a in ids for b in ids if a < b}
    assert got == want
    assert all(r.cos >= 0.999 for r in pairs)


def test_no_false_positives_and_recall_vs_exact(spark, sf_dir):
    from schema_validata_spark.operators.dedup import \
        embedding_near_duplicates
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {(r.id_a, r.id_b): r.cos for r in
             embedding_near_duplicates(emb, threshold=0.45).collect()}
    sem = {(r.id_a, r.id_b): r.cos for r in
           semantic_near_duplicates(emb, threshold=0.45, n_clusters=4,
                                    n_iters=4).collect()}
    assert set(sem) <= set(exact)          # exact verify => no FPs
    assert len(sem) / max(1, len(exact)) >= 0.5, (len(sem), len(exact))
    for k, v in sem.items():
        assert v == exact[k]               # identical cos on found pairs


def test_deterministic_across_partitionings(spark):
    df = _planted(spark)
    a = {(r.id_a, r.id_b, r.cos) for r in semantic_near_duplicates(
        df.repartition(1), threshold=0.999, n_clusters=4).collect()}
    b = {(r.id_a, r.id_b, r.cos) for r in semantic_near_duplicates(
        df.repartition(7), threshold=0.999, n_clusters=4).collect()}
    assert a == b and a


def test_semantic_dedup_keeps_canonicals(spark):
    out = semantic_dedup(_planted(spark), threshold=0.999,
                         n_clusters=4, n_iters=4)
    kept = sorted(r.vec_id for r in out.collect())
    # min id per planted cluster survives, isolated vectors untouched
    assert kept == [10, 20, 30, 900, 901, 902]


def test_centroid_reuse_skips_training(spark):
    from schema_validata_spark.operators.similarity import \
        train_ivf_centroids
    df = _planted(spark)
    e = df.select("vec_id",
                  F.col("embedding").cast("array<double>").alias("v"))
    cent = train_ivf_centroids(e, "v", n_clusters=4, n_iters=4)
    with_reuse = {(r.id_a, r.id_b) for r in semantic_near_duplicates(
        df, threshold=0.999, centroids=cent).collect()}
    fresh = {(r.id_a, r.id_b) for r in semantic_near_duplicates(
        df, threshold=0.999, n_clusters=4, n_iters=4).collect()}
    assert with_reuse == fresh


def test_mega_cluster_cap_telemetry(spark):
    # 50 identical vectors = one degenerate cluster; cap of 10 drops it
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(50)] + \
           [(100 + j, [0.0, 1.0, 0.0, float(j) * 0.001])
            for j in range(3)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    tel = {}
    pairs = semantic_near_duplicates(df, threshold=0.999, n_clusters=2,
                                     n_iters=3, max_bucket=10,
                                     telemetry_out=tel).collect()
    assert tel["capped_buckets"] >= 1 and tel["capped_rows"] >= 50
    got_ids = {i for r in pairs for i in (r.id_a, r.id_b)}
    assert got_ids <= {100, 101, 102}      # mega-cluster dropped, small kept


def test_null_vectors_pass_through_dedup(spark):
    rows = [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, None)]
    df = spark.createDataFrame(rows, "vec_id: bigint, embedding: array<double>")
    out = sorted(r.vec_id for r in semantic_dedup(
        df, threshold=0.999, n_clusters=1, n_iters=2).collect())
    assert out == [1, 3]                   # 2 deduped; NULL row survives
