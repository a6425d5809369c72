"""Round-4: distributed query side for IVF×PQ (VERDICT r3 #4) — the
``query_mode="join"`` path keeps queries a DataFrame end to end (no
driver collect, no query-set in task closures); ``"closure"`` remains
the interactive small-batch form."""

import pytest
from pyspark.sql import DataFrame, functions as F

from schema_validata_spark.operators.similarity import (
    ivf_pq_topk, train_ivf_centroids, train_pq_codebooks)


def _norm_emb(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v = F.col("embedding").cast("array<double>")
    n = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return emb.select("vec_id",
                      F.transform(v, lambda x: x / n).alias("embedding"))


def test_join_and_closure_modes_agree(spark, sf_dir):
    """Same trained model, full probe, beam ≥ corpus: both query modes
    ADC-scan the same candidate set and exact-rerank, so the top-k
    sets must be IDENTICAL (scores come from the same cosine expr)."""
    nemb = _norm_emb(spark, sf_dir)
    q = nemb.where("vec_id < 8")
    cents = train_ivf_centroids(nemb, n_clusters=4, n_iters=3)
    books = train_pq_codebooks(nemb, m=8, k=16, n_iters=3)
    kw = dict(k=5, n_clusters=4, n_probe=4, batch_k=1000,
              centroids=cents, codebooks=books)
    a = {(r.query_id, r.neighbor_id, r.cos)
         for r in ivf_pq_topk(nemb, q, query_mode="join",
                              **kw).collect()}
    b = {(r.query_id, r.neighbor_id, r.cos)
         for r in ivf_pq_topk(nemb, q, query_mode="closure",
                              **kw).collect()}
    assert a == b
    assert len({(x[0]) for x in a}) == 8


def test_join_mode_never_collects_queries(spark, sf_dir, monkeypatch):
    """The scale guarantee: with a pre-trained model, building AND
    executing the join-mode plan performs ZERO driver-side collects of
    any DataFrame — the query set reaches tasks via the bucket join,
    not a closure (closure mode collects once by design)."""
    nemb = _norm_emb(spark, sf_dir)
    q = nemb.where("vec_id < 4")
    cents = train_ivf_centroids(nemb, n_clusters=4, n_iters=2)
    books = train_pq_codebooks(nemb, m=8, k=16, n_iters=2)
    calls = []
    cls = type(nemb)          # the concrete (classic) DataFrame class
    orig = cls.collect

    def spy(self):
        calls.append(1)
        return orig(self)

    monkeypatch.setattr(cls, "collect", spy)
    df = ivf_pq_topk(nemb, q, k=3, n_clusters=4, n_probe=2,
                     centroids=cents, codebooks=books,
                     query_mode="join")
    assert not calls, "join mode must not collect while planning"
    assert df.count() > 0
    assert not calls, "join mode must not collect while executing"
    ivf_pq_topk(nemb, q, k=3, n_clusters=4, n_probe=2,
                centroids=cents, codebooks=books, query_mode="closure")
    assert len(calls) == 1, "closure mode collects the query set once"


def test_join_mode_recall_floor(spark, sf_dir):
    """The round-3 recall floor holds on the new default path."""
    from schema_validata_spark.operators.similarity import brute_force_topk
    nemb = _norm_emb(spark, sf_dir)
    q = nemb.where("vec_id < 10")
    bf = {(r.query_id, r.neighbor_id)
          for r in brute_force_topk(nemb, q, k=5).collect()}
    got = {(r.query_id, r.neighbor_id)
           for r in ivf_pq_topk(nemb, q, k=5, n_clusters=4, n_probe=4,
                                m=8, pq_k=16, batch_k=100,
                                query_mode="join").collect()}
    assert len(got & bf) / len(bf) >= 0.8


def test_bad_query_mode_rejected(spark, sf_dir):
    nemb = _norm_emb(spark, sf_dir)
    with pytest.raises(ValueError, match="query_mode"):
        ivf_pq_topk(nemb, nemb.limit(1), n_iters=1,
                    query_mode="nonsense")
