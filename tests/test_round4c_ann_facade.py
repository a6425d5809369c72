"""Round-4: ann_topk auto-routing façade (VERDICT r3 #3) — size-based
routing, explicit overrides, and the audited gate on the raw
hyperplane path."""

import pytest
from pyspark.sql import functions as F

from schema_validata_spark.operators.similarity import (
    ann_topk, brute_force_topk)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_auto_small_routes_to_brute(emb):
    q = emb.where("vec_id < 5")
    got = {(r.query_id, r.neighbor_id, r.cos)
           for r in ann_topk(emb, q, k=4).collect()}
    exact = {(r.query_id, r.neighbor_id, r.cos)
             for r in brute_force_topk(emb, q, k=4).collect()}
    assert got == exact


def test_auto_mid_routes_to_ivf(emb):
    """corpus_count above small_corpus forces the trained-IVF route
    without a counting job; full probe == exact."""
    q = emb.where("vec_id < 5")
    got = {(r.query_id, r.neighbor_id, r.cos)
           for r in ann_topk(emb, q, k=4, corpus_count=200_000,
                             n_clusters=4, n_probe=4).collect()}
    exact = {(r.query_id, r.neighbor_id, r.cos)
             for r in brute_force_topk(emb, q, k=4).collect()}
    assert got == exact


def test_auto_huge_routes_to_ivf_pq(emb):
    q = emb.where("vec_id < 5")
    got = ann_topk(emb, q, k=4, corpus_count=100_000_000,
                   n_clusters=4, n_probe=4, batch_k=1000).collect()
    assert {r.query_id for r in got} == set(range(5))
    assert all(len([r for r in got if r.query_id == i]) == 4
               for i in range(5))


def test_lsh_gate_raises_below_floor(emb):
    """An absurd floor makes the audit fail → ValueError with the
    measured recall; force_lsh=True downgrades to a warning and
    returns results."""
    q = emb.where("vec_id < 5")
    with pytest.raises(ValueError, match="recall"):
        ann_topk(emb, q, k=4, method="lsh", recall_floor=1.01,
                 n_planes=10, n_tables=4)
    out = ann_topk(emb, q, k=4, method="lsh", recall_floor=1.01,
                   force_lsh=True, n_planes=10, n_tables=4)
    assert out.columns == ["query_id", "neighbor_id", "cos"]


def test_lsh_gate_passes_at_zero_floor(emb):
    q = emb.where("vec_id < 3")
    out = ann_topk(emb, q, k=4, method="lsh", recall_floor=0.0,
                   n_planes=6, n_tables=8)
    assert out.count() >= 0      # executes; recall is data-dependent


def test_bad_method_rejected(emb):
    with pytest.raises(ValueError, match="method"):
        ann_topk(emb, emb.limit(1), method="faiss")


def test_auto_big_query_batch_avoids_broadcast_routes(emb):
    """A query batch over max_brute_queries must route to the
    join-mode IVF×PQ even on a small corpus — brute and ivf both
    broadcast the query side."""
    q = emb.where("vec_id < 5")
    got = ann_topk(emb, q, k=3, query_count=10_000_000,
                   n_clusters=4, n_probe=4, batch_k=1000).collect()
    assert {r.query_id for r in got} == set(range(5))
