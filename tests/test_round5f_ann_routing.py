"""Round-5 (VERDICT r4 #7): ann_topk routing derives its row caps
from the MEASURED vector width (broadcast/raw-scan byte budgets), and
the recall gate extends to the IVF route (opt-in via audit_routes).
"""

import pytest

from schema_validata_spark.operators.similarity import (
    _vec_row_bytes, ann_topk, brute_force_topk)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_vec_row_bytes_measures_dim_and_width(emb):
    dim, rb = _vec_row_bytes(emb, "embedding")
    assert dim > 0
    assert rb == dim * 4 + 24        # parquet float32 embeddings
    empty = emb.where("vec_id < 0")
    assert _vec_row_bytes(empty, "embedding") == (0, 1024)


def test_byte_budget_tightens_query_cap(emb):
    """A tiny broadcast budget pushes a small-corpus query batch OFF
    the brute/ivf broadcast routes: the result must still be produced
    (ivf_pq join mode), proving the cap is byte-derived, not the
    constant row cap."""
    q = emb.where("vec_id < 5")
    out = ann_topk(emb, q, k=4, broadcast_budget_bytes=64,
                   n_clusters=4, n_probe=4, batch_k=1000)
    got = out.collect()
    assert {r.query_id for r in got} == set(range(5))
    assert all(len([r for r in got if r.query_id == i]) == 4
               for i in range(5))


def test_raw_budget_routes_wide_corpora_to_pq(emb):
    """raw_bytes_budget below the corpus's raw vector bytes forces the
    PQ route even under the huge_corpus row cap (the 3072-dim-float
    case the constant threshold mis-routed)."""
    q = emb.where("vec_id < 3")
    # corpus_count chosen under huge_corpus but over the byte budget:
    # 1M rows x row_bytes >> 1KB budget -> ivf is not allowed
    out = ann_topk(emb, q, k=4, corpus_count=1_000_000,
                   raw_bytes_budget=1 << 10,
                   n_clusters=4, n_probe=4, batch_k=1000)
    assert {r.query_id for r in out.collect()} == {0, 1, 2}


def test_ivf_recall_gate_raises_when_probe_starved(emb):
    """audit_routes=('lsh','ivf') arms the IVF gate: n_probe=1 of 4
    clusters misses cross-cluster neighbors, so a 1.0 floor raises
    with the measured recall and the n_probe remedy named."""
    q = emb.where("vec_id < 8")
    with pytest.raises(ValueError, match="n_probe"):
        ann_topk(emb, q, k=8, method="ivf",
                 audit_routes=("lsh", "ivf"), recall_floor=1.0,
                 n_clusters=4, n_probe=1)


def test_ivf_recall_gate_passes_at_full_probe(emb):
    """n_probe == n_clusters is exact — recall 1.0 passes a 1.0 floor
    and the results equal brute force."""
    q = emb.where("vec_id < 5")
    got = {(r.query_id, r.neighbor_id, r.cos)
           for r in ann_topk(emb, q, k=4, method="ivf",
                             audit_routes=("lsh", "ivf"),
                             recall_floor=1.0,
                             n_clusters=4, n_probe=4).collect()}
    exact = {(r.query_id, r.neighbor_id, r.cos)
             for r in brute_force_topk(emb, q, k=4).collect()}
    assert got == exact


def test_ivf_gate_off_by_default(emb):
    """Default audit_routes=('lsh',) leaves the IVF route un-audited —
    no extra brute scan on the auto path (behavioral back-compat)."""
    q = emb.where("vec_id < 5")
    out = ann_topk(emb, q, k=4, method="ivf", recall_floor=1.0,
                   n_clusters=4, n_probe=1)
    assert out.columns == ["query_id", "neighbor_id", "cos"]
