"""Winnowing fingerprints + partial-overlap detection
(schema_validata_spark/operators/winnow.py).

Covers the SIGMOD'03 guarantee (a shared substring of >= window+k-1
chars yields a shared fingerprint), position robustness (the same block
at different offsets still matches), the boilerplate fp cap with
telemetry, hasher modes, and NULL/short-text edges.
"""

import pytest
from pyspark.sql import functions as F

from schema_validata_spark.operators.winnow import (overlap_candidates,
                                                    overlap_share,
                                                    winnow_fingerprints)

BLOCK = "an identical quoted paragraph long enough to winnow reliably"


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["id", "text"])


def test_guarantee_shared_substring_yields_shared_fp(spark):
    # the block sits at DIFFERENT offsets inside otherwise-unrelated
    # docs — whole-doc near-dup would miss this; winnowing must not
    rows = [
        (1, "zebra quartz vexing jumps " + BLOCK + " umbra lynx"),
        (2, BLOCK + " completely different trailing content here okay"),
        (3, "nothing in common with anybody else at all whatsoever"),
    ]
    pairs = overlap_candidates(_docs(spark, rows), "text", "id",
                               k=8, window=4, min_shared=2,
                               max_docs_per_fp=None).collect()
    matched = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in matched
    assert all(3 not in p for p in matched)


def test_identical_docs_share_all_fingerprints(spark):
    rows = [(1, BLOCK), (2, BLOCK)]
    fps = winnow_fingerprints(_docs(spark, rows), "text", "id")
    a = {r.fp for r in fps.where(F.col("id") == 1).collect()}
    b = {r.fp for r in fps.where(F.col("id") == 2).collect()}
    assert a and a == b


def test_null_empty_short_text(spark):
    rows = [(1, None), (2, ""), (3, "   "), (4, "ab")]
    fps = winnow_fingerprints(_docs(spark, rows), "text", "id").collect()
    by_id = {}
    for r in fps:
        by_id.setdefault(r.id, []).append(r.fp)
    assert 1 not in by_id and 2 not in by_id and 3 not in by_id
    # a doc shorter than k still gets exactly one fingerprint
    assert len(by_id[4]) == 1


def test_normalization_case_and_whitespace(spark):
    rows = [(1, "Hello   World Example Text"),
            (2, "hello world\texample\n text")]
    fps = winnow_fingerprints(_docs(spark, rows), "text", "id")
    a = {r.fp for r in fps.where(F.col("id") == 1).collect()}
    b = {r.fp for r in fps.where(F.col("id") == 2).collect()}
    assert a == b


def test_md5_and_xxhash_modes_agree_on_matching(spark):
    rows = [(1, "prefix one " + BLOCK), (2, BLOCK + " suffix two"),
            (3, "unrelated content with zero overlap potential here")]
    for hasher in ("xxhash64", "md5"):
        pairs = overlap_candidates(_docs(spark, rows), "text", "id",
                                   min_shared=2, max_docs_per_fp=None,
                                   hasher=hasher).collect()
        assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}
    with pytest.raises(ValueError):
        winnow_fingerprints(_docs(spark, rows), "text", "id",
                            hasher="sha9000").collect()


def test_boilerplate_cap_drops_mega_fp_with_telemetry(spark):
    # 30 docs all containing the block: with a cap of 10 docs/fp the
    # block's fingerprints are dropped (reported via telemetry), so no
    # pair reaches min_shared
    import hashlib
    # md5-hex leads: no two docs share an 11-char substring outside
    # the planted block, so the ONLY candidate source is the block
    rows = [(i, hashlib.md5(str(i).encode()).hexdigest() + " " + BLOCK)
            for i in range(30)]
    tel = {}
    pairs = overlap_candidates(_docs(spark, rows), "text", "id",
                               min_shared=2, max_docs_per_fp=10,
                               telemetry_out=tel).collect()
    assert pairs == []
    assert tel["capped_buckets"] > 0 and tel["capped_rows"] >= 30


def test_overlap_share_bounds_and_planted_coverage(spark):
    rows = [
        (1, BLOCK),                                       # fully recycled
        (2, BLOCK),
        (3, "entirely original writing nothing shared anywhere else"),
    ]
    out = {r.id: r for r in overlap_share(_docs(spark, rows), "text",
                                          "id",
                                          max_docs_per_fp=None).collect()}
    assert out[1].overlap_share == 1.0 and out[2].overlap_share == 1.0
    assert out[3].overlap_share == 0.0
    for r in out.values():
        assert 0.0 <= r.overlap_share <= 1.0
        assert r.shared_fps <= r.n_fps


def test_partition_independence(spark):
    rows = [(i, f"document number {i} body text with filler words plus "
                + (BLOCK if i % 3 == 0 else f"tail {i}"))
            for i in range(12)]
    df1 = _docs(spark, rows).repartition(1)
    df8 = _docs(spark, rows).repartition(8)
    p1 = {(r.id_a, r.id_b, r.shared_fps)
          for r in overlap_candidates(df1, "text", "id", min_shared=2,
                                      max_docs_per_fp=None).collect()}
    p8 = {(r.id_a, r.id_b, r.shared_fps)
          for r in overlap_candidates(df8, "text", "id", min_shared=2,
                                      max_docs_per_fp=None).collect()}
    assert p1 == p8 and p1


def test_no_text_in_exchange_plan(spark):
    # the only shuffled columns are (id, fp): the text column must be
    # pruned before any Exchange
    rows = [(i, f"some document body {i} with words") for i in range(6)]
    df = _docs(spark, rows)
    plan = overlap_candidates(df, "text", "id", max_docs_per_fp=None) \
        ._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line


# --- property: the SIGMOD'03 winnowing guarantee ---------------------------

from hypothesis import HealthCheck, given, settings, strategies as st

_WORD = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1,
                max_size=6)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lead_a=st.lists(_WORD, min_size=0, max_size=8),
       lead_b=st.lists(_WORD, min_size=0, max_size=8),
       shared=st.lists(_WORD, min_size=4, max_size=10),
       k=st.integers(min_value=4, max_value=10),
       w=st.integers(min_value=2, max_value=6))
def test_property_shared_block_always_yields_shared_fp(spark, lead_a,
                                                       lead_b, shared,
                                                       k, w):
    """Any substring match of >= w+k-1 normalized chars must produce at
    least one identical fingerprint in both docs — for EVERY (k, w) and
    arbitrary surrounding context (the winnowing guarantee)."""
    block = " ".join(shared)
    if len(block) < w + k - 1:
        return                      # block too short for the guarantee
    rows = [(1, (" ".join(lead_a) + " " + block).strip()),
            (2, (" ".join(lead_b) + " " + block).strip())]
    fps = winnow_fingerprints(_docs(spark, rows), "text", "id",
                              k=k, window=w)
    a = {r.fp for r in fps.where(F.col("id") == 1).collect()}
    b = {r.fp for r in fps.where(F.col("id") == 2).collect()}
    assert a & b, (rows, k, w)
