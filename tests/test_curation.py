"""Whole-pipeline curation: stage precedence, accounting totals, and
agreement between ``curate`` (the lazy corpus) and ``curation_report``
(the attribution aggregate)."""

import pytest
from pyspark.sql import functions as F

from schema_validata_spark import curate, curation_report

ROWS = [
    # doc_id, text
    (1, "the quick brown fox jumps over the lazy dog and runs far away"
        " into the quiet green hills with a happy friendly old dog"),
    (2, "the quick brown fox jumps over the lazy dog and runs far away"
        " into the quiet green hills with a happy friendly old dog"),  # dup of 1
    (3, "!!! ??? ### $$$ %%%"),                                        # low quality
    (4, "this document is about the history of music and it has many"
        " good long sentences that score well on the simple heuristics"
        " because they are made of common words and few symbols"),
    (5, None),                                                          # null text
    (6, "a completely different clean document with plenty of normal"
        " words that the little quality formula is happy to accept as"
        " being above the configured threshold for keeping documents"),
]
EVAL = [(100, "about the history of music and it")]     # contaminates 4


@pytest.fixture(scope="module")
def frames(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    ev = spark.createDataFrame(EVAL, "doc_id long, text string")
    return df, ev


def test_stage_precedence_and_totals(frames):
    df, ev = frames
    rep = {r["stage"]: r["n_rows"] for r in
           curation_report(df, ev, min_quality=0.4, shingle_k=5,
                           splits={"train": 0.5, "val": 0.25,
                                   "test": 0.25}).collect()}
    assert sum(rep.values()) == df.count()       # every row accounted
    assert rep["duplicate"] == 1                  # doc 2
    assert rep["low_quality"] == 2                # docs 3 and 5 (NULL→0.0)
    assert rep["contaminated"] == 1               # doc 4
    kept = sum(v for k, v in rep.items() if k.startswith("kept:"))
    assert kept == 2                              # docs 1 and 6


def test_curate_matches_report_kept_counts(frames):
    df, ev = frames
    kwargs = dict(min_quality=0.4, shingle_k=5,
                  splits={"train": 0.5, "val": 0.25, "test": 0.25})
    cur = curate(df, ev, **kwargs)
    rep = {r["stage"]: r["n_rows"] for r in
           curation_report(df, ev, **kwargs).collect()}
    by_split = {r["split"]: r["n"] for r in
                cur.groupBy("split").agg(F.count(F.lit(1)).alias("n"))
                   .collect()}
    assert cur.count() == sum(v for k, v in rep.items()
                              if k.startswith("kept:"))
    for name, n in by_split.items():
        assert rep[f"kept:{name}"] == n
    kept_ids = {r["doc_id"] for r in cur.collect()}
    assert kept_ids == {1, 6}


def test_curate_stages_optional(frames):
    df, ev = frames
    # no quality gate, no eval set, no splits: pure dedup
    out = curate(df, min_quality=0.0, splits=None)
    assert "split" not in out.columns
    assert {r["doc_id"] for r in out.collect()} == {1, 3, 4, 5, 6}
