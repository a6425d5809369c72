"""Round-4: streaming decontamination twin (VERDICT r3 #10) — the
bloom-bitmap prescreen as a stateless streaming filter; memory-sink
stream must equal batch decontaminate on the same rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schema_validata_spark.operators.decontam import decontaminate
from schema_validata_spark.streaming.decontam_stream import (
    build_bloom_filter, stream_decontaminate)


@pytest.fixture(scope="module")
def corpus(spark):
    eval_rows = [
        (900, "the secret benchmark question about quantum turtles and "
              "their remarkable swimming speed in cold water"),
        (901, "another held out evaluation prompt concerning ancient "
              "roman aqueduct engineering and gravity flow design"),
    ]
    train_rows = [
        (1, "a perfectly clean training document about cooking pasta "
            "with garlic butter and fresh basil leaves"),
        (2, "the secret benchmark question about quantum turtles and "
            "their remarkable swimming speed in cold water plus extra"),
        (3, "nothing to see here just ordinary web text about bicycle "
            "maintenance and chain lubrication schedules today"),
        (4, "students study ancient roman aqueduct engineering and "
            "gravity flow design concerning held out evaluation prompt "
            "material verbatim another"),
        (5, None),
    ]
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")
    tr = spark.createDataFrame(train_rows, "doc_id long, text string")
    return tr, ev


def test_stream_equals_batch_decontaminate(spark, corpus, tmp_path):
    tr, ev = corpus
    batch_kept = {r.doc_id
                  for r in decontaminate(tr, ev, shingle_k=8).collect()}
    words = build_bloom_filter(ev, shingle_k=8)
    src = str(tmp_path / "src")
    tr.coalesce(1).write.parquet(src)
    stream = (spark.readStream.schema(tr.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = stream_decontaminate(stream, words, shingle_k=8)
    q = (out.writeStream.format("memory").queryName("decon_mem")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    stream_kept = {r.doc_id
                   for r in spark.sql("SELECT doc_id FROM decon_mem")
                                 .collect()}
    assert stream_kept == batch_kept
    assert 2 not in stream_kept and 4 not in stream_kept   # contaminated
    assert {1, 3, 5} <= stream_kept                        # clean + NULL


def test_stateless_predicate_works_on_batch_frames(spark, corpus):
    """The same filter applied as a plain batch transform — proves
    statelessness and gives the cheap re-check path."""
    tr, ev = corpus
    words = build_bloom_filter(ev)
    got = {r.doc_id for r in stream_decontaminate(tr, words).collect()}
    batch = {r.doc_id for r in decontaminate(tr, ev).collect()}
    assert got == batch


def test_min_overlap_loosens_filter(spark, corpus):
    tr, ev = corpus
    words = build_bloom_filter(ev)
    strict = {r.doc_id
              for r in stream_decontaminate(tr, words,
                                            min_overlap=1).collect()}
    loose = {r.doc_id
             for r in stream_decontaminate(tr, words,
                                           min_overlap=50).collect()}
    assert strict <= loose
    assert loose == {1, 2, 3, 4, 5}     # nobody shares 50 shingles


def test_bitmap_is_compact(spark, corpus):
    _, ev = corpus
    words = build_bloom_filter(ev, m_bits=1 << 16)
    assert words.shape == (1 << 10,)    # m_bits/64 words
    assert words.dtype.kind == "i" and words.any()
