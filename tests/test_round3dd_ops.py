"""Round-3dd: streaming burst alerts, embedding L2 normalization."""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import functions as F

from schema_validata_spark.operators.similarity import normalize_embeddings


def _ts(s):
    return datetime.datetime.fromisoformat(s)


# --------------------------------------------------- stream_burst_alerts

def test_stream_burst_alerts(spark, tmp_path):
    from schema_validata_spark.streaming.validate_stream import \
        stream_burst_alerts

    base = _ts("2024-01-01T00:00:00")
    rows = ([("hot", base + datetime.timedelta(seconds=i))
             for i in range(30)]                       # 30 in 30s
            + [("calm", base + datetime.timedelta(minutes=7 * i))
               for i in range(5)]
            + [(None, base)])
    df = spark.createDataFrame(rows, "u string, ts timestamp")
    src = str(tmp_path / "burst_src")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = stream_burst_alerts(stream, "u", "ts", window="5 minutes",
                              watermark="1 hour", threshold=10)
    q = (out.writeStream.format("memory").queryName("burst_mem")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM burst_mem").collect()
    assert {r["key"] for r in got} == {"hot"}
    assert got[0]["n_events"] == 30
    with pytest.raises(ValueError):
        stream_burst_alerts(df, "u", threshold=0)


# --------------------------------------------------- normalize_embeddings

def _vecs(spark, arrs):
    return spark.createDataFrame([(i, a) for i, a in enumerate(arrs)],
                                 "id long, embedding array<float>")


def test_normalize_hand_case(spark):
    got = normalize_embeddings(_vecs(spark, [[3.0, 4.0]])).collect()[0]
    assert got["embedding"] == [0.6, 0.8]


def test_normalize_zero_null_empty_guarded(spark):
    got = {r["id"]: r["embedding"] for r in normalize_embeddings(
        _vecs(spark, [[0.0, 0.0], None, []])).collect()}
    assert got == {0: None, 1: None, 2: None}


def test_normalize_out_col_and_unit_norm(spark):
    df = _vecs(spark, [[1.0, 2.0, 2.0], [5.0, 0.0, 0.0]])
    out = normalize_embeddings(df, out_col="unit")
    rows = out.collect()
    assert "embedding" in out.columns and "unit" in out.columns
    for r in rows:
        n = math.sqrt(sum(x * x for x in r["unit"]))
        assert abs(n - 1.0) < 1e-5


def test_normalize_composes_with_cosine(spark):
    """After normalization, the dot product IS the cosine."""
    from schema_validata_spark.operators.similarity import cosine_expr
    df = normalize_embeddings(_vecs(spark, [[3.0, 4.0], [6.0, 8.0]]))
    a, b = [r["embedding"] for r in df.collect()]
    dot = sum(x * y for x, y in zip(a, b))
    assert abs(dot - 1.0) < 1e-9                 # parallel vectors
