"""Multimodal plumbing (stubbed decode, real Spark mechanics) and
Structured-Streaming validation parity."""

import pytest
from pyspark.sql import functions as F

from schema_validata_spark.datagen import gen_transcripts, transcript_rules
from schema_validata_spark.operators.multimodal import (decode_image_batch,
                                                        extract_features,
                                                        frame_sample_plan,
                                                        gen_media)
from schema_validata_spark.streaming import (stream_partition_verdicts,
                                             stream_validate)


def test_media_schema_and_features(spark):
    m = gen_media(spark, 50)
    feats = extract_features(m, fake_decode=True).collect()
    assert len(feats) == 50
    ok = [r for r in feats if r["error"] is None]
    assert len(ok) == 50
    assert all(len(r["feature"]) == 8 for r in ok)
    assert all(abs(sum(r["feature"]) - 1.0) < 1e-5 for r in ok)
    # deterministic: same media_id → same feature
    again = extract_features(gen_media(spark, 50), fake_decode=True).collect()
    assert {r["media_id"]: r["feature"] for r in feats} == \
        {r["media_id"]: r["feature"] for r in again}


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image_batch([b"x"], fake=False)


def test_real_decode_path_channels_errors(spark):
    """fake_decode=False must not kill the job: errors land in the
    error column (poison-blob resilience)."""
    m = gen_media(spark, 5)
    rows = extract_features(m, fake_decode=False).collect()
    assert len(rows) == 5
    assert all(r["error"] and "image decode requires" in r["error"]
               for r in rows)
    assert all(r["feature"] is None for r in rows)


def test_frame_sample_plan(spark):
    m = gen_media(spark, 30)
    plan = frame_sample_plan(m, every_ms=500)
    rows = plan.collect()
    vids = m.where("kind = 'video'").count()
    assert len(rows) == vids * 3  # 0, 500, 1000
    assert set(r["frame_ts_ms"] for r in rows) == {0, 500, 1000}


def test_stream_validate_matches_batch(spark, tmp_path):
    """Stream the fixture through readStream; per-row violations equal
    the batch scan on the same data (parity by construction)."""
    t = gen_transcripts(spark, 3000, seed=42)
    src = str(tmp_path / "stream_src")
    t.write.parquet(src)
    stream = spark.readStream.schema(t.schema).parquet(src)
    rules = transcript_rules()

    out = stream_validate(stream, rules, ["conv_id", "turn_idx"])
    q = (out.writeStream.format("memory").queryName("violations_mem")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.sql("SELECT count(*) c FROM violations_mem").collect()[0]["c"]
    batch = stream_validate(spark.read.parquet(src), rules,
                            ["conv_id", "turn_idx"]).count()
    assert got == batch > 0


def test_stream_windowed_verdicts(spark, tmp_path):
    t = gen_transcripts(spark, 3000, seed=42)
    src = str(tmp_path / "stream_src2")
    t.write.parquet(src)
    stream = spark.readStream.schema(t.schema).parquet(src)
    out = stream_partition_verdicts(stream, transcript_rules(),
                                    ts_col="ts", window="24 hours")
    q = (out.writeStream.format("memory").queryName("verdicts_mem")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM verdicts_mem").collect()
    assert len(rows) > 0
    assert any(r["status"] == "fail" for r in rows)


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Redelivered keys inside the watermark horizon are suppressed;
    content mode dedupes normalized-identical text across conv_ids."""
    import datetime as dt
    from schema_validata_spark.streaming.validate_stream import stream_dedup
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("c1", 0, "hello world", base),
        ("c1", 0, "hello world", base),                       # redelivery
        ("c1", 1, "second turn", base + dt.timedelta(minutes=1)),
        ("c2", 0, "HELLO   world", base + dt.timedelta(minutes=2)),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, ts timestamp"
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "conv_id string, turn_idx int, text string, ts timestamp"
    ).parquet(src)

    by_key = stream_dedup(stream, key_cols=["conv_id", "turn_idx"])
    q = (by_key.writeStream.format("memory").queryName("dedup_key_mem")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT conv_id, turn_idx FROM dedup_key_mem").collect()
    assert sorted((r[0], r[1]) for r in got) == [
        ("c1", 0), ("c1", 1), ("c2", 0)]

    by_content = stream_dedup(stream, text_col="text")
    q2 = (by_content.writeStream.format("memory")
          .queryName("dedup_content_mem")
          .outputMode("append").trigger(availableNow=True).start())
    q2.awaitTermination(120)
    texts = [r[0] for r in
             spark.sql("SELECT text FROM dedup_content_mem").collect()]
    # 'hello world' and 'HELLO   world' share a normalized fingerprint
    assert len(texts) == 2
    assert "second turn" in texts


def test_stream_dedup_arg_validation(spark):
    import pytest as _pytest
    from schema_validata_spark.streaming.validate_stream import stream_dedup
    df = spark.range(1).select(
        F.col("id").cast("string").alias("conv_id"),
        F.current_timestamp().alias("ts"))
    with _pytest.raises(ValueError):
        stream_dedup(df)


def test_stream_dedup_null_text_passthrough(spark, tmp_path):
    """Text-less rows must pass through content-mode dedup untouched —
    xxhash64(NULL) is the constant seed, so an ungated fingerprint
    would collapse every null-text row in the horizon into one."""
    import datetime as dt
    from schema_validata_spark.streaming.validate_stream import stream_dedup
    base = dt.datetime(2024, 1, 1, 12, 0)
    rows = [("c1", 0, None, base), ("c2", 0, None, base),
            ("c3", 0, None, base), ("c4", 0, "real text", base)]
    src = str(tmp_path / "src2")
    spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, ts timestamp"
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "conv_id string, turn_idx int, text string, ts timestamp"
    ).parquet(src)
    q = (stream_dedup(stream, text_col="text")
         .writeStream.format("memory").queryName("dedup_null_mem")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(r[0] for r in
                 spark.sql("SELECT conv_id FROM dedup_null_mem").collect())
    assert got == ["c1", "c2", "c3", "c4"]    # all three null-text rows kept
