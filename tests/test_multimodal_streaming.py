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


def _encode_png(width, height, pixels, color_type=2, filters=None):
    """Minimal PNG encoder for test fixtures (filters per row, default
    all-0/None) — independent of the decoder under test."""
    import struct
    import zlib
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    filters = filters or [0] * height
    raw = bytearray()
    prev = [0] * (width * channels)
    for y in range(height):
        row = [pixels[y][x][c] if channels > 1 else pixels[y][x]
               for x in range(width) for c in range(channels)] \
            if channels > 1 else [pixels[y][x] for x in range(width)]
        ft = filters[y]
        raw.append(ft)
        bpp = channels
        if ft == 0:
            raw += bytes(row)
        elif ft == 1:      # Sub
            raw += bytes((row[i] - (row[i - bpp] if i >= bpp else 0)) & 0xFF
                         for i in range(len(row)))
        elif ft == 2:      # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(len(row)))
        elif ft == 3:      # Average
            raw += bytes((row[i] - (((row[i - bpp] if i >= bpp else 0)
                                     + prev[i]) >> 1)) & 0xFF
                         for i in range(len(row)))
        elif ft == 4:      # Paeth
            def paeth(a, b, c):
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            raw += bytes((row[i] - paeth(row[i - bpp] if i >= bpp else 0,
                                         prev[i],
                                         prev[i - bpp] if i >= bpp else 0))
                         & 0xFF for i in range(len(row)))
        prev = row

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_png_decode_real():
    """Stdlib PNG decode (VERDICT r2 #4): dims/depth/channels + channel
    means, across all five scanline filter types."""
    # 2×2 RGB: known means R=(10+30+50+70)/4=40, G=80, B=120
    px = [[(10, 60, 100), (30, 70, 110)], [(50, 90, 130), (70, 100, 140)]]
    for filters in ([0, 0], [1, 2], [3, 4]):
        blob = _encode_png(2, 2, px, color_type=2, filters=filters)
        (feat, err), = decode_image_batch([blob], fake=False)
        assert err is None, (filters, err)
        assert feat[:4] == [2.0, 2.0, 8.0, 3.0]
        assert abs(feat[4] - 40 / 255) < 1e-6
        assert abs(feat[5] - 80 / 255) < 1e-6
        assert abs(feat[6] - 120 / 255) < 1e-6
        assert feat[7] == 0.0                   # no alpha channel
    # grayscale
    g = _encode_png(3, 1, [[0, 128, 255]], color_type=0)
    (feat, err), = decode_image_batch([g], fake=False)
    assert err is None and feat[:4] == [3.0, 1.0, 8.0, 1.0]
    assert abs(feat[4] - (383 / 3) / 255) < 1e-6


def test_png_decode_poison_blobs():
    """Poison blobs land in the error slot, never raise: non-PNG,
    CRC-corrupted, and truncated payloads."""
    good = _encode_png(2, 2, [[(1, 2, 3), (4, 5, 6)],
                              [(7, 8, 9), (10, 11, 12)]])
    corrupt = bytearray(good)
    corrupt[-17] ^= 0xFF                        # flip a byte inside IDAT
    got = decode_image_batch(
        [b"x", None, bytes(corrupt), good[:20], good], fake=False)
    assert got[0][0] is None and "unsupported format" in got[0][1]
    assert got[1] == (None, "null payload")
    assert got[2][0] is None and "corrupt PNG" in got[2][1]
    assert got[3][0] is None and "corrupt PNG" in got[3][1]
    assert got[4][1] is None and got[4][0][:2] == [2.0, 2.0]


def test_real_decode_path_channels_errors(spark):
    """fake_decode=False must not kill the job: non-PNG blobs land in
    the error column (poison-blob resilience), PNG blobs decode — in the
    same Spark pass."""
    m = gen_media(spark, 5)
    rows = extract_features(m, fake_decode=False).collect()
    assert len(rows) == 5
    assert all(r["error"] and "unsupported format" in r["error"]
               for r in rows)                   # gen_media blobs aren't PNG
    assert all(r["feature"] is None for r in rows)
    # a real PNG through the same mapInPandas path decodes
    blob = _encode_png(4, 2, [[(i * 10, 0, 255) for i in range(4)]] * 2)
    png_df = spark.createDataFrame(
        [(99, "image", "image/png", 4, 2, 0, bytearray(blob))],
        gen_media(spark, 1).schema)
    row, = extract_features(png_df, fake_decode=False).collect()
    assert row["error"] is None
    assert row["feature"][:4] == [4.0, 2.0, 8.0, 3.0]


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


def test_stream_drift_scores_match_batch(spark, tmp_path):
    """Windowed streaming drift must reproduce the batch drift_scores
    chi2/PSI on the same rows vs the same baseline (one 24h window =
    the whole fixture), and a shifted stream must score drifted."""
    from schema_validata_spark.operators.drift import (drift_scores,
                                                       numeric_histogram)
    from schema_validata_spark.streaming.validate_stream import \
        stream_drift_scores

    t = gen_transcripts(spark, 4000, seed=42) \
        .select("ts", F.length("text").cast("double").alias("tlen"))
    baseline = numeric_histogram(
        t.withColumn("pk", F.lit("all")), "tlen", "pk", 0.0, 400.0, 10)

    src = str(tmp_path / "drift_src")
    t.write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = stream_drift_scores(stream, "tlen", baseline, 0.0, 400.0,
                              n_buckets=10, ts_col="ts",
                              window="36500 days", watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("drift_mem")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM drift_mem").collect()
    assert len(rows) == 1
    got = rows[0]
    assert got.n_obs == 4000

    observed = numeric_histogram(
        t.withColumn("pk", F.lit("all")), "tlen", "pk", 0.0, 400.0, 10)
    batch = drift_scores(observed, baseline, by_partition=False).collect()[0]
    # identical data vs itself: both engines near-zero and equal
    assert abs(got.chi2 - batch["chi2"]) < 1e-3
    assert abs(got.psi - batch["psi"]) < 1e-3

    # shifted stream: batch and stream agree on a real drift too
    t2 = t.withColumn("tlen", F.col("tlen") * 1.5)
    src2 = str(tmp_path / "drift_src2")
    t2.write.parquet(src2)
    stream2 = spark.readStream.schema(t2.schema).parquet(src2)
    out2 = stream_drift_scores(stream2, "tlen", baseline, 0.0, 400.0,
                               n_buckets=10, ts_col="ts",
                               window="36500 days", watermark="1 hour")
    q2 = (out2.writeStream.format("memory").queryName("drift_mem2")
          .outputMode("complete").trigger(availableNow=True).start())
    q2.awaitTermination(120)
    got2 = spark.sql("SELECT * FROM drift_mem2").collect()[0]
    obs2 = numeric_histogram(
        t2.withColumn("pk", F.lit("all")), "tlen", "pk", 0.0, 400.0, 10)
    batch2 = drift_scores(obs2, baseline, by_partition=False).collect()[0]
    assert got2.psi > got.psi and got2.chi2 > got.chi2
    assert abs(got2.chi2 - batch2["chi2"]) / max(batch2["chi2"], 1.0) < 1e-3
    assert abs(got2.psi - batch2["psi"]) < 1e-3


def test_stream_drift_empty_baseline_raises(spark):
    from schema_validata_spark.streaming.validate_stream import \
        stream_drift_scores
    empty = spark.createDataFrame([], "bucket: string, count: bigint")
    df = spark.createDataFrame([(1.0,)], "v: double")
    import pytest as pt
    with pt.raises(ValueError):
        stream_drift_scores(df, "v", empty, 0.0, 1.0)


def _encode_wav(rate=8000, channels=1, bits=16, samples=None):
    """Minimal PCM WAV encoder for tests (stdlib struct only)."""
    import struct
    if samples is None:
        samples = [0, 8000, -8000, 16000, -16000, 0]
    if bits == 16:
        pcm = b"".join(struct.pack("<h", s) for s in samples)
    else:
        pcm = bytes((s + 128) & 0xFF for s in samples)
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block,
                      block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_decode_wav_real_path(spark):
    from schema_validata_spark.operators.multimodal import (decode_wav,
                                                            extract_features,
                                                            gen_media)
    import math
    blob = _encode_wav(rate=8000, samples=[0, 16384, -16384, 0])
    feat = decode_wav(blob)
    rate, ch, bits, n, dur, rms, peak = feat[:7]
    assert (rate, ch, bits, n) == (8000.0, 1.0, 16.0, 4.0)
    assert abs(dur - 4 / 8000) < 1e-9
    assert abs(peak - 0.5) < 1e-3
    assert abs(rms - math.sqrt(2 * 0.5 ** 2 / 4)) < 1e-3
    # through the mapInPandas path alongside non-WAV blobs
    m = gen_media(spark, 3)
    wav_df = spark.createDataFrame(
        [(42, "audio", "audio/wav", 0, 0, 500, bytearray(blob))],
        gen_media(spark, 1).schema)
    rows = extract_features(m.unionByName(wav_df),
                            fake_decode=False).collect()
    by_id = {r.media_id: r for r in rows}
    assert by_id[42].error is None
    assert by_id[42].feature[:4] == [8000.0, 1.0, 16.0, 4.0]
    assert all(r.error is not None for i, r in by_id.items() if i != 42)


def test_decode_wav_poison_blobs(spark):
    import pytest as pt
    from schema_validata_spark.operators.multimodal import (
        decode_image_batch, decode_wav)
    good = _encode_wav()
    # truncated data chunk / non-PCM format / empty data
    with pt.raises(ValueError):
        decode_wav(good[:-3])
    import struct
    nonpcm = bytearray(good)
    nonpcm[20:22] = struct.pack("<H", 3)       # IEEE float format
    with pt.raises(ValueError):
        decode_wav(bytes(nonpcm))
    # batch path: errors routed, never raised
    out = decode_image_batch([good, good[:-3], bytes(nonpcm), None])
    assert out[0][1] is None and out[0][0][0] == 8000.0
    assert "corrupt WAV" in out[1][1]
    assert "corrupt WAV" in out[2][1]
    assert out[3][1] == "null payload"


def test_stream_distinct_estimates_windows_and_merge(spark, tmp_path):
    """Per-window distinct estimates are exact in the coupon regime,
    NULLs count rows but not coupons, and the emitted sketches union
    across windows to the whole-stream distinct count."""
    import datetime as dt
    from pyspark.sql import functions as F
    from schema_validata_spark.streaming.validate_stream import (
        stream_distinct_estimates)
    h0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    h1 = dt.datetime(2024, 1, 1, 11, 0, 0)
    rows = ([("c%d" % (i % 5), h0 + dt.timedelta(minutes=i % 30))
             for i in range(40)]                      # 5 distinct in w0
            + [("c%d" % (3 + i % 4), h1 + dt.timedelta(minutes=i % 30))
               for i in range(20)]                    # c3..c6 in w1
            + [(None, h0)]                            # NULL: row, no coupon
            # sentinel advances the watermark past w1's end so append
            # mode emits it; its own window never closes and is absent
            + [("sentinel", h1 + dt.timedelta(hours=1, minutes=1))])
    src = str(tmp_path / "sde")
    spark.createDataFrame(rows, "conv_id string, ts timestamp") \
        .write.parquet(src)
    stream = spark.readStream.schema("conv_id string, ts timestamp") \
        .parquet(src)
    out = stream_distinct_estimates(stream, "conv_id", window="1 hour",
                                    watermark="0 seconds")
    q = (out.writeStream.format("memory").queryName("sde_mem")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["window_start"]: r for r in
           spark.sql("SELECT * FROM sde_mem").collect()}
    assert got[h0]["n_distinct_est"] == 5
    assert got[h0]["n_rows"] == 41          # NULL row counted
    assert got[h1]["n_distinct_est"] == 4
    # window sketches merge to the whole-stream distinct (c0..c6 = 7)
    assert h1 + dt.timedelta(hours=1) not in got   # sentinel window open
    merged = (spark.sql("SELECT sketch FROM sde_mem")
              .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")))
              .collect()[0][0])
    assert merged == 7


def test_stream_quantile_summaries_feed_merge_and_drift(spark, tmp_path):
    """Per-window quantile summaries emit in the batch merge layer's
    frame shape: completed windows merge to whole-stream quantiles and
    diff through summary_drift (a +100 shift between windows reads as
    W1 = 100 exactly, since GK returns actual elements)."""
    import datetime as dt
    from pyspark.sql import functions as F
    from schema_validata_spark.streaming.validate_stream import (
        stream_quantile_summaries)
    from schema_validata_spark.operators.sketches import (
        merge_quantile_estimates, summary_drift)
    h0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    h1 = dt.datetime(2024, 1, 1, 11, 0, 0)
    rows = ([(float(i), h0 + dt.timedelta(minutes=i % 30))
             for i in range(100)]                     # w0: 0..99
            + [(float(i) + 100.0, h1 + dt.timedelta(minutes=i % 30))
               for i in range(100)]                   # w1: 100..199
            + [(None, h0)]                            # NULL: not counted
            + [(0.0, h1 + dt.timedelta(hours=1, minutes=1))])  # sentinel
    src = str(tmp_path / "sqs")
    spark.createDataFrame(rows, "v double, ts timestamp") \
        .write.parquet(src)
    stream = spark.readStream.schema("v double, ts timestamp").parquet(src)
    out = stream_quantile_summaries(stream, ["v"], window="1 hour",
                                    watermark="0 seconds", k=8)
    q = (out.writeStream.format("memory").queryName("sqs_mem")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sqs_mem")
    rows_out = {r["window_start"]: r for r in got.collect()}
    assert set(rows_out) == {h0, h1}            # sentinel window still open
    assert rows_out[h0]["n_vals"] == 100        # NULL not counted
    assert len(rows_out[h0]["qs"]) == 8
    # the emitted frame IS the batch merge layer's shape
    merged = merge_quantile_estimates(
        got.select("partition_key", "column_name", "qs", "n_vals"),
        [0.5]).collect()[0]
    assert 90.0 <= merged["q_50"] <= 110.0      # median of 0..199
    drift = summary_drift(
        got.where(F.col("window_start") == h0)
           .select("column_name", "qs", "n_vals"),
        got.where(F.col("window_start") == h1)
           .select("column_name", "qs", "n_vals"),
        probes=4).collect()[0]
    assert drift["w1_est"] == 100.0 and drift["max_q_gap"] == 100.0
