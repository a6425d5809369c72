"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step itself is STUBBED (the container ships no image/audio
libraries): ``decode_image_batch`` raises NotImplementedError unless a
deterministic fake decoder is requested. Everything around it — schema,
partition sizing, UDF signature, batch shape, error channeling — is real
and tested, so dropping in PIL/librosa later is a one-function change.

Design for 100 TB of blobs:
* blobs never pass through a shuffle — feature extraction is a
  map-only ``mapInPandas`` stage; only the (small) extracted features
  continue into joins/aggregates;
* ``spark.sql.files.maxPartitionBytes`` should be sized so a task's
  Arrow batch of blobs fits executor memory (hence ``batch_rows``);
* corrupt blobs go to an error column, not an exception — a poison
  blob must not kill a 10^6-task job.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),      # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
    T.StructField("payload", T.BinaryType(), True),    # opaque blob
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.IntegerType(), True),
    T.StructField("payload_hash", T.LongType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
    T.StructField("error", T.StringType(), True),
])


def gen_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA — payload
    bytes derived from (media_id, seed)."""
    kinds = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                         (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3))
                          + 1).cast("int"))
    payload = F.encode(
        F.concat(F.lit("blob-"), F.col("id").cast("string"), F.lit("-"),
                 F.md5(F.concat(F.col("id").cast("string"), F.lit(seed)))),
        "utf-8")
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).alias("width"), F.lit(64).alias("height"),
        F.lit(1000).alias("duration_ms"),
        payload.alias("payload"))


def decode_image_batch(payloads, fake: bool = False):
    """Decode a batch of image blobs → feature vectors.

    STUB: real decoding needs an image library absent from this
    container. ``fake=True`` returns a deterministic 8-dim feature from
    the payload bytes so the full pipeline is testable end to end.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires an image library (e.g. PIL) not present "
            "in this environment; pass fake=True for the deterministic stub")
    import numpy as np
    out = []
    for p in payloads:
        if p is None:
            out.append(None)
            continue
        b = np.frombuffer(bytes(p), dtype=np.uint8)
        # deterministic 8-bucket byte histogram, normalized
        hist = np.bincount(b % 8, minlength=8).astype("float32")
        out.append(hist / max(1.0, float(hist.sum())))
    return out


def extract_features(df: DataFrame, fake_decode: bool = True,
                     batch_rows: int = 1024) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction over MEDIA_SCHEMA
    rows. Map-only (no shuffle of blobs); corrupt rows land in 'error'."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np  # noqa: F401
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start:start + batch_rows]
                feats, errs = [], []
                try:
                    decoded = decode_image_batch(chunk["payload"].tolist(),
                                                 fake=fake_decode)
                except NotImplementedError as e:
                    decoded = [None] * len(chunk)
                    errs = [str(e)] * len(chunk)
                if not errs:
                    errs = [None if d is not None else "null payload"
                            for d in decoded]
                feats = [None if d is None else [float(x) for x in d]
                         for d in decoded]
                yield pd.DataFrame({
                    "media_id": chunk["media_id"].values,
                    "kind": chunk["kind"].values,
                    "n_bytes": [len(p) if p is not None else None
                                for p in chunk["payload"]],
                    "payload_hash": [
                        None if p is None else
                        int.from_bytes(bytes(p)[:8].ljust(8, b"\0"),
                                       "little", signed=True)
                        for p in chunk["payload"]],
                    "feature": feats,
                    "error": errs,
                })

    cols = ["media_id", "kind", "payload"]
    return df.select(*cols).mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one output row per planned frame
    timestamp (sequence expression; no decode). The decode of each frame
    is the stubbed step."""
    return (df.where(F.col("kind") == "video")
              .select("media_id",
                      F.explode(F.sequence(
                          F.lit(0), F.col("duration_ms"),
                          F.lit(every_ms))).alias("frame_ts_ms")))
