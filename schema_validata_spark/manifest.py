"""Resume manifest: per-partition lineage + metrics checkpointing.

No reference counterpart (the reference is whole-file, single-shot); the
north_rule requires interrupted runs to resume without recomputation.
The manifest is a small append-only Parquet table (Iceberg-compatible
layout) keyed by ``(run_id, partition_key)``:

    run_id        deterministic run identity (data hash + rules hash)
    partition_key partition value as string (e.g. '2023-11-14')
    status        'done'
    metrics       JSON blob of per-partition stats/violation counts
    rows          rows validated in the partition
    wall_s        seconds spent on the partition
    snapshot_id   input snapshot identity when available

On startup, planned partitions are anti-joined (driver-side set
difference — partition lists are small metadata) against completed
manifest rows; only the remainder is computed. Idempotent: re-running a
finished run is a no-op.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import SparkSession, types as T

MANIFEST_SCHEMA = T.StructType([
    T.StructField("run_id", T.StringType(), False),
    T.StructField("partition_key", T.StringType(), False),
    T.StructField("status", T.StringType(), False),
    T.StructField("metrics", T.StringType(), True),
    T.StructField("rows", T.LongType(), True),
    T.StructField("wall_s", T.DoubleType(), True),
    T.StructField("snapshot_id", T.StringType(), True),
    # commit wall-clock: a partition recomputed after its data changed
    # appends a NEWER row; readers take the latest row per partition
    T.StructField("committed_at", T.DoubleType(), True),
])


class Manifest:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _exists(self) -> bool:
        """True when the manifest holds at least one parquet file.
        Must work on ANY Hadoop-visible filesystem (s3a://, hdfs://,
        dbfs:/ — the storage a 10^5-partition run actually uses), so a
        bare local-path check goes through os.path and everything else
        through the JVM Hadoop FileSystem of the path's own scheme."""
        p = self.path
        scheme = p.split("://", 1)[0] if "://" in p else (
            "file" if not p.startswith(("dbfs:", "hdfs:")) else p.split(":", 1)[0])
        if scheme == "file":
            local = p[len("file://"):] if p.startswith("file://") else p
            return os.path.exists(local) and any(
                f.endswith(".parquet")
                for _, _, fs in os.walk(local) for f in fs)
        try:
            jvm = self.spark._jvm
            jsc = self.spark._jsc
            hpath = jvm.org.apache.hadoop.fs.Path(p)
            fs = hpath.getFileSystem(jsc.hadoopConfiguration())
            if not fs.exists(hpath):
                return False
            it = fs.listFiles(hpath, True)  # recursive
            while it.hasNext():
                if it.next().getPath().getName().endswith(".parquet"):
                    return True
            return False
        except Exception:  # noqa: BLE001 — permission/scheme surprises:
            # claim existence and let the schema-pinned read decide; an
            # unreadable-but-present manifest must not silently restart
            # the whole run
            return True

    def _latest_done(self, run_id: str):
        """Latest 'done' row per partition (recomputed partitions append
        newer rows; old rows are superseded, never trusted again).
        Returns None when the manifest path does not exist yet (fresh
        run); any OTHER read failure propagates — an unreadable manifest
        must not silently restart a 10^5-partition run."""
        from pyspark.errors import AnalysisException
        try:
            df = self.spark.read.schema(MANIFEST_SCHEMA).parquet(self.path)
        except AnalysisException as e:
            if "PATH_NOT_FOUND" in str(e) or "does not exist" in str(e):
                return None
            raise
        from pyspark.sql import Window, functions as F
        w = Window.partitionBy("partition_key").orderBy(
            F.desc_nulls_last("committed_at"))
        return (df.where((df.run_id == run_id) & (df.status == "done"))
                  .withColumn("__rn", F.row_number().over(w))
                  .where("__rn = 1"))

    def completed(self, run_id: str) -> set[str]:
        if not self._exists():
            return set()
        latest = self._latest_done(run_id)
        if latest is None:
            return set()
        rows = latest.select("partition_key").collect()
        return {r["partition_key"] for r in rows}

    def done_identities(self, run_id: str) -> dict[str, str | None]:
        """{partition_key: snapshot_id} for done partitions — the input
        identity (content fingerprint or table snapshot) recorded at
        completion time. A rerun skips a partition only when its CURRENT
        identity equals the recorded one, so a data change after the
        original run forces recomputation (no stale-verdict reuse)."""
        if not self._exists():
            return {}
        latest = self._latest_done(run_id)
        if latest is None:
            return {}
        rows = latest.select("partition_key", "snapshot_id").collect()
        return {r["partition_key"]: r["snapshot_id"] for r in rows}

    def mark_done(self, run_id: str, partition_key: str,
                  metrics: dict[str, Any] | None = None,
                  rows: int | None = None, wall_s: float | None = None,
                  snapshot_id: str | None = None) -> None:
        self.mark_done_many(run_id, [(partition_key, metrics, rows, wall_s,
                                      snapshot_id)])

    def mark_done_many(self, run_id: str, entries) -> None:
        """One commit for a batch of completed partitions — a manifest
        write per partition would mean 10^5 tiny files at design scale;
        a write per processed batch keeps the manifest compact while
        preserving partition-granular resume."""
        now = time.time()
        recs = [(run_id, str(pk), "done",
                 json.dumps(metrics or {}, sort_keys=True, default=str),
                 rows, wall_s, snapshot_id, now)
                for pk, metrics, rows, wall_s, snapshot_id in entries]
        if recs:
            (self.spark.createDataFrame(recs, MANIFEST_SCHEMA)
                 .coalesce(1).write.mode("append").parquet(self.path))

    def metrics(self, run_id: str) -> dict[str, dict]:
        if not self._exists():
            return {}
        latest = self._latest_done(run_id)
        if latest is None:
            return {}
        out = {}
        for r in latest.collect():
            out[r["partition_key"]] = json.loads(r["metrics"] or "{}")
        return out


def timed() -> float:
    return time.monotonic()
