"""SparkSession factory tuned for this engine.

Local-mode defaults match the sandbox (single JVM, N threads); on a real
cluster the same code runs unchanged via spark-submit --py-files — the
engine never assumes local mode. AQE is on so skewed shuffles re-plan at
runtime; shuffle partitions default to the core count rather than 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "schema_validata_spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    master = master or f"local[{DEFAULT_CPUS}]"
    ncores = DEFAULT_CPUS if "*" in master or "[" not in master else \
        master.split("[", 1)[1].rstrip("]")
    try:
        n = int(ncores)
    except ValueError:
        n = 32
    builder = (
        SparkSession.builder
        .master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
