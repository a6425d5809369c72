"""Input-parallelism guard for CPU-heavy scans.

Small/unsplittable inputs (a single parquet row group, a one-file
table) give Spark one task no matter how many cores exist, which
serializes expression-heavy passes (per-cell profiling, wide predicate
scans). ``ensure_min_parallelism`` repartitions ONLY when the scan
would otherwise use fewer tasks than the cluster has cores — at real
scale (many files / row groups, partitions ≫ cores) it is a no-op and
costs nothing; when it does trigger, the one round-robin shuffle is
repaid many times over by the parallel compute that follows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_BYTE_SUFFIXES = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40,
                  "p": 1 << 50}

# Compression suffixes Hadoop/Spark cannot split: one such file is one
# task no matter its size, so the size-based estimate below would
# overcount. bzip2 IS technically splittable but is treated
# conservatively (rung 3's exact count handles it correctly either
# way). Splittable plain text (.csv/.json/.txt uncompressed) and
# columnar formats take the estimate.
_NON_SPLITTABLE = (".gz", ".zip", ".lz4", ".snappy", ".zst", ".zstd",
                   ".deflate", ".br", ".bz2")


def _parse_byte_string(v: str) -> int:
    """Spark byte-string conf values: '134217728', '134217728b',
    '128m', '64MB', '1g' … (JavaUtils.byteStringAsBytes semantics)."""
    s = str(v).strip().lower()
    if s.endswith("b"):
        s = s[:-1]
    mult = 1
    if s and s[-1] in _BYTE_SUFFIXES:
        mult = _BYTE_SUFFIXES[s[-1]]
        s = s[:-1]
    return int(s) * mult


def ensure_min_parallelism(df: DataFrame, min_factor: float = 1.0) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` iff its scan would
    otherwise use fewer tasks than ``min_factor * defaultParallelism``.

    Decision ladder, cheapest first: (1) ``inputFiles()`` — file count ≥
    floor means at least one task each, metadata-only exit (the common
    at-scale case: files ≫ cores); (2) few local files — stat their
    sizes and estimate split count via ``maxPartitionBytes`` (big files
    still split into many tasks; filesystem metadata only); (3) only
    when both are inconclusive (remote files, non-file sources), confirm
    with ``df.rdd.getNumPartitions()``, which forces a plan→RDD
    conversion — the one non-metadata step, paid only on this last rung.
    Repartitioning an 8×1 GB table that already plans 64 scan tasks
    would be a pure regression, hence the confirmation before the
    shuffle."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    floor = max(1, int(target * min_factor))
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — planning-only failure: leave as-is
        files = []
    if files and len(files) >= floor:
        # many files → at least one task each; metadata-only fast exit.
        # (Safe despite FilePartition bin-packing: openCostInBytes pads
        # every file to ≥4 MB and maxSplitBytes shrinks to
        # totalBytes/defaultParallelism, so ≥floor files always plan
        # ≥~floor partitions.)
        return df
    if files and all(f.startswith("file:") for f in files) \
            and not any(f.rstrip("/").lower().endswith(_NON_SPLITTABLE)
                        for f in files):
        # few local SPLITTABLE files: estimate the planner's bin count
        # from sizes with FilePartition's own formula — os.stat only,
        # no RDD conversion. Non-splittable compressed files (a big
        # .csv.gz plans ONE task however large) are excluded above and
        # take the exact count below.
        import os
        from urllib.parse import unquote, urlparse
        try:
            conf = df.sparkSession.conf
            open_cost = _parse_byte_string(conf.get(
                "spark.sql.files.openCostInBytes", str(4 << 20)))
            max_pb = _parse_byte_string(conf.get(
                "spark.sql.files.maxPartitionBytes", str(128 << 20)))
            padded = sum(os.path.getsize(unquote(urlparse(f).path))
                         + open_cost for f in files)
            # FilePartition.maxSplitBytes divides by minPartitionNum —
            # conf spark.sql.files.minPartitionNum if set, else
            # leafNodeDefaultParallelism (defaults to
            # defaultParallelism ≈ target). Using target alone
            # overestimates bins when either conf is set LOWER, and the
            # guard would silently skip its repartition.
            min_pn = conf.get("spark.sql.files.minPartitionNum", None)
            if min_pn is None:
                min_pn = conf.get(
                    "spark.sql.leafNodeDefaultParallelism", None)
            divisor = int(min_pn) if min_pn else max(1, target)
            # FilePartition.maxSplitBytes: min(maxPartitionBytes,
            # max(openCostInBytes, bytesPerCore)); ceil(padded/split)
            # is a lower bound on the planned bin count, so a skip
            # here is always safe
            max_split = min(max_pb,
                            max(open_cost, padded // max(1, divisor)))
            est_tasks = -(-padded // max(1, max_split))
            if est_tasks >= floor:
                return df
        except (OSError, ValueError):
            pass  # fall through to the exact count
    try:
        nparts = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — planning-only failure: leave as-is
        return df
    if nparts < floor:
        return df.repartition(target)
    return df
