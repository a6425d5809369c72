"""Uniqueness / duplicate detection at scale, including the salted
two-phase aggregate the north_rule mandates for (conv_id, turn_idx).

The reference's only duplicate op is pandas ``duplicated(keep=False)``
per column (src/schema_validata.py:1427, 2225). At 10^12 rows a plain
``groupBy(key)`` would hot-spot one reducer when a single mega
conversation holds a large share of turns, so the composite-key check
runs as:

  phase 1: groupBy(key..., salt) partial counts   (salt = shard of the
           row, so one hot key spreads over S reducers)
  phase 2: re-aggregate phase-1 counts by key      (input is ≤ S rows
           per surviving key — tiny)

Only keys whose total count > 1 survive, so the phase-2 exchange is
proportional to the number of DUPLICATE keys, not to the data.

Note: for pure counting, Spark's map-side partial hash aggregation
already collapses hot keys per task; the explicit salt additionally
bounds reducer-side state when the grouping spills (many distinct keys
per reducer) and is the contractually-required strategy here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.colref import qcol


def duplicate_stats(df: DataFrame, key_cols: list[str],
                    n_salts: int = 32) -> dict:
    """Exact duplicate stats for a composite key via salted two-phase
    aggregation: ``{'duplicate_keys': k, 'duplicate_rows': m}`` where
    ``duplicate_rows`` counts every member of every duplicate group
    (pandas keep=False semantics)."""
    keys = [qcol(c) for c in key_cols]
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    phase1 = (df.select(*keys, salt.alias("__salt"))
                .groupBy(*[qcol(c) for c in key_cols], "__salt")
                .agg(F.count(F.lit(1)).alias("__c")))
    phase2 = (phase1.groupBy(*[qcol(c) for c in key_cols])
                    .agg(F.sum("__c").alias("cnt"))
                    .where(F.col("cnt") > 1))
    row = phase2.agg(
        F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("duplicate_keys"),
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("duplicate_rows"),
    ).collect()[0]
    return {"duplicate_keys": row["duplicate_keys"] or 0,
            "duplicate_rows": row["duplicate_rows"] or 0}


def composite_duplicates(df: DataFrame, key_cols: list[str],
                         n_salts: int = 32) -> DataFrame:
    """All rows belonging to duplicated composite keys (keep=False), as a
    DataFrame ``[*key_cols, dup_count]`` joined back to the duplicate key
    set.

    The join-back carries NO broadcast hint: a hint is honored regardless
    of size, and a key where duplication is pervasive (worst case n/2
    distinct duplicated keys) would broadcast an unbounded set. Unhinted,
    AQE measures the aggregate's real output size at runtime and picks a
    broadcast join exactly when the duplicate key set is small."""
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    dup_keys = (df.select(*[qcol(c) for c in key_cols], salt.alias("__salt"))
                  .groupBy(*[qcol(c) for c in key_cols], "__salt")
                  .agg(F.count(F.lit(1)).alias("__c"))
                  .groupBy(*[qcol(c) for c in key_cols])
                  .agg(F.sum("__c").alias("dup_count"))
                  .where(F.col("dup_count") > 1))
    return df.join(dup_keys, key_cols, "inner")


def key_skew_stats(df: DataFrame, key_cols: list[str],
                   top_n: int = 20, persist: bool = True) -> DataFrame:
    """Heavy-hitter diagnosis for a prospective shuffle key: the
    ``top_n`` heaviest key values with row count, share of all rows,
    and the ratio to a perfectly-uniform key's share — the number that
    says whether a ``groupBy``/``join`` on this key needs salting or
    AQE skew handling BEFORE the job hot-spots a reducer at 10^12 rows
    (north_rule: "partitioning / shuffle / skew handled explicitly").

    skew_ratio = share × n_distinct_keys: 1.0 ⇒ uniform; ≥ the salt
    count you'd need to spread the key. NULL keys group as NULL (a
    common real hot key) and rank like any other value.

    SCALE: one hash aggregate on the key (partial counts collapse
    map-side — the aggregate itself cannot hot-spot), ONE single-row
    summary aggregate over the counts frame, and a
    TakeOrderedAndProject for the top-N (no global sort materializes).
    Ties break on the key columns for determinism. The counts frame
    feeds BOTH the top-N and the summary, so it is persisted
    MEMORY_AND_DISK by default — (key, count) rows, orders of
    magnitude under the raw data; ``persist=False`` trades a second
    full input scan for zero cache footprint."""
    keys = [qcol(c) for c in key_cols]
    counts = (df.groupBy(*keys)
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows")))
    if persist:
        from pyspark import StorageLevel
        counts = counts.persist(StorageLevel.MEMORY_AND_DISK)
    summary = counts.agg(
        F.sum("n_rows").alias("__total"),
        F.count(F.lit(1)).alias("__n_keys"))
    top = counts.orderBy(F.desc("n_rows"),
                         *[qcol(c).asc_nulls_first() for c in key_cols]) \
                .limit(top_n)
    return (top.crossJoin(F.broadcast(summary))
               .select(*[qcol(c) for c in key_cols], "n_rows",
                       F.round(F.col("n_rows") / F.col("__total"), 6)
                        .alias("share"),
                       F.round(F.col("n_rows") * F.col("__n_keys")
                               / F.col("__total"), 4)
                        .alias("skew_ratio")))


def key_locality(df: DataFrame, key_col: str,
                 partition_col: str) -> DataFrame:
    """Physical-locality audit of an access key against the table's
    partition layout: how many partitions does each key's data
    straddle? The one-row answer to "will a point lookup / per-key job
    on ``key_col`` prune partitions, or scan the world?" — the
    complement of key_skew_stats (which asks if the key hot-spots a
    SHUFFLE; this asks if the key respects the SCAN layout). At 10^12
    turns the difference between conv_ids confined to one ts_date
    partition and conv_ids smeared across hundreds is the difference
    between a pruned read and a full-table scan per conversation —
    exactly what an Iceberg sort-order / partition-spec review needs a
    number for.

    Output (single row): n_keys, avg_parts_per_key (6dp),
    max_parts_per_key, pct_single_part (share of keys living entirely
    in one partition, 6dp). NULL keys and NULL partitions participate
    as ordinary values (a NULL partition IS a layout fact).

    SCALE: ONE distinct-pair aggregate — the shuffle carries only
    (key, partition) pairs, map-side pre-deduplicated, nothing from
    the row payload — then a per-key count and a single-row rollup
    over the #keys-sized frame. No raw-row shuffle, no window, no
    sort."""
    pairs = (df.select(qcol(key_col).alias("__k"),
                       qcol(partition_col).cast("string").alias("__p"))
               .distinct())
    per_key = pairs.groupBy("__k").agg(
        F.count(F.lit(1)).cast("bigint").alias("__nparts"))
    return per_key.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.round(F.avg("__nparts"), 6).alias("avg_parts_per_key"),
        F.max("__nparts").cast("bigint").alias("max_parts_per_key"),
        F.round(F.avg((F.col("__nparts") == 1).cast("double")), 6)
         .alias("pct_single_part"))


def k_anonymity(df: DataFrame, quasi_cols: list[str],
                k: int = 5) -> DataFrame:
    """k-anonymity screen over a quasi-identifier combination — the
    release-readiness check for transcript/corpus exports: a row whose
    (e.g. source, lang, date) combination is shared by fewer than k
    rows is re-identifiable by joining on those attributes alone, even
    after the PII scan scrubbed direct identifiers. NULL is a value
    here (NULL-lang rows group together — groupBy semantics), since an
    attacker sees the missing attribute too.

    Output (one row): n_rows, n_classes, min_class_size,
    n_violating_classes (size < k), n_violating_rows,
    violating_row_share (6dp; NULL on empty input), k.

    SCALE: ONE map-side-combined hash agg on the quasi-identifier
    combo, then a single-row rollup of the classes-sized count frame —
    the same shape as duplicate_stats; rows never shuffle. For the
    row-level listing join the class frame back with a plain equi-join
    on the combo (violations-sized output)."""
    if not quasi_cols:
        raise ValueError("k_anonymity needs at least one quasi column")
    classes = (df.groupBy(*[qcol(c) for c in quasi_cols])
                 .agg(F.count(F.lit(1)).cast("bigint").alias("__n")))
    bad = F.col("__n") < k
    return classes.agg(
        F.coalesce(F.sum("__n"), F.lit(0)).cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("__n").alias("min_class_size"),
        F.count(F.when(bad, 1)).cast("bigint").alias("n_violating_classes"),
        F.coalesce(F.sum(F.when(bad, F.col("__n")).otherwise(F.lit(0))),
                   F.lit(0)).cast("bigint").alias("n_violating_rows"),
        F.when(F.sum("__n") > 0,
               F.round(F.sum(F.when(bad, F.col("__n")).otherwise(F.lit(0)))
                       .cast("double") / F.sum("__n"), 6))
         .alias("violating_row_share"),
        F.lit(int(k)).cast("bigint").alias("k"))


def k_anonymity_classes(df: DataFrame, quasi_cols: list[str],
                        k: int = 5) -> DataFrame:
    """The listing twin of ``k_anonymity``: every quasi-identifier
    class with fewer than k rows (the classes a suppression /
    generalization pass must treat before release), with its size.
    Violations-sized output; same single hash agg."""
    classes = (df.groupBy(*[qcol(c) for c in quasi_cols])
                 .agg(F.count(F.lit(1)).cast("bigint").alias("class_size")))
    return classes.where(F.col("class_size") < k)


def l_diversity(df: DataFrame, quasi_cols: list[str],
                sensitive_col: str, l: int = 2) -> DataFrame:
    """l-diversity companion to ``k_anonymity``: a quasi-identifier
    class can be large (k-anonymous) yet still leak — if every row in
    it shares ONE sensitive value, membership alone reveals the
    secret. Per class, count distinct non-NULL sensitive values;
    classes with fewer than l are violations.

    Output (one row): n_classes, n_violating_classes,
    n_violating_rows, violating_row_share (6dp; NULL on empty input),
    min_diversity, l. A class whose sensitive values are all NULL has
    diversity 0 (it reveals 'the secret is missing' — still uniform).

    SCALE: ONE hash agg on (quasi..., sensitive) pre-collapses
    duplicates map-side, then a classes-keyed rollup and a single-row
    summary — the distinct count never materializes per row."""
    if not quasi_cols:
        raise ValueError("l_diversity needs at least one quasi column")
    qs = [qcol(c) for c in quasi_cols]
    pairs = (df.groupBy(*qs, qcol(sensitive_col).alias("__s"))
               .agg(F.count(F.lit(1)).cast("bigint").alias("__n")))
    classes = (pairs.groupBy(*quasi_cols)
                    .agg(F.sum("__n").cast("bigint").alias("__rows"),
                         F.count(F.when(F.col("__s").isNotNull(), 1))
                          .cast("bigint").alias("__div")))
    bad = F.col("__div") < l
    return classes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.count(F.when(bad, 1)).cast("bigint").alias("n_violating_classes"),
        F.coalesce(F.sum(F.when(bad, F.col("__rows")).otherwise(F.lit(0))),
                   F.lit(0)).cast("bigint").alias("n_violating_rows"),
        F.when(F.sum("__rows") > 0,
               F.round(F.sum(F.when(bad, F.col("__rows"))
                              .otherwise(F.lit(0))).cast("double")
                       / F.sum("__rows"), 6)).alias("violating_row_share"),
        F.min("__div").alias("min_diversity"),
        F.lit(int(l)).cast("bigint").alias("l"))


def dup_trend(df: DataFrame, key_cols: list[str], ts_col: str,
              granularity: str = "day") -> DataFrame:
    """Duplicate pressure over TIME: per arrival bucket, how many rows
    belong to a composite key that appears more than once WITHIN that
    bucket — the double-ingest / replayed-batch detector
    (``duplicate_stats`` says the corpus has dups; this says they all
    arrived on March 3rd, which is a pipeline incident, not a data
    property). Keys are scoped per bucket deliberately: a key that
    legitimately recurs across days is not a replay.

    Per bucket: n_rows, n_keys (distinct), dup_keys, dup_rows
    (keep=False count), dup_rate = dup_rows/n_rows (6dp). NULL-ts rows
    are excluded; NULL key parts group like values (SQL GROUP BY).

    SCALE: one (bucket, *key) salted-style hash aggregate — the
    map-side combine collapses within-partition repeats, so the
    shuffle carries (bucket, key, count) partials; the bucket rollup
    runs on the key-counts frame. Same two-phase shape as
    duplicate_stats, keyed one level wider."""
    fmt = {"day": "yyyy-MM-dd", "hour": "yyyy-MM-dd HH"}.get(granularity)
    if fmt is None:
        raise ValueError("dup_trend supports day/hour granularity")
    t = qcol(ts_col)
    bucket = F.date_format(F.date_trunc(granularity, t), fmt)
    per_key = (df.where(t.isNotNull())
                 .groupBy(bucket.alias("bucket"),
                          *[qcol(c) for c in key_cols])
                 .agg(F.count(F.lit(1)).alias("__c")))
    per_bucket = per_key.groupBy("bucket").agg(
        F.sum("__c").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum(F.when(F.col("__c") > 1, 1).otherwise(0)).cast("bigint")
         .alias("dup_keys"),
        F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(0))
         .cast("bigint").alias("dup_rows"))
    return per_bucket.select(
        "bucket", "n_rows", "n_keys", "dup_keys", "dup_rows",
        F.round(F.col("dup_rows").cast("double")
                / F.col("n_rows").cast("double"), 6).alias("dup_rate"))
