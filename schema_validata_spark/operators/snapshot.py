"""Snapshot-to-snapshot row diff keyed by a stable row address.

The north-rule invariant is *per-turn text equality under stable
(conv_id, turn_idx) ordering*: when the transcripts table moves from
snapshot A to snapshot B, the engine must say exactly WHICH rows were
added, removed, or changed — and in what columns — without ever
shipping the (wide) text payload through a shuffle. The reference has
no incremental story at all (it re-reads whole files and compares
nothing across runs; its closest notion is the content-md5 run uid,
src/schema_validata.py:190-219); this operator is the engine-native
replacement for "diff two exports in pandas".

SCALE DESIGN (the whole point of the operator):

* Each side is projected to ``key_cols + one fixed-width digest per
  compared column`` INSIDE its scan — md5 of the value's UTF-8 bytes,
  NULL kept as SQL NULL. Only keys + digests enter the join shuffle;
  a 100 TB text corpus diffs by moving ~48 bytes × columns per row.
* ONE full-outer sort-merge join on the key columns (the natural
  plan for two similarly-sized sides; AQE may still broadcast a tiny
  side). Unchanged rows — the overwhelming majority between adjacent
  snapshots — are filtered out immediately after the join, so the
  output is change-sized, not corpus-sized.
* Digest equality stands in for value equality with the usual md5
  collision bound (~2^-128 per cell pair); the DuckDB oracle compares
  RAW values instead, so the correctness gate also certifies the
  digest shortcut on the fixture.
* For partition-granular skipping (don't even scan unchanged
  partitions) compose with ``validate.partition_fingerprints`` — this
  operator is the row-level drill-down once a partition fingerprint
  moved.

NULL keys: the equi-join never matches NULL = NULL, so a NULL-keyed
row on each side surfaces as one 'removed' + one 'added' pair rather
than pairing up — keys are row ADDRESSES and a NULL address is already
a data bug the key checks flag.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from ..functions.colref import qcol

CHANGE_ADDED = "added"
CHANGE_REMOVED = "removed"
CHANGE_CHANGED = "changed"


def _digests(df: DataFrame, key_cols: list[str], compare_cols: list[str],
             tag: str) -> DataFrame:
    cols = [qcol(k) for k in key_cols]
    cols += [F.md5(qcol(c).cast("string").cast("binary"))
              .alias(f"__{tag}_{i}") for i, c in enumerate(compare_cols)]
    cols.append(F.lit(1).alias(f"__{tag}"))
    return df.select(*cols)


def snapshot_diff(old: DataFrame, new: DataFrame, key_cols: list[str],
                  compare_cols: list[str] | None = None) -> DataFrame:
    """Rows that differ between two snapshots of the same table.

    Output: ``*key_cols, change ('added'|'removed'|'changed'),
    changed_cols (comma-joined names of differing compare columns;
    NULL for added/removed rows)`` — one row per added / removed /
    value-changed key, NOTHING for unchanged keys.

    ``compare_cols`` defaults to every shared non-key column (in
    ``old``'s column order). A value change is detected on the md5
    digest of the value's string form; NULL ≠ any value, NULL = NULL.
    """
    if compare_cols is None:
        shared = set(new.columns)
        compare_cols = [c for c in old.columns
                        if c in shared and c not in key_cols]
    missing = [c for c in key_cols + compare_cols
               if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"columns absent from a snapshot side: {missing}")

    o = _digests(old, key_cols, compare_cols, "o")
    n = _digests(new, key_cols, compare_cols, "n")
    j = o.join(n, on=key_cols, how="full_outer")

    diff_flags = [
        F.when(~F.col(f"__o_{i}").eqNullSafe(F.col(f"__n_{i}")),
               F.lit(c)) for i, c in enumerate(compare_cols)]
    any_diff = reduce(lambda a, b: a | b,
                      [~F.col(f"__o_{i}").eqNullSafe(F.col(f"__n_{i}"))
                       for i in range(len(compare_cols))]) \
        if compare_cols else F.lit(False)
    change = (F.when(F.col("__o").isNull(), F.lit(CHANGE_ADDED))
               .when(F.col("__n").isNull(), F.lit(CHANGE_REMOVED))
               .when(any_diff, F.lit(CHANGE_CHANGED)))
    changed_cols = F.when(change == CHANGE_CHANGED,
                          F.concat_ws(",", *diff_flags)) \
        if compare_cols else F.lit(None).cast("string")
    return (j.withColumn("change", change)
             .where(F.col("change").isNotNull())
             .select(*key_cols, "change",
                     changed_cols.alias("changed_cols")))


def snapshot_diff_summary(old: DataFrame, new: DataFrame,
                          key_cols: list[str],
                          compare_cols: list[str] | None = None
                          ) -> DataFrame:
    """One row per change type: ``change, n`` (plus an 'unchanged' row)
    — the cheap health gauge before drilling into :func:`snapshot_diff`
    rows. Same single-join plan; the count aggregate replaces the
    row output, so nothing change-sized hits the driver either."""
    if compare_cols is None:
        shared = set(new.columns)
        compare_cols = [c for c in old.columns
                        if c in shared and c not in key_cols]
    o = _digests(old, key_cols, compare_cols, "o")
    n = _digests(new, key_cols, compare_cols, "n")
    j = o.join(n, on=key_cols, how="full_outer")
    any_diff = reduce(lambda a, b: a | b,
                      [~F.col(f"__o_{i}").eqNullSafe(F.col(f"__n_{i}"))
                       for i in range(len(compare_cols))]) \
        if compare_cols else F.lit(False)
    change = (F.when(F.col("__o").isNull(), F.lit(CHANGE_ADDED))
               .when(F.col("__n").isNull(), F.lit(CHANGE_REMOVED))
               .when(any_diff, F.lit(CHANGE_CHANGED))
               .otherwise(F.lit("unchanged")))
    return (j.groupBy(change.alias("change"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
