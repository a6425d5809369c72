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


def _bloom_positions(h, m_bits: int):
    """Two independent bit positions for a 64-bit shingle hash:
    re-hash the hash with distinct salt tuples (xxhash64 of (h, salt))
    instead of multiply-shift — long multiplication overflows under
    ANSI mode, re-hashing never does."""
    p1 = F.pmod(F.xxhash64(h, F.lit(1)), F.lit(m_bits))
    p2 = F.pmod(F.xxhash64(h, F.lit(2)), F.lit(m_bits))
    return p1, p2


def _bloom_bitmap(hashes: DataFrame, m_bits: int) -> DataFrame:
    """Distributed bloom build: every hash sets 2 bits; bits pack into
    (slot:long, word:long) rows via a ``bit_or`` hash aggregate — the
    bitmap is at most ``m_bits/64`` rows no matter how many hashes
    went in, so it broadcasts even when the eval hash set itself has
    outgrown the broadcast threshold."""
    p1, p2 = _bloom_positions(F.col("sh"), m_bits)
    pos = (hashes.select(p1.alias("p"))
                 .unionAll(hashes.select(p2.alias("p"))))
    return (pos.select(F.shiftright("p", 6).alias("slot"),
                       F.expr("shiftleft(1L, cast(p % 64 as int))")
                        .alias("w"))
               .groupBy("slot").agg(F.bit_or("w").alias("word")))


def contamination_pairs_bloom(train: DataFrame, eval_set: DataFrame,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              shingle_k: int = 8, min_overlap: int = 1,
                              m_bits: int = 1 << 23) -> DataFrame:
    """``contamination_pairs`` with a bloom pre-screen — the shape that
    survives when the EVAL side outgrows the broadcast threshold (a
    10^8-hash protected set is GBs as join keys but ``m_bits/8`` bytes
    as a bloom bitmap).

    The train side's shingle hashes probe the bitmap with two
    broadcast-sized (slot → word) joins; only rows whose BOTH bits are
    set continue to the exact hash join, so bloom false positives are
    eliminated and the output is byte-identical to
    ``contamination_pairs`` (shared oracle). A probed slot absent from
    the bitmap frame means bit unset — the join is ``left`` and NULL
    words drop the row.

    False-positive pass-through rate ≈ (n_eval_hashes / m_bits)²; the
    default 8M bits (1 MiB bitmap) holds ~1M eval shingles at ~1.5%
    — tune ``m_bits`` upward for bigger protected sets (cost is linear
    bitmap size, not join size)."""
    t = _shingle_hashes(train, text_col, id_col, "train_id", shingle_k)
    e = _shingle_hashes(eval_set, text_col, id_col, "eval_id", shingle_k)
    bitmap = _bloom_bitmap(e.select("sh").distinct(), m_bits)

    p1, p2 = _bloom_positions(F.col("sh"), m_bits)
    probed = t.withColumn("__p1", p1).withColumn("__p2", p2)
    for i in ("__p1", "__p2"):
        b = bitmap.select(F.col("slot").alias(f"{i}_slot"),
                          F.col("word").alias(f"{i}_word"))
        probed = (probed
                  .withColumn(f"{i}_slot", F.shiftright(i, 6))
                  .join(b, f"{i}_slot", "left")
                  .where(F.col(f"{i}_word").isNotNull()
                         & (F.col(f"{i}_word")
                            .bitwiseAND(F.expr(
                                f"shiftleft(1L, cast({i} % 64 as int))"
                            )) != 0))
                  .drop(i, f"{i}_slot", f"{i}_word"))
    return (probed.join(e, "sh")
                  .groupBy("train_id", "eval_id")
                  .agg(F.count(F.lit(1)).alias("n_shared"))
                  .where(F.col("n_shared") >= min_overlap))


def shingle_containment(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", shingle_k: int = 5,
                        threshold: float = 0.5) -> DataFrame:
    """Directional shingle CONTAINMENT within one corpus: pairs where
    one document's k-gram set is largely inside the other's — the
    quote-inclusion / near-superset detector Jaccard structurally
    misses (a long page quoting a short doc whole has Jaccard
    |B|/|A| ≈ 0 but containment of the short side 1.0). The dedup
    complement of cross-corpus ``contamination_pairs``.

    Output (id_a < id_b): id_a, id_b, n_common, size_a, size_b
    (distinct-shingle counts), containment_a (n_common/size_a — how
    much of A is inside B), containment_b (6dp); pairs kept when
    EITHER direction >= ``threshold``. NULL-text docs carry no
    shingles (same contract as minhash/contamination).

    SCALE: documented EXACT BASELINE, like ``ngram_jaccard`` — the
    8-byte shingle-hash equi-join is quadratic in docs-per-shared-
    shingle (boilerplate blows it up); MinHash/winnowing are the scale
    path, this is the ground truth they're measured against. Text
    never shuffles — only (id, hash) rows and the docs-sized size
    frame."""
    if not 0 < threshold <= 1:
        raise ValueError("threshold must be in (0, 1]")
    sh = _shingle_hashes(df, text_col, id_col, "__id", shingle_k)
    sizes = sh.groupBy("__id").agg(F.count(F.lit(1)).cast("bigint")
                                    .alias("sz"))
    a = sh.select(F.col("__id").alias("id_a"), "sh")
    b = sh.select(F.col("__id").alias("id_b"), "sh")
    common = (a.join(b, "sh")
               .where(F.col("id_a") < F.col("id_b"))
               .groupBy("id_a", "id_b")
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_common")))
    sa = sizes.select(F.col("__id").alias("id_a"),
                      F.col("sz").alias("size_a"))
    sb = sizes.select(F.col("__id").alias("id_b"),
                      F.col("sz").alias("size_b"))
    ca = F.col("n_common").cast("double") / F.col("size_a").cast("double")
    cb = F.col("n_common").cast("double") / F.col("size_b").cast("double")
    return (common.join(sa, "id_a").join(sb, "id_b")
                  .where((ca >= F.lit(float(threshold)))
                         | (cb >= F.lit(float(threshold))))
                  .select("id_a", "id_b", "n_common", "size_a",
                          "size_b",
                          F.round(ca, 6).alias("containment_a"),
                          F.round(cb, 6).alias("containment_b")))
