"""Boilerplate detection — corpus-frequent word n-grams (C4-style).

Web corpora are full of repeated furniture ("all rights reserved",
"click here to subscribe") that should be discovered and discounted
before training. The classic C4 cleaning pass drops any three-sentence
span seen more than once; the scalable formulation used here finds
word n-grams that occur in ≥ ``min_docs`` DISTINCT documents, then
scores each document by how much of it is made of those n-grams.

SCALE NOTES (the part that matters at 100 TB):

* Per-document n-gram expansion and deduplication happen MAP-SIDE
  (``transform`` over ``sequence`` + ``array_distinct`` inside the
  scan projection) — the shuffle for the frequency count carries each
  distinct (n-gram, doc) pair once, never per-occurrence rows, and the
  (n-gram → doc count) aggregate gets map-side partial combine.
* The frequent set is tiny relative to the corpus (frequency ≥
  min_docs truncates the Zipf tail), so the ratio pass joins the full
  n-gram stream against it with AQE free to pick a broadcast — no
  forced hint, same policy as the rest of the repo.
* ``boilerplate_ratio`` scans the text twice (build the set, then
  score). Both scans are shuffle-light; at cluster scale the frequent
  set would be persisted between the passes, which callers do by
  passing a materialized ``frequent`` frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_WS = r"\s+"


def _ngram_col(text_col: str, n: int):
    """Array of space-joined word n-grams of ``text_col`` (NULL when
    the text is NULL/blank or shorter than ``n`` words). The word
    array is let-bound (functions/exprs.py) — an unbound split inside
    the transform lambda re-evaluates per element, O(len²) per row."""
    from ..functions.exprs import let_col

    def body(words):
        ok = (F.col(text_col).isNotNull()
              & (F.length(F.trim(F.col(text_col))) > 0)
              & (F.size(words) >= n))
        grams = F.transform(
            F.sequence(F.lit(1), F.size(words) - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(words, i, n), " "))
        return F.when(ok, grams)

    return let_col(F.split(F.lower(F.trim(F.col(text_col))), _WS), body)


def boilerplate_ngrams(df: DataFrame, text_col: str, id_col: str,
                       n: int = 3, min_docs: int = 5) -> DataFrame:
    """Word n-grams occurring in at least ``min_docs`` distinct
    documents. Output: ``(ngram, n_docs)``."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    grams = (df.select(F.col(id_col),
                       F.explode(F.array_distinct(
                           _ngram_col(text_col, n))).alias("ngram")))
    return (grams.groupBy("ngram")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
            .where(F.col("n_docs") >= min_docs))


def boilerplate_ratio(df: DataFrame, text_col: str, id_col: str,
                      n: int = 3, min_docs: int = 5,
                      frequent: DataFrame | None = None) -> DataFrame:
    """Per-document boilerplate score: the share of the document's
    n-gram OCCURRENCES (not distinct grams) that belong to the
    corpus-frequent set. Documents shorter than ``n`` words have zero
    n-grams and score NULL. Output:
    ``(id_col, n_ngrams, n_boiler, boiler_ratio)``.

    Pass ``frequent`` (a materialized ``boilerplate_ngrams`` result)
    to avoid the second corpus scan at cluster scale."""
    if frequent is None:
        frequent = boilerplate_ngrams(df, text_col, id_col,
                                      n=n, min_docs=min_docs)
    occ = df.select(F.col(id_col),
                    F.explode_outer(_ngram_col(text_col, n))
                     .alias("ngram"))
    hit = occ.join(frequent.select("ngram",
                                   F.lit(1).alias("_freq")),
                   "ngram", "left")
    return (hit.groupBy(id_col)
            .agg(F.count("ngram").cast("bigint").alias("n_ngrams"),
                 F.count("_freq").cast("bigint").alias("n_boiler"))
            .withColumn(
                "boiler_ratio",
                F.when(F.col("n_ngrams") > 0,
                       F.round(F.col("n_boiler")
                               / F.col("n_ngrams"), 6))))


def template_openings(df: DataFrame, text_col: str, id_col: str,
                      k_tokens: int = 8, min_docs: int = 2,
                      max_chars: int = 200) -> DataFrame:
    """Documents sharing the same normalized OPENING — the first
    ``k_tokens`` case-folded words (clipped to ``max_chars``) — in at
    least ``min_docs`` documents: the template-response detector
    (form-letter support replies, scripted assistant openings, scraped
    page skeletons) that n-gram boilerplate misses when the shared
    part is position-anchored rather than frequency-dominant.

    Output per template: prefix (the shared opening, human-readable),
    n_docs, example_id (min id — a stable exemplar). Empty/NULL texts
    carry no opening.

    SCALE: the prefix assembles inside the scan projection (split +
    slice + concat_ws + substring — pure Column chain) and is BOUNDED
    at ``max_chars`` bytes, so the group key can't smuggle a
    pathological megabyte "token" into the shuffle; ONE hash aggregate
    on that bounded key, output is template-count-sized (the ≥min_docs
    filter truncates the unique tail)."""
    c = F.col(text_col)
    toks = F.split(F.lower(F.trim(c)), _WS)
    prefix = F.substring(
        F.concat_ws(" ", F.slice(toks, 1, k_tokens)), 1, max_chars)
    return (df.where(c.isNotNull() & (F.length(F.trim(c)) > 0))
              .select(F.col(id_col), prefix.alias("prefix"))
              .groupBy("prefix")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                   F.min(id_col).alias("example_id"))
              .where(F.col("n_docs") >= min_docs))
