"""Winnowing document fingerprints and partial-overlap detection.

Near-dup LSH (MinHash/SimHash, ``operators/dedup.py``) answers "are
these two documents mostly the same?" — it misses PARTIAL containment:
a paragraph quoted inside an otherwise-unrelated page, a licence block
pasted into thousands of files, an eval answer embedded in a longer
web document. The standard tool is **winnowing** (Schleimer, Wilkerson
& Aiken, SIGMOD 2003 — the MOSS algorithm): hash every character
k-gram, slide a window of ``w`` consecutive gram hashes, and keep each
window's MINIMUM hash. The selected fingerprints are a deterministic,
position-robust ~1/w sample of the document's substrings with a hard
guarantee: any shared substring of at least ``w + k - 1`` characters
contributes at least one IDENTICAL fingerprint to both documents.

IMPLEMENTATION (Spark-first, zero UDF): the whole selection runs as a
``transform``/``slice``/``array_min`` expression chain inside the scan
projection — grams and windows never materialize as rows, documents
never shuffle; only the winnowed (id, fp) pairs (a ~1/w-sized stream
of 8-byte hashes) reach the exchange. Overlap candidates are then one
fp-keyed self-join, the same shape as the LSH bucket join, with the
same mega-bucket cap + telemetry (``_cap_buckets``).

SCALE NOTES: per-row cost is O(len·(k + w)) char work inside
whole-stage codegen (each window recomputes its min over w entries —
the classic rolling-min deque is row-imperative, wrong shape for a
columnar engine; w is small, 4-16). Shuffle volume is len/w hashes per
doc, ~8 bytes each. The fp self-join's worst case is a fingerprint
shared by k docs → O(k²) pairs; boilerplate fps are exactly that, so
``max_docs_per_fp`` drops them (telemetry reports what; a licence
header shared by 10⁶ files is boilerplate, not plagiarism signal).

Hash portability: ``hasher="xxhash64"`` (default) keeps fingerprints
as 8-byte bigints for the scale path; ``hasher="md5"`` uses the
32-hex-char md5 string so the DuckDB oracle replays the identical
selection (min over lexicographic hex = min over the same total order
in both engines). Selection differs between hashers (each induces its
own min order) — both are valid winnowing schemes with the same
guarantee.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.exprs import let_col as _let
from .dedup import _cap_buckets


def _winnow_expr(text: Column, k: int, window: int, hasher: str) -> Column:
    """Array of winnowed fingerprint hashes for one normalized text
    value (NULL for NULL/empty text). Pure Column expression chain —
    evaluates inside the scan stage; ``_let`` keeps it O(len·(k+w))."""
    if hasher == "xxhash64":
        def h(s: Column) -> Column:
            return F.xxhash64(s)
    elif hasher == "md5":
        h = F.md5
    else:
        raise ValueError(f"hasher must be 'xxhash64' or 'md5', "
                         f"got {hasher!r}")

    def fps_of(t: Column) -> Column:
        n = F.length(t)
        # one gram per character position; a doc shorter than k chars
        # gets ONE gram of its full text (substring clamps at the end)
        grams = F.transform(
            F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1))),
            lambda i: h(F.substring(t, i, F.lit(k))))

        def windows_of(g: Column) -> Column:
            # each window's min; fewer grams than the window -> one
            # global min
            win_len = F.least(F.lit(window), F.size(g))
            return F.array_distinct(F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(g) - F.lit(window - 1),
                                                F.lit(1))),
                lambda j: F.array_min(F.slice(g, j, win_len))))

        return F.when(n >= 1, _let(grams, windows_of))

    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return _let(norm, fps_of)


def winnow_fingerprints(df: DataFrame, text_col: str, id_col: str,
                        k: int = 8, window: int = 4,
                        hasher: str = "xxhash64") -> DataFrame:
    """(id, fp): each document's distinct winnowed fingerprints —
    guaranteed to include a shared fp for any cross-document substring
    match of >= ``window + k - 1`` characters. NULL/empty texts emit no
    rows (no content to fingerprint). Map-only until the explode; the
    exchange (if any downstream) carries ~len/window hashes per doc,
    never the text."""
    fps = _winnow_expr(F.col(text_col), k, window, hasher)
    return (df.select(F.col(id_col), fps.alias("__fps"))
              .where(F.col("__fps").isNotNull())
              .select(F.col(id_col), F.explode("__fps").alias("fp")))


def overlap_candidates(df: DataFrame, text_col: str, id_col: str,
                       k: int = 8, window: int = 4,
                       min_shared: int = 2,
                       max_docs_per_fp: int | None = 200,
                       hasher: str = "xxhash64",
                       telemetry_out: dict | None = None) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowed fingerprints —
    partial-overlap candidates (quotes, pasted blocks, containment)
    that whole-document near-dup LSH cannot see. Output:
    (id_a, id_b, shared_fps), id_a < id_b.

    ``max_docs_per_fp`` drops fingerprints present in more documents
    than that before the self-join (boilerplate guard — identical cap +
    telemetry contract as the LSH buckets, see ``_cap_buckets``).
    ``min_shared`` > 1 suppresses single-window coincidences.

    SCALE: one scan to winnowed (id, fp) pairs, the capped fp-keyed
    self-join (pair volume tracks real overlap, not n²), one count
    aggregate on (id_a, id_b). Text never shuffles."""
    fps = winnow_fingerprints(df, text_col, id_col, k, window, hasher)
    fps = _cap_buckets(fps, "fp", max_docs_per_fp, telemetry_out)
    a, b = fps.alias("a"), fps.alias("b")
    return (a.join(b, (F.col("a.fp") == F.col("b.fp"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.count(F.lit(1)).alias("shared_fps"))
             .where(F.col("shared_fps") >= min_shared))


def overlap_share(df: DataFrame, text_col: str, id_col: str,
                  k: int = 8, window: int = 4,
                  max_docs_per_fp: int | None = 200,
                  hasher: str = "xxhash64",
                  telemetry_out: dict | None = None) -> DataFrame:
    """Per-document duplication coverage: what share of a doc's
    winnowed fingerprints also appear in at least one OTHER document —
    the corpus-level "how much of this page is recycled text" metric
    (near 1.0 = assembled from boilerplate even if no single pair
    crosses a near-dup threshold). Output: (id, n_fps, shared_fps,
    overlap_share).

    SCALE: winnowed pairs -> one fp-keyed aggregate marking fps with
    >= 2 distinct docs (8-byte keys) -> join back -> one per-doc
    aggregate. Two shuffles of hash-sized rows; ``max_docs_per_fp``
    caps degenerate fps the same way (capped fps drop from BOTH the
    numerator and denominator — telemetry says how many)."""
    fps = winnow_fingerprints(df, text_col, id_col, k, window, hasher)
    fps = _cap_buckets(fps, "fp", max_docs_per_fp, telemetry_out)
    shared = (fps.groupBy("fp")
                 .agg(F.count(F.lit(1)).alias("__nd"))
                 .select("fp", (F.col("__nd") > 1).alias("__shared")))
    return (fps.join(shared, "fp")
               .groupBy(F.col(id_col).alias("id"))
               .agg(F.count(F.lit(1)).alias("n_fps"),
                    F.sum(F.col("__shared").cast("int")).alias("shared_fps"))
               .select("id", "n_fps", "shared_fps",
                       F.round(F.col("shared_fps")
                               / F.col("n_fps").cast("double"), 6)
                        .alias("overlap_share")))
