"""Text-analysis column expressions for large-scale training-data
pipelines: token counting, quality scoring, language ID, fingerprinting.

All of these are pure Column expressions (JVM-side, whole-stage
codegen) — no Python in the row path. They complement the validation
engine: the same single-pass aggregate/profile machinery consumes them.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Tiny per-language stopword marker sets for the n-gram language-ID
# heuristic. Deliberately small: the point is deterministic, cheap,
# JVM-side scoring, not SOTA accuracy.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "et", "est", "des", "une", "que"],
    "es": ["el", "la", "los", "las", "es", "una", "que", "por"],
}

STOPWORDS_EN = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "as", "with", "was", "at", "by", "be", "this",
]


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-flavored token estimate: word pieces + digits + punctuation
    counted separately (a common regex approximation of tokenizer
    output; ~chars/4 for English)."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.regexp_extract_all(
        c, F.lit(r"[A-Za-z]{1,4}|\d|[^\sA-Za-z\d]"), 0)
    return F.size(pieces)


def quality_score(col: Column | str) -> Column:
    """Heuristic [0,1] quality score from length / punctuation density /
    stopword ratio — the standard cheap pre-filter for web-scale corpora
    (C4-style heuristics expressed as one Column)."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("double")
    n_tokens = token_count(c).cast("double")
    n_punct = (n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))) \
        .cast("double")
    words = F.split(F.lower(F.trim(c)), r"\s+")
    n_stop = F.size(F.array_intersect(words, F.array(
        *[F.lit(w) for w in STOPWORDS_EN]))).cast("double")
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(
        n_punct / F.greatest(n_chars, F.lit(1.0)) * F.lit(5.0), F.lit(1.0))
    stop_score = F.least(
        n_stop / F.greatest(n_tokens, F.lit(1.0)) * F.lit(10.0), F.lit(1.0))
    score = (len_score + punct_score + stop_score) / F.lit(3.0)
    return F.when(c.isNull() | (F.length(F.trim(c)) == 0), F.lit(0.0)) \
            .otherwise(F.round(score, 6))


def lang_id(col: Column | str) -> Column:
    """Marker-word language ID over {en,de,fr,es}; 'und' (undetermined)
    when no marker hits. One pass, array intersections only."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.lower(F.trim(c)), r"\s+")
    scores = [
        (lang, F.size(F.array_intersect(
            words, F.array(*[F.lit(w) for w in markers]))))
        for lang, markers in LANG_MARKERS.items()
    ]
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    # reverse order so earlier languages win ties deterministically
    for lang, s in reversed(scores):
        expr = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(col: Column | str) -> Column:
    """64-bit rolling-hash document fingerprint over normalized text
    (case-folded, whitespace-collapsed) — stable content identity for
    exact dedup at scale."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.xxhash64(normalized)


def shingles(col: Column | str, k: int = 3) -> Column:
    """Word k-shingles as an array<string> — input to MinHash / Jaccard.
    Built with transform() over a token array: JVM-side, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    return shingles_from_tokens(F.split(F.lower(F.trim(c)), r"\s+"), k)


# --- PII pattern scan ------------------------------------------------------
# Patterns stick to the Java/RE2 common dialect (no lookaround, no
# backrefs) so the SAME strings run under Spark rlike/regexp_count AND
# the DuckDB oracle. Heuristic by design: a compliance pre-filter that
# surfaces density for audit, not a guarantee.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone_us": r"\(\d{3}\)\s?\d{3}-\d{4}|\b\d{3}-\d{3}-\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_counts(col: Column | str) -> dict[str, Column]:
    """{pii_type: occurrences-in-text Column} — one regexp_count per
    pattern, all JVM-side in the same projection (one text scan)."""
    c = F.col(col) if isinstance(col, str) else col
    return {name: F.coalesce(
                F.regexp_count(c, F.lit(pat)), F.lit(0)).alias(name)
            for name, pat in PII_PATTERNS.items()}


def pii_scan(df, text_col: str, id_col: str):
    """Per-document PII occurrence counts (wide: one int column per
    type). Map-only — evaluates inside the scan stage."""
    return df.select(F.col(id_col), *pii_counts(text_col).values())


def pii_summary(df, text_col: str):
    """Corpus-level audit: per PII type, total occurrences and number
    of documents affected — ONE aggregate over the per-doc counts."""
    counts = pii_counts(text_col)
    aggs = []
    for name in counts:
        aggs.append(F.sum(name).cast("bigint").alias(f"{name}_total"))
        aggs.append(F.count(F.when(F.col(name) > 0, 1))
                     .cast("bigint").alias(f"{name}_docs"))
    wide = df.select(*counts.values()).agg(*aggs)
    names = list(counts)
    stack = ", ".join(
        f"'{n}', `{n}_total`, `{n}_docs`" for n in names)
    return wide.selectExpr(
        f"stack({len(names)}, {stack}) as (pii_type, total_matches, docs_affected)")


def repetition_stats(df, text_col: str, id_col: str):
    """Boilerplate/repetition detection per document:

    * ``top_token_frac`` — fraction of tokens that are the single most
      frequent token (a page of 'buy buy buy …' scores → 1.0);
    * ``dup_trigram_frac`` — fraction of word 3-grams that are repeats
      of an earlier 3-gram in the same doc (template/boilerplate text
      repeats long spans; C4 uses the same family of heuristics).

    Empty / NULL texts are excluded (no tokens → no signal). SCALE:
    the token mode is explode + TWO-stage aggregate — (doc, token)
    partial counts collapse map-side exactly like the profile melt, so
    a doc repeating one token 10^6 times contributes one row per
    partition, not 10^6 shuffle rows. The trigram fraction is pure
    array arithmetic in the same scan (no shuffle)."""
    base = (df.where(F.col(text_col).isNotNull()
                     & (F.length(F.trim(text_col)) > 0))
              .select(F.col(id_col),
                      F.split(F.lower(F.trim(text_col)), r"\s+")
                       .alias("__toks")))
    tok_counts = (base.select(id_col, F.explode("__toks").alias("tok"))
                      .groupBy(id_col, "tok")
                      .agg(F.count(F.lit(1)).alias("c")))
    mode_frac = (tok_counts.groupBy(id_col)
                 .agg((F.max("c") / F.sum("c")).alias("top_token_frac")))
    # materialize the shingle array ONCE: transform()-based
    # higher-order functions are CodegenFallback, so whole-stage
    # subexpression elimination would NOT merge two occurrences —
    # without this every doc's trigram array is built twice
    tri = (base.withColumn("__tri", shingles_from_tokens("__toks", 3))
               .select(
                   F.col(id_col),
                   (F.lit(1.0) - F.size(F.array_distinct("__tri"))
                    / F.greatest(F.size("__tri"), F.lit(1)))
                   .alias("dup_trigram_frac")))
    return (mode_frac.join(tri, id_col)
            .select(id_col,
                    F.round("top_token_frac", 6).alias("top_token_frac"),
                    F.round("dup_trigram_frac", 6).alias("dup_trigram_frac")))


def clean_text(col: Column | str) -> Column:
    """Deterministic text normalization for training-data ingest — pure
    Column expressions (regexp_replace/translate chains, whole-stage
    codegen, no UDF), so the cleaning decision is identical in every
    engine:

    1. strip C0/C1 control characters (keeping \\t \\n \\r for step 2);
    2. normalize typographic variants: curly quotes → straight,
       en/em/horizontal dashes → '-', NBSP/thin spaces → ' ',
       ellipsis char → '...';
    3. collapse ALL whitespace runs to one space and trim.

    NULL passes through as NULL (no coalesce — a missing document is
    not an empty one)."""
    c = F.col(col) if isinstance(col, str) else col
    # 1: control chars (x00-x08 x0B x0C x0E-x1F x7F-x9F), keep \t\n\r
    s = F.regexp_replace(
        c, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x80-\\x9F]", "")
    # 2: typographic normalization — translate() is one pass per char
    s = F.translate(
        s,
        "\u2018\u2019\u201a\u201c\u201d\u201e"   # curly quotes
        "\u2013\u2014\u2015"                        # en/em/horizontal dash
        "\u00a0\u2009\u202f",                       # nbsp/thin/narrow-nbsp
        "'''\"\"\"---   ")
    s = F.regexp_replace(s, "\u2026", "...")
    # 3: whitespace collapse + trim
    return F.trim(F.regexp_replace(s, "\\s+", " "))


def shingles_from_tokens(toks_col: Column | str, k: int = 3) -> Column:
    """Word k-shingles from an ALREADY-TOKENIZED array column (same
    semantics as ``shingles``, without re-splitting the text).

    The token array is LET-BOUND (functions/exprs.py): the lambda
    reads it per shingle, and an unbound expression argument (e.g. the
    split built by ``shingles``) would re-evaluate per element —
    O(len²) per row on long documents (measured 260 s vs ~1 s for
    3-shingles over 20k × 400-word docs)."""
    from .exprs import let_col
    toks = F.col(toks_col) if isinstance(toks_col, str) else toks_col

    def body(t: Column) -> Column:
        n = F.size(t)
        idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
        return F.when(n < k, F.array(F.concat_ws(" ", t))).otherwise(
            F.transform(idx, lambda i: F.concat_ws(
                " ", *[F.element_at(t, (i + j + 1).cast("int"))
                       for j in range(k)])))

    return let_col(toks, body)


def top_tokens(df, text_col: str, k: int = 20) -> "DataFrame":
    """Corpus vocabulary head: the ``k`` most frequent whitespace
    tokens (case-folded) with their counts — output (token, n), ordered
    by count desc then token asc (deterministic tiebreak).

    The standard first look at a web-scale corpus (vocabulary head
    inspection, boilerplate-token discovery, stopword curation).

    SCALE: classic wordcount — explode + TWO-stage hash aggregate, so
    per-partition partial counts collapse map-side and the shuffle
    carries one row per (partition, distinct token), not per token
    occurrence. The final top-k is ``orderBy().limit(k)`` over the
    distinct-vocabulary frame (≪ corpus), which Spark executes as
    TakeOrderedAndProject — each task keeps a k-row heap; no global
    sort materializes. Empty/NULL texts carry no tokens."""
    c = F.col(text_col)
    toks = (df.where(c.isNotNull() & (F.length(F.trim(c)) > 0))
              .select(F.explode(F.split(F.lower(F.trim(c)), r"\s+"))
                       .alias("token")))
    counts = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"))
    return counts.orderBy(F.col("n").desc(), F.col("token").asc()).limit(k)


def gopher_rules(df, text_col: str, id_col: str, *,
                 min_words: int = 5, max_words: int = 100_000,
                 min_mean_word_len: float = 3.0,
                 max_mean_word_len: float = 10.0,
                 min_alpha_frac: float = 0.8,
                 min_stop_hits: int = 2) -> "DataFrame":
    """Gopher-style per-document quality-filter verdicts: one row per
    document with the measured stats, a 0/1 flag per rule, and the
    overall ``passes`` flag — the audit-friendly form (a pipeline wants
    to know WHY a doc was dropped, not just that it was). Thresholds
    follow Rae et al. 2021 ("Scaling Language Models: ... Gopher",
    Table A1 — public paper), with the word-count floor scaled down
    from the paper's 50 to suit short-doc fixtures.

    Rules (all pure Column expressions, one scan, map-only):

    * ``ok_word_count``    — word count within [min_words, max_words];
    * ``ok_mean_word_len`` — mean word length within [3, 10] (gibberish
      and char-mashed text fall outside);
    * ``ok_alpha``         — ≥80% of words contain a letter (symbol/
      number soup fails);
    * ``ok_stop``          — ≥2 distinct English stopwords present
      (the classic machine-generated-text tell).

    NULL/empty documents get n_words=0, NULL stats, and fail every
    rule (a missing document is never training-worthy). Mean word
    length is computed as squashed-length/word-count so the SQL oracle
    can reproduce it without array aggregation."""
    c = F.col(text_col)
    empty = c.isNull() | (F.length(F.trim(c)) == 0)
    words = F.split(F.lower(F.trim(c)), r"\s+")
    n_words = F.when(empty, F.lit(0)).otherwise(F.size(words)) \
               .cast("bigint")
    squashed = F.length(F.regexp_replace(F.trim(c), r"\s+", ""))
    mean_wl = F.when(n_words > 0, squashed.cast("double") / n_words)
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(words, lambda w: w.rlike("[a-z]")))
         .cast("double") / n_words)
    stop_hits = F.when(empty, F.lit(0)).otherwise(
        F.size(F.array_distinct(
            F.filter(words, lambda w: w.isin(*STOPWORDS_EN))))) \
        .cast("bigint")
    ok_wc = ((n_words >= min_words) & (n_words <= max_words)).cast("int")
    ok_mwl = F.coalesce((mean_wl >= min_mean_word_len)
                        & (mean_wl <= max_mean_word_len),
                        F.lit(False)).cast("int")
    ok_alpha = F.coalesce(alpha_frac >= min_alpha_frac,
                          F.lit(False)).cast("int")
    ok_stop = (stop_hits >= min_stop_hits).cast("int")
    passes = ((ok_wc == 1) & (ok_mwl == 1) & (ok_alpha == 1)
              & (ok_stop == 1)).cast("int")
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        stop_hits.alias("stop_hits"),
        ok_wc.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_alpha.alias("ok_alpha"),
        ok_stop.alias("ok_stop"),
        passes.alias("passes"))


# --- Encoding / mojibake QA -------------------------------------------------
# Encoding-artifact battery for web-scale ingest QA. Each pattern is
# valid (and was verified count-identical) under BOTH Java regex
# (Spark regexp_count) and RE2 (DuckDB regexp_extract_all), so the
# oracle can replay the exact same strings. Heuristic by design, like
# PII_PATTERNS: a density signal for audit, not a decoder.
ENCODING_PATTERNS: dict[str, str] = {
    # U+FFFD — a decoder already gave up on these bytes upstream
    "replacement_chars": "�",
    # C0 controls except \t \n \r — binary junk inside "text"
    "control_chars": "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]",
    # UTF-8 bytes decoded as Latin-1/cp1252: 2-byte sequences surface
    # as Ã/Â + a char in U+00A0–U+00BF (é→Ã©, »→Â»), 3-byte
    # punctuation as the literal digraph â€ (’→â€™, “→â€œ)
    "mojibake_seqs": "â€|Ã[ -¿]|Â[ -¿]",
}


def encoding_artifact_counts(col: Column | str) -> dict[str, Column]:
    """{artifact_type: occurrences-in-text Column} — one regexp_count
    per pattern, all JVM-side in the same projection (one text scan)."""
    c = F.col(col) if isinstance(col, str) else col
    return {name: F.coalesce(
                F.regexp_count(c, F.lit(pat)), F.lit(0)).alias(name)
            for name, pat in ENCODING_PATTERNS.items()}


def encoding_qa(df, text_col: str, id_col: str):
    """Per-document encoding-artifact counts plus an ``is_clean`` flag
    (1 = no artifact of any type). Map-only — evaluates inside the
    scan; the natural pre-filter before fingerprinting/dedup, since
    mojibake makes byte-identical content hash differently."""
    counts = encoding_artifact_counts(text_col)
    clean = F.lit(True)
    for c in counts.values():
        clean = clean & (c == 0)
    return df.select(F.col(id_col), *counts.values(),
                     clean.cast("int").alias("is_clean"))


def encoding_summary(df, text_col: str, group_col: str | None = None):
    """Corpus (or per-group) encoding health: doc counts, affected-doc
    counts and total occurrences per artifact type — ONE hash
    aggregate over the map-side per-doc counts; long text never
    shuffles (only the small int vector does)."""
    counts = encoding_artifact_counts(text_col)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_docs")]
    dirty = None
    for name in counts:
        aggs.append(F.sum(name).cast("bigint").alias(f"{name}_total"))
        aggs.append(F.count(F.when(F.col(name) > 0, 1))
                     .cast("bigint").alias(f"{name}_docs"))
        cond = F.col(name) > 0
        dirty = cond if dirty is None else (dirty | cond)
    aggs.append(F.count(F.when(dirty, 1)).cast("bigint")
                 .alias("dirty_docs"))
    keys = [group_col] if group_col else []
    wide = df.select(*([F.col(group_col)] if group_col else []),
                     *counts.values())
    return wide.groupBy(*keys).agg(*aggs)


# --- Markup / URL density ---------------------------------------------------
# Web-corpus cleaning signal: text that is still full of HTML tags,
# entities, or bare URLs escaped the extractor. Same dual-dialect
# (Java + RE2) discipline as ENCODING_PATTERNS.
MARKUP_PATTERNS: dict[str, str] = {
    "html_tags": "<[A-Za-z/][^>]*>",
    "urls": "https?://[^\\s<>\"']+",
    "html_entities": "&[A-Za-z]+;|&#[0-9]+;",
}


def markup_stats(df, text_col: str, id_col: str):
    """Per-document markup density: occurrence counts per pattern plus
    ``markup_char_ratio`` — the fraction of characters consumed by
    tag/entity/URL matches (computed by deleting the matches and
    comparing lengths, so it stays a pure Column chain). Map-only."""
    c = F.col(text_col)
    counts = {name: F.coalesce(
                  F.regexp_count(c, F.lit(pat)), F.lit(0)).alias(name)
              for name, pat in MARKUP_PATTERNS.items()}
    stripped = c
    for pat in MARKUP_PATTERNS.values():
        stripped = F.regexp_replace(stripped, pat, "")
    n = F.length(c).cast("double")
    ratio = F.when(n > 0,
                   F.round((n - F.length(stripped)) / n, 6))
    return df.select(F.col(id_col), *counts.values(),
                     ratio.alias("markup_char_ratio"))


def vocab_stats(df, text_col: str) -> "DataFrame":
    """Corpus vocabulary summary in ONE row: token occurrences
    (``n_tokens``), distinct types (``n_types``), type/token ratio,
    hapax legomena count + share (types occurring exactly once — the
    Zipf tail; a collapsing hapax share is the classic symptom of
    template/boilerplate-dominated or deduplicated-to-death corpora)
    and the head token's share of all occurrences (``top_share``).

    Same case-folded whitespace tokenization as ``top_tokens``;
    empty/NULL texts carry no tokens.

    SCALE: wordcount two-stage hash aggregate (map-side partial
    collapse — the shuffle carries one row per (partition, distinct
    token)), then ONE global aggregate over the vocabulary-sized
    counts frame. No sort, no top-k heap, no row data after the first
    aggregate."""
    c = F.col(text_col)
    toks = (df.where(c.isNotNull() & (F.length(F.trim(c)) > 0))
              .select(F.explode(F.split(F.lower(F.trim(c)), r"\s+"))
                       .alias("token")))
    counts = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"))
    return (counts.agg(
                F.coalesce(F.sum("n"), F.lit(0)).cast("bigint")
                 .alias("n_tokens"),
                F.count(F.lit(1)).cast("bigint").alias("n_types"),
                F.count(F.when(F.col("n") == 1, 1)).cast("bigint")
                 .alias("n_hapax"),
                F.coalesce(F.max("n"), F.lit(0)).cast("bigint")
                 .alias("top_n"))
            .select(
                "n_tokens", "n_types",
                F.when(F.col("n_tokens") > 0,
                       F.round(F.col("n_types")
                               / F.col("n_tokens").cast("double"), 6))
                 .alias("type_token_ratio"),
                "n_hapax",
                F.when(F.col("n_types") > 0,
                       F.round(F.col("n_hapax")
                               / F.col("n_types").cast("double"), 6))
                 .alias("hapax_share"),
                F.when(F.col("n_tokens") > 0,
                       F.round(F.col("top_n")
                               / F.col("n_tokens").cast("double"), 6))
                 .alias("top_share")))


def ngram_diversity(df, text_col: str, group_col: str,
                    n: int = 2) -> "DataFrame":
    """Per-group distinct-n diversity: total word n-gram occurrences
    vs distinct n-grams, and their ratio (the distinct-n metric of
    text-generation evaluation, applied corpus-side) — a collapsing
    ratio flags template-dominated or self-repetitive slices that
    per-document ``repetition_stats`` can't see (each doc looks fine;
    the SLICE repeats itself).

    Tokenization matches ``top_tokens`` (case-folded whitespace
    split); documents with fewer than ``n`` tokens contribute nothing.
    Output per group: group, n_ngrams, n_distinct, distinct_ratio.

    SCALE: n-grams assemble inside the scan projection (transform over
    the token array — JVM-side, no UDF) and are hashed to 8 bytes
    BEFORE the explode, so the shuffle carries (group, hash) pairs,
    never n-gram text; TWO-stage hash aggregate — (group, hash)
    partials collapse map-side, then one group-keyed aggregate over
    the vocabulary-sized frame. No sort, no window."""
    from .exprs import let_col
    c = F.col(text_col)

    def gram_hashes(t: Column) -> Column:
        # t is the LET-BOUND token array (see shingles_from_tokens —
        # an unbound split here re-evaluates per element, O(len²))
        sz = F.size(t)
        idx = F.sequence(F.lit(0), sz - n)
        return F.when(sz >= n, F.transform(idx, lambda i: F.xxhash64(
            F.concat_ws(" ", *[F.element_at(t, (i + j + 1).cast("int"))
                               for j in range(n)])))) \
                .otherwise(F.array().cast("array<bigint>"))

    grams = let_col(F.split(F.lower(F.trim(c)), r"\s+"), gram_hashes)
    pairs = (df.where(c.isNotNull() & (F.length(F.trim(c)) > 0))
               .select(F.col(group_col),
                       F.explode(grams).alias("__g")))
    per_gram = (pairs.groupBy(F.col(group_col), F.col("__g"))
                     .agg(F.count(F.lit(1)).cast("bigint")
                           .alias("__n")))
    return (per_gram.groupBy(F.col(group_col))
            .agg(F.sum("__n").cast("bigint").alias("n_ngrams"),
                 F.count(F.lit(1)).cast("bigint").alias("n_distinct"))
            .select(group_col, "n_ngrams", "n_distinct",
                    F.when(F.col("n_ngrams") > 0,
                           F.round(F.col("n_distinct")
                                   / F.col("n_ngrams").cast("double"),
                                   6)).alias("distinct_ratio")))


def url_domains(df, text_col: str, id_col: str, k: int = 20
                ) -> "DataFrame":
    """Top-k URL domains cited inside document text — the
    blocklist/whitelist curation view of a web corpus (which hosts
    dominate the link mass, which docs to re-crawl or drop). Output
    (domain, n_occurrences, n_docs), ordered by occurrences desc then
    domain asc; domains are case-folded hosts (no port/path).

    SCALE: ONE scan — URLs extract and reduce to hosts inside the scan
    projection (regexp battery, same dual Java/RE2 dialect as
    MARKUP_PATTERNS), then one hash aggregate per domain (the
    countDistinct(doc) expands to a standard two-phase agg over
    (domain, id) pairs — ids, never text, ride the shuffle). The final
    top-k is TakeOrderedAndProject (per-task heap — no global sort)."""
    c = F.col(text_col)
    urls = F.regexp_extract_all(c, F.lit(MARKUP_PATTERNS["urls"]), 0)
    host = lambda u: F.lower(F.regexp_extract(
        u, r"^https?://([^/:?#]+)", 1))
    domains = F.filter(F.transform(urls, host),
                       lambda d: F.length(d) > 0)
    pairs = (df.where(c.isNotNull())
               .select(F.col(id_col).alias("__doc"),
                       F.explode(domains).alias("domain")))
    return (pairs.groupBy("domain")
                 .agg(F.count(F.lit(1)).cast("bigint")
                       .alias("n_occurrences"),
                      F.countDistinct("__doc").cast("bigint")
                       .alias("n_docs"))
                 .orderBy(F.col("n_occurrences").desc(),
                          F.col("domain").asc())
                 .limit(k))


def fertility_stats(df, text_col: str, group_col: str) -> "DataFrame":
    """Per-group tokenizer fertility: BPE-ish tokens per whitespace
    word (``fertility``) and characters per BPE-ish token
    (``chars_per_token``) — the standard multilingual audit (a
    language whose fertility is 2× English pays 2× the context budget
    per word; mixture weights and per-lang length thresholds hang off
    this table).

    Output per group: n_docs, n_words, n_bpe_tokens, n_chars,
    fertility, chars_per_token. Empty/NULL texts contribute zero mass
    but still count as documents of their group.

    SCALE: both token counts and the length evaluate inside the scan
    projection (same dual-dialect expressions as ``token_counts`` /
    ``bpe_token_counts``); ONE hash aggregate on the group key — text
    never shuffles, only per-doc int triples do."""
    words = F.coalesce(token_count(text_col).cast("bigint"), F.lit(0))
    toks = F.coalesce(bpe_ish_token_count(text_col).cast("bigint"),
                      F.lit(0))
    chars = F.coalesce(F.length(F.col(text_col)).cast("bigint"),
                       F.lit(0))
    wide = df.select(F.col(group_col), words.alias("__w"),
                     toks.alias("__t"), chars.alias("__c"))
    return (wide.groupBy(group_col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum("__w").cast("bigint").alias("n_words"),
                 F.sum("__t").cast("bigint").alias("n_bpe_tokens"),
                 F.sum("__c").cast("bigint").alias("n_chars"))
            .select(group_col, "n_docs", "n_words", "n_bpe_tokens",
                    "n_chars",
                    F.when(F.col("n_words") > 0,
                           F.round(F.col("n_bpe_tokens")
                                   / F.col("n_words").cast("double"),
                                   6)).alias("fertility"),
                    F.when(F.col("n_bpe_tokens") > 0,
                           F.round(F.col("n_chars")
                                   / F.col("n_bpe_tokens")
                                      .cast("double"), 6))
                     .alias("chars_per_token")))


# --- Unigram-LM quality scoring (perplexity proxy) -------------------------

_OOV_SENTINEL = ""     # whitespace-split of trimmed text never yields ""


def train_unigram_lm(df, text_col: str, vocab_size: int = 50_000):
    """Train an add-one-smoothed unigram language model over the
    corpus: (token, logp) for the top-``vocab_size`` tokens (by count
    desc, token asc — deterministic cutoff) plus ONE out-of-vocabulary
    sentinel row (token "" — unreachable by whitespace tokenization).

    p(t) = (c_t + 1) / (N + V + 1) for in-vocab tokens,
    p(OOV) = 1 / (N + V + 1), with N = total token occurrences and
    V = min(vocab_size, distinct tokens). logp is ln(p) rounded to 8
    decimals so the scores are engine-portable (libm last-ulp noise
    cannot survive the rounding).

    SCALE: one wordcount (two-stage hash agg, map-side collapse), one
    1-row total aggregate, one TakeOrderedAndProject top-V — the model
    frame is <= vocab_size+1 rows and persists like any manifest
    table. The N/V scalars ride a 1-row collect (driver-safe)."""
    c = F.col(text_col)
    toks = (df.where(c.isNotNull() & (F.length(F.trim(c)) > 0))
              .select(F.explode(F.split(F.lower(F.trim(c)), r"\s+"))
                       .alias("token")))
    counts = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = counts.agg(F.sum("n").alias("N"),
                     F.count(F.lit(1)).alias("D")).first()
    if tot["N"] is None:
        raise ValueError("train_unigram_lm: corpus has no tokens")
    big_n, v = int(tot["N"]), min(vocab_size, int(tot["D"]))
    denom = float(big_n + v + 1)
    vocab = counts.orderBy(F.col("n").desc(), F.col("token").asc()) \
                  .limit(vocab_size)
    lm = vocab.select(
        "token",
        F.round(F.log((F.col("n") + 1).cast("double") / F.lit(denom)), 8)
         .alias("logp"))
    import math
    oov = df.sparkSession.createDataFrame(
        [(_OOV_SENTINEL, round(math.log(1.0 / denom), 8))],
        "token: string, logp: double")
    return lm.unionByName(oov)


def unigram_logprob_scores(df, text_col: str, id_col: str,
                           lm=None, vocab_size: int = 50_000):
    """Per-document mean negative log-probability under a unigram LM —
    the cheap perplexity proxy (CCNet-style quality bucketing scores
    documents under a reference LM; here the model is a unigram table
    so the whole pass stays declarative — no external LM binary).
    Lower = more typical of the training corpus; gibberish and
    wrong-language docs score high. Output: (id, n_tokens,
    avg_neg_logp). NULL/empty docs carry no tokens and emit no row.

    ``lm`` defaults to self-scoring (train on ``df`` via
    ``train_unigram_lm``); pass a persisted model frame to score
    against a reference corpus instead (drift-robust mode).

    SCALE: tokens explode map-side and join the vocab-sized LM frame
    (AQE broadcasts it — no forced hint); the OOV logp rides a 1-row
    broadcast cross join, so scoring is ONE scan + one per-doc
    aggregate with map-side partial sums. Token strings shuffle only
    as (id, partial-sum) aggregate state, never as rows."""
    if lm is None:
        lm = train_unigram_lm(df, text_col, vocab_size)
    c = F.col(text_col)
    toks = (df.where(c.isNotNull() & (F.length(F.trim(c)) > 0))
              .select(F.col(id_col).alias("id"),
                      F.explode(F.split(F.lower(F.trim(c)), r"\s+"))
                       .alias("token")))
    oov = (lm.where(F.col("token") == _OOV_SENTINEL)
             .select(F.col("logp").alias("__oov_logp")))
    voc = lm.where(F.col("token") != _OOV_SENTINEL)
    scored = (toks.join(voc, "token", "left")
                  .crossJoin(oov)
                  .select("id", F.coalesce("logp", "__oov_logp")
                                 .alias("__lp")))
    return (scored.groupBy("id")
                  .agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
                       F.round(-F.sum("__lp")
                               / F.count(F.lit(1)).cast("double"), 4)
                        .alias("avg_neg_logp")))


def distinctive_terms(df, text_col: str, group_col: str,
                      k: int = 10) -> "DataFrame":
    """TF-IDF distinctive vocabulary per group: for each group (source,
    language, split), the ``k`` tokens most over-represented there —
    score = tf(group, token) · ln(N_groups / df(token)), the standard
    'what makes this slice different' probe for corpus mixing and
    contamination triage (a token present in every group scores 0).

    Tokenization matches ``top_tokens`` (case-folded whitespace split,
    empty/NULL texts carry nothing). Rank is deterministic across
    engines: scores are pinned to 6dp BEFORE the per-group ordering
    (rounded score desc, token asc), so float ulp noise cannot reorder
    the top-k between Spark and an independent SQL replay.

    Output: group, token, tf, n_groups_with_token, score, rank (1..k).

    SCALE: explode + TWO map-side-combined hash aggs (per-(group,
    token) tf, then per-token group-df over the already-distinct tf
    frame); the group count N broadcasts as a 1-row frame; the final
    window ranks the vocabulary-sized tf frame per group — corpus text
    never shuffles, only (group, token) pairs do."""
    from pyspark.sql import Window

    c = F.col(text_col)
    toks = (df.where(c.isNotNull() & (F.length(F.trim(c)) > 0)
                     & F.col(group_col).isNotNull())
              .select(F.col(group_col).alias("group"),
                      F.explode(F.split(F.lower(F.trim(c)), r"\s+"))
                       .alias("token")))
    tf = toks.groupBy("group", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf"))
    dfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups_with_token"))
    n_groups = tf.select("group").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("__n"))
    scored = (tf.join(dfreq, "token")
                .crossJoin(F.broadcast(n_groups))
                .withColumn("score", F.round(
                    F.col("tf") * F.log(F.col("__n") /
                                        F.col("n_groups_with_token")), 6))
                .drop("__n"))
    w = Window.partitionBy("group").orderBy(
        F.col("score").desc(), F.col("token").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("group", "token", "tf", "n_groups_with_token",
                          "score", "rank"))


def zipf_slope(df, text_col: str, group_col: str,
               top_v: int = 500) -> "DataFrame":
    """Zipf-law fit per corpus slice: OLS of ln(freq) on ln(rank) over
    the ``top_v`` most frequent tokens — a healthy natural-language
    slice sits near slope −1 with high r²; templated/boilerplate or
    synthetic slices bend the curve (slope far from −1, low r²). The
    screen catches generator collapse and log-dump contamination that
    per-document quality rules miss.

    Tokenization matches ``top_tokens``. Frequency ranks pin ties by
    token asc, but tied frequencies contribute identical y values so
    the fit itself is tiebreak-invariant within a tied block's x-sum.
    Slope/intercept/r² via covar_pop/var_pop (identical replay in any
    SQL engine), rounded to 6dp.

    Output per group: group, n_tokens (≤ top_v), slope, intercept, r2
    (slope/r2 NULL when fewer than 2 distinct ranks).

    SCALE: explode + one map-side-combined (group, token) count, then
    a vocabulary-sized rank window per group and ONE moment aggregate —
    corpus text never shuffles."""
    from pyspark.sql import Window

    c = F.col(text_col)
    toks = (df.where(c.isNotNull() & (F.length(F.trim(c)) > 0)
                     & F.col(group_col).isNotNull())
              .select(F.col(group_col).alias("group"),
                      F.explode(F.split(F.lower(F.trim(c)), r"\s+"))
                       .alias("token")))
    tf = toks.groupBy("group", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf"))
    w = Window.partitionBy("group").orderBy(
        F.col("tf").desc(), F.col("token").asc())
    ranked = (tf.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= top_v)
                .select("group",
                        F.log(F.col("rank").cast("double")).alias("__x"),
                        F.log(F.col("tf").cast("double")).alias("__y")))
    agg = (ranked.groupBy("group")
                 .agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
                      F.covar_pop("__x", "__y").alias("__cxy"),
                      F.var_pop("__x").alias("__vx"),
                      F.var_pop("__y").alias("__vy"),
                      F.avg("__x").alias("__mx"),
                      F.avg("__y").alias("__my")))
    slope = F.col("__cxy") / F.col("__vx")
    return agg.select(
        "group", "n_tokens",
        F.when(F.col("__vx") > 0, F.round(slope, 6)).alias("slope"),
        F.when(F.col("__vx") > 0,
               F.round(F.col("__my") - slope * F.col("__mx"), 6))
         .alias("intercept"),
        F.when((F.col("__vx") > 0) & (F.col("__vy") > 0),
               F.round(F.col("__cxy") * F.col("__cxy")
                       / (F.col("__vx") * F.col("__vy")), 6))
         .alias("r2"))


def whitespace_stats(df, cols: list[str]) -> "DataFrame":
    """Whitespace-hygiene profile per column: counts of values with
    leading/trailing whitespace, embedded newlines, runs of multiple
    spaces, and tabs — plus how many values CHANGE under trim. The
    quantified version of the reference's silent newline scrub
    (src/schema_validata.py remove_pd_df_newlines, ~:1011): before an
    engine strips whitespace, a validator should say how much there is
    and where, because trailing-space keys break joins and embedded
    newlines break CSV round-trips.

    Output per column: ``column_name, n_values (non-null),
    n_leading_ws, n_trailing_ws, n_embedded_newlines,
    n_multi_spaces, n_tabs, n_trim_changed``.

    SCALE: every counter is a single-pass rlike/comparison inside ONE
    global aggregate (whole-stage codegen, no Python, no shuffle of
    values — only the final one-row-per-column partials)."""
    from pyspark.sql import functions as F

    from .colref import qcol

    out = None
    aggs = []
    for c in cols:
        s = qcol(c).cast("string")
        nn = s.isNotNull()

        def g(e):
            return F.coalesce(F.sum(F.when(nn & e, 1).otherwise(0)),
                              F.lit(0)).cast("bigint")
        aggs.append(F.struct(
            F.coalesce(F.sum(nn.cast("int")), F.lit(0)).cast("bigint")
             .alias("n_values"),
            # explicit class, not \s: Java's \s includes \x0B,
            # RE2's (DuckDB) does not — pin the vocabulary so both
            # engines count identically
            g(s.rlike(r"^[ \t\n\r\f]")).alias("n_leading_ws"),
            g(s.rlike(r"[ \t\n\r\f]$")).alias("n_trailing_ws"),
            g(s.contains("\n") | s.contains("\r"))
             .alias("n_embedded_newlines"),
            g(s.rlike("  ")).alias("n_multi_spaces"),
            g(s.contains("\t")).alias("n_tabs"),
            g(F.trim(s) != s).alias("n_trim_changed"),
        ).alias(f"__s_{c}"))
    one = df.agg(*aggs)
    # ONE aggregate, then explode the per-column structs on the
    # 1-row frame — a union of N projections would replant the
    # aggregate subtree (and the scan) once per column
    fields = ["n_values", "n_leading_ws", "n_trailing_ws",
              "n_embedded_newlines", "n_multi_spaces", "n_tabs",
              "n_trim_changed"]
    rows = F.array(*[
        F.struct(F.lit(c).alias("column_name"),
                 *[F.col(f"`__s_{c}`.{fld}").alias(fld)
                   for fld in fields])
        for c in cols])
    out = (one.select(F.explode(rows).alias("__r"))
              .select("__r.*"))
    return out


# Unicode SCRIPT classes, Java-regex dialect (Spark side). The DuckDB
# oracle uses the RE2 spellings (\p{Latin}, ...) — different pattern
# text, same character sets, so counts agree. Mutually disjoint by
# construction (scripts are disjoint; digits/whitespace are not
# letters), so 'other' = total − Σ classified is well-defined.
SCRIPT_CLASSES: list[tuple[str, str]] = [
    ("latin", r"\p{IsLatin}"),
    ("cyrillic", r"\p{IsCyrillic}"),
    ("han", r"\p{IsHan}"),
    ("arabic", r"\p{IsArabic}"),
    ("digit", r"[0-9]"),
    ("space", r"\s"),
]


def script_mix_stats(df: DataFrame, text_col: str,
                     group_col: str) -> DataFrame:
    """Unicode-script composition per corpus slice: what share of a
    slice's characters are Latin / Cyrillic / Han / Arabic / digits /
    whitespace / other — the mislabeled-language and mojibake screen
    at the character level (a slice labeled 'en' that is 30% Cyrillic
    is mislabeled or encoding-corrupted; lang-ID scores the winner,
    this shows the MIX, and 'other' spiking means replacement chars or
    markup sludge).

    Output per (group, script): group, script (the classes above +
    'other'), n_chars (exact BIGINT), share (of the slice's total
    chars, 6dp). NULL text/group rows are excluded; empty-text docs
    contribute nothing.

    SCALE: per-class counting is length(text) −
    length(regexp_replace(text, class, '')) — JVM regex inside the
    scan projection, no explode of characters; ONE wide hash aggregate
    per group, unpivoted AFTER aggregation. len(SCRIPT_CLASSES)
    multiplies map-side regex work, not shuffle width."""
    from .colref import qcol
    t, g = qcol(text_col), qcol(group_col)
    total = F.length(t)

    def _cnt(pat):
        return total - F.length(F.regexp_replace(t, pat, ""))

    aggs = [F.sum(total).cast("bigint").alias("__total")]
    for name, pat in SCRIPT_CLASSES:
        aggs.append(F.sum(_cnt(pat)).cast("bigint").alias(f"__{name}"))
    per = (df.where(g.isNotNull() & t.isNotNull())
             .groupBy(g.cast("string").alias("group")).agg(*aggs))
    classified = None
    for name, _ in SCRIPT_CLASSES:
        c = F.col(f"__{name}")
        classified = c if classified is None else classified + c
    rows = [F.struct(F.lit(name).alias("script"),
                     F.col(f"__{name}").alias("n_chars"))
            for name, _ in SCRIPT_CLASSES]
    rows.append(F.struct(F.lit("other").alias("script"),
                         (F.col("__total") - classified)
                         .cast("bigint").alias("n_chars")))
    long = (per.select("group", F.col("__total").alias("__t"),
                       F.explode(F.array(*rows)).alias("e"))
               .select("group", "e.script", "e.n_chars", "__t"))
    return long.select(
        "group", "script", "n_chars",
        F.when(F.col("__t") > 0,
               F.round(F.col("n_chars").cast("double")
                       / F.col("__t").cast("double"), 6))
         .alias("share"))


def readability_stats(df, text_col: str, group_col: str) -> "DataFrame":
    """Corpus readability profile per group: Flesch reading ease and
    Flesch-Kincaid grade level from three cheap regex counts — words
    (``\\S+`` runs), sentences (``[.!?]+`` runs), and an approximate
    syllable count (``[aeiouyAEIOUY]+`` vowel groups, the standard
    cheap proxy). Readability is a corpus-mix signal the per-column
    profile can't see: a source whose grade level jumps between
    snapshots changed register (boilerplate injection, OCR noise,
    template text), even if lengths and token counts look stable.

    The reference profiles only counts/lengths (src/schema_validata.py
    :955-1147); this is a north-rule text-QA addition.

    Formulas (corpus-level, from group sums, not per-doc averages):
      flesch   = 206.835 − 1.015·(W/S) − 84.6·(Y/W)
      fk_grade = 0.39·(W/S) + 11.8·(Y/W) − 15.59
    with S and W floored at 1 (punctuation-free corpora would divide
    by zero; a floor of one sentence per corpus is the conventional
    fallback). NULL-text and NULL-group rows are excluded.

    Output per group: group, n_docs, words, sentences, syllables,
    words_per_sentence, syllables_per_word, flesch, fk_grade (6dp).

    SCALE: three ``regexp_count`` column expressions inside ONE
    map-side-combined hash aggregate — the shuffle carries one partial
    row per (task, group). No UDFs, no second scan."""
    t, g = F.col(text_col), F.col(group_col)
    per = (df.where(g.isNotNull() & t.isNotNull())
             .groupBy(g.cast("string").alias("group"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                  F.sum(F.regexp_count(t, F.lit(r"\S+")))
                   .cast("bigint").alias("words"),
                  F.sum(F.regexp_count(t, F.lit(r"[.!?]+")))
                   .cast("bigint").alias("sentences"),
                  F.sum(F.regexp_count(t, F.lit(r"[aeiouyAEIOUY]+")))
                   .cast("bigint").alias("syllables")))
    w = F.greatest(F.col("words"), F.lit(1)).cast("double")
    s = F.greatest(F.col("sentences"), F.lit(1)).cast("double")
    y = F.col("syllables").cast("double")
    wps = w / s
    ypw = y / w
    return per.select(
        "group", "n_docs", "words", "sentences", "syllables",
        F.round(wps, 6).alias("words_per_sentence"),
        F.round(ypw, 6).alias("syllables_per_word"),
        F.round(F.lit(206.835) - F.lit(1.015) * wps
                - F.lit(84.6) * ypw, 6).alias("flesch"),
        F.round(F.lit(0.39) * wps + F.lit(11.8) * ypw
                - F.lit(15.59), 6).alias("fk_grade"))


def unigram_sampling_table(df, text_col: str, vocab_size: int = 1000,
                           power: float = 0.75) -> "DataFrame":
    """Negative-sampling table over the corpus vocabulary head: the
    word2vec-style smoothed unigram distribution p_i = c_i^power /
    Σ c_j^power (power 0.75 flattens the head so frequent tokens are
    not sampled in proportion to raw count) with its cumulative
    distribution — the lookup artifact an embedding-training pipeline
    materializes once per corpus snapshot. Tokenization matches
    ``top_tokens`` (case-folded whitespace split); normalization and
    the CDF run over the top ``vocab_size`` tokens (count desc, token
    asc tiebreak), the standard truncated-vocab contract.

    Output per token: rank (1-based), token, n (bigint), p (6dp),
    cum_p (6dp, reaches 1.0 at the last rank).

    SCALE: the wordcount two-stage aggregate (map-side combined), a
    TakeOrderedAndProject top-k, then window math on the vocab-sized
    frame — the single ordered window runs over ``vocab_size`` rows,
    never the corpus."""
    from pyspark.sql import Window
    c = F.col(text_col)
    toks = (df.where(c.isNotNull() & (F.length(F.trim(c)) > 0))
              .select(F.explode(F.split(F.lower(F.trim(c)), r"\s+"))
                       .alias("token")))
    counts = (toks.groupBy("token")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
              .orderBy(F.col("n").desc(), F.col("token").asc())
              .limit(vocab_size))
    smoothed = F.pow(F.col("n").cast("double"), F.lit(power))
    vocab = counts.select("token", "n", smoothed.alias("__s"))
    tot = vocab.agg(F.sum("__s").alias("__t"))
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    j = vocab.crossJoin(F.broadcast(tot))
    return (j.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        "token", "n",
        F.round(F.col("__s") / F.col("__t"), 6).alias("p"),
        F.round(F.sum(F.col("__s") / F.col("__t")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)), 6)
         .alias("cum_p")))


def vocab_coverage(df, text_col: str,
                   ranks=(10, 100, 1000, 10000)) -> "DataFrame":
    """Vocabulary coverage curve: what share of all token OCCURRENCES
    do the top-k distinct tokens cover, for each k in ``ranks``? The
    tokenizer-budget question in one table — if the top 10k types
    cover 98% of the corpus, a 32k vocab is mostly allocating tail;
    if coverage is still 80%, the corpus is type-rich (code, names,
    multilingual) and fertility will suffer. Complements ``zipf_fit``
    (a slope) and ``concentration_stats`` (HHI) with the actual
    curve points a vocab decision reads off.

    Tokenization matches ``top_tokens`` (case-folded whitespace).
    Output per rank cutoff: rank_k (bigint), covered (occurrences in
    the top-k types, bigint), total (bigint), coverage (6dp), plus
    n_types (distinct tokens overall, same every row) for context.

    SCALE: the wordcount two-stage aggregate, then ONE ordered window
    over the distinct-vocabulary frame (vocab-sized, not corpus-sized)
    and a ≤|ranks| aggregate."""
    from pyspark.sql import Window
    c = F.col(text_col)
    toks = (df.where(c.isNotNull() & (F.length(F.trim(c)) > 0))
              .select(F.explode(F.split(F.lower(F.trim(c)), r"\s+"))
                       .alias("token")))
    counts = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    ranked = counts.select(
        "n", F.row_number().over(w).cast("bigint").alias("__r"),
        F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0))
         .alias("__cum"))
    # one conditional aggregate per cutoff — no join, no second pass
    aggs = [F.sum("n").alias("__t"),
            F.count(F.lit(1)).cast("bigint").alias("__types")]
    for k in ranks:
        aggs.append(F.coalesce(
            F.max(F.when(F.col("__r") <= int(k), F.col("__cum"))),
            F.lit(0).cast("bigint")).alias(f"__cov_{int(k)}"))
    wide = ranked.agg(*aggs)
    rows = [F.struct(F.lit(int(k)).cast("bigint").alias("rank_k"),
                     F.col(f"__cov_{int(k)}").alias("covered"))
            for k in ranks]
    return (wide.select(F.col("__t").cast("bigint").alias("total"),
                        "__types",
                        F.explode(F.array(*rows)).alias("e"))
            .select(F.col("e.rank_k").alias("rank_k"),
                    F.col("e.covered").alias("covered"), "total",
                    F.round(F.col("e.covered")
                            / F.col("total").cast("double"), 6)
                     .alias("coverage"),
                    F.col("__types").alias("n_types")))


def doc_keywords(df, text_col: str, id_col: str,
                 k: int = 3) -> "DataFrame":
    """Top-k TF-IDF keywords per document: the per-document counterpart
    of ``distinctive_terms`` (which works per slice) — the cheap
    summary/labeling pass a curation UI shows next to each doc, and a
    near-dup explanation aid (shared keywords ≈ shared topic).

    tf = in-doc occurrences; idf = ln(N / df) over distinct-doc
    frequency (tokens in every doc score exactly 0 and never rank);
    score = tf·idf, top-k per doc by (score desc, token asc). Output:
    id, rank (1..k), token, score (6dp). Tokenization matches
    ``top_tokens``.

    SCALE: wordcount-shaped two-stage aggregates — (doc, token) tf
    partials collapse map-side, the df frame is vocab-sized, and the
    per-doc top-k is a WindowGroupLimit (per-task k-row heaps), no
    global sort."""
    from pyspark.sql import Window
    c = F.col(text_col)
    toks = (df.where(c.isNotNull() & (F.length(F.trim(c)) > 0))
            .select(F.col(id_col).alias("id"),
                    F.explode(F.split(F.lower(F.trim(c)), r"\s+"))
                     .alias("token")))
    tf = toks.groupBy("id", "token").agg(
        F.count(F.lit(1)).cast("double").alias("__tf"))
    n_docs = (df.where(c.isNotNull() & (F.length(F.trim(c)) > 0))
              .agg(F.count(F.lit(1)).alias("__n")))
    dfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("double").alias("__df"))
    scored = (tf.join(dfreq, "token").crossJoin(F.broadcast(n_docs))
              .select("id", "token",
                      (F.col("__tf")
                       * F.log(F.col("__n") / F.col("__df")))
                      .alias("__score")))
    w = Window.partitionBy("id").orderBy(F.col("__score").desc(),
                                         F.col("token").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("id", F.col("rank").cast("bigint").alias("rank"),
                    "token", F.round("__score", 6).alias("score")))


def lang_confusion(df, text_col: str, declared_col: str) -> "DataFrame":
    """Declared-vs-detected language confusion matrix: the label-QA
    view for a corpus whose ``lang`` column came from upstream metadata
    — how often does the content (marker-word ``lang_id``) disagree
    with the label, and with WHAT? Off-diagonal mass per declared
    language is mislabeled or code-switched data that a per-language
    pipeline (fertility, distinctive terms, per-lang sampling) silently
    mis-buckets. The detector's own limits apply ('und' = no marker
    hit, common for short texts — a large und column means the detector
    abstains, not that labels are wrong).

    Output per (declared, detected) pair: declared, detected, n
    (bigint), share_of_declared (6dp), mismatch (boolean,
    declared != detected). NULL declared labels are excluded.

    SCALE: one map-only lang_id projection inside the scan + ONE
    ≤|langs|² hash aggregate; the share window runs on that tiny
    frame."""
    from pyspark.sql import Window
    d = F.col(declared_col)
    base = (df.where(d.isNotNull())
            .select(d.cast("string").alias("declared"),
                    lang_id(text_col).alias("detected")))
    counts = base.groupBy("declared", "detected").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.partitionBy("declared")
    return counts.select(
        "declared", "detected", "n",
        F.round(F.col("n") / F.sum("n").over(w).cast("double"), 6)
         .alias("share_of_declared"),
        (F.col("declared") != F.col("detected")).alias("mismatch"))


def pii_by_group(df, text_col: str, group_col: str) -> "DataFrame":
    """Per-slice PII exposure: the ``pii_summary`` corpus roll-up,
    keyed by source/language/snapshot — because PII is never uniform
    (one scraped forum dominates the email count) and remediation is
    per-SOURCE work: this table names which slice to quarantine or
    re-scrub, with the doc-rate that a corpus-level total hides.

    Output per (group, pii_type): group, pii_type, total_matches,
    docs_affected (bigint), doc_rate (docs_affected / slice docs,
    6dp). Every group emits a row for every PII type (zeros included
    — absence of a row would read as 'not checked'). NULL groups are
    excluded; NULL texts count as unaffected docs.

    SCALE: one regexp_count per pattern inside ONE wide
    map-side-combined group aggregate (single text scan), unpivoted
    after — the ``pii_summary`` plan shape, keyed by the slice."""
    g = F.col(group_col)
    counts = pii_counts(text_col)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__docs")]
    for name in counts:
        aggs.append(F.sum(counts[name]).cast("bigint")
                    .alias(f"__t_{name}"))
        aggs.append(F.count(F.when(counts[name] > 0, 1))
                    .cast("bigint").alias(f"__d_{name}"))
    wide = (df.where(g.isNotNull())
            .groupBy(g.cast("string").alias("group")).agg(*aggs))
    rows = [F.struct(F.lit(name).alias("pii_type"),
                     F.col(f"__t_{name}").alias("total_matches"),
                     F.col(f"__d_{name}").alias("docs_affected"))
            for name in counts]
    return (wide.select("group", "__docs",
                        F.explode(F.array(*rows)).alias("e"))
            .select("group", "e.pii_type", "e.total_matches",
                    "e.docs_affected",
                    F.round(F.col("e.docs_affected")
                            / F.col("__docs").cast("double"), 6)
                     .alias("doc_rate")))
