"""Mergeable distinct-count sketches with per-partition lineage — the
incremental complement of the resume manifest.

The north rule's resume story (manifest.py, validate.py
partition_fingerprints) skips partitions whose DATA is unchanged; but
table-LEVEL distinct counts (profile's unique_value, uid-candidate
screening) are not partition-decomposable with plain counts — distinct
values straddle partitions. Datasketches HLL sketches ARE
partition-decomposable: sketch each partition once, persist the binary
sketches beside the manifest, and a run that touched 3 of 10^5
partitions re-sketches only those 3 and UNIONs — table-level distinct
estimates with ZERO rescan of unchanged data. Union is order- and
grouping-invariant, so incremental results equal a full recompute by
construction (merge-invariance is pytest-asserted).

Accuracy contract (Apache DataSketches HLL, Spark 3.5+ built-ins):
EXACT while a column's cardinality keeps the sketch in its coupon
(sparse) mode — empirically, at lg_k=12 estimates are exact through
384 distinct and approximate from 512 (the `distinct_sketch_estimates`
oracle relies on the exact regime: ≤150 distinct user_ids at gate
scale) — and ~1–2% relative error once the dense HLL array takes over
(pytest-bounded at 10k true distinct).

SCALE: a sketch frame is (#partitions × #columns) rows of ≤ ~2^lg_k
bytes each — metadata-sized next to the data. Sketch aggregation is
one map-side-combined hash agg (`hll_sketch_agg` partials merge in the
map stage); the union pass aggregates the tiny sketch frame only. No
reference counterpart (the reference recomputes pandas ``nunique``
whole-file every run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..functions.colref import qcol

SKETCH_COLUMNS = ["partition_key", "column_name", "sketch", "n_rows"]

SKETCH_SCHEMA = T.StructType([
    T.StructField("partition_key", T.StringType(), True),
    T.StructField("column_name", T.StringType(), False),
    T.StructField("sketch", T.BinaryType(), True),
    T.StructField("n_rows", T.LongType(), True),
])


def partition_sketches(df: DataFrame, cols: list[str],
                       partition_col: str, lg_k: int = 12) -> DataFrame:
    """Per-(partition, column) HLL sketch frame: one row per partition
    per tracked column with the binary sketch and the partition's row
    count. This is the frame you persist (parquet, beside the resume
    manifest) and later union — see ``union_estimates`` /
    ``incremental_update``.

    NULLs are not coupons: ``hll_sketch_agg`` skips NULL input, so a
    column's estimate counts distinct NON-NULL values (matching
    count(DISTINCT col)'s NULL handling in both Spark and ANSI SQL).

    SCALE: ONE hash aggregate keyed by partition; per-column sketch
    partials combine map-side, so the shuffle carries (#partitions ×
    #cols) sketch blobs, never rows."""
    if not cols:
        raise ValueError("partition_sketches needs at least one column")
    aggs = [F.hll_sketch_agg(qcol(c), F.lit(lg_k)).alias(f"__sk_{i}")
            for i, c in enumerate(cols)]
    wide = (df.groupBy(qcol(partition_col).cast("string")
                       .alias("partition_key"))
              .agg(*aggs, F.count(F.lit(1)).cast("bigint").alias("n_rows")))
    # melt the per-column sketches into the canonical long frame
    pairs = []
    for i, c in enumerate(cols):
        pairs.append(F.struct(F.lit(c).alias("column_name"),
                              F.col(f"__sk_{i}").alias("sketch")))
    return (wide.select("partition_key", "n_rows",
                        F.explode(F.array(*pairs)).alias("__p"))
                .select("partition_key",
                        F.col("__p.column_name").alias("column_name"),
                        F.col("__p.sketch").alias("sketch"),
                        "n_rows"))


def union_estimates(sketches: DataFrame) -> DataFrame:
    """Collapse a sketch frame (any subset of partitions, any merge
    order) to table-level estimates: (column_name, n_distinct_est,
    n_rows). `hll_union_agg` merges the binary sketches; the estimate
    is exact in the sparse regime and ~1–2% above it.

    SCALE: aggregates the metadata-sized sketch frame only — the
    original data is NOT scanned (that is the entire point)."""
    return (sketches.groupBy("column_name")
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch"))
                  .cast("bigint").alias("n_distinct_est"),
                 # one row per partition within each column group, each
                 # carrying that partition's row count -> sum = table rows
                 F.sum("n_rows").cast("bigint").alias("n_rows"))
            .orderBy("column_name"))


def incremental_update(cached: DataFrame, fresh: DataFrame,
                       changed_keys: list[str]) -> DataFrame:
    """Resume-style sketch refresh: keep every cached partition row
    whose key is NOT in ``changed_keys``, splice in the freshly
    computed rows (``partition_sketches`` over ONLY the changed
    partitions' data). The result is estimate-identical to a full
    recompute — HLL union is insensitive to which run produced each
    partition's sketch.

    ``changed_keys`` comes from the same place the resume manifest's
    skip-set does (validate.py partition_fingerprints: per-partition
    xxhash64 content fingerprints), so both layers share one notion of
    "changed".

    SCALE: a filter + union on the metadata-sized sketch frame;
    only changed partitions' DATA was ever rescanned (by the caller,
    to build ``fresh``)."""
    keep = cached.where(~F.col("partition_key")
                        .isin([str(k) for k in changed_keys]))
    return keep.unionByName(fresh)


def save_sketches(sketches: DataFrame, path: str) -> None:
    """Persist a sketch frame as a small parquet table (overwrite —
    the frame IS the current state, latest-wins like the manifest)."""
    sketches.write.mode("overwrite").parquet(path)


def load_sketches(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def sketch_overlap(sketches_a: DataFrame,
                   sketches_b: DataFrame) -> DataFrame:
    """Value-universe overlap between two snapshots at metadata cost:
    per column, |A|, |B|, |A∪B| from the persisted sketch frames
    (``hll_union_agg`` + a two-sketch ``hll_union``), then
    inclusion–exclusion gives the intersection, Jaccard, and
    containment — 'did the id universe shift between yesterday's run
    and today's' WITHOUT rescanning either snapshot's data. Estimates
    are exact while both columns stay in the sketches' sparse regime
    (the oracle gate), ~1–2% after.

    A column tracked in only one frame is treated as EMPTY on the
    other side (est 0, intersection 0) and kept visible rather than
    dropped — a silently untracked column is itself a finding.

    Output per column: column_name, est_a, est_b, est_union,
    est_intersection (clamped ≥ 0 — inclusion–exclusion on estimates
    can go fractionally negative), jaccard (6dp, NULL when the union
    is empty), containment_a (share of A's values also in B).

    SCALE: aggregates two metadata-sized sketch frames and joins the
    per-column single rows — original data is never scanned."""
    ua = (sketches_a.groupBy("column_name")
                    .agg(F.hll_union_agg("sketch").alias("__sa")))
    ub = (sketches_b.groupBy("column_name")
                    .agg(F.hll_union_agg("sketch").alias("__sb")))
    j = ua.join(ub, "column_name", "full_outer")
    ea = F.coalesce(F.hll_sketch_estimate(F.col("__sa")), F.lit(0))           .cast("bigint")
    eb = F.coalesce(F.hll_sketch_estimate(F.col("__sb")), F.lit(0))           .cast("bigint")
    eu = (F.when(F.col("__sa").isNotNull() & F.col("__sb").isNotNull(),
                 F.hll_sketch_estimate(
                     F.hll_union("__sa", "__sb", True)))
           .when(F.col("__sa").isNotNull(),
                 F.hll_sketch_estimate(F.col("__sa")))
           .otherwise(F.hll_sketch_estimate(F.col("__sb")))
           .cast("bigint"))
    out = j.select("column_name", ea.alias("est_a"), eb.alias("est_b"),
                   eu.alias("est_union"))
    inter = F.greatest(F.col("est_a") + F.col("est_b")
                       - F.col("est_union"), F.lit(0).cast("bigint"))
    return (out.withColumn("est_intersection", inter)
               .select("column_name", "est_a", "est_b", "est_union",
                       "est_intersection",
                       F.when(F.col("est_union") > 0,
                              F.round(F.col("est_intersection")
                                      .cast("double")
                                      / F.col("est_union"), 6))
                        .alias("jaccard"),
                       F.when(F.col("est_a") > 0,
                              F.round(F.col("est_intersection")
                                      .cast("double")
                                      / F.col("est_a"), 6))
                        .alias("containment_a"))
               .orderBy("column_name"))


# ------------------------------------------------------------------
# Mergeable QUANTILE summaries — the order-statistics complement of
# the HLL layer above.  No reference counterpart (the reference's
# length stats recompute whole-file, src/schema_validata.py:1150-1320).
# ------------------------------------------------------------------

def quantile_summaries(df: DataFrame, cols: list[str],
                       partition_col: str, k: int = 128) -> DataFrame:
    """Per-(partition, column) quantile summary: the k exact order
    statistics at fractions (i+0.5)/k plus the non-null count.  Like
    the HLL frame, this is what you persist beside the resume manifest
    — re-summarize only changed partitions, then
    ``merge_quantile_estimates`` recovers table-level quantiles with a
    DETERMINISTIC rank-error bound without rescanning unchanged data.

    Error contract: one partition's summary answers rank queries
    within n_i/(2k); a FLAT merge of per-partition summaries (never a
    re-compressed merge tree) answers within Σ n_i/(2k) = n/(2k) —
    0.4% rank error at the default k=128.  Exact when a partition has
    ≤ k values only in the sense of interpolation, so the merged
    estimate is approximate by design; the `quantile_sketch_merge`
    oracle replays the SAME summarize+merge algorithm in DuckDB rather
    than pretending exactness.

    Summaries are pinned to 6 decimal places (like the equi-depth
    histogram edges) so Spark-vs-oracle float noise cannot move a
    value across a merge-order boundary.

    SCALE: ONE hash aggregate keyed by partition (percentile partials
    sort only within each partition's map-side group); the output is
    (#partitions × #cols) rows of k doubles — metadata-sized."""
    if not cols:
        raise ValueError("quantile_summaries needs at least one column")
    if k < 2:
        raise ValueError("k must be >= 2")
    fracs = F.array(*[F.lit((i + 0.5) / k) for i in range(k)])
    aggs = []
    for i, c in enumerate(cols):
        v = qcol(c).cast("double")
        aggs.append(F.transform(F.percentile(v, fracs),
                                lambda x: F.round(x, 6))
                    .alias(f"__q_{i}"))
        aggs.append(F.count(v).cast("bigint").alias(f"__n_{i}"))
    wide = (df.groupBy(qcol(partition_col).cast("string")
                       .alias("partition_key"))
              .agg(*aggs))
    pairs = [F.struct(F.lit(c).alias("column_name"),
                      F.col(f"__q_{i}").alias("qs"),
                      F.col(f"__n_{i}").alias("n_vals"))
             for i, c in enumerate(cols)]
    return (wide.select("partition_key",
                        F.explode(F.array(*pairs)).alias("__p"))
                .select("partition_key",
                        F.col("__p.column_name").alias("column_name"),
                        F.col("__p.qs").alias("qs"),
                        F.col("__p.n_vals").alias("n_vals"))
                .where(F.col("n_vals") > 0))


def merge_quantile_estimates(summaries: DataFrame,
                             fractions: list[float]) -> DataFrame:
    """Collapse a quantile-summary frame (any subset of partitions) to
    table-level quantile estimates: for each requested fraction f, the
    smallest summary value whose cumulative weight reaches f·n, where
    each of a partition's k order statistics carries weight n_i/k.

    Deterministic: ties in value contribute the same value whichever
    tied row crosses the threshold, and summaries are already pinned
    to 6dp, so the estimate is reproducible across engines — the
    DuckDB oracle replays this merge exactly.

    SCALE: explode + window over the metadata-sized summary frame
    only (#partitions × #cols × k rows); the data is never rescanned."""
    from pyspark.sql import Window

    exploded = summaries.select(
        "column_name",
        F.explode("qs").alias("value"),
        (F.col("n_vals").cast("double") / F.size("qs")).alias("w"))
    win = (Window.partitionBy("column_name").orderBy("value")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tot = Window.partitionBy("column_name")
    cum = exploded.select(
        "column_name", "value",
        F.sum("w").over(win).alias("cumw"),
        F.sum("w").over(tot).alias("total"))
    picks = [F.min(F.when(F.col("cumw") >= F.lit(f) * F.col("total")
                          - F.lit(1e-9),
                          F.col("value"))).alias(f"q_{int(f * 100):02d}")
             for f in fractions]
    return (cum.groupBy("column_name").agg(*picks)
               .orderBy("column_name"))


def _summary_quantiles_long(summaries: DataFrame,
                            fractions: list[float]) -> DataFrame:
    """(column_name, fidx, q): the merge-quantile pick at each probe
    fraction, long form — same cumulative-weight algorithm as
    ``merge_quantile_estimates`` (kept verbatim so both layers stay
    oracle-replayable)."""
    from pyspark.sql import Window

    exploded = summaries.select(
        "column_name",
        F.explode("qs").alias("value"),
        (F.col("n_vals").cast("double") / F.size("qs")).alias("w"))
    win = (Window.partitionBy("column_name").orderBy("value")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tot = Window.partitionBy("column_name")
    cum = exploded.select(
        "column_name", "value",
        F.sum("w").over(win).alias("cumw"),
        F.sum("w").over(tot).alias("total"))
    picks = [F.min(F.when(F.col("cumw") >= F.lit(f) * F.col("total")
                          - F.lit(1e-9),
                          F.col("value"))).alias(f"__p{i}")
             for i, f in enumerate(fractions)]
    wide = cum.groupBy("column_name").agg(*picks)
    longs = F.explode(F.array(*[
        F.struct(F.lit(i).alias("fidx"), F.col(f"__p{i}").alias("q"))
        for i in range(len(fractions))])).alias("__e")
    return (wide.select("column_name", longs)
                .select("column_name", F.col("__e.fidx").alias("fidx"),
                        F.col("__e.q").alias("q")))


def summary_drift(summaries_a: DataFrame, summaries_b: DataFrame,
                  probes: int = 20) -> DataFrame:
    """Distribution drift between two snapshots at metadata cost: the
    W1 (earth-mover) distance estimated from the persisted
    quantile-summary frames alone — W1 = ∫|Q_a(p) − Q_b(p)|dp,
    approximated as the mean |quantile gap| over ``probes`` evenly
    spaced fractions ((i+0.5)/probes), plus the worst single gap.
    This is the "did the value distribution move since the baseline
    run" check WITHOUT rescanning either snapshot — the drift twin of
    ``sketch_overlap``, riding the same resume-layer artifacts that
    ``quantile_summaries`` already persists beside the manifest.

    Columns summarized in only one frame stay visible (counts shown,
    NULL drift) rather than silently dropping.

    Accuracy: each side's probe quantile carries the merge layer's
    n/(2k) rank-error bound; gaps inherit it. Values are 6dp-pinned
    upstream and the pick algorithm is the deterministic one the
    DuckDB oracle replays, so the estimate is engine-portable.

    Output per column: column_name, n_a, n_b, w1_est, max_q_gap (6dp).

    Shape note: the two sides are combined by UNION + pivot, not a
    join — the frames often share lineage (two filters of one saved
    table, or two windows of one stream), and a self-join of
    window-bearing plans trips Spark's conflicting-attribute
    resolution; the union is also one shuffle cheaper.

    SCALE: windows + one hash agg over the metadata-sized summary
    frames only ((#partitions × #cols × k) rows); data is never
    rescanned."""
    if probes < 2:
        raise ValueError("probes must be >= 2")
    fractions = [(i + 0.5) / probes for i in range(probes)]

    def _side(summ, tag):
        return (_summary_quantiles_long(summ, fractions)
                .select("column_name", "fidx", "q",
                        F.lit(tag).alias("__side")))

    both = _side(summaries_a, "a").unionByName(_side(summaries_b, "b"))
    per_probe = (both.groupBy("column_name", "fidx")
                     .agg(F.max(F.when(F.col("__side") == "a",
                                       F.col("q"))).alias("__qa"),
                          F.max(F.when(F.col("__side") == "b",
                                       F.col("q"))).alias("__qb")))
    gap = F.abs(F.col("__qa") - F.col("__qb"))  # NULL if a side missing
    drift = (per_probe.groupBy("column_name")
                      .agg(F.round(F.avg(gap), 6).alias("w1_est"),
                           F.round(F.max(gap), 6).alias("max_q_gap")))
    counts = (summaries_a.select("column_name", "n_vals",
                                 F.lit("a").alias("__side"))
              .unionByName(summaries_b.select("column_name", "n_vals",
                                              F.lit("b").alias("__side")))
              .groupBy("column_name")
              .agg(F.coalesce(F.sum(F.when(F.col("__side") == "a",
                                           F.col("n_vals"))), F.lit(0))
                    .cast("bigint").alias("n_a"),
                   F.coalesce(F.sum(F.when(F.col("__side") == "b",
                                           F.col("n_vals"))), F.lit(0))
                    .cast("bigint").alias("n_b")))
    # final combine is ALSO a union-pivot: counts and drift both trace
    # back to the same input frames, so a join would reintroduce the
    # shared-lineage ambiguity the union shape exists to avoid
    c2 = counts.select("column_name", "n_a", "n_b",
                       F.lit(None).cast("double").alias("w1_est"),
                       F.lit(None).cast("double").alias("max_q_gap"))
    d2 = drift.select("column_name",
                      F.lit(None).cast("bigint").alias("n_a"),
                      F.lit(None).cast("bigint").alias("n_b"),
                      "w1_est", "max_q_gap")
    return (c2.unionByName(d2)
              .groupBy("column_name")
              .agg(F.max("n_a").alias("n_a"),
                   F.max("n_b").alias("n_b"),
                   F.max("w1_est").alias("w1_est"),
                   F.max("max_q_gap").alias("max_q_gap"))
              .orderBy("column_name"))


def heavy_hitters(df: DataFrame, col: str,
                  threshold_share: float = 0.001) -> DataFrame:
    """EXACT heavy hitters above ``threshold_share`` in two scans and
    NO full-value shuffle — the top_tokens / value-counts pattern at
    cardinalities where shuffling every (value, 1) pair is the
    bottleneck (URL, user-agent, free-text key columns at 10¹² rows).

    Phase 1 finds a CANDIDATE superset per partition with a vectorized
    pandas ``value_counts`` (Arrow island, zero shuffle): any value
    with global share > t must exceed share t inside at least one
    partition (Σc_p > tN = Σ tN_p ⟹ ∃p: c_p > tN_p), and fewer than
    1/t values can exceed share t locally, so each partition emits
    ≤ ⌈1/t⌉ candidates. Phase 2 rescans with an ``isin`` literal
    filter (pushed to the scan) and exactly counts ONLY candidates —
    the one shuffle carries ≤ partitions/t tiny rows. The final
    ``count > t·N`` filter makes the output PARTITION-LAYOUT
    INDEPENDENT (the candidate superset varies with layout; the
    survivors never do): value, count (exact), share (6dp), sorted
    deterministically by (count DESC, value ASC) semantics via exact
    values. NULLs are excluded (profile counts them already).

    A 10⁻³ threshold means ≤1,000 survivors regardless of data size —
    driver-safe by construction."""
    if not 0 < threshold_share < 1:
        raise ValueError("threshold_share must be in (0, 1)")
    import math

    import pandas as pd  # noqa: F401 — vectorized value_counts below

    m = int(math.ceil(1.0 / threshold_share))

    def _local_tops(batches):
        import pandas as pd
        acc = None
        for pdf in batches:
            vc = pdf[col].dropna().value_counts()
            acc = vc if acc is None else acc.add(vc, fill_value=0)
        if acc is None or acc.empty:
            return
        n_local = int(acc.sum())
        # fewer than m values can exceed share 1/m locally
        tops = acc[acc > n_local * float(threshold_share)]
        if len(tops) > m:
            tops = tops.iloc[:m]
        # one NULL-value row carries the partition's non-null total,
        # so ONE pass yields both the candidates and N
        yield pd.DataFrame({
            "value": list(tops.index.astype(str)) + [None],
            "n_part": [0] * len(tops) + [n_local]})

    part = (df.select(col)
              .mapInPandas(_local_tops,
                           schema="value string, n_part long")
              .collect())
    cands = sorted({r["value"] for r in part if r["value"] is not None})
    total = sum(r["n_part"] for r in part)
    if not cands or total == 0:
        return df.sparkSession.createDataFrame(
            [], "value string, count bigint, share double")
    v = qcol(col).cast("string")
    exact = (df.where(v.isin(cands))
               .groupBy(v.alias("value"))
               .agg(F.count(F.lit(1)).cast("bigint").alias("count")))
    return (exact.where(F.col("count")
                        > F.lit(float(threshold_share) * total))
                 .select("value", "count",
                         F.round(F.col("count").cast("double")
                                 / F.lit(float(total)), 6)
                          .alias("share")))
