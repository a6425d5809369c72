"""Distribution-drift checks: per-partition histograms compared against a
baseline snapshot via chi-square statistic and PSI.

No reference counterpart (north_rule addition). Design:

* **Histogram build** — one ``groupBy(partition, column, bucket)``
  aggregate. Numeric columns bucket via ``width_bucket`` over a fixed
  range; categorical columns use the value itself (top-K guarded).
  Entirely JVM-side.
* **Comparison** — baseline histograms are small (buckets × columns ×
  partitions), so the compare is a join of two histogram DataFrames +
  vectorized math in Column expressions; chi-square statistic and PSI
  need no UDF. A grouped ``applyInPandas`` variant is provided for
  extensibility (e.g. plugging exact p-values in an environment with
  scipy), demonstrating the pandas/Arrow UDF island pattern the
  north_star names.

PSI convention: buckets with zero mass on either side are smoothed with
EPS to keep the logarithm finite (standard practice). Thresholds:
PSI < 0.1 stable, 0.1–0.25 moderate, > 0.25 drifted.
"""

from __future__ import annotations

from pyspark.sql import Window, DataFrame, functions as F

from ..functions.colref import qcol

EPS = 1e-6

HIST_COLUMNS = ["partition_key", "column_name", "bucket", "count"]


def numeric_histogram(df: DataFrame, col: str, partition_col: str,
                      lo: float, hi: float, n_buckets: int = 20) -> DataFrame:
    """(partition, bucket) counts for a numeric expression via
    width_bucket — one hash aggregate."""
    b = F.width_bucket(qcol(col).cast("double"), F.lit(lo), F.lit(hi),
                       F.lit(n_buckets))
    return (df.where(qcol(col).isNotNull())
              .groupBy(qcol(partition_col).cast("string").alias("partition_key"),
                       b.cast("string").alias("bucket"))
              .agg(F.count(F.lit(1)).alias("count"))
              .select("partition_key", F.lit(col).alias("column_name"),
                      "bucket", "count"))


def categorical_histogram(df: DataFrame, col: str, partition_col: str,
                          max_categories: int = 1000) -> DataFrame:
    """(partition, value) counts; categories beyond ``max_categories`` by
    global frequency collapse into '__other__' so a high-cardinality
    column cannot blow up the histogram."""
    counts = (df.where(qcol(col).isNotNull())
                .groupBy(qcol(partition_col).cast("string").alias("partition_key"),
                         qcol(col).cast("string").alias("bucket"))
                .agg(F.count(F.lit(1)).alias("count")))
    top = (counts.groupBy("bucket").agg(F.sum("count").alias("n"))
                 .orderBy(F.desc("n")).limit(max_categories)
                 .select("bucket").withColumn("__keep", F.lit(1)))
    return (counts.join(F.broadcast(top), "bucket", "left")
            .withColumn("bucket", F.when(F.col("__keep").isNotNull(),
                                         F.col("bucket"))
                        .otherwise(F.lit("__other__")))
            .groupBy("partition_key", "bucket")
            .agg(F.sum("count").alias("count"))
            .select("partition_key", F.lit(col).alias("column_name"),
                    "bucket", "count"))


def text_length_histogram(df: DataFrame, text_col: str, partition_col: str,
                          hi: int = 8000, n_buckets: int = 40) -> DataFrame:
    h = numeric_histogram(
        df.select(qcol(partition_col), F.length(qcol(text_col)).alias("__len")),
        "__len", partition_col, 0.0, float(hi), n_buckets)
    return h.withColumn("column_name", F.lit(f"{text_col}_length"))


def build_histograms(df: DataFrame, partition_col: str,
                     numeric: dict[str, tuple[float, float]] | None = None,
                     categorical: list[str] | None = None,
                     text: list[str] | None = None) -> DataFrame:
    """Union of all requested histograms — the drift baseline snapshot
    shape (FIXTURES.md §3): (partition_key, column_name, bucket, count)."""
    frames = []
    for col, (lo, hi) in (numeric or {}).items():
        frames.append(numeric_histogram(df, col, partition_col, lo, hi))
    for col in categorical or []:
        frames.append(categorical_histogram(df, col, partition_col))
    for col in text or []:
        frames.append(text_length_histogram(df, col, partition_col))
    if not frames:
        raise ValueError("no histogram columns requested")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def drift_scores(observed_hist: DataFrame, baseline_hist: DataFrame,
                 by_partition: bool = True) -> DataFrame:
    """Chi-square statistic + PSI per (partition, column) — a pure
    DataFrame computation: full-outer join of the two histograms on
    (column, bucket[, partition]) then two aggregates. Baseline buckets
    are scaled to the observed total (standard chi-square drift form).

    Output: (partition_key?, column_name, chi2, psi, n_obs, n_base).
    """
    keys = ["column_name", "bucket"] + (["partition_key"] if by_partition else [])
    obs = observed_hist.groupBy(*keys).agg(F.sum("count").alias("o"))
    base = (baseline_hist.groupBy("column_name", "bucket")
            .agg(F.sum("count").alias("b")))
    j = obs.join(base, ["column_name", "bucket"], "full_outer") \
           .fillna(0, subset=["o", "b"])
    gcols = (["partition_key"] if by_partition else []) + ["column_name"]
    j = j.fillna("__all__", subset=[c for c in gcols if c == "partition_key"])

    totals = j.groupBy(*gcols).agg(F.sum("o").alias("to"),
                                   F.sum("b").alias("tb"))
    j = j.join(totals, gcols)
    po = F.col("o") / F.greatest(F.col("to"), F.lit(1))
    pb = F.col("b") / F.greatest(F.col("tb"), F.lit(1))
    e = pb * F.col("to")  # expected count under baseline proportions
    chi_term = F.when(e > 0, F.pow(F.col("o") - e, 2) / e).otherwise(F.lit(0.0))
    psi_term = (po - pb + F.lit(0.0)) * F.log((po + F.lit(EPS)) / (pb + F.lit(EPS)))
    return (j.groupBy(*gcols)
             .agg(F.sum(chi_term).alias("chi2"),
                  F.sum(psi_term).alias("psi"),
                  F.max("to").alias("n_obs"),
                  F.max("tb").alias("n_base")))


def drift_scores_pandas(observed_hist: DataFrame, baseline_hist: DataFrame):
    """Grouped-map (applyInPandas) variant — the pandas/Arrow UDF island
    named by the north_star. Functionally identical to drift_scores for
    chi2/PSI; exists as the extension point for exact p-values or
    KS-style stats that genuinely need per-group array math."""
    import pandas as pd  # noqa: F401
    import numpy as np

    base = (baseline_hist.groupBy("column_name", "bucket")
            .agg(F.sum("count").alias("b")))
    obs = (observed_hist.groupBy("partition_key", "column_name", "bucket")
           .agg(F.sum("count").alias("o")))
    joined = obs.join(base, ["column_name", "bucket"], "full_outer") \
                .fillna(0, subset=["o", "b"]) \
                .fillna("__all__", subset=["partition_key"])

    def score(pdf):
        o = pdf["o"].to_numpy(dtype=float)
        b = pdf["b"].to_numpy(dtype=float)
        to, tb = max(o.sum(), 1.0), max(b.sum(), 1.0)
        po, pb = o / to, b / tb
        e = pb * to
        chi2 = float(np.where(e > 0, (o - e) ** 2 / np.where(e > 0, e, 1), 0).sum())
        psi = float(((po - pb) * np.log((po + EPS) / (pb + EPS))).sum())
        return pd.DataFrame({
            "partition_key": [pdf["partition_key"].iloc[0]],
            "column_name": [pdf["column_name"].iloc[0]],
            "chi2": [chi2], "psi": [psi],
            "n_obs": [int(to)], "n_base": [int(tb)],
        })

    return joined.groupBy("partition_key", "column_name").applyInPandas(
        score,
        schema=("partition_key string, column_name string, chi2 double, "
                "psi double, n_obs long, n_base long"))


def vocab_drift(df_a: DataFrame, df_b: DataFrame, text_col: str,
                k: int = 25) -> DataFrame:
    """Top-``k`` vocabulary movers between two corpus snapshots: the
    tokens whose share of all token occurrences changed the most from
    snapshot A (baseline) to snapshot B (current) — the lexical twin
    of the histogram ``drift_scores`` (a chi²/PSI number says THAT the
    text column drifted; this says WHICH words did it: a spam wave, a
    new boilerplate template, a language-mix shift).

    Output: token, n_a, n_b, share_a, share_b, delta (share_b −
    share_a, rounded) — selected by |delta| desc with token as the
    deterministic tiebreak, so the same k rows surface in any engine.
    Tokenization matches ``top_tokens`` (case-folded whitespace).

    SCALE: TWO wordcount two-stage aggregates (map-side partial
    collapse; the shuffles carry one row per (partition, distinct
    token)) + a full outer join of the two VOCABULARY-sized count
    frames on the token key; totals are single-row aggregates crossed
    back in (broadcast by construction). The final top-k is
    TakeOrderedAndProject over the joined vocabulary — per-task heaps,
    no global sort. Corpus text never shuffles."""
    def _counts(df, n_name):
        c = F.col(text_col)
        return (df.where(c.isNotNull() & (F.length(F.trim(c)) > 0))
                  .select(F.explode(F.split(F.lower(F.trim(c)), r"\s+"))
                           .alias("token"))
                  .groupBy("token")
                  .agg(F.count(F.lit(1)).cast("bigint").alias(n_name)))
    ca, cb = _counts(df_a, "n_a"), _counts(df_b, "n_b")
    ta = ca.agg(F.coalesce(F.sum("n_a"), F.lit(0)).alias("__ta"))
    tb = cb.agg(F.coalesce(F.sum("n_b"), F.lit(0)).alias("__tb"))
    joined = (ca.join(cb, on="token", how="full_outer")
                .select("token",
                        F.coalesce("n_a", F.lit(0)).alias("n_a"),
                        F.coalesce("n_b", F.lit(0)).alias("n_b"))
                .crossJoin(F.broadcast(ta))
                .crossJoin(F.broadcast(tb)))
    share_a = F.when(F.col("__ta") > 0,
                     F.col("n_a") / F.col("__ta").cast("double")) \
               .otherwise(F.lit(0.0))
    share_b = F.when(F.col("__tb") > 0,
                     F.col("n_b") / F.col("__tb").cast("double")) \
               .otherwise(F.lit(0.0))
    out = joined.select(
        "token", "n_a", "n_b",
        F.round(share_a, 6).alias("share_a"),
        F.round(share_b, 6).alias("share_b"),
        F.round(share_b - share_a, 6).alias("delta"))
    return (out.orderBy(F.abs(F.col("delta")).desc(),
                        F.col("token").asc())
               .limit(k))


def drifted_partitions(scores: DataFrame, psi_threshold: float = 0.25) -> DataFrame:
    return scores.where(F.col("psi") > psi_threshold)


def ks_drift(df: DataFrame, value_col: str, partition_col: str,
             edges: list[float], baseline_key: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic per partition on a
    FIXED edge grid — the numeric complement of chi²/PSI (which need
    binned mass; KS compares cumulative distributions directly and is
    sensitive to location shifts that leave bin mass nearly unchanged).

    For each partition p and each grid edge e the empirical CDF is
    ``count(value <= e) / count(*)``; the reported statistic is
    ``max_e |CDF_p(e) − CDF_baseline(e)|``. The grid is supplied by the
    caller (e.g. baseline percentiles), which is what makes the result
    deterministic and engine-independent — the classical exact KS over
    all observed values would require a global sort of the raw data.

    Output: (partition_key, n_rows, ks_stat) — ks_stat rounded to 6dp.
    Partitions are compared against the row whose key equals
    ``baseline_key``; if that partition is absent the result is empty
    (nothing to compare against), mirroring drift_scores' join form.

    SCALE: one hash aggregate — the shuffle carries one row per
    partition_key with len(edges)+1 longs (counts are map-side
    combined), then a broadcast of the single baseline row back across
    the #partitions-sized frame. The raw values never shuffle; cost is
    one scan regardless of edge count."""
    if not edges:
        raise ValueError("ks_drift needs at least one grid edge")
    v = qcol(value_col).cast("double")
    aggs = [F.sum(F.when(v <= F.lit(float(e)), 1).otherwise(0))
             .cast("bigint").alias(f"__le_{i}")
            for i, e in enumerate(edges)]
    counts = (df.where(v.isNotNull())
                .groupBy(qcol(partition_col).cast("string")
                         .alias("partition_key"))
                .agg(*aggs, F.count(F.lit(1)).cast("bigint").alias("n_rows")))
    base = (counts.where(F.col("partition_key") == F.lit(baseline_key))
                  .select(*[F.col(f"__le_{i}").alias(f"__ble_{i}")
                            for i in range(len(edges))],
                          F.col("n_rows").alias("__bn")))
    j = counts.crossJoin(F.broadcast(base))
    diffs = [F.abs(F.col(f"__le_{i}") / F.col("n_rows")
                   - F.col(f"__ble_{i}") / F.col("__bn"))
             for i in range(len(edges))]
    ks = F.greatest(*diffs) if len(diffs) > 1 else diffs[0]
    return j.select("partition_key", "n_rows",
                    F.round(ks, 6).alias("ks_stat"))


def wasserstein_drift(df: DataFrame, value_col: str, partition_col: str,
                      edges: list[float], baseline_key: str) -> DataFrame:
    """Grid-approximated Wasserstein-1 (earth-mover) drift per
    partition — the MAGNITUDE complement of ks_drift: KS reports the
    worst single CDF gap (scale-free, capped at 1), W1 integrates the
    gap over the value axis, so it says HOW FAR the mass moved in the
    column's own units (a +10 location shift on a price column scores
    10, whether the distributions overlap or not). Alarming on W1
    catches slow monotone creep that KS under-weights once the CDFs
    separate.

    W1 = ∫|CDF_p(x) − CDF_base(x)| dx, approximated on the caller's
    fixed ``edges`` grid as Σ_i |ΔCDF at edge i| × (edge_{i+1} −
    edge_i) — the same trapezoid-free left-point rule both a SQL
    replay and a baseline snapshot from another engine compute
    IDENTICALLY, because the only inputs are integer counts on a
    shared grid (no percentile interpolation, no float-order
    sensitivity; contrast equidepth_histogram's edge-rounding note).
    Mass outside [edges[0], edges[-1]] contributes nothing — pick the
    grid from baseline percentiles wide enough to cover the tails you
    care about.

    Output: (partition_key, n_rows, w1) — w1 rounded to 6dp, in
    value-column units. Empty if ``baseline_key`` is absent,
    mirroring ks_drift.

    SCALE: identical profile to ks_drift — ONE hash aggregate whose
    shuffle carries one row per partition_key with len(edges)+1
    map-side-combined longs, then a single-row baseline broadcast.
    Raw values never shuffle; edge count is free at scan time."""
    if len(edges) < 2:
        raise ValueError("wasserstein_drift needs at least two grid "
                         "edges (segment widths come from the grid)")
    if sorted(edges) != list(edges):
        raise ValueError("edges must be sorted ascending")
    v = qcol(value_col).cast("double")
    aggs = [F.sum(F.when(v <= F.lit(float(e)), 1).otherwise(0))
             .cast("bigint").alias(f"__le_{i}")
            for i, e in enumerate(edges)]
    counts = (df.where(v.isNotNull())
                .groupBy(qcol(partition_col).cast("string")
                         .alias("partition_key"))
                .agg(*aggs, F.count(F.lit(1)).cast("bigint").alias("n_rows")))
    base = (counts.where(F.col("partition_key") == F.lit(baseline_key))
                  .select(*[F.col(f"__le_{i}").alias(f"__ble_{i}")
                            for i in range(len(edges))],
                          F.col("n_rows").alias("__bn")))
    j = counts.crossJoin(F.broadcast(base))
    segs = [F.abs(F.col(f"__le_{i}") / F.col("n_rows")
                  - F.col(f"__ble_{i}") / F.col("__bn"))
            * F.lit(float(edges[i + 1] - edges[i]))
            for i in range(len(edges) - 1)]
    w1 = segs[0]
    for s in segs[1:]:
        w1 = w1 + s
    return j.select("partition_key", "n_rows",
                    F.round(w1, 6).alias("w1"))


def jsd_drift(observed_hist: DataFrame, baseline_hist: DataFrame,
              by_partition: bool = True) -> DataFrame:
    """Jensen–Shannon divergence per (partition?, column) over the same
    ``(partition_key, column_name, bucket, count)`` histogram shape as
    ``drift_scores`` — the BOUNDED drift score the chi²/PSI pair lacks:
    JSD lives in [0, 1] bits regardless of bucket count or totals, so
    one threshold works across columns (chi² grows with n; PSI needs an
    epsilon and explodes on empty bins). Zero bins are exact here —
    0·log(0) = 0 by continuity, no epsilon — which also makes JSD the
    right score when snapshots have disjoint category support.

    Output: (partition_key?, column_name, jsd, n_obs, n_base); jsd is
    NULL when either side's total is 0. Base-2 logs: 0 = identical
    distributions, 1 = disjoint support.

    ENGINE-PORTABLE: shares are single divisions of exact BIGINT
    counts; each bucket's term is one fixed log2 expression (p=0 and
    q=0 branches handled by CASE, not epsilon), and the final sum is
    rounded to 6dp. SCALE: one full-outer join on (column, bucket
    [, partition]) + two hash aggregates — histogram-frame-sized
    (buckets × columns × partitions), never row data."""
    keys = (["column_name", "bucket"]
            + (["partition_key"] if by_partition else []))
    obs = (observed_hist.groupBy(*keys)
           .agg(F.sum("count").cast("bigint").alias("o")))
    base = (baseline_hist.groupBy("column_name", "bucket")
            .agg(F.sum("count").cast("bigint").alias("b")))
    j = (obs.join(base, ["column_name", "bucket"], "full_outer")
            .fillna(0, subset=["o", "b"]))
    gcols = ((["partition_key"] if by_partition else [])
             + ["column_name"])
    if by_partition:
        j = j.fillna("__all__", subset=["partition_key"])
    totals = j.groupBy(*gcols).agg(
        F.sum("o").cast("bigint").alias("to"),
        F.sum("b").cast("bigint").alias("tb"))
    j = j.join(totals, gcols)
    p = F.col("o").cast("double") / F.col("to").cast("double")
    q = F.col("b").cast("double") / F.col("tb").cast("double")
    m = (p + q) / 2.0
    term = (F.when(F.col("o") > 0, p / 2.0 * F.log2(p / m))
             .otherwise(F.lit(0.0))
            + F.when(F.col("b") > 0, q / 2.0 * F.log2(q / m))
               .otherwise(F.lit(0.0)))
    term = F.when((F.col("to") > 0) & (F.col("tb") > 0), term)
    return (j.groupBy(*gcols)
             .agg(F.round(F.sum(term), 6).alias("jsd"),
                  F.max("to").alias("n_obs"),
                  F.max("tb").alias("n_base")))


def numeric_histogram2d(df: DataFrame, x_col: str, y_col: str,
                        x_lo: float, x_hi: float,
                        y_lo: float, y_hi: float,
                        n_x: int = 10, n_y: int = 10) -> DataFrame:
    """Joint 2-D histogram of two numeric columns via a pair of
    width_buckets — the dependence-structure drift input the marginal
    histograms can't give (two snapshots with identical per-column
    histograms can still have swapped which hours carry which values;
    chi²/PSI over the JOINT cells sees it, and cramers_v/correlations
    compress it to one number while this keeps the where).

    Output: (x_bucket, y_bucket, count, share 6dp) — bucket 0 and
    n+1 are the standard width_bucket under/overflow cells. Rows with
    NULL in either column are excluded (they carry no joint
    information; the completeness screens own them).

    SCALE: ONE hash aggregate on the (n_x+2)·(n_y+2)-key space —
    map-side combine collapses every partition to ≤ that many
    partials. Feed two snapshots' outputs to ``jsd_drift``/
    ``drift_scores`` with bucket = concat(x, ':', y)."""
    if n_x < 1 or n_y < 1:
        raise ValueError("n_x and n_y must be >= 1")
    x, y = qcol(x_col).cast("double"), qcol(y_col).cast("double")
    bx = F.width_bucket(x, F.lit(float(x_lo)), F.lit(float(x_hi)),
                        F.lit(int(n_x)))
    by = F.width_bucket(y, F.lit(float(y_lo)), F.lit(float(y_hi)),
                        F.lit(int(n_y)))
    cells = (df.where(x.isNotNull() & y.isNotNull())
               .groupBy(bx.cast("int").alias("x_bucket"),
                        by.cast("int").alias("y_bucket"))
               .agg(F.count(F.lit(1)).cast("bigint").alias("count")))
    tot = cells.groupBy().agg(F.sum("count").cast("bigint")
                               .alias("__t"))
    return (cells.crossJoin(F.broadcast(tot))
                 .select("x_bucket", "y_bucket", "count",
                         F.round(F.col("count").cast("double")
                                 / F.col("__t").cast("double"), 6)
                          .alias("share")))


def pairwise_psi(hist: DataFrame) -> DataFrame:
    """Slice-vs-slice PSI MATRIX from one histogram frame
    (``numeric_histogram``/``categorical_histogram`` output): which
    sources/languages/shards actually differ from each other — the
    baseline-relative ops (drift_scores, jsd_drift) score every slice
    against ONE reference; this scores every unordered pair, the
    clustering/triage view ("de and fr agree; the new crawl disagrees
    with everything").

    PSI over the DENSE bucket union per column (a bucket either side
    never observed contributes with probability 0 + EPS — unlike the
    baseline join this is symmetric by construction):
    Σ (p_a − p_b)·ln((p_a+EPS)/(p_b+EPS)), 6dp. Output per
    (column_name, part_a < part_b): psi, n_a, n_b.

    SCALE: everything runs on the HISTOGRAM frame (|partitions| ×
    |buckets| rows — metadata, not row data): densify via a
    (partitions × buckets) cross of two tiny distinct frames, then one
    equi-join on (column, bucket) with the a < b filter and one
    (column, pair) hash aggregate."""
    parts = hist.select("column_name", "partition_key").distinct()
    buckets = hist.select("column_name", "bucket").distinct()
    totals = (hist.groupBy("column_name", "partition_key")
                  .agg(F.sum("count").cast("bigint").alias("__t")))
    dense = (parts.join(buckets, "column_name")
                  .join(hist.select("column_name", "partition_key",
                                    "bucket", "count"),
                        ["column_name", "partition_key", "bucket"],
                        "left")
                  .join(totals, ["column_name", "partition_key"])
                  .select("column_name", "partition_key", "bucket",
                          (F.coalesce(F.col("count"), F.lit(0))
                           .cast("double")
                           / F.col("__t").cast("double")).alias("p"),
                          "__t"))
    a = dense.select("column_name", "bucket",
                     F.col("partition_key").alias("part_a"),
                     F.col("p").alias("pa"), F.col("__t").alias("ta"))
    b = dense.select("column_name", "bucket",
                     F.col("partition_key").alias("part_b"),
                     F.col("p").alias("pb"), F.col("__t").alias("tb"))
    term = (F.col("pa") - F.col("pb")) * F.log(
        (F.col("pa") + F.lit(EPS)) / (F.col("pb") + F.lit(EPS)))
    return (a.join(b, ["column_name", "bucket"])
             .where(F.col("part_a") < F.col("part_b"))
             .groupBy("column_name", "part_a", "part_b")
             .agg(F.round(F.sum(term), 6).alias("psi"),
                  F.max("ta").cast("bigint").alias("n_a"),
                  F.max("tb").cast("bigint").alias("n_b")))


def histogram_movers(observed_hist: DataFrame,
                     baseline_hist: DataFrame,
                     top_k: int = 5) -> DataFrame:
    """WHICH buckets drove a drift score: per (partition, column), the
    ``top_k`` buckets by absolute share movement between baseline and
    observed histograms — chi²/PSI/JSD say HOW MUCH a distribution
    moved; the triage needs WHERE ("the 0-length bucket tripled" reads
    differently from "the whole curve shifted right").

    Full-outer bucket union (a bucket only one side observed moved by
    its whole mass); shares against each side's own total. Output:
    partition_key, column_name, bucket, share_obs, share_base (6dp),
    delta (obs − base, 6dp), rank (1 = biggest |delta|, ties by
    bucket ASC — deterministic).

    SCALE: all frames histogram-sized; one full-outer join + marginal
    windows + a rank window over the joined frame."""
    from pyspark.sql import Window

    if top_k < 1:
        raise ValueError("top_k must be >= 1")

    def _side(h, cname):
        return (h.groupBy("partition_key", "column_name", "bucket")
                 .agg(F.sum("count").cast("bigint").alias(cname)))

    o = _side(observed_hist, "o")
    b = _side(baseline_hist, "b")
    j = (o.join(b, ["partition_key", "column_name", "bucket"],
                "full_outer")
          .select("partition_key", "column_name", "bucket",
                  F.coalesce(F.col("o"), F.lit(0)).cast("bigint")
                   .alias("o"),
                  F.coalesce(F.col("b"), F.lit(0)).cast("bigint")
                   .alias("b")))
    wg = Window.partitionBy("partition_key", "column_name")
    j = (j.withColumn("__to", F.sum("o").over(wg))
          .withColumn("__tb", F.sum("b").over(wg)))
    so = F.when(F.col("__to") > 0,
                F.col("o").cast("double") / F.col("__to").cast("double")) \
          .otherwise(F.lit(0.0))
    sb = F.when(F.col("__tb") > 0,
                F.col("b").cast("double") / F.col("__tb").cast("double")) \
          .otherwise(F.lit(0.0))
    j = (j.withColumn("share_obs", F.round(so, 6))
          .withColumn("share_base", F.round(sb, 6))
          .withColumn("delta", F.round(so - sb, 6)))
    wr = Window.partitionBy("partition_key", "column_name").orderBy(
        F.abs(F.col("delta")).desc(), F.col("bucket").asc())
    return (j.withColumn("rank", F.row_number().over(wr).cast("int"))
             .where(F.col("rank") <= int(top_k))
             .select("partition_key", "column_name", "bucket",
                     "share_obs", "share_base", "delta", "rank"))


def rolling_psi(df: DataFrame, ts_col: str, value_col: str,
                lo: float, hi: float, n_buckets: int = 10,
                window_days: int = 7,
                smoothing: float = 0.5) -> DataFrame:
    """Rolling drift monitor: per day, the PSI of the value
    distribution over the trailing ``window_days`` window versus the
    window immediately before it — the continuous-monitoring
    counterpart of the snapshot-vs-baseline ``drift_scores`` (which
    needs someone to choose a baseline; this self-baselines and flags
    WHEN the distribution moved, not just that it did).

    Mechanics: width_bucket daily counts are zero-filled onto the
    dense (day × bucket) grid (≤ #days·(n_buckets+2) rows — without
    densification a bucket absent on one day silently drops its term),
    then two RANGE windows per bucket (trailing [d−w+1, d], prior
    [d−2w+1, d−w]) with calendar-day offsets so date gaps count as
    zero volume, then one per-day roll-up of Σ (po−pb)·ln(po/pb) over
    ``smoothing``-Laplace-smoothed shares (zeros never hit the log).
    Days whose prior window is empty (the first ``window_days`` days)
    emit NULL psi rather than a fabricated 0.

    Output per day: day (date), n_obs, n_base (window row totals,
    bigint), psi (6dp, NULL while warming up).

    SCALE: ONE corpus-scan hash aggregate keyed by (day, bucket);
    everything after runs on the dense grid frame. PSI interpretation
    rule of thumb: <0.1 stable, 0.1–0.25 shifting, >0.25 act."""
    if window_days < 1 or n_buckets < 1 or not hi > lo:
        raise ValueError("need window_days >= 1, n_buckets >= 1, "
                         "hi > lo")
    t, v = F.col(ts_col), F.col(value_col)
    day_idx = F.datediff(F.to_date(t), F.lit("1970-01-01"))
    b = F.width_bucket(v.cast("double"), F.lit(lo), F.lit(hi),
                       F.lit(n_buckets))
    daily = (df.where(t.isNotNull() & v.isNotNull())
             .groupBy(day_idx.alias("d"), b.alias("bucket"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    days = daily.select("d").distinct()
    buckets = daily.select("bucket").distinct()
    grid = (days.crossJoin(buckets)
            .join(daily, ["d", "bucket"], "left")
            .select("d", "bucket",
                    F.coalesce("c", F.lit(0).cast("bigint")).alias("c")))
    w_obs = (Window.partitionBy("bucket").orderBy("d")
             .rangeBetween(-(window_days - 1), 0))
    w_base = (Window.partitionBy("bucket").orderBy("d")
              .rangeBetween(-(2 * window_days - 1), -window_days))
    g = grid.select(
        "d", "bucket",
        F.sum("c").over(w_obs).alias("__o"),
        F.coalesce(F.sum("c").over(w_base), F.lit(0).cast("bigint"))
         .alias("__b"))
    per_day = (g.groupBy("d")
               .agg(F.sum("__o").alias("__to"),
                    F.sum("__b").alias("__tb"),
                    F.count(F.lit(1)).alias("__k"),
                    F.collect_list(F.struct("__o", "__b")).alias("__x")))
    # smoothed shares: (cnt + s) / (total + s*k); computed per bucket
    # via a higher-order function on the per-day bucket list (stays
    # JVM-side, no UDF)
    s = float(smoothing)
    po = lambda e: (e["__o"] + F.lit(s)) \
        / (F.col("__to") + F.lit(s) * F.col("__k"))  # noqa: E731
    pb = lambda e: (e["__b"] + F.lit(s)) \
        / (F.col("__tb") + F.lit(s) * F.col("__k"))  # noqa: E731
    term = lambda e: (po(e) - pb(e)) * F.log(po(e) / pb(e))  # noqa: E731
    psi = F.aggregate("__x", F.lit(0.0),
                      lambda acc, e: acc + term(e))
    return (per_day.select(
        F.date_add(F.lit("1970-01-01"), F.col("d")).alias("day"),
        F.col("__to").cast("bigint").alias("n_obs"),
        F.col("__tb").cast("bigint").alias("n_base"),
        F.when(F.col("__tb") > 0, F.round(psi, 6)).alias("psi")))
