"""Statistical data-quality screens that go beyond the reference's
per-column profile (src/schema_validata.py:955-1147 computes counts /
ranges / lengths only): first-digit (Benford) conformance for numeric
columns and Shannon-entropy cardinality profiles for categorical ones.
Both are north_rule additions — single-aggregate screens a validation
engine runs next to the column profile to catch fabricated or collapsed
data that passes range/null/dtype checks.

Design: everything is built-in Column expressions (log10/log2, floor,
pow) over one or two hash aggregates whose output is digit- or
cardinality-sized — never row-sized. No UDFs, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.colref import qcol


def benford_digits(df: DataFrame, value_col: str) -> DataFrame:
    """Leading-significant-digit distribution of a numeric column versus
    Benford's law (P(d) = log10(1 + 1/d)).

    Naturally-occurring multiplicative data (transaction amounts, file
    sizes, latencies) follows Benford closely; uniform or hand-typed
    data does not — a large per-digit deviation is a cheap fraud /
    synthetic-data tripwire that the range+null profile cannot see.

    The leading digit of |v| is ``floor(|v| / 10^floor(log10 |v|))``,
    exact for every representable double whose log10 is not on an exact
    power-of-ten boundary (and exact there too on platforms with a
    correctly-rounded log10, which both the JVM and DuckDB provide for
    powers of ten). Zero and NULL values are excluded (they have no
    leading significant digit); the share denominator is the non-zero
    count.

    Output (≤9 rows): digit, n, share, benford_share, chi2_term —
    chi2_term = (n − E)²/E with E = total·P(d); sum over rows is the
    chi-square statistic against Benford with 8 dof.

    SCALE: one hash aggregate keyed by a 1-of-9 int (map-side combined;
    the shuffle carries ≤9 rows per task) plus a broadcast of the
    single-row total back over the 9-row frame."""
    v = F.abs(qcol(value_col).cast("double"))
    digit = F.floor(v / F.pow(F.lit(10.0), F.floor(F.log10(v)))).cast("int")
    counts = (df.where(qcol(value_col).isNotNull() & (v > 0))
                .groupBy(digit.alias("digit"))
                .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    total = counts.agg(F.coalesce(F.sum("n"), F.lit(0)).alias("__total"))
    j = counts.crossJoin(F.broadcast(total))
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    expected = benford * F.col("__total")
    chi2_term = F.when(expected > 0,
                       F.pow(F.col("n") - expected, 2) / expected) \
                 .otherwise(F.lit(0.0))
    return (j.select("digit", "n",
                     F.round(F.col("n") / F.col("__total"), 6).alias("share"),
                     F.round(benford, 6).alias("benford_share"),
                     F.round(chi2_term, 6).alias("chi2_term"))
             .orderBy("digit"))


def column_entropy(df: DataFrame, cols: list[str],
                   null_token: str = "__null__") -> DataFrame:
    """Shannon entropy + cardinality profile per categorical column:
    how much information a column actually carries. A column whose
    entropy collapsed between snapshots (all rows suddenly one value)
    passes every null/allowed-value rule yet is broken — this is the
    aggregate that catches it. NULL is counted as its own category
    (``null_token``) so a null-flood moves the number too.

    Output (one row per requested column): column_name, n_rows,
    n_distinct, entropy_bits (−Σ p·log2 p, rounded 6dp), norm_entropy
    (entropy / log2(n_distinct), 0 for single-valued columns — a
    0-to-1 evenness score comparable across columns), top_share
    (modal value's share).

    SCALE: the input is melted to (column_name, value) pairs via one
    generated-column explode (no Python), then ONE hash aggregate per
    level: (column, value) counts — shuffle is vocabulary-sized, rows
    never shuffle — followed by a (column)-keyed rollup of the count
    frame. len(cols) multiplies map-side work, not shuffle width."""
    pairs = F.explode(F.array(*[
        F.struct(F.lit(c).alias("column_name"),
                 F.coalesce(qcol(c).cast("string"), F.lit(null_token))
                  .alias("value"))
        for c in cols])).alias("p")
    counts = (df.select(pairs)
                .select("p.column_name", "p.value")
                .groupBy("column_name", "value")
                .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    totals = counts.groupBy("column_name").agg(
        F.sum("n").alias("__total"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.max("n").alias("__top"))
    p = F.col("n") / F.col("__total")
    term = -p * F.log2(p)
    return (counts.join(totals, "column_name")
                  .groupBy("column_name")
                  .agg(F.max("__total").alias("n_rows"),
                       F.max("n_distinct").alias("n_distinct"),
                       F.round(F.sum(term), 6).alias("entropy_bits"),
                       F.round(F.when(F.max("n_distinct") > 1,
                                      F.sum(term)
                                      / F.log2(F.max("n_distinct")))
                                .otherwise(F.lit(0.0)), 6)
                        .alias("norm_entropy"),
                       F.round(F.max("__top") / F.max("__total"), 6)
                        .alias("top_share")))
