"""Referential integrity: anti-join of fact foreign keys vs a dimension.

No reference counterpart (the reference validates one table at a time);
this is the north_rule addition: ``transcripts.conv_id`` must exist in
``conversations.conv_id``. Implemented as a ``left_anti`` join —
broadcast when the dimension fits in memory (the planner is hinted),
shuffle hash join with AQE skew mitigation otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.colref import qcol

# dimension row-count threshold below which we force a broadcast hint
BROADCAST_DIM_MAX_ROWS = 50_000_000


def referential_violations(fact: DataFrame, fk_cols: list[str],
                           dim: DataFrame, dim_cols: list[str],
                           broadcast_dim: bool | None = None) -> DataFrame:
    """Rows of ``fact`` whose (non-null) foreign key has no match in
    ``dim``. NULL foreign keys are excluded — they are the null check's
    business, not RI's."""
    d = dim.select(*[qcol(c).alias(f"__d_{i}") for i, c in enumerate(dim_cols)]) \
           .dropDuplicates()
    if broadcast_dim is None:
        # cheap heuristic: let Catalyst/AQE decide unless caller insists;
        # hint only when dim is known-small (avoids a count() job on big dims)
        broadcast_dim = False
    if broadcast_dim:
        d = F.broadcast(d)
    cond = None
    for i, fk in enumerate(fk_cols):
        c = qcol(fk) == F.col(f"__d_{i}")
        cond = c if cond is None else cond & c
    nn = None
    for fk in fk_cols:
        c = qcol(fk).isNotNull()
        nn = c if nn is None else nn & c
    return fact.where(nn).join(d, cond, "left_anti")


def reconcile_keys(df_a: DataFrame, keys_a: list[str],
                   df_b: DataFrame, keys_b: list[str]) -> DataFrame:
    """Two-sided key reconciliation: ``(status, n_keys)`` for status in
    {'only_a', 'only_b', 'both'} over the DISTINCT (non-null) key sets —
    the source-vs-sink audit after a copy/transform ("did every order
    land, and did anything appear from nowhere?").

    Scale shape: tag + union + ONE aggregate on the key — each side's
    duplicates collapse map-side in the same hash aggregate (no separate
    distinct pass, no join); the classification re-aggregates the
    distinct-key frame. Works for composite keys (positional match)."""
    if len(keys_a) != len(keys_b):
        raise ValueError("keys_a and keys_b must have the same arity")

    def _side(df: DataFrame, keys: list[str], bit: int) -> DataFrame:
        nn = None
        for k in keys:
            c = qcol(k).isNotNull()
            nn = c if nn is None else nn & c
        return (df.where(nn)
                  .select(*[qcol(k).alias(f"__k{i}")
                            for i, k in enumerate(keys)],
                          F.lit(bit).alias("__s")))

    tagged = _side(df_a, keys_a, 1).unionByName(_side(df_b, keys_b, 2))
    kcols = [f"__k{i}" for i in range(len(keys_a))]
    per_key = tagged.groupBy(*kcols).agg(F.bit_or("__s").alias("__m"))
    status = (F.when(F.col("__m") == 1, F.lit("only_a"))
               .when(F.col("__m") == 2, F.lit("only_b"))
               .otherwise(F.lit("both")))
    return (per_key.groupBy(status.alias("status"))
                   .agg(F.count(F.lit(1)).alias("n_keys")))


def referential_violation_count(fact: DataFrame, fk_cols: list[str],
                                dim: DataFrame, dim_cols: list[str],
                                broadcast_dim: bool | None = None) -> int:
    return referential_violations(fact, fk_cols, dim, dim_cols,
                                  broadcast_dim).count()


def fd_check(df: DataFrame,
             fds: list[tuple[str, list[str], str]]) -> DataFrame:
    """Functional-dependency audit: for each claimed dependency
    ``determinant → dependent``, how many determinant keys map to MORE
    than one distinct non-null dependent value (and how many rows live
    under those keys). The classic "is this column derivable from that
    key" data-quality probe — e.g. does every order carry one return
    flag, does every user keep one signup country.

    ``fds`` is ``[(name, [det_col, ...], dep_col), ...]``; output is
    one row per dependency:
    ``(fd, n_keys, n_violating_keys, n_rows_in_violating_keys)``.

    NULL dependent values are ignored (NULL asserts nothing about the
    dependency); rows whose determinant is entirely NULL are grouped
    under the NULL key like any other group.

    Scale shape: one hash aggregate per dependency on the determinant
    key (two-stage count-distinct — partial (key, dep) dedup map-side),
    then a one-row reduction; results union. Distinct dependencies
    cannot share a grouping, so the scans are per-FD by construction —
    at cluster scale callers persist ``df`` once across the list."""
    if not fds:
        raise ValueError("fds must be non-empty")
    out = None
    for name, det_cols, dep_col in fds:
        per_key = (df.groupBy(*[qcol(c) for c in det_cols])
                   .agg(F.count(F.lit(1)).alias("__n"),
                        F.count_distinct(qcol(dep_col)).alias("__d")))
        summ = per_key.agg(
            F.lit(name).alias("fd"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum(F.when(F.col("__d") > 1, 1).otherwise(0))
             .cast("bigint").alias("n_violating_keys"),
            F.sum(F.when(F.col("__d") > 1, F.col("__n")).otherwise(0))
             .cast("bigint").alias("n_rows_in_violating_keys"))
        out = summ if out is None else out.unionByName(summ)
    return out
