"""Per-group top-k selection — the quality-filtering stage of a
training-data pipeline (e.g. keep the k highest-quality documents per
language / per domain / per dedup cluster).

SCALE NOTES: expressed as ``row_number() OVER (PARTITION BY g ORDER BY
s)`` + ``rank <= k`` so Catalyst's ``InferWindowGroupLimit`` rule
(Spark 3.5+) rewrites it into a ``WindowGroupLimit`` physical node:
each map task keeps only its local top-k per group BEFORE the shuffle,
so the exchange carries ≤ k·groups·tasks rows instead of the full
table — the same partial-top-k trick as a map-side combine. The plan
guard test asserts the node is present; without it this pattern
shuffles the whole table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def top_k_per_group(df: DataFrame, group_cols: list[str],
                    order_col: str | Column, k: int,
                    descending: bool = True,
                    tiebreak_cols: list[str] | None = None,
                    rank_col: str = "rank") -> DataFrame:
    """Keep the top ``k`` rows per group, ranked by ``order_col``
    (descending by default), with a deterministic tiebreak (ascending
    ``tiebreak_cols`` — pass the row id to make output reproducible
    across shuffles/retries; without one, ties make row_number
    nondeterministic)."""
    c = F.col(order_col) if isinstance(order_col, str) else order_col
    order = [c.desc() if descending else c.asc()]
    order += [F.col(t).asc() for t in (tiebreak_cols or [])]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (df.withColumn(rank_col, F.row_number().over(w))
              .where(F.col(rank_col) <= k))
