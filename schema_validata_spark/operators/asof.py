"""As-of (point-in-time) join — match each left row to the most recent
right row at or before its timestamp, per key.

Spark has no native ASOF JOIN (pandas ``merge_asof`` / DuckDB ``ASOF
JOIN`` / kdb ``aj`` semantics), but a validation pipeline needs one
constantly: join each transcript turn to the rules/config snapshot that
was active when it happened, each event to the latest preceding state
change, metrics to the last deployed model version.

IMPLEMENTATION (Spark-first, no UDF): tag both sides, union them, and
run ONE window per key ordered by (ts, side) where the right side sorts
first at equal timestamps — then ``last(value, ignorenulls=True)`` over
an unbounded-preceding frame carries the latest right-side values
forward onto every left row. Filter back to left rows. This is the
classic sort-merge formulation: ONE shuffle on the key (the window
exchange), a single streaming pass per partition, and the right side is
never re-scanned per left row (the naive inequality join is O(n·m) per
key and is what Catalyst would do with a plain ``l.ts >= r.ts`` theta
join).

SCALE NOTES: cost is sort-of(left+right) within each key partition —
the same profile as any windowed check in this engine; a mega-key rides
on the sort's spill path (the carried columns are the only extra state,
one row's worth). Tolerance filtering is a post-window map. If the
right side is tiny and keys are few, a broadcast + max-under aggregate
can beat this; this operator targets the general large×large case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def asof_join(left: DataFrame, right: DataFrame, ts_col: str,
              by_cols: list[str], value_cols: list[str] | None = None,
              tolerance_s: float | None = None,
              allow_exact_matches: bool = True,
              direction: str = "backward",
              matched_ts_col: str = "asof_ts",
              tiebreak_col: str | None = None) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``right``'s
    ``value_cols`` from the most recent right row with the same
    ``by_cols`` key and ``right.ts <= left.ts`` (``direction=
    'backward'``, the default) or the EARLIEST right row with
    ``right.ts >= left.ts`` (``direction='forward'``); strict
    inequality when ``allow_exact_matches=False``. NULLs when no such
    row exists or it is further than ``tolerance_s`` seconds away.
    ``matched_ts_col`` holds the matched right row's timestamp (the
    audit column). 'forward' is the same single-window plan with the
    sort reversed — not a second pass.

    Ties inside the right side (two right rows with identical (key,
    ts)): pass ``tiebreak_col`` (a right-side column) and the row with
    the GREATEST tiebreak value wins, deterministically across
    partitionings and shuffle retries. Without it, ties resolve to the
    later row in the union's sort order — nondeterministic under
    shuffle retries if the right side holds exact-duplicate (key, ts)
    rows (caller contract).

    NULL timestamps: a left row with NULL ts matches nothing (NULLs
    sort FIRST in both directions, before every right row, so nothing
    is carried onto it); a right row with NULL ts is never matched (its
    carried ``__ts`` is NULL → the match predicate fails) — pandas
    ``merge_asof`` / SQL ASOF semantics.

    Column-name contract: ``value_cols`` must not collide with left
    columns (rename upstream); ``ts_col``/``by_cols`` must exist on
    both sides."""
    value_cols = value_cols if value_cols is not None else [
        c for c in right.columns if c not in by_cols and c != ts_col]
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols collide with left columns: "
                         f"{sorted(clash)}; rename on the right side")
    if matched_ts_col in left.columns or matched_ts_col in value_cols:
        raise ValueError(f"matched_ts_col {matched_ts_col!r} collides "
                         f"with an output column; pass a different name")

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', "
                         f"got {direction!r}")
    if tiebreak_col is not None and tiebreak_col not in right.columns:
        raise ValueError(f"tiebreak_col {tiebreak_col!r} must be a "
                         f"right-side column")
    # side 0 = right, 1 = left: at equal ts the right row sorts first,
    # so its values are already carried when the left row is evaluated
    # (allow_exact_matches=True). For strict inequality, left sorts
    # FIRST at equal ts so the same-instant right row is not yet
    # visible. 'forward' reverses the time order, turning the carry of
    # "latest right row so far" into "earliest right row from here on".
    r_side, l_side = (0, 1) if allow_exact_matches else (1, 0)
    from pyspark.sql import Window
    tb_r = (F.col(tiebreak_col).alias("__tb") if tiebreak_col is not None
            else F.lit(0).alias("__tb"))
    tb_l = (F.lit(None).cast(right.schema[tiebreak_col].dataType)
            if tiebreak_col is not None else F.lit(0)).alias("__tb")
    r = right.select(
        *[F.col(c) for c in by_cols],
        F.col(ts_col),
        F.lit(r_side).alias("__side"),
        tb_r,
        F.col(ts_col).alias("__r_ts"),
        *[F.col(c) for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in by_cols and c != ts_col])
    l = left.select(
        *[F.col(c) for c in by_cols],
        F.col(ts_col),
        F.lit(l_side).alias("__side"),
        tb_l,
        F.lit(None).cast(right.schema[ts_col].dataType).alias("__r_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c)
          for c in value_cols],
        *[F.col(c) for c in left.columns
          if c not in by_cols and c != ts_col])
    u = r.unionByName(l)

    is_left = F.col("__side") == l_side
    # NULLS FIRST in BOTH directions (asc defaults to it; desc does NOT
    # — Spark's desc() is NULLS LAST, which would sort a NULL-ts left
    # row after every right row and hand it the min-ts row's values):
    # NULL-ts rows must precede every real timestamp so they carry
    # nothing and match nothing.
    ts_order = (F.col(ts_col).asc_nulls_first() if direction == "backward"
                else F.col(ts_col).desc_nulls_first())
    # __tb last: among equal-(ts, side) RIGHT rows the greatest tiebreak
    # value sorts last and wins the carry; asc_nulls_first keeps rows
    # without a tiebreak (left rows / None) inert.
    w = (Window.partitionBy(*[F.col(c) for c in by_cols])
               .orderBy(ts_order, F.col("__side").asc(),
                        F.col("__tb").asc_nulls_first())
               .rowsBetween(Window.unboundedPreceding, 0))
    # carry ONE struct, non-NULL exactly for right rows: a matched right
    # row whose VALUE is legitimately NULL must yield that NULL, not an
    # older non-null value (last(value, ignorenulls) would skip it)
    st = F.when(F.col("__side") == r_side,
                F.struct(F.col("__r_ts").alias("__ts"),
                         *[F.col(c).alias(c) for c in value_cols]))
    carried_st = F.last(st, ignorenulls=True).over(w)
    carried_ts = carried_st["__ts"]
    carried = {c: carried_st[c] for c in value_cols}

    within: Column = F.lit(True)
    if tolerance_s is not None:
        # NTZ-safe epoch diff (same hop as sequence.sessionize)
        def _ep(c):
            return c.cast("timestamp_ltz").cast("double")
        gap = (_ep(F.col(ts_col)) - _ep(carried_ts)
               if direction == "backward"
               else _ep(carried_ts) - _ep(F.col(ts_col)))
        within = gap <= float(tolerance_s)

    matched = carried_ts.isNotNull() & within
    out_cols = (
        [F.col(c) for c in by_cols]
        + [F.col(ts_col)]
        + [F.col(c) for c in left.columns
           if c not in by_cols and c != ts_col]
        + [F.when(matched, carried[c]).alias(c) for c in value_cols]
        + [F.when(matched, carried_ts).alias(matched_ts_col)])
    return u.select(*out_cols, is_left.alias("__is_left")) \
            .where(F.col("__is_left")).drop("__is_left")
