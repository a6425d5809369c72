"""Skew-salted join: the standard heavy-key mitigation as a reusable
operator with a provable invariant — the result is ROW-IDENTICAL to the
plain join, only the shuffle layout changes. ``key_skew_stats`` and
``join_size_estimate`` (operators/uniqueness.py) tell you a join WILL
skew; this is what you reach for when it does and AQE's skew-join split
can't help (e.g. a shuffle-hash join whose one hot key exceeds a single
task's memory even after AQE splitting).

Mechanics (classic N-way salting): the large side tags each row with a
deterministic salt in [0, salts) derived from xxhash64 of the whole row
(content-derived — no rand(), so retried tasks re-produce identical
salts and the join stays exactly-once under speculative execution); the
small side is replicated ``salts`` times via a posexplode. The join key
becomes (key, salt), splitting each hot key's rows across ``salts``
shuffle partitions. Replication multiplies the small side ×salts —
worth it exactly when the small side is dim-sized and the big side's
hot key dominates a task.

The reference engine is single-process pandas and has no join layout
concept at all; this is a north-rule scale addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(big: DataFrame, small: DataFrame, on: list[str] | str,
                salts: int = 8, how: str = "inner") -> DataFrame:
    """Join ``big`` ⋈ ``small`` on equi-key ``on`` with an N-way salt
    on the big side. Semantics: identical rows to ``big.join(small,
    on, how)`` for ``how`` in {inner, left} — the equivalence the
    oracle check and tests pin down. Column order: join keys first,
    then big's remaining columns, then small's (Spark's usual equi-join
    layout).

    ``salts=1`` degenerates to the plain join (handy for A/B). Right
    and full joins are rejected: replicating the small side would
    duplicate its unmatched rows, breaking outer semantics.

    SCALE: one extra tiny column on the big side, ×salts rows on the
    small side, and the shuffle hashes (key..., salt) — each formerly
    hot partition becomes ``salts`` mergeable ones. No extra shuffle
    stage versus the plain join."""
    if salts < 1:
        raise ValueError("salts must be >= 1")
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how in {'inner','left'}: "
                         "replicating the small side breaks right/full "
                         "outer semantics")
    keys = [on] if isinstance(on, str) else list(on)
    if salts == 1:
        return big.join(small, keys, how)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                  F.lit(salts)).cast("int")
    b = big.withColumn("__salt", salt)
    s = (small.withColumn("__salt",
                          F.explode(F.sequence(F.lit(0),
                                               F.lit(salts - 1))))
         .withColumn("__salt", F.col("__salt").cast("int")))
    return b.join(s, keys + ["__salt"], how).drop("__salt")
