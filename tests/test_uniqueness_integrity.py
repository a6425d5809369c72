"""Salted composite-key uniqueness + referential integrity, incl. the
skew fixture (one mega conversation)."""

from pyspark.sql import functions as F

from schema_validata_spark.datagen import gen_conversations, gen_transcripts
from schema_validata_spark.operators.integrity import (
    referential_violation_count, referential_violations)
from schema_validata_spark.operators.uniqueness import (composite_duplicates,
                                                        duplicate_stats)


def test_duplicate_stats_exact(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 1), ("b", 2), ("b", 3), ("c", 4)],
        "k: string, i: int")
    s = duplicate_stats(df, ["k", "i"])
    assert s == {"duplicate_keys": 1, "duplicate_rows": 3}


def test_composite_duplicates_rows(spark):
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 1, "y"), ("b", 2, "z")], "k: string, i: int, v: string")
    rows = composite_duplicates(df, ["k", "i"]).collect()
    assert len(rows) == 2
    assert all(r["dup_count"] == 2 for r in rows)


def test_salted_path_matches_plain_groupby_on_skewed_data(spark):
    """Salting must not double count: same verdict as an unsalted
    aggregate on the mega-conversation skew fixture (SURVEY §5.2.5)."""
    df = gen_transcripts(spark, 30_000, seed=42).cache()
    salted = duplicate_stats(df, ["conv_id", "turn_idx"], n_salts=32)
    plain = (df.groupBy("conv_id", "turn_idx").count()
               .where(F.col("count") > 1)
               .agg(F.count(F.lit(1)).alias("k"),
                    F.coalesce(F.sum("count"), F.lit(0)).alias("m"))
               .collect()[0])
    assert salted["duplicate_keys"] == plain["k"]
    assert salted["duplicate_rows"] == plain["m"]
    assert salted["duplicate_rows"] > 0  # seeded dups exist
    df.unpersist()


def test_referential_violations(spark):
    fact = spark.createDataFrame(
        [("c1", 1), ("c2", 2), ("zz", 3), (None, 4)], "conv_id: string, t: int")
    dim = spark.createDataFrame([("c1",), ("c2",)], "conv_id: string")
    bad = referential_violations(fact, ["conv_id"], dim, ["conv_id"],
                                 broadcast_dim=True)
    rows = bad.collect()
    assert [r["conv_id"] for r in rows] == ["zz"]  # NULL fk excluded


def test_referential_on_generated_data(spark):
    t = gen_transcripts(spark, 20_000, seed=42)
    c = gen_conversations(spark, 20_000, seed=42)
    n = referential_violation_count(t, ["conv_id"], c, ["conv_id"],
                                    broadcast_dim=True)
    # seeded RI violations (conv-9xxxxxxx) + NA-pattern strings
    assert n > 0
    bad = referential_violations(t, ["conv_id"], c, ["conv_id"], True)
    assert bad.where(F.col("conv_id").rlike("^conv-9")).count() > 0


def test_reconcile_keys(spark):
    from schema_validata_spark import reconcile_keys
    a = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (None,)], "k bigint")
    b = spark.createDataFrame([(2,), (3,), (4,), (4,)], "k bigint")
    got = {r["status"]: r["n_keys"]
           for r in reconcile_keys(a, ["k"], b, ["k"]).collect()}
    assert got == {"only_a": 1, "only_b": 1, "both": 2}


def test_reconcile_keys_composite_and_arity(spark):
    import pytest as _pt
    from schema_validata_spark import reconcile_keys
    a = spark.createDataFrame([(1, "x"), (1, "y")], "k bigint, s string")
    b = spark.createDataFrame([(1, "y"), (2, "z")], "j bigint, t string")
    got = {r["status"]: r["n_keys"] for r in
           reconcile_keys(a, ["k", "s"], b, ["j", "t"]).collect()}
    assert got == {"only_a": 1, "only_b": 1, "both": 1}
    with _pt.raises(ValueError):
        reconcile_keys(a, ["k"], b, ["j", "t"])


def test_key_skew_stats_finds_hot_key(spark):
    """A mega-key corpus: the hot key must rank first with the right
    share and a skew_ratio ≈ its count × n_keys / total; NULL keys
    rank like values."""
    from pyspark.sql import functions as F
    from schema_validata_spark.operators.uniqueness import key_skew_stats
    hot = spark.range(900).select(F.lit("mega").alias("k"))
    cold = spark.range(99).select(
        F.concat(F.lit("u"), F.col("id")).alias("k"))
    nulls = spark.range(1).select(F.lit(None).cast("string").alias("k"))
    df = hot.union(cold).union(nulls)
    rows = key_skew_stats(df, ["k"], top_n=3).collect()
    assert rows[0]["k"] == "mega" and rows[0]["n_rows"] == 900
    assert abs(rows[0]["share"] - 0.9) < 1e-6
    # 101 distinct keys (99 cold + mega + NULL): 0.9 * 101
    assert abs(rows[0]["skew_ratio"] - 90.9) < 1e-3
    assert {r["n_rows"] for r in rows[1:]} == {1}


def test_k_anonymity_hand_computed(spark):
    from schema_validata_spark.operators.uniqueness import (k_anonymity,
                                                            k_anonymity_classes)
    rows = ([("us", "en")] * 5 + [("fr", "fr")] * 2
            + [("de", None)] * 1 + [(None, None)] * 3)
    df = spark.createDataFrame(rows, "src: string, lang: string")
    out = k_anonymity(df, ["src", "lang"], k=3).collect()[0]
    assert out["n_rows"] == 11 and out["n_classes"] == 4
    assert out["min_class_size"] == 1
    # classes under k=3: (fr,fr)=2 and (de,NULL)=1 -> 3 rows
    assert out["n_violating_classes"] == 2
    assert out["n_violating_rows"] == 3
    assert out["violating_row_share"] == round(3 / 11, 6)
    listing = {(r["src"], r["lang"]): r["class_size"]
               for r in k_anonymity_classes(df, ["src", "lang"], k=3).collect()}
    assert listing == {("fr", "fr"): 2, ("de", None): 1}
    # NULL quasi values group together (the attacker sees them too)
    assert out["n_rows"] - sum(listing.values()) == 8


def test_l_diversity_hand_computed(spark):
    from schema_validata_spark.operators.uniqueness import l_diversity
    # class (us,en): secrets a,a,b -> diversity 2 (ok at l=2)
    # class (fr,fr): secrets a,a   -> diversity 1 (violates)
    # class (de,de): secrets NULL,NULL -> diversity 0 (violates)
    rows = [("us", "en", "a"), ("us", "en", "a"), ("us", "en", "b"),
            ("fr", "fr", "a"), ("fr", "fr", "a"),
            ("de", "de", None), ("de", "de", None)]
    df = spark.createDataFrame(rows, "src: string, lang: string, s: string")
    out = l_diversity(df, ["src", "lang"], "s", l=2).collect()[0]
    assert out["n_classes"] == 3
    assert out["n_violating_classes"] == 2
    assert out["n_violating_rows"] == 4
    assert out["violating_row_share"] == round(4 / 7, 6)
    assert out["min_diversity"] == 0 and out["l"] == 2


def test_relationship_audit_classifications(spark):
    from schema_validata_spark.operators.integrity import relationship_audit
    a = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z"), (3, "w"), (None, "n")],
        "k: int, payload: string")
    b = spark.createDataFrame(
        [(1, "p"), (2, "q"), (2, "r"), (4, "s")], "k: int, d: string")
    out = relationship_audit(a, b, "k").collect()[0]
    assert out["n_keys_a"] == 3 and out["n_keys_b"] == 3
    assert out["n_matched_keys"] == 2          # keys 1 and 2
    assert out["orphan_keys_a"] == 1           # key 3
    assert out["orphan_keys_b"] == 1           # key 4
    assert out["null_rows_a"] == 1 and out["null_rows_b"] == 0
    # key 1: 2 rows in a x 1 in b; key 2: 1 x 2 -> N:M overall
    assert out["relationship"] == "many_to_many"
    assert out["worst_fanout"] == 2
    # clean 1:N case
    dim = spark.createDataFrame([(1, "d1"), (2, "d2")], "k: int, d: string")
    fact = spark.createDataFrame([(1, 10), (1, 11), (2, 12)],
                                 "k: int, v: int")
    r = relationship_audit(dim, fact, "k").collect()[0]
    assert r["relationship"] == "one_to_many"
    assert r["orphan_keys_a"] == 0 and r["orphan_keys_b"] == 0
    # disjoint key spaces
    d = relationship_audit(dim, spark.createDataFrame([(9, 1)],
                           "k: int, v: int"), "k").collect()[0]
    assert d["relationship"] == "disjoint" and d["worst_fanout"] == 0
