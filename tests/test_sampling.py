"""Deterministic sampling / splitting (functions/sampling.py):
partitioning-independence, fraction accuracy, leakage safety."""

from pyspark.sql import functions as F

from schema_validata_spark.functions.sampling import (deterministic_sample,
                                                      group_split,
                                                      sample_expr,
                                                      split_expr)


def _keys(spark, n=10_000):
    return spark.range(n).select(F.col("id").alias("k"))


def test_sample_is_partitioning_independent(spark):
    df = _keys(spark)
    a = {r["k"] for r in deterministic_sample(df, "k", 0.25).collect()}
    b = {r["k"] for r in
         deterministic_sample(df.repartition(17), "k", 0.25).collect()}
    assert a == b            # df.sample() would fail this
    assert a == {r["k"] for r in
                 deterministic_sample(df, "k", 0.25).collect()}


def test_sample_fraction_accuracy_and_nesting(spark):
    df = _keys(spark)
    n10 = deterministic_sample(df, "k", 0.10).count()
    n50 = deterministic_sample(df, "k", 0.50).count()
    assert abs(n10 / 10_000 - 0.10) < 0.02
    assert abs(n50 / 10_000 - 0.50) < 0.02
    # thresholds nest: the 10% sample is a subset of the 50% sample
    s10 = {r["k"] for r in deterministic_sample(df, "k", 0.10).collect()}
    s50 = {r["k"] for r in deterministic_sample(df, "k", 0.50).collect()}
    assert s10 <= s50


def test_sample_salt_gives_independent_draws(spark):
    df = _keys(spark)
    a = {r["k"] for r in deterministic_sample(df, "k", 0.5, "s1").collect()}
    b = {r["k"] for r in deterministic_sample(df, "k", 0.5, "s2").collect()}
    overlap = len(a & b) / 10_000
    assert 0.15 < overlap < 0.35        # ≈ 0.25 if independent


def test_sample_edge_fractions(spark):
    df = _keys(spark, 100)
    assert deterministic_sample(df, "k", 1.0).count() == 100
    assert deterministic_sample(df, "k", 0.0).count() == 0


def test_group_split_no_leakage(spark):
    # 200 groups × 5 rows; every row of a group must share its split
    df = spark.range(1000).select(
        (F.col("id") % 200).alias("g"), F.col("id").alias("row_id"))
    out = group_split(df, "g")
    per_group = (out.groupBy("g")
                    .agg(F.countDistinct("split").alias("nsplits"))
                    .agg(F.max("nsplits")).collect()[0][0])
    assert per_group == 1
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n"))
                 .collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert abs(counts["train"] / 1000 - 0.8) < 0.1


def test_split_fractions_exhaustive_and_disjoint(spark):
    df = _keys(spark)
    out = df.select("k", split_expr("k", {"a": 0.5, "b": 0.5}).alias("s"))
    counts = {r["s"]: r["n"] for r in
              out.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 10_000
    assert abs(counts["a"] / 10_000 - 0.5) < 0.02


def test_sample_expr_is_map_only(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    _keys(spark, 1000).write.parquet(p)
    df = spark.read.parquet(p)
    plan = df.where(sample_expr("k", 0.3)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan       # no shuffle: filter in the scan stage


def test_split_full_cumulative_fraction(spark):
    # cumulative fraction reaching 1.0 before the last split must NOT
    # leak rows into later zero-width splits
    df = _keys(spark, 1000)
    out = df.select("k", split_expr(
        "k", {"train": 0.9, "val": 0.1, "test": 0.0}).alias("s"))
    counts = {r["s"]: r["n"] for r in
              out.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert "test" not in counts
    assert abs(counts["train"] / 1000 - 0.9) < 0.05
    assert abs(counts["val"] / 1000 - 0.1) < 0.05
    one = df.select(split_expr("k", {"a": 1.0, "b": 0.0}).alias("s"))
    assert {r["s"] for r in one.distinct().collect()} == {"a"}


def test_stratified_sample_fractions(spark):
    from schema_validata_spark.functions.sampling import stratified_sample
    df = spark.range(30_000).select(
        F.col("id"),
        F.element_at(F.array(F.lit("a"), F.lit("b"), F.lit("c")),
                     (F.col("id") % 3 + 1).cast("int")).alias("s"))
    out = stratified_sample(df, "id", "s",
                            {"a": 0.5, "b": 1.0}, default=0.0)
    by = {r["s"]: r["n"] for r in
          out.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by.get("b") == 10_000                 # keep-all stratum
    assert "c" not in by                         # default 0.0 drops all
    assert abs(by.get("a", 0) - 5_000) < 300     # ~50%
    # deterministic: second run identical
    again = stratified_sample(df, "id", "s", {"a": 0.5, "b": 1.0})
    assert sorted(r["id"] for r in out.collect()) == \
        sorted(r["id"] for r in again.collect())


def test_stratified_sample_null_stratum_uses_default(spark):
    from schema_validata_spark.functions.sampling import (
        stratified_sample, stratified_sample_expr)
    df = spark.range(100).select(
        F.col("id"), F.lit(None).cast("string").alias("s"))
    assert stratified_sample(df, "id", "s", {"a": 1.0},
                             default=0.0).count() == 0
    assert stratified_sample(df, "id", "s", {"a": 0.0},
                             default=1.0).count() == 100
    # a NULL-named stratum can still be targeted via eqNullSafe
    kept = df.where(stratified_sample_expr("id", "s", {None: 1.0},
                                           default=0.0))
    assert kept.count() == 100


# --- cap_group_share ---------------------------------------------------------

def test_cap_group_share_downsamples_only_big_groups(spark):
    from schema_validata_spark.functions.sampling import cap_group_share
    import pyspark.sql.functions as F
    # 900 rows in 'big', 100 in 'small' → small is 10% of total
    df = spark.range(1000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 900, "big").otherwise("small").alias("g"))
    out = cap_group_share(df, "k", "g", 0.30)
    counts = {r["g"]: r["n"] for r in
              out.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["small"] == 100                      # under cap: untouched
    # big capped at ≈ 0.30 * 1000 = 300 (hash-exact, not quota-exact)
    assert 240 <= counts["big"] <= 360


def test_cap_group_share_deterministic_and_partition_independent(spark):
    from schema_validata_spark.functions.sampling import cap_group_share
    import pyspark.sql.functions as F
    df = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("g"))
    a = set(r["k"] for r in cap_group_share(df, "k", "g", 0.2).collect())
    b = set(r["k"] for r in
            cap_group_share(df.repartition(7), "k", "g", 0.2).collect())
    assert a == b and len(a) > 0


def test_cap_group_share_null_group_rows_survive(spark):
    # VERDICT r2 #1: the join back to the rates frame must be NULL-safe
    # — NULL-group rows obey the cap like any group, never silently drop.
    from schema_validata_spark.functions.sampling import cap_group_share
    import pyspark.sql.functions as F
    # 900 'big', 100 NULL-group → NULL group is 10% of total, under cap
    df = spark.range(1000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 900, "big").alias("g"))
    out = cap_group_share(df, "k", "g", 0.30)
    counts = {r["g"]: r["n"] for r in
              out.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts[None] == 100            # under-cap NULL group: untouched
    assert 240 <= counts["big"] <= 360
    # over-cap NULL group is downsampled, not dropped
    df2 = spark.range(1000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") >= 900, "small").alias("g"))
    counts2 = {r["g"]: r["n"] for r in
               cap_group_share(df2, "k", "g", 0.30)
               .groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts2["small"] == 100
    assert 240 <= counts2[None] <= 360


def test_hex_cut_clamps_near_one_rate(spark):
    # ADVICE r2: a rate within ~2^-33 of 1.0 must clamp the rendered cut
    # to 'ffffffff' (keep ~all), not roll over to the 9-char '100000000'
    # (keep ~1/16).
    from schema_validata_spark.functions.sampling import _hex_cut_expr
    import pyspark.sql.functions as F
    rate = 1.0 - 2.0 ** -34               # rounds to 2^32, but < 1.0
    assert rate < 1.0
    cut = spark.range(1).select(
        _hex_cut_expr(F.lit(rate)).alias("c")).first()["c"]
    assert cut == "ffffffff"
    df = spark.range(2000).select(F.col("id").alias("k"))
    from schema_validata_spark.functions.sampling import stable_hash_hex
    kept = df.where(stable_hash_hex("k") < _hex_cut_expr(F.lit(rate))).count()
    assert kept == 2000                   # ~all, not ~1/16


# --- deterministic_topk_sample -----------------------------------------------

def test_topk_sample_exact_size_and_stability(spark):
    from schema_validata_spark.functions.sampling import (
        deterministic_topk_sample)
    import pyspark.sql.functions as F
    df = spark.range(1000).select(F.col("id").alias("k"))
    a = [r["k"] for r in deterministic_topk_sample(df, "k", 20).collect()]
    assert len(a) == 20
    b = [r["k"] for r in
         deterministic_topk_sample(df.repartition(13), "k", 20).collect()]
    assert a == b                                     # partition-independent
    # shrinking the corpus can only REMOVE kept keys, never add new ones
    # ahead of surviving keys
    half = df.where(F.col("k") < 500)
    c = set(r["k"] for r in
            deterministic_topk_sample(half, "k", 20).collect())
    assert c >= (set(a) & set(range(500)))


def test_topk_sample_k_larger_than_input(spark):
    from schema_validata_spark.functions.sampling import (
        deterministic_topk_sample)
    df = spark.range(5).withColumnRenamed("id", "k")
    assert deterministic_topk_sample(df, "k", 100).count() == 5


def test_topk_sample_plan_is_take_ordered(spark):
    from schema_validata_spark.functions.sampling import (
        deterministic_topk_sample)
    df = spark.range(100).withColumnRenamed("id", "k")
    plan = deterministic_topk_sample(df, "k", 5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# --- weighted_sample ---------------------------------------------------------

def test_weighted_sample_extremes_and_null(spark):
    from schema_validata_spark.functions.sampling import weighted_sample
    import pyspark.sql.functions as F
    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -5.0), (4, None), (5, 2.0)],
        ["k", "w"])
    kept = set(r["k"] for r in weighted_sample(df, "k", "w").collect())
    assert 1 in kept and 5 in kept          # weight >= 1 always kept
    assert 2 not in kept and 3 not in kept  # zero/negative never kept
    assert 4 not in kept                    # NULL weight never kept


def test_weighted_sample_rate_tracks_weight(spark):
    from schema_validata_spark.functions.sampling import weighted_sample
    import pyspark.sql.functions as F
    df = spark.range(4000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, 0.8).otherwise(0.2).alias("w"))
    out = weighted_sample(df, "k", "w")
    hi = out.where(F.col("w") == 0.8).count()
    lo = out.where(F.col("w") == 0.2).count()
    assert 1450 <= hi <= 1750               # ~0.8 * 2000
    assert 290 <= lo <= 510                 # ~0.2 * 2000


def test_weighted_sample_deterministic(spark):
    from schema_validata_spark.functions.sampling import weighted_sample
    import pyspark.sql.functions as F
    df = spark.range(500).select(F.col("id").alias("k"),
                                 (F.col("id") % 7 / 10.0).alias("w"))
    a = set(r["k"] for r in weighted_sample(df, "k", "w").collect())
    b = set(r["k"] for r in
            weighted_sample(df.repartition(9), "k", "w").collect())
    assert a == b
