"""salted_join: row-identical to the plain join (the invariant that
makes the skew mitigation deployable), salt actually present in the
shuffle key, outer modes rejected."""

import pytest
from pyspark.sql import Row, functions as F


def _frames(spark):
    big = spark.createDataFrame(
        [Row(k="hot", v=i) for i in range(50)]
        + [Row(k="cold", v=1), Row(k="ghost", v=9)],
        "k string, v int")
    small = spark.createDataFrame(
        [Row(k="hot", tag="H"), Row(k="cold", tag="C"),
         Row(k="unused", tag="U")], "k string, tag string")
    return big, small


def test_salted_inner_row_identical_to_plain(spark):
    from schema_validata_spark.plans.salting import salted_join
    big, small = _frames(spark)
    plain = big.join(small, ["k"], "inner")
    salted = salted_join(big, small, "k", salts=8)
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
    assert salted.count() == 51                # ghost dropped


def test_salted_left_keeps_unmatched_big_rows_once(spark):
    from schema_validata_spark.plans.salting import salted_join
    big, small = _frames(spark)
    plain = big.join(small, ["k"], "left")
    salted = salted_join(big, small, "k", salts=4, how="left")
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
    ghost = salted.where(F.col("k") == "ghost").collect()
    assert len(ghost) == 1 and ghost[0]["tag"] is None


def test_salt_in_join_key_and_small_side_replicated(spark):
    from schema_validata_spark.plans.salting import salted_join
    big, small = _frames(spark)
    plan = salted_join(big, small, "k", salts=8)._jdf \
        .queryExecution().optimizedPlan().toString()
    assert "__salt" in plan                    # salt is a join key
    # hot key's 50 rows spread over >1 salt with high probability
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8))
    n_salts = (big.where(F.col("k") == "hot")
               .select(salt.alias("s")).distinct().count())
    assert n_salts > 1


def test_salted_join_validation_and_degenerate(spark):
    from schema_validata_spark.plans.salting import salted_join
    big, small = _frames(spark)
    assert salted_join(big, small, "k", salts=1).count() == 51
    with pytest.raises(ValueError):
        salted_join(big, small, "k", salts=0)
    with pytest.raises(ValueError):
        salted_join(big, small, "k", salts=4, how="full")
