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


# ------------------------------------------------------- zorder preview

def _py_z(xq, yq, bits=8):
    z = 0
    for i in range(bits):
        z |= ((xq >> i) & 1) << (2 * i)
        z |= ((yq >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_matches_python_interleave(spark):
    from schema_validata_spark.sources.layout import zorder_preview
    rows = [Row(x=float(x), y=float(y))
            for x in (0.0, 3.9, 8.0, 15.9) for y in (0.0, 7.9, 15.9)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = {r["zbucket"]: r["n"] for r in
           zorder_preview(df, "x", "y", 0.0, 16.0, 0.0, 16.0,
                          bits=4, buckets_log2=8).collect()}
    # with buckets_log2 == 2*bits the bucket IS the full z-value
    want = {}
    for r in rows:
        xq = min(max(int(r["x"] / 16.0 * 16), 0), 15)
        yq = min(max(int(r["y"] / 16.0 * 16), 0), 15)
        z = _py_z(xq, yq, 4)
        want[z] = want.get(z, 0) + 1
    assert out == want


def test_zorder_clamps_and_validates(spark):
    from schema_validata_spark.sources.layout import zorder_preview
    df = spark.createDataFrame(
        [Row(x=-99.0, y=999.0), Row(x=None, y=1.0)],
        "x double, y double")
    out = zorder_preview(df, "x", "y", 0.0, 10.0, 0.0, 10.0,
                         bits=4, buckets_log2=8).collect()
    assert len(out) == 1 and out[0]["n"] == 1          # NULL dropped
    assert out[0]["zbucket"] == _py_z(0, 15, 4)        # clamped corners
    with pytest.raises(ValueError):
        zorder_preview(df, "x", "y", 1.0, 1.0, 0.0, 1.0)
    with pytest.raises(ValueError):
        zorder_preview(df, "x", "y", 0.0, 1.0, 0.0, 1.0, bits=0)
