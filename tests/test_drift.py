"""Drift: histogram build + chi2/PSI scoring; shifted distribution must
flag only affected columns (FIXTURES.md §3)."""

from pyspark.sql import functions as F

from schema_validata_spark.datagen import gen_transcripts
from schema_validata_spark.operators.drift import (build_histograms,
                                                   drift_scores,
                                                   drift_scores_pandas,
                                                   drifted_partitions)


def _hists(spark, df):
    return build_histograms(df, "ts_date",
                            categorical=["role"], text=["text"])


def test_no_drift_against_self(spark):
    t = gen_transcripts(spark, 8000, seed=42).cache()
    h = _hists(spark, t).cache()
    scores = drift_scores(h, h, by_partition=False).collect()
    assert all(abs(r["psi"]) < 1e-6 for r in scores)
    t.unpersist(); h.unpersist()


def test_shifted_role_mix_flags_role_only(spark):
    base = gen_transcripts(spark, 8000, seed=42)
    # shifted run: force a heavy 'operator' share by remapping roles
    shifted = base.withColumn(
        "role", F.when(F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(3)) == 0,
                       F.lit("operator")).otherwise(F.col("role")))
    hb = _hists(spark, base)
    hs = _hists(spark, shifted)
    scores = {r["column_name"]: r["psi"]
              for r in drift_scores(hs, hb, by_partition=False).collect()}
    assert scores["role"] > 0.25          # drifted
    assert scores["text_length"] < 0.05   # unaffected


def test_pandas_udf_variant_matches_dataframe_path(spark):
    base = gen_transcripts(spark, 4000, seed=42)
    shifted = gen_transcripts(spark, 4000, seed=99)
    hb, hs = _hists(spark, base), _hists(spark, shifted)
    a = {(r["partition_key"], r["column_name"]): (round(r["chi2"], 4),
                                                  round(r["psi"], 6))
         for r in drift_scores(hs, hb, by_partition=True).collect()}
    b = {(r["partition_key"], r["column_name"]): (round(r["chi2"], 4),
                                                  round(r["psi"], 6))
         for r in drift_scores_pandas(hs, hb).collect()}
    assert a == b


def test_drifted_partitions_filter(spark):
    base = gen_transcripts(spark, 4000, seed=42)
    shifted = base.withColumn("role", F.lit("operator"))
    scores = drift_scores(_hists(spark, shifted), _hists(spark, base))
    flagged = drifted_partitions(scores).collect()
    assert all(r["psi"] > 0.25 for r in flagged)
    assert any(r["column_name"] == "role" for r in flagged)


def test_vocab_drift(spark):
    from schema_validata_spark.operators.drift import vocab_drift
    a = spark.createDataFrame([("x x y",)], "text string")
    b = spark.createDataFrame([("x y y z",)], "text string")
    got = vocab_drift(a, b, "text", k=2).collect()
    # deltas: x: 1/4 - 2/3 = -.416667, z: .25 - 0, y: .5 - 1/3 = .166667
    assert [r["token"] for r in got] == ["x", "z"]
    x = got[0]
    assert x["n_a"] == 2 and x["n_b"] == 1
    assert abs(x["delta"] - (-0.416667)) < 1e-6
    z = got[1]
    assert z["n_a"] == 0 and z["share_a"] == 0.0 and z["delta"] == 0.25


def test_vocab_drift_empty_baseline(spark):
    """Empty snapshot A: shares_a are 0.0, not NULL/NaN — every B
    token is pure drift."""
    from schema_validata_spark.operators.drift import vocab_drift
    a = spark.createDataFrame([], "text string")
    b = spark.createDataFrame([("new new",)], "text string")
    got = vocab_drift(a, b, "text", k=5).collect()
    assert len(got) == 1
    assert got[0]["share_a"] == 0.0 and got[0]["delta"] == 1.0


def test_jsd_zero_against_self(spark):
    from schema_validata_spark.operators.drift import jsd_drift
    t = gen_transcripts(spark, 6000, seed=42)
    h = _hists(spark, t).cache()
    got = jsd_drift(h, h, by_partition=False).collect()
    assert got and all(abs(r["jsd"]) < 1e-9 for r in got)
    # by_partition=True compares each partition to the POOLED baseline,
    # so self-comparison is only bounded, not zero
    got_p = jsd_drift(h, h, by_partition=True).collect()
    assert got_p and all(0.0 <= r["jsd"] <= 1.0 for r in got_p)
    h.unpersist()


def test_jsd_bounded_and_flags_shifted_column(spark):
    from schema_validata_spark.operators.drift import jsd_drift
    base = gen_transcripts(spark, 6000, seed=42)
    shifted = base.withColumn(
        "role", F.when(F.pmod(F.xxhash64("conv_id", "turn_idx"),
                              F.lit(3)) == 0,
                       F.lit("operator")).otherwise(F.col("role")))
    got = {r["column_name"]: r["jsd"]
           for r in jsd_drift(_hists(spark, shifted), _hists(spark, base),
                              by_partition=False).collect()}
    assert all(0.0 <= v <= 1.0 for v in got.values())
    assert got["role"] > 0.01
    assert got["text_length"] < got["role"]


def test_jsd_disjoint_support_is_one_bit(spark):
    """Disjoint category supports -> JSD = 1 exactly (no epsilon
    smearing), the property chi2/PSI lack."""
    from schema_validata_spark.operators.drift import jsd_drift
    mk = lambda b: spark.createDataFrame(
        [("p1", "c", b, 10)],
        "partition_key string, column_name string, bucket string, count long")
    got = jsd_drift(mk("A"), mk("B"), by_partition=False).collect()
    assert len(got) == 1 and abs(got[0]["jsd"] - 1.0) < 1e-9
    # hand-check a half-overlap case: p=(.5,.5) on {A,B}, q=(1) on {A}
    # restricted-baseline semantics keep all baseline mass (A in both)
    obs = spark.createDataFrame(
        [("p1", "c", "A", 5), ("p1", "c", "B", 5)],
        "partition_key string, column_name string, bucket string, count long")
    got2 = jsd_drift(obs, mk("A"), by_partition=True).collect()
    # p=(.5,.5), q=(1,0): m=(.75,.25);
    # jsd = .25*log2(.5/.75)+ .25*log2(.5/.25) + .5*log2(1/.75)
    import math
    exp = (0.25 * math.log2(0.5 / 0.75) + 0.25 * math.log2(0.5 / 0.25)
           + 0.5 * math.log2(1 / 0.75))
    assert len(got2) == 1 and abs(got2[0]["jsd"] - round(exp, 6)) < 1e-9
    assert got2[0]["n_obs"] == 10 and got2[0]["n_base"] == 10
