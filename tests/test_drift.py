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
