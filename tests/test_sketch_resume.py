"""Sketch maintenance inside validate_partitioned: skipped partitions
reuse cached sketch rows without rescanning, changed partitions
re-sketch, and union estimates track the live table."""

from pyspark.sql import functions as F

from schema_validata_spark.datagen import gen_transcripts, transcript_rules
from schema_validata_spark.operators.sketches import (
    load_sketches, union_estimates)
from schema_validata_spark.validate import validate_partitioned


def _est(spark, path):
    return {r["column_name"]: r["n_distinct_est"]
            for r in union_estimates(load_sketches(spark, path)).collect()}


def test_sketches_written_and_estimates_exact(spark, tmp_path):
    t = gen_transcripts(spark, 6_000, seed=7).cache()
    mpath = str(tmp_path / "m")
    validate_partitioned(spark, t, transcript_rules(), "ts_date", mpath,
                         run_id="r", sketch_cols=["role", "conv_id"])
    est = _est(spark, mpath + "_sketches")
    exact = t.agg(F.countDistinct("role"), F.countDistinct("conv_id")) \
             .collect()[0]
    # role is in the coupon (exact) regime; conv_id (~750 distinct)
    # is past the ~384 exactness boundary -> bounded error instead
    assert est["role"] == exact[0]
    assert abs(est["conv_id"] - exact[1]) / exact[1] < 0.02
    t.unpersist()


def test_skipped_partitions_reuse_cached_sketches_no_rescan(spark,
                                                            tmp_path):
    """Proof of no-rescan: doctor one cached partition's sketch row,
    re-run with UNCHANGED data — the doctored row must survive (reused
    verbatim); then mutate that partition's data — the doctored row
    must be replaced by a fresh sketch."""
    src = str(tmp_path / "src")
    gen_transcripts(spark, 6_000, seed=11).write.mode("overwrite") \
        .parquet(src)
    t = spark.read.parquet(src)
    rules = transcript_rules()
    mpath = str(tmp_path / "m")
    spath = mpath + "_sketches"

    validate_partitioned(spark, t, rules, "ts_date", mpath, run_id="r",
                         sketch_cols=["role"])
    rows = load_sketches(spark, spath).collect()
    victim = sorted(r["partition_key"] for r in rows)[0]

    # doctor: swap the victim's sketch for one sketching 99 fake values
    fake = (spark.range(99)
            .agg(F.hll_sketch_agg(F.concat(F.lit("fake-"),
                                           F.col("id").cast("string")),
                                  F.lit(12))).collect()[0][0])
    doctored = [(r["partition_key"], r["column_name"],
                 bytearray(fake) if r["partition_key"] == victim
                 else r["sketch"], r["n_rows"]) for r in rows]
    from schema_validata_spark.operators.sketches import SKETCH_SCHEMA
    spark.createDataFrame(doctored, SKETCH_SCHEMA) \
        .write.mode("overwrite").parquet(spath)

    # unchanged data: victim is skipped, so its doctored sketch is
    # reused as-is and the 99 fakes leak into the union estimate
    validate_partitioned(spark, t, rules, "ts_date", mpath, run_id="r",
                         sketch_cols=["role"])
    assert _est(spark, spath)["role"] >= 99

    # mutate the victim partition: it recomputes, fresh sketch replaces
    # the doctored row, estimate returns to the true distinct count
    mdir = str(tmp_path / "src2")
    t.withColumn("role", F.when(t.ts_date.cast("string") == victim,
                                F.lit("operator")).otherwise(t.role)) \
        .write.mode("overwrite").parquet(mdir)
    t2 = spark.read.parquet(mdir)
    validate_partitioned(spark, t2, rules, "ts_date", mpath, run_id="r",
                         sketch_cols=["role"])
    exact = t2.agg(F.countDistinct("role")).collect()[0][0]
    assert _est(spark, spath)["role"] == exact


def test_sketch_cols_growth_backfills_missing_column(spark, tmp_path):
    t = gen_transcripts(spark, 4_000, seed=5).cache()
    mpath = str(tmp_path / "m")
    spath = mpath + "_sketches"
    validate_partitioned(spark, t, transcript_rules(), "ts_date", mpath,
                         run_id="r", sketch_cols=["role"])
    assert set(r["column_name"] for r in
               load_sketches(spark, spath).collect()) == {"role"}
    # second run asks for an extra column: kept partitions lack cover,
    # so they re-sketch (narrow scan) and the frame gains the column
    validate_partitioned(spark, t, transcript_rules(), "ts_date", mpath,
                         run_id="r", sketch_cols=["role", "tool"])
    est = _est(spark, spath)
    exact = t.agg(F.countDistinct("role"), F.countDistinct("tool")) \
             .collect()[0]
    assert est["role"] == exact[0] and est["tool"] == exact[1]
    t.unpersist()
