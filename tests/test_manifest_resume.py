"""Resume semantics: interrupted runs skip completed partitions and the
final verdicts equal an uninterrupted run (SURVEY §5.2.4)."""

from schema_validata_spark.datagen import gen_transcripts, transcript_rules
from schema_validata_spark.manifest import Manifest
from schema_validata_spark.validate import validate_partitioned


def _key(rows):
    return sorted((r["partition_key"], r["column_name"], r["check"],
                   r["violation_count"]) for r in rows)


def test_resume_skips_done_and_matches_full_run(spark, tmp_path):
    t = gen_transcripts(spark, 8_000, seed=42).cache()
    rules = transcript_rules()

    # uninterrupted run
    full = validate_partitioned(spark, t, rules, "ts_date",
                                str(tmp_path / "m_full"), run_id="r1")
    full_rows = _key(full.collect())

    # interrupted run: process only the first batch by marking the rest...
    # simulate by running with batch_size=2 and killing after first batch:
    # we emulate the kill by pre-marking NOTHING and running twice with
    # a manifest shared between runs.
    mpath = str(tmp_path / "m_resume")
    parts = [r[0] for r in t.select(t.ts_date.cast("string"))
             .distinct().orderBy("ts_date").collect()]
    # first "partial" run: restrict input to a prefix of partitions
    prefix = parts[: max(1, len(parts) // 2)]
    sub = t.where(t.ts_date.cast("string").isin(prefix))
    validate_partitioned(spark, sub, rules, "ts_date", mpath, run_id="r2")

    m = Manifest(spark, mpath)
    assert m.completed("r2") == set(prefix)

    # resumed run over the full input: completed partitions are skipped
    # (their verdicts come back from manifest metrics) and the combined
    # output equals the uninterrupted run
    resumed = validate_partitioned(spark, t, rules, "ts_date", mpath,
                                   run_id="r2")
    assert _key(resumed.collect()) == full_rows
    t.unpersist()


def test_rerun_is_idempotent(spark, tmp_path):
    t = gen_transcripts(spark, 4_000, seed=1)
    rules = transcript_rules()
    mpath = str(tmp_path / "m_idem")
    a = validate_partitioned(spark, t, rules, "ts_date", mpath, run_id="x")
    b = validate_partitioned(spark, t, rules, "ts_date", mpath, run_id="x")
    assert _key(a.collect()) == _key(b.collect())
    # second run recomputed nothing: every partition already marked done
    m = Manifest(spark, mpath)
    parts = {r[0] for r in t.select(t.ts_date.cast("string")).distinct().collect()}
    assert m.completed("x") == parts
