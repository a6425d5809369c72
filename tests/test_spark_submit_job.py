"""End-to-end `spark-submit --py-files` drive of the production job
entrypoint (scripts/run_validation_job.py) — the north_rule's stated
deployment shape. The package ships as a zip built fresh from the repo
(exactly the documented `zip -r` + `--py-files` recipe), the job runs
in its own JVM/driver, writes report artifacts, and exits 3 on seeded
violations. Slow (~1 min: fresh JVM + session); one test on purpose.
"""

import json
import os
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on this host")
def test_spark_submit_py_files_job(spark, tmp_path):
    from schema_validata_spark.datagen import gen_conversations, \
        gen_transcripts

    tdir, cdir, out, mdir = (str(tmp_path / d)
                             for d in ("t", "c", "out", "manifest"))
    gen_transcripts(spark, 4000, seed=7).write.parquet(tdir)
    gen_conversations(spark, 4000, seed=7).write.parquet(cdir)

    # the documented packaging step: the package zip, built from source
    zip_path = str(tmp_path / "schema_validata_spark.zip")
    pkg = os.path.join(REPO, "schema_validata_spark")
    with zipfile.ZipFile(zip_path, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))

    env = {k: v for k, v in os.environ.items()}
    # the job must resolve the package from --py-files, not the repo cwd
    env["PYTHONPATH"] = ""
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.driver.memory=2g",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "scripts", "run_validation_job.py"),
         "--transcripts", tdir, "--conversations", cdir,
         "--out", out, "--name", "transcripts",
         "--partition-col", "ts_date", "--manifest", mdir,
         "--sketch-cols", "conv_id,role",
         "--mask-cols", "conv_id,role",
         "--trend-screens",
         "--run-log-dir", str(tmp_path / "runlog"),
         # budgets: tolerate ALL text-length violations, stay strict on
         # everything else -> the budget gate still fails (exit 3)
         "--budgets", '{"text:length": 1.0}'],
        capture_output=True, text=True, timeout=420, cwd=str(tmp_path),
        env=env)

    # seeded violations -> deliberate non-zero business exit
    assert proc.returncode == 3, (proc.returncode, proc.stdout[-2000:],
                                  proc.stderr[-2000:])
    payload = [ln for ln in proc.stdout.splitlines()
               if ln.startswith("{")]
    assert payload, proc.stdout[-2000:]
    report = json.loads(payload[-1])
    assert report["passed"] is False
    assert report["uid"]
    for p in report["artifacts"].values():
        assert os.path.exists(p), p
    # the resumable path ran: partition verdicts + manifest + the
    # mergeable sketch frame persisted beside it
    assert os.path.exists(os.path.join(
        out, "transcripts_partition_verdicts.parquet"))
    assert os.path.exists(mdir)
    assert os.path.exists(mdir + "_sketches")
    # the format-drift screen ran: per-column stability artifact
    ms = spark.read.parquet(os.path.join(
        out, "transcripts_mask_stability.parquet")).collect()
    assert {r["column_name"] for r in ms} == {"conv_id", "role"}
    assert all(r["n_partitions"] > 0 for r in ms)
    # the rolling run log accumulated this run (idempotent upsert)
    rl = spark.read.parquet(str(tmp_path / "runlog" / "run_log"))
    assert rl.count() == 1 and rl.first()["dataset"] == "transcripts"
    assert spark.read.parquet(
        str(tmp_path / "runlog" / "error_log")).count() > 0
    # the time-bucketed incident screens ran
    ct = spark.read.parquet(os.path.join(
        out, "transcripts_completeness_trend.parquet"))
    assert {r["column_name"] for r in ct.collect()} \
        >= {"role", "text", "tool"}
    dt = spark.read.parquet(os.path.join(
        out, "transcripts_dup_trend.parquet"))
    assert dt.count() > 0
    mt = spark.read.parquet(os.path.join(
        out, "transcripts_monotone_trend.parquet"))
    assert mt.count() > 0
    # the budgeted gate ran: rate-verdict artifact written, the
    # budgeted check passes everywhere while stricter ones still fail
    assert report["budget_gate"] is False
    assert report["strict_passed"] is False
    prv = spark.read.parquet(os.path.join(
        out, "transcripts_partition_rate_verdicts.parquet")).collect()
    text_len = [r for r in prv if (r["column_name"], r["check"])
                == ("text", "length")]
    assert text_len and all(r["status"] == "pass" for r in text_len)
    assert any(r["status"] == "fail" for r in prv)
