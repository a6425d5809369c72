"""Round-5: the production job's FILE MODE — the reference user's CLI
shape (`--dataset-file csv --data-dict template.xlsx`) routed through
validate_files, writing the reference-shaped JSON artifact and exiting
1 on violations / 0 clean. Runs the job's main() in-process (the
fresh-JVM --py-files drive lives in test_spark_submit_job.py)."""

import csv
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

TEMPLATE = "/root/reference/data_dictionary_template.xlsx"


def _write_movies(path, clean: bool):
    rows = [
        (1, "Heat", 1995, "Mann", "Action", 170, "Heist", "True"),
        (2, "Alien", 1979, "Scott", "Sci-Fi", 117, "x", "False"),
    ]
    if not clean:
        rows.append((3, "Bad", 2300, "Dir", "Romance", 6000, "y",
                     "True"))
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "title", "release_year", "director", "genre",
                    "runtime_minutes", "synopsis", "available"])
        w.writerows(rows)


def _run(argv):
    import run_validation_job
    with pytest.raises(SystemExit) as ei:
        run_validation_job.main(argv)
    return ei.value.code


def test_file_mode_fail_and_artifact(spark, tmp_path):
    ds = str(tmp_path / "movies.csv")
    _write_movies(ds, clean=False)
    out = str(tmp_path / "out")
    code = _run(["--dataset-file", ds, "--data-dict", TEMPLATE,
                 "--out", out, "--name", "movies",
                 "--schema-mapping",
                 '[{"dataset": "movies", "data_dict": '
                 '"MOVIES_SCHEMA"}]'])
    assert code == 1
    arts = os.listdir(out)
    assert len(arts) == 1 and arts[0].startswith("movies_(")
    with open(os.path.join(out, arts[0])) as f:
        rep = json.load(f)
    uid = next(iter(rep))
    sv = rep[uid]["results"]["movies"]["schema_violations"]
    assert {"release_year", "genre", "runtime_minutes"} <= set(sv)


def test_file_mode_clean_passes_default_mapping(spark, tmp_path):
    """No --schema-mapping: the dataset base name maps to the
    dictionary's first qualifying sheet (MOVIES_SCHEMA)."""
    ds = str(tmp_path / "movies.csv")
    _write_movies(ds, clean=True)
    out = str(tmp_path / "out")
    code = _run(["--dataset-file", ds, "--data-dict", TEMPLATE,
                 "--out", out, "--name", "movies"])
    assert code == 0


def test_file_mode_requires_data_dict(spark, tmp_path):
    code = _run(["--dataset-file", "x.csv",
                 "--out", str(tmp_path / "o")])
    assert code not in (0, None)


def test_table_mode_still_requires_transcripts(spark, tmp_path):
    code = _run(["--out", str(tmp_path / "o")])
    assert code not in (0, None)
