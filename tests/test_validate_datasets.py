"""Multi-dataset schema_mapping orchestration (reference
validate_dataset over a multi-sheet workbook, src/schema_validata.py:
2607-2712, mapping cleanup :2076-2082, merged result :2678-2700)."""

import pytest
from pyspark.sql import functions as F

from schema_validata_spark import (FieldRule, Rules, validate_datasets)


@pytest.fixture(scope="module")
def frames(spark):
    movies = spark.createDataFrame(
        [(1, "Heat", "Drama"), (2, "Alien", "Horror"), (3, None, "Drama")],
        "movie_id bigint, title string, genre string")
    theaters = spark.createDataFrame(
        [(1, "US"), (2, "ZZ")], "tid bigint, state string")
    return {"movies": movies, "theaters": theaters}


@pytest.fixture(scope="module")
def dictionary():
    return {
        "MOVIES_SCHEMA": Rules("MOVIES_SCHEMA", fields=[
            FieldRule("movie_id", required=True, data_type="Integer",
                      allow_null=False, unique_value=True),
            FieldRule("title", required=True, data_type="String",
                      allow_null=False),
            FieldRule("genre", required=True, data_type="String",
                      allowed_value_list=["Drama", "Action", "Comedy",
                                          "Sci-Fi"]),
        ]),
        "THEATERS_SCHEMA": Rules("THEATERS_SCHEMA", fields=[
            FieldRule("tid", required=True, data_type="Integer",
                      allow_null=False, unique_value=True),
            FieldRule("state", required=True, data_type="String",
                      allowed_value_list=["US", "CA", "UK", "AU", "NZ"]),
        ]),
    }


MAPPING = [
    {"dataset": "movies", "data_dict": "MOVIES_SCHEMA"},
    {"dataset": "theaters", "data_dict": "THEATERS_SCHEMA"},
]


def test_multi_dataset_run(spark, frames, dictionary):
    res = validate_datasets(spark, frames, dictionary, MAPPING,
                            ignore_errors=[],
                            key_cols={"movies": ["movie_id"],
                                      "theaters": ["tid"]})
    try:
        assert set(res.results) == {"movies", "theaters"}
        assert not res.passed()
        # movies: null title + unallowed genre flagged
        mv = res.results["movies"].schema_violations
        assert "title" in mv and "genre" in mv
        th = res.results["theaters"].schema_violations
        assert "state" in th
        rep = res.report()
        assert list(rep) == [res.uid]
        sections = rep[res.uid]["results"]
        assert set(sections) == {"movies", "theaters"}
        assert sections["movies"]["schema_violations"]
        # row-level errors present for the flagged checks
        assert sections["theaters"]["value_errors"]
    finally:
        res.unpersist()


def test_unmapped_dict_section_dropped(spark, frames, dictionary):
    mapping = MAPPING + [{"dataset": "movies", "data_dict": "NOPE_SCHEMA"}]
    with pytest.warns(UserWarning, match="NOPE_SCHEMA"):
        res = validate_datasets(spark, frames, dictionary, mapping,
                                list_errors=False)
    try:
        assert res.dropped_mappings == [
            {"dataset": "movies", "data_dict": "NOPE_SCHEMA"}]
        assert len(res.schema_mapping) == 2
    finally:
        res.unpersist()


def test_missing_dataset_raises(spark, frames, dictionary):
    with pytest.raises(KeyError, match="ghost"):
        validate_datasets(
            spark, frames, dictionary,
            [{"dataset": "ghost", "data_dict": "MOVIES_SCHEMA"}])


def test_uid_stable_and_content_sensitive(spark, frames, dictionary):
    r1 = validate_datasets(spark, frames, dictionary, MAPPING,
                           list_errors=False)
    r2 = validate_datasets(spark, frames, dictionary, MAPPING,
                           list_errors=False)
    changed = dict(frames)
    changed["movies"] = frames["movies"].where(F.col("movie_id") != 2)
    r3 = validate_datasets(spark, changed, dictionary, MAPPING,
                           list_errors=False)
    try:
        assert r1.uid == r2.uid          # deterministic
        assert r1.uid != r3.uid          # content-sensitive (stale-resume guard)
    finally:
        r1.unpersist(); r2.unpersist(); r3.unpersist()
