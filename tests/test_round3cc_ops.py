"""Round-3cc: blocking-based deterministic record linkage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schema_validata_spark.operators.dedup import record_linkage_pairs


def _people(spark, rows):
    return spark.createDataFrame(
        rows, "id long, blk string, city string, zip string, seg string")


FIELDS = {"city": 2.0, "zip": 1.0, "seg": 1.0}


def test_linkage_hand_case(spark):
    rows = [(1, "b1", "rome", "00100", "a"),
            (2, "b1", "rome", "00100", "a"),     # full match with 1
            (3, "b1", "rome", "99999", "b"),     # city only: 2/4
            (4, "b2", "rome", "00100", "a")]     # other block: no pair
    got = {(r["id_a"], r["id_b"]): r for r in record_linkage_pairs(
        _people(spark, rows), "id", "blk", FIELDS,
        threshold=0.5).collect()}
    assert set(got) == {(1, 2), (1, 3), (2, 3)}
    full = got[(1, 2)]
    assert (full["n_compared"], full["n_matched"]) == (3, 3)
    assert full["score"] == 1.0
    part = got[(1, 3)]
    assert (part["n_compared"], part["n_matched"]) == (3, 1)
    assert part["score"] == 0.5                  # 2.0 / 4.0


def test_linkage_null_fields_neither_help_nor_hurt(spark):
    rows = [(1, "b", "rome", None, "a"),
            (2, "b", "rome", "123", "a")]
    r = record_linkage_pairs(_people(spark, rows), "id", "blk",
                             FIELDS, 0.5).collect()[0]
    # zip incomparable: denominator 3.0 (city 2 + seg 1), all matched
    assert (r["n_compared"], r["n_matched"], r["score"]) == (2, 2, 1.0)


def test_linkage_all_null_pair_dropped_and_null_block(spark):
    rows = [(1, "b", None, None, None), (2, "b", None, None, None),
            (3, None, "rome", "1", "a"), (4, None, "rome", "1", "a")]
    got = record_linkage_pairs(_people(spark, rows), "id", "blk",
                               FIELDS, 0.1).collect()
    assert got == []        # no comparable fields; NULL block excluded


def test_linkage_threshold_and_validation(spark):
    rows = [(1, "b", "rome", "1", "a"), (2, "b", "rome", "2", "b")]
    # score = 2/4 = 0.5 -> excluded at 0.6, included at 0.5
    assert record_linkage_pairs(_people(spark, rows), "id", "blk",
                                FIELDS, 0.6).count() == 0
    assert record_linkage_pairs(_people(spark, rows), "id", "blk",
                                FIELDS, 0.5).count() == 1
    with pytest.raises(ValueError):
        record_linkage_pairs(_people(spark, rows), "id", "blk", {}, 0.5)
    with pytest.raises(ValueError):
        record_linkage_pairs(_people(spark, rows), "id", "blk",
                             FIELDS, 0.0)
