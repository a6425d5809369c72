"""Round-3gg: histogram bucket movers (drift drill-down)."""

from __future__ import annotations

import pytest

from schema_validata_spark.operators.drift import histogram_movers


def _hist(spark, rows):
    return spark.createDataFrame(
        rows, "partition_key string, column_name string, bucket string,"
              " count bigint")


def test_movers_hand_case(spark):
    obs = _hist(spark, [("p", "v", "1", 70), ("p", "v", "2", 30)])
    base = _hist(spark, [("p", "v", "1", 50), ("p", "v", "2", 50)])
    got = {r["bucket"]: r for r in histogram_movers(
        obs, base, top_k=5).collect()}
    assert got["1"]["delta"] == 0.2 and got["2"]["delta"] == -0.2
    assert got["1"]["share_obs"] == 0.7
    assert got["1"]["share_base"] == 0.5
    # tie on |delta|: bucket "1" < "2" wins rank 1
    assert got["1"]["rank"] == 1 and got["2"]["rank"] == 2


def test_movers_one_sided_bucket_moves_whole_mass(spark):
    obs = _hist(spark, [("p", "v", "9", 100)])
    base = _hist(spark, [("p", "v", "1", 100)])
    got = {r["bucket"]: r for r in histogram_movers(
        obs, base).collect()}
    assert got["9"]["delta"] == 1.0 and got["1"]["delta"] == -1.0
    assert got["9"]["share_base"] == 0.0


def test_movers_top_k_and_validation(spark):
    obs = _hist(spark, [("p", "v", str(i), 10 + i) for i in range(8)])
    base = _hist(spark, [("p", "v", str(i), 10) for i in range(8)])
    got = histogram_movers(obs, base, top_k=3).collect()
    assert len(got) == 3
    assert [r["rank"] for r in sorted(got, key=lambda r: r["rank"])] \
        == [1, 2, 3]
    with pytest.raises(ValueError):
        histogram_movers(obs, base, top_k=0)
