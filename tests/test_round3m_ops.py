"""Round-3m: per-bucket duplicate trend, value-concentration (HHI)
profile, streaming per-window completeness."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from schema_validata_spark.operators.statqa import concentration_stats
from schema_validata_spark.operators.uniqueness import dup_trend


def _ts(s):
    return datetime.datetime.fromisoformat(s)


# ----------------------------------------------------------- dup_trend

def _ev(spark, rows):
    return spark.createDataFrame(rows, "k string, ts timestamp")


def test_dup_trend_hand_case(spark):
    d1, d2 = _ts("2024-01-01T08:00"), _ts("2024-01-02T08:00")
    rows = ([("a", d1), ("a", d1), ("b", d1)]          # day1: a dup'd
            + [("a", d2), ("c", d2)])                  # day2: clean
    got = {r["bucket"]: r for r in dup_trend(
        _ev(spark, rows), ["k"], "ts").collect()}
    x = got["2024-01-01"]
    assert (x["n_rows"], x["n_keys"], x["dup_keys"], x["dup_rows"]) \
        == (3, 2, 1, 2)
    assert abs(x["dup_rate"] - round(2 / 3, 6)) < 1e-9
    y = got["2024-01-02"]
    assert (y["dup_keys"], y["dup_rows"], y["dup_rate"]) == (0, 0, 0.0)


def test_dup_trend_key_scoped_per_bucket(spark):
    """A key recurring across days is NOT a within-day duplicate."""
    rows = [("a", _ts("2024-01-01T00:00")),
            ("a", _ts("2024-01-02T00:00"))]
    got = dup_trend(_ev(spark, rows), ["k"], "ts").collect()
    assert all(r["dup_rows"] == 0 for r in got)


def test_dup_trend_null_ts_and_validation(spark):
    rows = [("a", None), ("a", _ts("2024-01-01T00:00"))]
    got = dup_trend(_ev(spark, rows), ["k"], "ts").collect()
    assert len(got) == 1 and got[0]["n_rows"] == 1
    with pytest.raises(ValueError):
        dup_trend(_ev(spark, rows), ["k"], "ts", granularity="minute")


# -------------------------------------------------- concentration_stats

def test_concentration_hand_case(spark):
    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "v string")
    r = concentration_stats(df, ["v"], top_k=2).collect()[0]
    assert (r["n_rows"], r["n_distinct"]) == (10, 3)
    assert r["top_share"] == 0.6
    assert r["topk_share"] == 0.9
    hhi = round((36 + 9 + 1) / 100.0, 6)
    assert r["hhi"] == hhi
    assert abs(r["effective_n"] - round(1.0 / hhi, 6)) < 1e-9


def test_concentration_uniform_vs_collapsed(spark):
    rows = [(f"v{i}", "x") for i in range(10)]
    df = spark.createDataFrame(rows, "u string, c string")
    got = {r["column_name"]: r
           for r in concentration_stats(df, ["u", "c"]).collect()}
    u, c = got["u"], got["c"]
    assert u["hhi"] == 0.1 and u["effective_n"] == 10.0
    assert c["hhi"] == 1.0 and c["effective_n"] == 1.0
    assert c["top_share"] == 1.0


def test_concentration_null_token_and_validation(spark):
    df = spark.createDataFrame([("a",), (None,), (None,)], "v string")
    r = concentration_stats(df, ["v"]).collect()[0]
    assert r["n_rows"] == 3 and r["n_distinct"] == 2
    assert abs(r["top_share"] - round(2 / 3, 6)) < 1e-9   # __null__ modal
    with pytest.raises(ValueError):
        concentration_stats(df, [])
    with pytest.raises(ValueError):
        concentration_stats(df, ["v"], top_k=0)


def test_concentration_rows_never_shuffle_raw(spark):
    """The only row-data exchange is the (column, value) counts agg;
    everything after runs on the vocabulary frame."""
    import contextlib
    import io
    df = spark.createDataFrame([("a", "b")] * 8, "x string, y string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        concentration_stats(df, ["x", "y"]).explain("formatted")
    plan = buf.getvalue()
    assert plan.count("Arguments: hashpartitioning") == 2, plan


# ------------------------------------------------- stream_completeness

def test_stream_completeness_matches_batch(spark, tmp_path):
    from schema_validata_spark.streaming.validate_stream import \
        stream_completeness

    rows = [( _ts("2024-01-01T00:00") + datetime.timedelta(minutes=i),
              None if i % 4 == 0 else float(i),
              None if i % 10 == 0 else f"u{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "ts timestamp, v double, u string")
    src = str(tmp_path / "sc_src")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = stream_completeness(stream, ["v", "u"], ts_col="ts",
                              window="36500 days",
                              watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("sc_mem")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["column_name"]: r
           for r in spark.sql("SELECT * FROM sc_mem").collect()}
    assert got["v"]["n"] == 40 and got["v"]["n_null"] == 10
    assert got["v"]["null_rate"] == 0.25
    assert got["u"]["n_null"] == 4 and got["u"]["null_rate"] == 0.1


def test_stream_completeness_validation(spark):
    from schema_validata_spark.streaming.validate_stream import \
        stream_completeness
    df = spark.createDataFrame([], "ts timestamp, v double")
    with pytest.raises(ValueError):
        stream_completeness(df, [])
