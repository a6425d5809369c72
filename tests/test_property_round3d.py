"""Property-based oracles for the round-3d operators: randomized tiny
frames through ``fd_violations`` / ``candidate_keys`` / ``quality_trend``
re-checked against plain-Python oracles (and DuckDB for the trend's
regression math) — edge coverage over NULL keys, NULL dependents, ties,
single-bucket groups, and all-NULL columns."""

from __future__ import annotations

import datetime as dt
from collections import Counter, defaultdict

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from schema_validata_spark.operators.integrity import (candidate_keys,
                                                       fd_violations)
from schema_validata_spark.operators.statqa import quality_trend

KEYS = st.one_of(st.none(), st.integers(0, 3))
VALS = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))


@settings(max_examples=15, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=st.lists(st.tuples(KEYS, VALS), min_size=1, max_size=30))
def test_fd_violations_matches_python_oracle(spark, rows):
    df = spark.createDataFrame(
        [(k, v) for k, v in rows], "k int, v string")
    got = {(r["k"], r["dep_value"]):
           (r["n_rows"], r["n_distinct_vals"], r["is_majority"])
           for r in fd_violations(df, ["k"], "v").collect()}

    per = Counter((k, v) for k, v in rows if v is not None)
    by_key = defaultdict(dict)
    for (k, v), n in per.items():
        by_key[k][v] = n
    want = {}
    for k, vals in by_key.items():
        if len(vals) < 2:
            continue
        best = max((n, v) for v, n in vals.items())
        for v, n in vals.items():
            want[(k, v)] = (n, len(vals), (n, v) == best)
    assert got == want


@settings(max_examples=15, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=st.lists(st.tuples(KEYS, VALS), min_size=1, max_size=30))
def test_candidate_keys_matches_python_oracle(spark, rows):
    df = spark.createDataFrame(
        [(k, v) for k, v in rows], "k int, v string")
    out = {r["key_name"]: r for r in candidate_keys(
        df, [("k_only", ["k"]), ("pair", ["k", "v"])]).collect()}

    for name, cols in [("k_only", [0]), ("pair", [0, 1])]:
        nonnull = [tuple(r[i] for i in cols) for r in rows
                   if all(r[i] is not None for i in cols)]
        r = out[name]
        assert r["n_rows"] == len(rows)
        assert r["n_null_rows"] == len(rows) - len(nonnull)
        assert r["n_distinct"] == len(set(nonnull))
        assert r["n_extra_rows"] == len(nonnull) - len(set(nonnull))
        assert r["is_unique"] == (len(nonnull) == len(rows)
                                  and len(set(nonnull)) == len(rows))


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=st.lists(
    st.tuples(st.sampled_from(["g1", "g2"]),
              st.one_of(st.none(), st.integers(0, 5)),   # week offset
              st.one_of(st.none(),
                        st.floats(-100, 100, allow_nan=False))),
    min_size=1, max_size=30))
def test_quality_trend_matches_duckdb(spark, rows):
    base = dt.datetime(2026, 1, 5)    # a Monday, so weeks bucket cleanly
    data = [(g, None if w is None else base + dt.timedelta(weeks=w), v)
            for g, w, v in rows]
    df = spark.createDataFrame(data, "g string, ts timestamp, v double")
    got = {r["group"]: r for r in
           quality_trend(df, "g", "ts", "v").collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, ts TIMESTAMP, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", data)
    want = con.execute("""
        WITH per AS (
          SELECT g, date_trunc('week', ts) AS wk,
                 round(round(avg(v), 6) * 1000000.0)::bigint AS y,
                 floor(epoch(date_trunc('week', ts)) / 604800)::bigint
                   AS x
          FROM t WHERE ts IS NOT NULL GROUP BY 1, 2
          HAVING round(avg(v), 6) IS NOT NULL),
        gg AS (
          SELECT g, count(*)::bigint AS n,
                 min(CAST(wk AS DATE)) AS fw, max(CAST(wk AS DATE)) AS lw,
                 sum(x)::bigint AS sx, sum(x * x)::bigint AS sxx,
                 sum(y)::bigint AS sy, sum(x * y)::bigint AS sxy
          FROM per GROUP BY g)
        SELECT g, n, fw, lw,
               round(sy::double / n::double) / 1000000.0,
               CASE WHEN n >= 2 AND n * sxx - sx * sx <> 0
                 THEN round((n * sxy - sx * sy)::double
                            / (n * sxx - sx * sx)::double) / 1000000.0
               END
        FROM gg""").fetchall()
    assert len(want) == len(got)
    for g, nb, fw, lw, avg, slope in want:
        r = got[g]
        assert r["n_buckets"] == nb
        assert r["first_week"] == fw and r["last_week"] == lw
        # exact-integer replay: both engines must agree bit-identically
        assert r["overall_avg"] == avg
        assert r["slope_per_week"] == slope
