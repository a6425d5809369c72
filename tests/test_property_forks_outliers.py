"""Property-based checks: conversation_forks against a plain-Python
prefix-grouping oracle, robust_outliers against a numpy median/MAD
oracle. Tiny random frames; edge coverage (NULL turns, equal-length
prefixes, constant features, NULL features), not volume."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row

from schema_validata_spark.operators.dedup import conversation_forks
from schema_validata_spark.operators.statqa import robust_outliers

TURN = st.one_of(st.none(), st.sampled_from(["s", "hi", "q", "a"]))
CONVS = st.dictionaries(
    st.sampled_from([f"c{i}" for i in range(6)]),
    st.lists(TURN, min_size=1, max_size=6),
    min_size=1, max_size=6)


def _fork_oracle(convs, k=3, min_group=2):
    groups = {}
    for cid, turns in convs.items():
        key = tuple("\x1e" if t is None else t for t in turns[:k])
        groups.setdefault(key, []).append((cid, len(turns)))
    out = {}
    for members in groups.values():
        if len(members) >= min_group:
            ids = sorted(m[0] for m in members)
            ns = [m[1] for m in members]
            out[ids[0]] = (len(members), min(ns), max(ns))
    return out


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(convs=CONVS)
def test_forks_match_python_oracle(spark, convs):
    rows = [Row(conv=c, idx=i, text=t)
            for c, turns in convs.items() for i, t in enumerate(turns)]
    df = spark.createDataFrame(rows, "conv string, idx int, text string")
    got = {r["example_conv"]:
           (r["n_conversations"], r["min_turns"], r["max_turns"])
           for r in conversation_forks(df, "conv", ["idx"],
                                       "text").collect()}
    assert got == _fork_oracle(convs)


FEATS = st.lists(
    st.one_of(st.none(),
              st.floats(min_value=-100, max_value=100,
                        allow_nan=False, width=32)),
    min_size=1, max_size=15)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=FEATS, k=st.sampled_from([0.5, 2.0, 5.0]))
def test_outliers_match_numpy_oracle(spark, vals, k):
    rows = [Row(id=f"e{i}", x=v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id string, x double")
    got = {r["id"]: r["deviation"]
           for r in robust_outliers(df, "id", ["x"], k=k, mad_floor=1e-9,
                                    exact=True).collect()}
    present = np.array([v for v in vals if v is not None], dtype=float)
    expect = {}
    if present.size:
        med = float(np.median(present))
        mad = float(np.median(np.abs(present - med)))
        for i, v in enumerate(vals):
            if v is None:
                continue
            dev = abs(float(v) - med) / max(mad, 1e-9)
            if round(dev, 6) > k:
                expect[f"e{i}"] = round(dev, 6)
    assert set(got) == set(expect)
    for key, dev in expect.items():
        # float-division noise vs numpy: compare loosely, the set
        # membership above is the exact contract under test
        assert abs(got[key] - dev) < 1e-3 * max(1.0, abs(dev))
