"""Property-based invariants (SURVEY.md §5.2 item 6): random rule
tables × random frames, re-evaluating every emitted violation row's
predicate in plain Python. Hypothesis drives the generation; Spark jobs
are kept small (≤ 40 rows) and example counts low — the point is edge
coverage (NA sentinels, boundary values, regex anchoring), not volume."""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from schema_validata_spark.config import NA_PATTERNS, NA_VALUES
from schema_validata_spark.operators.violations import (CheckSpec,
                                                        value_errors_df)

VALUES = st.one_of(
    st.none(),
    st.sampled_from(NA_VALUES),
    st.sampled_from(["a", "bb", "ccc", "dddd", "0", "07", "12", "3.5",
                     "-4", "xyz", " x ", "NOT AVAILABLE", "100000"]),
    st.integers(-1000, 1000).map(str),
)


def _is_na(v) -> bool:
    if v is None:
        return True
    s = str(v)
    if s.strip() == "" or s.strip() in NA_VALUES:
        return True
    return any(re.search(p, s) for p in NA_PATTERNS)


def _to_double(s):
    if s is None:
        return None
    if not re.match(r"^\s*[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?\s*$",
                    str(s)):
        return None
    try:
        return float(str(s).strip())
    except ValueError:
        return None


@pytest.mark.parametrize("check,param", [
    ("allow_null", None),
    ("length", 2),
    ("range_min", 0.0),
    ("range_max", 10.0),
    ("allowed_value_list", ["a", "bb", "12"]),
    ("regex_pattern", r"\d+"),
])
@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=st.lists(VALUES, min_size=1, max_size=40))
def test_violation_rows_satisfy_predicate(spark, check, param, rows):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(rows)],
                               "id: int, v: string")
    out = value_errors_df(df, [CheckSpec("v", check, param)], ["id"])
    flagged = {r["id"] for r in out.collect()}
    for i, v in enumerate(rows):
        if check == "allow_null":
            expect = _is_na(v)
        elif check == "length":
            expect = v is not None and len(str(v)) > param
        elif check == "range_min":
            d = _to_double(v)
            expect = d is not None and d < param
        elif check == "range_max":
            d = _to_double(v)
            expect = d is not None and d > param
        elif check == "allowed_value_list":
            expect = v is not None and str(v).strip() not in param
        elif check == "regex_pattern":
            # reference semantics: re.match (anchored at start)
            expect = v is not None and not re.match(param, str(v))
        assert (i in flagged) == expect, (check, i, repr(v))


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=st.lists(st.sampled_from(["x", "y", "z", "w"]),
                     min_size=1, max_size=30))
def test_duplicate_rows_keep_false(spark, rows):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(rows)],
                               "id: int, v: string")
    out = value_errors_df(df, [CheckSpec("v", "unique_value")], ["id"])
    from collections import Counter
    counts = Counter(rows)
    expected = {i for i, v in enumerate(rows) if counts[v] > 1}
    assert {r["id"] for r in out.collect()} == expected


# --- connected-components property: Spark CC vs pure-Python union-find ----

def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(edges=st.lists(
    st.tuples(st.integers(0, 60), st.integers(0, 60)).filter(
        lambda e: e[0] != e[1]),
    min_size=1, max_size=80))
def test_near_dup_clusters_matches_union_find(spark, edges):
    from schema_validata_spark.operators.dedup import near_dup_clusters
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges],
        "id_a long, id_b long")
    got = {r["id"]: r["cluster_id"]
           for r in near_dup_clusters(pairs).collect()}
    want = _uf_components(edges)
    assert got == want
