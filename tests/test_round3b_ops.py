"""Round-3 continuation operators: Wasserstein-1 grid drift, JSON
key-set profiling, key/partition locality audit."""

import pytest
from pyspark.sql import Row


# -------------------------------------------------------- wasserstein_drift

def _w1(spark, base_vals, cur_vals, edges):
    from schema_validata_spark.operators.drift import wasserstein_drift
    rows = ([Row(day="base", v=float(x)) for x in base_vals]
            + [Row(day="cur", v=float(x)) for x in cur_vals])
    out = wasserstein_drift(spark.createDataFrame(rows), "v", "day",
                            edges, "base").collect()
    return {r["partition_key"]: r["w1"] for r in out}


def test_w1_identical_distributions_zero(spark):
    vals = [1, 2, 3, 4, 5, 6, 7, 8]
    got = _w1(spark, vals, vals, [0.0, 2.5, 5.0, 7.5, 10.0])
    assert got["base"] == 0.0 and got["cur"] == 0.0


def test_w1_location_shift_reports_units_moved(spark):
    # +2 shift of a point mass: all mass sits below 5 for base and
    # above 5 for cur between edges 4..6 -> |dCDF|=1 on [4,6) segments
    base = [4.0] * 10
    cur = [6.0] * 10
    got = _w1(spark, base, cur, [0.0, 4.0, 5.0, 6.0, 8.0])
    # segments: [4,5): |1-0|*1 ; [5,6): |1-0|*1 ; others 0 -> W1 = 2.0
    assert got["cur"] == pytest.approx(2.0)


def test_w1_scales_with_shift_magnitude_where_ks_saturates(spark):
    from schema_validata_spark.operators.drift import ks_drift
    edges = [float(e) for e in range(0, 21)]
    base = [2.0] * 50
    small = _w1(spark, base, [5.0] * 50, edges)["cur"]
    large = _w1(spark, base, [15.0] * 50, edges)["cur"]
    assert large == pytest.approx(small * (13.0 / 3.0))
    # KS is 1.0 for both shifts -- the magnitude signal W1 adds
    rows = ([Row(day="base", v=2.0)] * 5 + [Row(day="cur", v=15.0)] * 5)
    ks = {r["partition_key"]: r["ks_stat"] for r in
          ks_drift(spark.createDataFrame(rows), "v", "day",
                   edges, "base").collect()}
    assert ks["cur"] == 1.0


def test_w1_rejects_bad_grids(spark):
    from schema_validata_spark.operators.drift import wasserstein_drift
    df = spark.createDataFrame([Row(day="base", v=1.0)])
    with pytest.raises(ValueError):
        wasserstein_drift(df, "v", "day", [1.0], "base")
    with pytest.raises(ValueError):
        wasserstein_drift(df, "v", "day", [2.0, 1.0], "base")


def test_w1_missing_baseline_empty(spark):
    got = _w1(spark, [], [1.0, 2.0], [0.0, 5.0])
    assert got == {}


# -------------------------------------------------------- json_key_profile

def test_json_key_profile_object_universe(spark):
    from schema_validata_spark.operators.semistructured import (
        json_key_profile)
    rows = [Row(props='{"a": 1, "b": 2}'),
            Row(props='{"a": 3}'),
            Row(props='{}'),              # object row, no keys
            Row(props='[1, 2]'),          # array: excluded
            Row(props='42'),              # scalar: excluded
            Row(props='not json at all'),  # malformed: excluded
            Row(props=None)]              # NULL: excluded
    out = {r["key"]: r for r in
           json_key_profile(spark.createDataFrame(rows), "props")
           .collect()}
    # denominator = 3 object rows ({a,b}, {a}, {})
    assert out["a"]["n_rows"] == 2
    assert out["a"]["share"] == pytest.approx(2 / 3, abs=1e-6)
    assert out["b"]["n_rows"] == 1
    assert out["b"]["share"] == pytest.approx(1 / 3, abs=1e-6)
    assert set(out) == {"a", "b"}


def test_json_key_profile_all_invalid_is_empty(spark):
    from schema_validata_spark.operators.semistructured import (
        json_key_profile)
    rows = [Row(props="oops"), Row(props=None), Row(props="[3]")]
    assert json_key_profile(spark.createDataFrame(rows),
                            "props").collect() == []


def test_json_key_profile_ordering_count_desc_then_key(spark):
    from schema_validata_spark.operators.semistructured import (
        json_key_profile)
    rows = [Row(props='{"z": 1, "m": 1}'), Row(props='{"m": 2}')]
    out = json_key_profile(spark.createDataFrame(rows), "props").collect()
    assert [(r["key"], r["n_rows"]) for r in out] == [("m", 2), ("z", 1)]


# ------------------------------------------------------------ key_locality

def test_key_locality_confined_vs_smeared(spark):
    from schema_validata_spark.operators.uniqueness import key_locality
    rows = (
        # key 1 confined to one partition (3 rows, dup pairs collapse)
        [Row(k=1, p="d1")] * 3
        # key 2 straddles three partitions
        + [Row(k=2, p="d1"), Row(k=2, p="d2"), Row(k=2, p="d3")]
        # key 3 in two partitions
        + [Row(k=3, p="d2"), Row(k=3, p="d3")])
    out = key_locality(spark.createDataFrame(rows), "k", "p").collect()[0]
    assert out["n_keys"] == 3
    assert out["max_parts_per_key"] == 3
    assert out["avg_parts_per_key"] == pytest.approx(2.0)
    assert out["pct_single_part"] == pytest.approx(1 / 3, abs=1e-6)


def test_key_locality_null_key_and_partition_participate(spark):
    from schema_validata_spark.operators.uniqueness import key_locality
    rows = [Row(k=None, p="d1"), Row(k=None, p="d2"),
            Row(k=1, p=None), Row(k=1, p=None)]
    out = key_locality(spark.createDataFrame(rows), "k", "p").collect()[0]
    assert out["n_keys"] == 2                  # NULL key is a key
    assert out["max_parts_per_key"] == 2       # NULL key spans d1,d2
    assert out["pct_single_part"] == pytest.approx(0.5)


# ----------------------------------------------------- tool_arg_conformance

def test_tool_arg_conformance_per_tool_contracts(spark):
    from schema_validata_spark.operators.semistructured import (
        tool_arg_conformance)
    rows = [
        Row(tool="search", args='{"query": "x"}'),       # ok
        Row(tool="search", args='{"q": "x"}'),           # missing query
        Row(tool="search", args=None),                   # NULL misses all
        Row(tool="search", args='{{{'),                  # parse fail
        Row(tool="calc", args='{"expr": "1+1", "precision": 2}'),  # ok
        Row(tool="calc", args='{"expr": "1+1"}'),        # missing precision
        Row(tool="browse", args='{"url": "u"}'),         # no contract
    ]
    req = {"search": ["query"], "calc": ["expr", "precision"]}
    out = {r["tool"]: r for r in tool_arg_conformance(
        spark.createDataFrame(rows), "tool", "args", req).collect()}
    s = out["search"]
    assert (s["n_calls"], s["n_parse_fail"], s["n_missing"]) == (4, 1, 2)
    assert s["missing_share"] == 0.5
    c = out["calc"]
    assert (c["n_calls"], c["n_parse_fail"], c["n_missing"]) == (2, 0, 1)
    # observed-but-uncontracted tool: visible, nothing asserted
    b = out["browse"]
    assert b["n_calls"] == 1
    assert b["n_parse_fail"] is None and b["n_missing"] is None
    assert b["missing_share"] is None


def test_tool_arg_conformance_empty_contract_rejected(spark):
    import pytest as _pt
    from schema_validata_spark.operators.semistructured import (
        tool_arg_conformance)
    df = spark.createDataFrame([Row(tool="t", args="{}")])
    with _pt.raises(ValueError):
        tool_arg_conformance(df, "tool", "args", {})
