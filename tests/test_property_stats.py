"""Property-based invariants for the statistical QA family (gini,
Spearman, eta², Theil's U): random small frames, each Spark result
re-derived in plain Python from the textbook formula. Spark jobs stay
tiny (≤ 40 rows) and example counts low — edge coverage, not volume."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings, strategies as st


def _py_gini(vals):
    xs = sorted(v for v in vals if v is not None and v >= 0)
    n, t = len(xs), sum(xs)
    if t <= 0:
        return None
    iw = sum((i + 1) * x for i, x in enumerate(xs))
    return round((2.0 * iw - (n + 1) * t) / (n * t), 6)


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=st.lists(st.integers(0, 50), min_size=1, max_size=40))
def test_gini_matches_python_and_is_bounded(spark, rows):
    from schema_validata_spark.operators.statqa import gini_coefficient
    df = spark.createDataFrame([(float(v),) for v in rows], "v: double")
    out = gini_coefficient(df, "v").collect()[0]
    expect = _py_gini([float(v) for v in rows])
    assert out["gini"] == expect
    if expect is not None:
        assert 0.0 <= out["gini"] < 1.0


def _frac_ranks(xs):
    order = sorted(range(len(xs)), key=lambda i: xs[i])
    ranks = [0.0] * len(xs)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and xs[order[j + 1]] == xs[order[i]]:
            j += 1
        avg = (i + j) / 2.0 + 1.0
        for k in range(i, j + 1):
            ranks[order[k]] = avg
        i = j + 1
    return ranks


def _py_spearman(xs, ys):
    pairs = [(x, y) for x, y in zip(xs, ys)
             if x is not None and y is not None]
    if not pairs:
        return None
    ra = _frac_ranks([p[0] for p in pairs])
    rb = _frac_ranks([p[1] for p in pairs])
    n = len(pairs)
    ma, mb = sum(ra) / n, sum(rb) / n
    cov = sum((a - ma) * (b - mb) for a, b in zip(ra, rb)) / n
    sa = math.sqrt(sum((a - ma) ** 2 for a in ra) / n)
    sb = math.sqrt(sum((b - mb) ** 2 for b in rb) / n)
    if sa <= 0 or sb <= 0:
        return None
    return round(cov / (sa * sb), 6)


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=st.lists(st.tuples(
    st.one_of(st.none(), st.integers(-20, 20)),
    st.one_of(st.none(), st.integers(-20, 20))),
    min_size=2, max_size=40))
def test_spearman_matches_python_and_antisymmetry(spark, rows):
    from schema_validata_spark.operators.statqa import spearman_correlations
    data = [(None if x is None else float(x),
             None if y is None else float(y),
             None if y is None else -float(y)) for x, y in rows]
    df = spark.createDataFrame(data, "x: double, y: double, ny: double")
    out = {(r["col_a"], r["col_b"]): r for r in
           spearman_correlations(df, ["x", "y", "ny"]).collect()}
    rho = out[("x", "y")]["spearman_rho"]
    expect = _py_spearman([d[0] for d in data], [d[1] for d in data])
    assert rho == expect
    if rho is not None:
        assert -1.0 <= rho <= 1.0
        # negating one side flips the sign exactly (ranks reverse)
        assert out[("x", "ny")]["spearman_rho"] == -rho


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=st.lists(st.tuples(st.sampled_from("abc"),
                               st.integers(0, 30)),
                     min_size=2, max_size=40))
def test_eta_squared_bounded_and_relabel_invariant(spark, rows):
    from schema_validata_spark.operators.statqa import variance_explained
    df = spark.createDataFrame([(g, float(v)) for g, v in rows],
                               "g: string, v: double")
    out = variance_explained(df, "v", "g").collect()[0]
    if out["eta_sq"] is not None:
        assert -1e-9 <= out["eta_sq"] <= 1.0 + 1e-9
    relab = spark.createDataFrame([(g.upper() * 2, float(v))
                                   for g, v in rows],
                                  "g: string, v: double")
    out2 = variance_explained(relab, "v", "g").collect()[0]
    assert out2["eta_sq"] == out["eta_sq"]


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=st.lists(st.sampled_from("abcd"), min_size=2, max_size=40))
def test_uncertainty_bounds_and_determinism(spark, rows):
    from schema_validata_spark.operators.statqa import uncertainty_coefficient
    # y is a deterministic function of x -> U(y|x) = 1 (when H(Y) > 0)
    fn = {"a": "p", "b": "q", "c": "p", "d": "q"}
    df = spark.createDataFrame([(x, fn[x]) for x in rows],
                               "x: string, y: string")
    r = uncertainty_coefficient(df, "x", "y").collect()[0]
    if r["u_y_given_x"] is not None:
        assert r["u_y_given_x"] == 1.0
    for k in ("u_y_given_x", "u_x_given_y"):
        if r[k] is not None:
            assert -1e-9 <= r[k] <= 1.0 + 1e-9
