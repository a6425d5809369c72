"""Property-based replicas for the last continuation batch: rolling_psi
re-derived from a pure-Python sliding-window PSI, readability from re
counts, unigram_sampling_table from collections.Counter. Tiny frames,
few examples — edge coverage, not volume."""

from __future__ import annotations

import datetime as dt
import math
import re
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row


# ------------------------------------------------------- rolling psi

def _py_rolling_psi(day_counts, lo, hi, nb, w, s=0.5):
    """day_counts: {day_idx: {bucket: count}} over observed buckets."""
    days = sorted(day_counts)
    buckets = sorted({b for d in day_counts.values() for b in d})
    out = {}
    for d in days:
        obs = {b: 0 for b in buckets}
        base = {b: 0 for b in buckets}
        for dd in days:
            for b in buckets:
                c = day_counts[dd].get(b, 0)
                if d - w + 1 <= dd <= d:
                    obs[b] += c
                elif d - 2 * w + 1 <= dd <= d - w:
                    base[b] += c
        to, tb, k = sum(obs.values()), sum(base.values()), len(buckets)
        if tb == 0:
            out[d] = None
            continue
        psi = 0.0
        for b in buckets:
            po = (obs[b] + s) / (to + s * k)
            pb = (base[b] + s) / (tb + s * k)
            psi += (po - pb) * math.log(po / pb)
        out[d] = round(psi, 6)
    return out


@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(data=st.lists(
    st.tuples(st.integers(0, 9),               # day offset
              st.floats(0.0, 99.0, allow_nan=False, width=16)),
    min_size=3, max_size=40))
def test_rolling_psi_matches_python(spark, data):
    from schema_validata_spark.operators.drift import rolling_psi
    start = dt.date(2024, 9, 1)
    rows = [Row(ts=dt.datetime.combine(start + dt.timedelta(days=d),
                                       dt.time(12)), v=float(v))
            for d, v in data]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    got = {(r["day"] - start).days: r["psi"]
           for r in rolling_psi(df, "ts", "v", 0.0, 100.0,
                                n_buckets=10, window_days=3).collect()}
    d0 = (start - dt.date(1970, 1, 1)).days
    counts: dict = {}
    for d, v in data:
        b = min(max(int(v // 10) + 1, 0), 11) if 0 <= v < 100 else (
            0 if v < 0 else 11)
        counts.setdefault(d, {}).setdefault(b, 0)
        counts[d][b] += 1
    want = _py_rolling_psi(counts, 0.0, 100.0, 10, 3)
    assert set(got) == set(want)
    for d in want:
        if want[d] is None:
            assert got[d] is None
        else:
            assert got[d] == pytest.approx(want[d], abs=1e-5)


# ------------------------------------------------------- readability

@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(texts=st.lists(
    st.text(alphabet="abcde .!?XY", min_size=1, max_size=40),
    min_size=1, max_size=8))
def test_readability_matches_re_counts(spark, texts):
    from schema_validata_spark.functions.text import readability_stats
    df = spark.createDataFrame([Row(text=t, g="g") for t in texts],
                               "text string, g string")
    out = readability_stats(df, "text", "g").collect()
    assert len(out) == 1
    r = out[0]
    words = sum(len(re.findall(r"\S+", t)) for t in texts)
    sents = sum(len(re.findall(r"[.!?]+", t)) for t in texts)
    syll = sum(len(re.findall(r"[aeiouyAEIOUY]+", t)) for t in texts)
    assert (r["words"], r["sentences"], r["syllables"]) \
        == (words, sents, syll)
    w, s = max(words, 1), max(sents, 1)
    assert r["flesch"] == pytest.approx(
        round(206.835 - 1.015 * (w / s) - 84.6 * (syll / w), 6),
        abs=1e-5)


# --------------------------------------------------- sampling table

@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(docs=st.lists(
    st.lists(st.sampled_from("pqrst"), min_size=1, max_size=12),
    min_size=1, max_size=10),
    vocab=st.integers(1, 6))
def test_sampling_table_matches_counter(spark, docs, vocab):
    from schema_validata_spark.functions.text import \
        unigram_sampling_table
    texts = [" ".join(d) for d in docs]
    df = spark.createDataFrame([Row(text=t) for t in texts],
                               "text string")
    out = unigram_sampling_table(df, "text", vocab_size=vocab).collect()
    out.sort(key=lambda r: r["rank"])
    counter = Counter(tok for d in docs for tok in d)
    top = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab]
    assert [(r["token"], r["n"]) for r in out] == top
    denom = sum(c ** 0.75 for _, c in top)
    cum = 0.0
    for r, (_, c) in zip(out, top):
        p = c ** 0.75 / denom
        cum += p
        assert r["p"] == pytest.approx(p, abs=1e-5)
        assert r["cum_p"] == pytest.approx(cum, abs=1e-5)
    assert out[-1]["cum_p"] == pytest.approx(1.0, abs=1e-5)
