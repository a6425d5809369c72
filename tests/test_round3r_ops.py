"""Round-3r: typed JSON flatten + discovery-driven auto-flatten."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schema_validata_spark.operators.semistructured import (json_flatten,
                                                            json_flatten_auto)


def _payloads(spark, rows):
    return spark.createDataFrame(rows, "id long, props string")


FIELDS = {"k": ("$.k", "bigint"), "tag": ("$.tag", "string")}


def test_flatten_typed_extraction(spark):
    rows = [(1, '{"k": 42, "tag": "a"}'),
            (2, '{"k": "not-an-int", "tag": 7}'),
            (3, '{"tag": "only"}'),
            (4, "not json at all"),
            (5, None)]
    got = {r["id"]: r for r in json_flatten(
        _payloads(spark, rows), "props", FIELDS).collect()}
    assert got[1]["k"] == 42 and got[1]["tag"] == "a"
    assert got[1]["json_ok"] is True
    assert got[2]["k"] is None               # try_cast mismatch -> NULL
    assert got[2]["tag"] == "7"              # JSON number as string
    assert got[3]["k"] is None and got[3]["tag"] == "only"
    assert got[4]["json_ok"] is False
    assert got[4]["k"] is None
    assert got[5]["json_ok"] is None         # NULL payload stays NULL
    # original columns survive
    assert set(got[1].asDict()) == {"id", "props", "json_ok", "k", "tag"}


def test_flatten_drop_payload_and_validation(spark):
    rows = [(1, '{"k": 1}')]
    out = json_flatten(_payloads(spark, rows), "props",
                       {"k": ("$.k", "bigint")}, drop_payload=True)
    assert "props" not in out.columns
    with pytest.raises(ValueError):
        json_flatten(_payloads(spark, rows), "props", {})
    with pytest.raises(ValueError):
        json_flatten(_payloads(spark, rows), "props",
                     {"k": ("$.k", "uuid")})


def test_flatten_is_map_only(spark):
    import contextlib
    import io
    rows = [(1, '{"k": 1}')] * 8
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        json_flatten(_payloads(spark, rows), "props",
                     FIELDS).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan      # pure scan-stage projection


def test_flatten_auto_discovers_frequent_keys(spark):
    rows = ([(i, '{"a": 1, "b": "x"}') for i in range(98)]
            + [(98, '{"a": 2, "rare": true}'), (99, "{}")])
    out = json_flatten_auto(_payloads(spark, rows), "props",
                            top_k=5, min_share=0.05)
    assert "j_a" in out.columns and "j_b" in out.columns
    assert "j_rare" not in out.columns       # 1% < min_share
    first = out.orderBy("id").first()
    assert first["j_a"] == "1" and first["j_b"] == "x"


def test_flatten_auto_no_keys_raises(spark):
    rows = [(1, "scalar"), (2, None)]
    with pytest.raises(ValueError):
        json_flatten_auto(_payloads(spark, rows), "props")
