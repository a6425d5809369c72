"""Unit tests for functions/nulls.py and functions/typing.py edge cases
flagged in round-1 advice: custom NA vocabularies longer than the default
length gate, and inf/padded-numeric acceptance in safe_double."""

from pyspark.sql import functions as F

from schema_validata_spark.functions.nulls import (_na_gate_length,
                                                   canonicalize_na,
                                                   is_na_expr)
from schema_validata_spark.functions.typing import safe_bigint, safe_double


def _vals(spark, values):
    return spark.createDataFrame([(v,) for v in values], "s: string")


def test_long_custom_sentinel_classified_na(spark):
    """A caller-supplied sentinel longer than the default 24-char gate
    must still classify as NA (the gate derives from the vocabulary)."""
    sentinel = "THIS VALUE IS INTENTIONALLY MISSING FROM THE EXPORT"  # 51 ch
    df = _vals(spark, [sentinel, "  " + sentinel + " ", "keep-me", None])
    na = df.select(is_na_expr(F.col("s"), na_values=[sentinel, "", "N/A"])
                   .alias("na")).collect()
    assert [r["na"] for r in na] == [True, True, False, True]


def test_custom_pattern_disables_length_gate(spark):
    """Custom na_patterns have unknowable match reach — the length gate
    must be dropped so a long match is not silently kept."""
    pat = r"(?i)^redacted[-: ].*$"
    long_hit = "REDACTED: " + "x" * 100
    df = _vals(spark, [long_hit, "fine"])
    na = df.select(
        is_na_expr(F.col("s"), na_patterns=[pat]).alias("na")).collect()
    assert [r["na"] for r in na] == [True, False]
    assert _na_gate_length(("",), (pat,)) is None


def test_default_gate_still_skips_long_text(spark):
    """Default vocabulary keeps the cheap gate: long document text short-
    circuits before the regex (observable only as: not classified NA)."""
    from schema_validata_spark.config import NA_PATTERNS
    assert _na_gate_length(("", "N/A", "NULL"), tuple(NA_PATTERNS)) == 24
    df = _vals(spark, ["word " * 50, "N/A", "   "])
    out = canonicalize_na(df).collect()
    assert out[0]["s"] is not None
    assert out[1]["s"] is None and out[2]["s"] is None


def test_safe_double_accepts_inf_and_padding(spark):
    df = _vals(spark, ["inf", "Infinity", "-INF", "+inf",
                       " " * 60 + "12.5" + " " * 60, "nan-like", "12x"])
    got = [r["d"] for r in
           df.select(safe_double(F.col("s")).alias("d")).collect()]
    assert got[0] == float("inf") and got[1] == float("inf")
    assert got[2] == float("-inf") and got[3] == float("inf")
    assert got[4] == 12.5
    assert got[5] is None and got[6] is None


def test_safe_bigint_trims_padding(spark):
    df = _vals(spark, ["  42  ", " " * 40 + "7", "9.5", "abc"])
    got = [r["i"] for r in
           df.select(safe_bigint(F.col("s")).alias("i")).collect()]
    assert got == [42, 7, None, None]


def test_padded_leading_zero_forces_string(spark):
    """' 07' (padded) must force String inference exactly like '07' —
    the lead0 probe runs on the trimmed value (round-1 advice)."""
    from schema_validata_spark.operators.profile import profile
    df = _vals(spark, [" 07", "12", "9"])
    assert profile(df)["s"]["data_type"] == "String"
    df2 = _vals(spark, ["7", "12", "9"])
    assert profile(df2)["s"]["data_type"] == "Integer"


def test_minhash_excludes_null_text_by_contract(spark):
    from schema_validata_spark.operators.dedup import (minhash_signatures,
                                                       simhash)
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the dog"),
         (2, None),
         (3, "the quick brown fox jumps over the dog")],
        "doc_id: int, text: string")
    sigs = minhash_signatures(df, "text", "doc_id")
    assert sorted(r["doc_id"] for r in sigs.collect()) == [1, 3]
    sh = simhash(df, "text", "doc_id")
    assert sorted(r["doc_id"] for r in sh.collect()) == [1, 3]


def test_discover_na_values(spark):
    """Per-column NA vocabulary from data (reference :1086-1104):
    pattern-tier hits surface; literal sentinels don't re-surface."""
    from schema_validata_spark.functions.nulls import discover_na_values
    df = spark.createDataFrame(
        [("ok", "N/A"), (" - ", "fine"), ("not available", "  "),
         (None, "x"), ("Not_Available", "-")],
        "a: string, b: string")
    vocab = discover_na_values(df)
    assert vocab["a"] == sorted([" - ", "not available", "Not_Available"])
    assert vocab["b"] == sorted(["  ", "-"])


def test_regex_parity_fallback_python_named_group(spark):
    """(?P<name>…) is a Java PatternSyntaxException — the check must
    route through the pandas-UDF re.match fallback and produce the
    reference's exact violation set."""
    import sys, types
    _fake = types.ModuleType("chardet")
    _fake.detect = lambda b: {"encoding": "utf-8", "confidence": 1.0}
    sys.modules.setdefault("chardet", _fake)
    sys.path.insert(0, "/root/reference/src")
    import schema_validata as ref
    import pandas as pd
    from schema_validata_spark.functions.regex_parity import \
        python_regex_required
    from schema_validata_spark.operators.violations import (CheckSpec,
                                                            value_errors_df)
    pat = r"(?P<area>\d{3})-(?P=area)?\d{4}"
    assert python_regex_required(pat)
    assert not python_regex_required(r"^\d{5}(?:[-\s]\d{4})?$")
    pdf = pd.DataFrame({"phone": ["555-0000", "x555-1234", "12-3456", None],
                        "k": [1, 2, 3, 4]})
    theirs = {(r["Error Type"], r["Column Name"], str(r["Error Value"]))
              for r in ref.value_errors_regex_mismatches(
                  pdf, "phone", pat, "k")}
    df = spark.createDataFrame(pdf)
    ours_df = value_errors_df(df, [CheckSpec("phone", "regex_pattern", pat)],
                              ["k"])
    ours = {(r["error_type"], r["column_name"], str(r["error_value"]))
            for r in ours_df.collect()}
    assert ours == theirs
    assert len(ours) == 2  # 'x555-…' and '12-3456' mismatch; null skipped


def test_get_byte_units():
    from schema_validata_spark.sources.tableio import get_byte_units
    assert get_byte_units(0) == "0 : B"
    assert get_byte_units(1500) == "1.5 : KB"
    assert get_byte_units(2_000_000_000) == "2.0 : GB"


def test_long_whitespace_only_cell_is_na(spark):
    """A whitespace-padded empty cell beyond the byte gate (fixed-width
    exports) must still NA-classify — the gate skips the regex, not the
    trim-only emptiness check."""
    from schema_validata_spark.functions.nulls import is_na_expr
    df = spark.createDataFrame(
        [(" " * 500,), ("x" + " " * 500,), ("n/a",)], "v string")
    got = [r["na"] for r in
           df.select(is_na_expr("v").alias("na")).collect()]
    assert got == [True, False, True]


def test_long_tab_newline_only_cell_is_na(spark):
    """Whitespace-only must mean ALL whitespace (tabs/newlines), not
    just spaces, past the byte gate — classification of identical
    content must not flip on length."""
    from schema_validata_spark.functions.nulls import is_na_expr
    df = spark.createDataFrame(
        [("\t" * 500,), ("\n" * 300 + " " * 300,), ("x" + "\t" * 500,)],
        "v string")
    got = [r["na"] for r in
           df.select(is_na_expr("v").alias("na")).collect()]
    assert got == [True, True, False]
