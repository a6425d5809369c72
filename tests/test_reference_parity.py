"""Reference-parity golden tests (SURVEY.md §5.2 item 1).

Runs the ACTUAL reference module (`/root/reference/src/schema_validata.py`,
imported with a chardet stub — chardet is only used for file-encoding
sniffing, which these tests never touch) on small pandas frames, and the
new engine on the same rows via Spark, then compares:

* ``build_data_dictionary`` vs ``profile`` — per-column stats dict;
* ``validate_schema`` — byte-identical nested verdict dict (incl.
  message strings) except two DOCUMENTED reference bugs we deliberately
  fix (see below);
* ``value_errors_*`` — row-level violations as sets.

Documented divergences (deliberate, reference file:line cited):
1. bool-cast hazard: ``get_dict_diffs`` casts an observed 'False'
   STRING via ``bool('False') is True`` (src/schema_validata.py:1738).
   In the real validate_dataset flow the observed dict is revived to
   bools first (eval_nested_string_literals, :1522-1523), so end-to-end
   both engines agree byte-for-byte; fed RAW build_data_dictionary
   output the reference misses unique_value/allow_null mismatches
   while our get_dict_diffs parses string-booleans itself and still
   flags them (see test_verdict_divergence_unique_value_bug).
2. zero-count crash: the reference only sets the ``{count}`` template
   value when truthy (:2121-2128) and raises KeyError formatting the
   allow_null message when a flagged column reports a zero count
   (reachable via the raw-string flow above). We default the count
   to 0.
"""

from __future__ import annotations

import copy
import sys
import types

import pandas as pd
import pytest

# --- import the reference with a chardet stub ------------------------------
_fake = types.ModuleType("chardet")
_fake.detect = lambda b: {"encoding": "utf-8", "confidence": 1.0}
sys.modules.setdefault("chardet", _fake)
sys.path.insert(0, "/root/reference/src")
import schema_validata as ref  # noqa: E402

from schema_validata_spark.operators.profile import profile  # noqa: E402
from schema_validata_spark.operators.verdicts import validate_schema  # noqa: E402
from schema_validata_spark.operators.violations import (CheckSpec,  # noqa: E402
                                                        value_errors_df)


def _norm(v):
    """numpy scalars → python scalars, for == comparison."""
    if hasattr(v, "item"):
        return v.item()
    if isinstance(v, list):
        return [_norm(x) for x in v]
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    return v


MOVIES = pd.DataFrame({
    "title": ["Heat", "Heat", "Alien", "Up", None, "Tron"],
    "release_year": [1995.0, 1995.0, 1979.0, 2009.0, 2030.0, 1982.0],
    "genre": ["Drama", "Drama", "Sci-Fi", "Comedy", "Horror", "Sci-Fi"],
    "runtime_minutes": [170.0, 170.0, 117.0, 96.0, None, 96.0],
    "zipcode": ["01234", "01234", "98765", "00501", "4521", "98101-1234"],
})


@pytest.fixture(scope="module")
def spark_movies(spark):
    return spark.createDataFrame(MOVIES)


def test_profile_parity(spark, spark_movies):
    theirs = ref.build_data_dictionary(MOVIES.copy())
    ours = profile(spark_movies)
    assert set(theirs) == set(ours)
    for col in theirs:
        t, o = _norm(theirs[col]), _norm(ours[col])
        for attr in ("data_type", "allow_null", "null_count",
                     "duplicate_count", "length", "range_min", "range_max",
                     "unique_value", "required", "allowed_value_list"):
            assert o[attr] == t[attr], (col, attr, t[attr], o[attr])


RULES = {
    "MOVIES_SCHEMA": {
        "title": {"required": True, "data_type": "String",
                  "allow_null": False, "length": 4},
        "release_year": {"required": True, "data_type": "Integer",
                         "range_min": 1900, "range_max": 2024},
        "genre": {"required": True, "data_type": "String",
                  "allowed_value_list": ["Drama", "Action", "Comedy",
                                         "Sci-Fi"]},
        "runtime_minutes": {"required": True, "data_type": "Integer",
                            "allow_null": True, "range_min": 60},
        "zipcode": {"required": True, "data_type": "String",
                    "regex_pattern": r"^\d{5}(?:[-\s]\d{4})?$"},
        "director": {"required": True, "data_type": "String"},
        "synopsis": {"required": False, "data_type": "String"},
    }
}
MAPPING = [{"dataset": "movies", "data_dict": "MOVIES_SCHEMA"}]


def test_verdict_parity_byte_identical(spark, spark_movies):
    # the reference's REAL pipeline revives 'True'/'False' strings to
    # bools between profiling and verdicts (dataset_schema_to_json →
    # eval_nested_string_literals, src/schema_validata.py:1522-1523)
    # before validate_schema ever sees them — mirror that step here so
    # the component test matches the validate_dataset end-to-end flow
    # (our get_dict_diffs performs the same revival internally)
    obs_ref = ref.eval_nested_string_literals(
        {"movies": ref.build_data_dictionary(MOVIES.copy())})
    theirs = ref.validate_schema(copy.deepcopy(obs_ref),
                                 copy.deepcopy(RULES),
                                 copy.deepcopy(MAPPING))
    ours_obs = {"movies": profile(spark_movies)}
    ours = validate_schema(copy.deepcopy(ours_obs), copy.deepcopy(RULES),
                           copy.deepcopy(MAPPING))
    t = _norm(theirs["movies"]["schema_violations"])
    o = _norm(ours["movies"]["schema_violations"])
    assert set(t) == set(o)
    for col in t:
        assert o[col] == t[col], (col, t[col], o[col])


def test_verdict_divergence_unique_value_bug(spark, spark_movies):
    """The reference's bool-cast hazard (:1738 — bool('False') is True)
    only bites when validate_schema is fed RAW build_data_dictionary
    output, whose booleans are still 'True'/'False' STRINGS; the real
    validate_dataset pipeline revives them to bools first
    (eval_nested_string_literals, :1522-1523), after which the
    reference flags unique_value violations correctly. Our engine flags
    them byte-identically in BOTH cases — get_dict_diffs parses
    string-booleans itself, so it cannot be derailed by a caller
    skipping the revival step."""
    rules = copy.deepcopy(RULES)
    rules["MOVIES_SCHEMA"]["title"]["unique_value"] = True
    raw_obs = {"movies": ref.build_data_dictionary(MOVIES.copy())}
    revived = ref.eval_nested_string_literals(copy.deepcopy(raw_obs))
    theirs = ref.validate_schema(copy.deepcopy(revived),
                                 copy.deepcopy(rules),
                                 copy.deepcopy(MAPPING))
    ours = validate_schema({"movies": profile(spark_movies)},
                           copy.deepcopy(rules), copy.deepcopy(MAPPING))
    t = _norm(theirs["movies"]["schema_violations"])
    o = _norm(ours["movies"]["schema_violations"])
    # end-to-end (revived) flow: both engines flag, byte-identically
    assert o["title"]["unique_value"] == t["title"]["unique_value"]
    assert o["title"]["unique_value"]["errors"] == (
        "Column 'title' values must be unique. Found  2 duplicate values "
        "in dataset column .")
    for col in t:
        assert o[col] == t[col]
    # component-level (raw string) flow: the reference MISSES the
    # violation — bool('False') is True — while ours above still flags
    theirs_raw = ref.validate_schema(copy.deepcopy(raw_obs),
                                     copy.deepcopy(rules),
                                     copy.deepcopy(MAPPING))
    assert "unique_value" not in \
        _norm(theirs_raw["movies"]["schema_violations"]).get("title", {})


def _disp(v) -> str:
    """Whole-number floats render as ints: the reference's typed ingest
    (read_df_with_optimal_dtypes, :1041-1146) reads whole-number columns
    as Int64, so its end-to-end error values print '2030', not '2030.0'.
    These tests feed raw float frames, so normalize both sides."""
    s = str(v)
    try:
        f = float(s)
        if f == int(f):
            return str(int(f))
    except (ValueError, OverflowError):
        pass
    return s


def _ref_rows(rows):
    return {(r["Error Type"], r["Column Name"], _disp(r["Error Value"]))
            for r in rows}


def _our_rows(df):
    return {(r["error_type"], r["column_name"], _disp(r["error_value"]))
            for r in df.collect()}


def test_value_errors_parity(spark, spark_movies):
    pdf = MOVIES.copy()
    cases = [
        (ref.value_errors_duplicates(pdf, "title", "zipcode"),
         [CheckSpec("title", "unique_value")]),
        (ref.value_errors_unallowed(pdf, "genre",
                                    ["Drama", "Action", "Comedy", "Sci-Fi"],
                                    "zipcode"),
         [CheckSpec("genre", "allowed_value_list",
                    ["Drama", "Action", "Comedy", "Sci-Fi"])]),
        (ref.value_errors_out_of_range(pdf, "release_year", "max", 2024,
                                       "zipcode"),
         [CheckSpec("release_year", "range_max", 2024)]),
        (ref.value_errors_regex_mismatches(
            pdf, "zipcode", r"^\d{5}(?:[-\s]\d{4})?$", "zipcode"),
         [CheckSpec("zipcode", "regex_pattern",
                    r"^\d{5}(?:[-\s]\d{4})?$")]),
    ]
    for ref_rows, specs in cases:
        ours = value_errors_df(spark_movies, specs, ["zipcode"])
        assert _our_rows(ours) == _ref_rows(ref_rows), specs[0].check


def test_value_errors_length_parity_nulls(spark, spark_movies):
    """parity_nulls=True reproduces the reference's ``astype(str)`` quirk
    (src/schema_validata.py:2328-2331): a float NaN renders as the 3-char
    string 'nan' and is length-checked like any value."""
    pdf = MOVIES.copy()
    ref_rows = ref.value_errors_length(pdf, "runtime_minutes", 2, "zipcode")
    # the reference flags every row: '170.0'… and the NaN-as-'nan' row
    assert len(ref_rows) == len(pdf)
    ours = value_errors_df(
        spark_movies, [CheckSpec("runtime_minutes", "length", 2)],
        ["zipcode"], parity_nulls=True)
    assert ours.count() == len(ref_rows)
    assert _our_rows(ours) == _ref_rows(ref_rows)
    # sane mode (default) excludes nulls AND renders whole-number floats
    # as ints (typed-ingest display): only 170, 170, 117 exceed len 2
    sane = value_errors_df(
        spark_movies, [CheckSpec("runtime_minutes", "length", 2)],
        ["zipcode"])
    assert sane.count() == 3


def test_value_errors_nulls_parity(spark, spark_movies):
    ref_rows = ref.value_errors_nulls(MOVIES.copy(), "title", "zipcode")
    ours = value_errors_df(spark_movies, [CheckSpec("title", "allow_null")],
                           ["zipcode"])
    theirs = {(r["Error Type"], r["Column Name"]) for r in ref_rows}
    mine = {(r["error_type"], r["column_name"]) for r in ours.collect()}
    assert mine == theirs
    assert ours.count() == len(ref_rows) == 1
