"""Engine-wide constants: null vocabulary, rule schema, message templates.

The vocabulary mirrors the reference engine's ``Config`` class
(reference: src/schema_validata.py:51-129) so verdict messages and null
semantics are byte-identical, but everything here is re-expressed for a
distributed Spark engine: NA handling becomes a Column expression
(see functions/nulls.py), not a pandas re-read.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Data dictionary (rule table) schema.
# Mirrors reference src/schema_validata.py:51-62 (DATA_DICT_SCHEMA) — the
# authoritative rule table has one row per field with these attributes.
# ---------------------------------------------------------------------------
DATA_DICT_SCHEMA = {
    "field_name": "string",
    "required": "boolean",
    "data_type": "string",
    "allow_null": "boolean",
    "length": "int",
    "range_min": "double",
    "range_max": "double",
    "regex_pattern": "string",
    "unique_value": "boolean",
    "allowed_value_list": "array<string>",
}

DATA_DICT_PRIMARY_KEY = "field_name"  # reference src/schema_validata.py:64

# ---------------------------------------------------------------------------
# Verdict message templates — copied verbatim (including the double spaces
# and trailing " ." quirks) from reference src/schema_validata.py:67-78 so
# the report layer produces byte-identical overview messages.
# ---------------------------------------------------------------------------
SCHEMA_ERROR_TEMPLATES = {
    "required_column": "Column by name '{col}' is required, but missing in dataset.",
    "optional_column": "Column by name '{col}' is missing in the dataset, but is optional.",
    "allow_null": "Column '{col}' data has {count} null values, null values are not allowed.",
    "data_type": "Column '{col}' data type: {observed} does not match the required data type: {expected} .",
    "unique_value": "Column '{col}' values must be unique. Found  {count} duplicate values in dataset column .",
    "length": "Column '{col}' max string  of: {observed} exceeds the max allowed  of: {expected} .",
    "range_min": "Column '{col}' min value of: {observed} is less than the minimum allowed value of: {expected} .",
    "range_max": "Column '{col}' max value of: {observed} exceeds the maximum allowed value of: {expected} .",
    "allowed_value_list": "Column '{col}' contains values that are not allowed: {err_vals} .",
    "regex_pattern": "Column '{col}' contains values which do not match the allowed format/pattern .",
}

# ---------------------------------------------------------------------------
# Null sentinel vocabulary (string-typed members of the reference list;
# reference src/schema_validata.py:118-121). np.nan / None members of the
# reference list are covered by Column.isNull() on the Spark side.
# ---------------------------------------------------------------------------
NA_VALUES = [
    "", " ", "#N/A", "#N/A N/A", "#NA", "-1.#IND", "-1.#QNAN", "-NaN", "-nan",
    "1.#IND", "1.#QNAN", "<NA>", "N/A", "NA", "NULL", "NaN", "n/a", "nan",
    "null", "Null", "None",
]

# Regex null patterns (reference src/schema_validata.py:124-129). These are
# Python-dialect patterns; they use only constructs with identical semantics
# in Java regex, so they run JVM-side via Column.rlike.
NA_PATTERNS = [
    r"(?i)^\s*NOT\s{0,1}(?:\s|_|-|/|\\|/){1}\s{0,1}AVAILABLE\s*$",
    r"(?i)^\s*N\s{0,1}(?:\s|_|-|/|\\|/){1}\s{0,1}A\s*$",
    r"(?i)^\s*(?:\s|_|-|/|\\|/){1}\s*$",
    r"^\s+$",
]

# ---------------------------------------------------------------------------
# Logical type vocabulary — exactly the reference's seven logical types
# (reference src/schema_validata.py:1150-1212, infer_data_types).
# ---------------------------------------------------------------------------
LOGICAL_TYPES = [
    "Null-Unknown", "Boolean", "Integer", "Float", "Datetime", "String", "Other",
]

# Allowed-casting lattice: observed type -> expected types that do NOT flag a
# data_type error (reference src/schema_validata.py:1782-1790).
ALLOWED_CASTING = {
    "String": ["String"],
    "Float": ["Float", "String"],
    "Boolean": ["Boolean", "String"],
    "Datetime": ["Datetime", "String"],
    "Integer": ["Integer", "Float", "String"],
    "Other": ["String"],
    "Null-Unknown": ["Integer", "Float", "String", "Boolean", "Datetime"],
}

# Checks that produce row-level violation listings (reference §2.5 ops).
ROW_LEVEL_CHECKS = [
    "allow_null", "unique_value", "allowed_value_list", "length",
    "range_min", "range_max", "regex_pattern",
]

# Default checks suppressed in row-level listing (reference
# src/schema_validata.py:2475, get_value_errors ignore_errors default).
DEFAULT_IGNORE_ERRORS = ["allow_null"]

# Cap on captured allowed-value lists during profiling (reference
# src/schema_validata.py:1344, build_data_dictionary max_unique_vals).
MAX_UNIQUE_VALS = 100

# Row-level error-type labels, byte-identical to the reference emitters:
# 'Null Value' (src/schema_validata.py:2187), 'Duplicate Value' (2231),
# 'Unallowed Value' (2283), 'Value Exceeds Max Length ({n})' (2338),
# 'Below Minimum Allowed Value ({v})' / 'Exceeds Maximum Allowed Value ({v})'
# (2399/2402), 'Invalid Value Formatting' (2459). Parameterized labels are
# produced by functions below.
ERROR_TYPE_LABELS = {
    "allow_null": "Null Value",
    "unique_value": "Duplicate Value",
    "allowed_value_list": "Unallowed Value",
    "regex_pattern": "Invalid Value Formatting",
}


def length_error_type(max_length) -> str:
    """Reference src/schema_validata.py:2338."""
    return f"Value Exceeds Max Length ({max_length})"


def range_error_type(test_type: str, value) -> str:
    """Reference src/schema_validata.py:2397-2402."""
    if test_type == "min":
        return f"Below Minimum Allowed Value ({value})"
    if test_type == "max":
        return f"Exceeds Maximum Allowed Value ({value})"
    raise ValueError("test_type must be either 'min' or 'max'")
