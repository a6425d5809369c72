"""Python-regex-dialect parity fallback (SURVEY §2.7).

The reference anchors row-level pattern checks with Python's
``re.match`` (src/schema_validata.py:2448-2452). Most rule patterns use
constructs with identical semantics in Java, so the engine's hot path is
``rlike('^(?:' + pattern + ')')`` — JVM-side, whole-stage codegen. But a
few constructs diverge or are Java syntax errors:

* ``(?P<name>…)`` / ``(?P=name)`` — Python named groups (Java spells
  them ``(?<name>…)``; ``(?P`` is a PatternSyntaxException in Java);
* ``\\Z`` — end-of-string in Python but end-before-final-newline in
  Java (Python's ``\\Z`` is Java's ``\\z``);
* ``(?(id)yes|no)`` conditionals and ``(?#comment)`` — Python-only.

For those patterns the check routes through a vectorized Arrow-batched
pandas UDF running the REAL ``re.match`` — byte-identical semantics,
paid only for the rare divergent pattern, never the common case.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, functions as F

_PY_ONLY = re.compile(r"\(\?P[<=]|\(\?\(|\(\?#|\\Z")


def python_regex_required(pattern: str) -> bool:
    """True when ``pattern`` uses a construct whose semantics (or
    validity) differ between Python ``re`` and Java ``rlike``."""
    return bool(_PY_ONLY.search(pattern))


@lru_cache(maxsize=256)
def _match_udf(pattern: str):
    rx = re.compile(pattern)

    def fn(s: pd.Series) -> pd.Series:
        return s.map(lambda v: bool(rx.match(v)) if v is not None else None)

    from pyspark.sql.functions import pandas_udf
    return pandas_udf(fn, "boolean")


def re_match_expr(col: Column | str, pattern: str) -> Column:
    """Boolean Column with Python ``re.match`` anchoring semantics.

    Dispatches to ``rlike`` (JVM) when the dialects agree, else to the
    pandas-UDF fallback. NULL in → NULL out, matching rlike."""
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")
    if python_regex_required(pattern):
        return _match_udf(pattern)(s)
    return s.rlike(f"^(?:{pattern})")
