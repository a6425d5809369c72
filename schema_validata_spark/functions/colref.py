"""Dot-safe column references.

Spreadsheet headers legally contain dots ('No.', 'price.usd'), which
both ``F.col(name)`` (struct-field parse) and ``df[name]``
(``Dataset.apply`` attribute-name parse) reject or misresolve. A
backtick-quoted identifier treats the content literally; backticks
inside the name are escaped by doubling (Spark identifier rules).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def qcol(name: str) -> Column:
    """``F.col`` on the EXACT column name, whatever characters it has."""
    return F.col("`" + name.replace("`", "``") + "`")
