from .nulls import is_na_expr, canonicalize_na
from .typing import type_probe_aggs, decide_logical_type, spark_type_to_logical

__all__ = [
    "is_na_expr", "canonicalize_na",
    "type_probe_aggs", "decide_logical_type", "spark_type_to_logical",
]
