from .profile import profile, profile_stats_df
from .verdicts import validate_schema, schema_validate_attribute
from .violations import value_errors_df, violation_plan_for
from .uniqueness import duplicate_stats, composite_duplicates
from .integrity import referential_violations

__all__ = [
    "profile", "profile_stats_df",
    "validate_schema", "schema_validate_attribute",
    "value_errors_df", "violation_plan_for",
    "duplicate_stats", "composite_duplicates",
    "referential_violations",
]
