"""Schema-evolution diff between two table snapshots — the Iceberg-era
counterpart of the reference's expected-vs-observed dtype verdicts
(src/schema_validata.py:1178-1286 compares one dataset against a data
dictionary; at 10^12-turn scale the question is just as often "what
changed between snapshot N-1 and N": a column added, dropped, or
silently retyped by an upstream writer).

This is a pure METADATA operation: both inputs contribute only their
``DataFrame.schema`` (an Iceberg/parquet catalog call — zero data is
scanned at any table size); the diff materializes as a tiny DataFrame
so it composes with the rest of the engine (joins into reports,
expectation checks on the `status` column, manifest persistence).

Type names are normalized to a SQL-ish canonical vocabulary
(string→varchar, long→bigint, int→integer, …) so the output is
engine-portable — the same names DuckDB's DESCRIBE prints, which is
what makes the operator oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Spark simpleString -> canonical SQL type name (DuckDB DESCRIBE casing,
# lowered). Complex/parameterized types pass through unchanged.
_CANON = {
    "string": "varchar",
    "long": "bigint",
    "bigint": "bigint",
    "int": "integer",
    "integer": "integer",
    "short": "smallint",
    "byte": "tinyint",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
    "binary": "blob",
}


def canonical_type(dt: T.DataType) -> str:
    if isinstance(dt, T.ArrayType):
        return f"{canonical_type(dt.elementType)}[]"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    s = dt.simpleString()
    return _CANON.get(s, s)


def schema_diff(spark: SparkSession, df_a: DataFrame,
                df_b: DataFrame) -> DataFrame:
    """Column-level diff of ``df_a`` (old snapshot) vs ``df_b`` (new).

    Output: (column_name, type_a, type_b, status) with status one of
    ``added`` (only in B), ``removed`` (only in A), ``type_changed``,
    ``unchanged``. One row per column name appearing in either schema;
    types are canonical names (see module docstring).
    """
    a = {f.name: canonical_type(f.dataType) for f in df_a.schema.fields}
    b = {f.name: canonical_type(f.dataType) for f in df_b.schema.fields}
    rows = []
    for name in sorted(set(a) | set(b)):
        ta, tb = a.get(name), b.get(name)
        if ta is None:
            status = "added"
        elif tb is None:
            status = "removed"
        elif ta != tb:
            status = "type_changed"
        else:
            status = "unchanged"
        rows.append((name, ta, tb, status))
    schema = T.StructType([
        T.StructField("column_name", T.StringType(), False),
        T.StructField("type_a", T.StringType(), True),
        T.StructField("type_b", T.StringType(), True),
        T.StructField("status", T.StringType(), False),
    ])
    return spark.createDataFrame(rows, schema)
