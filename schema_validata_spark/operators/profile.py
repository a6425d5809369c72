"""Column profiling: the reference's ``build_data_dictionary``
(src/schema_validata.py:1344-1473) re-expressed as O(1) Spark jobs.

The reference loops columns in pandas, calling ``duplicated()``,
``nunique()``, ``to_numeric()`` per column (O(cols) passes, single
node). Here:

* **Pass A** — ONE wide ``df.agg(...)`` computing, for every column at
  once: non-null count, max display length, numeric min/max, whole-number
  flag, approx distinct (HLL), boolean min/max, null-likeness and (for
  string-typed columns) the type-inference probe counts. Partial+final
  hash aggregate, no shuffle of row data, whole-stage codegen.
* **Pass B** — ONE melt ("stack") shuffle giving exact per-column
  ``duplicate_count`` (pandas ``duplicated(keep=False).sum()`` semantics:
  every member of every duplicate group counts) and exact distinct
  counts. Group key is ``(column, prefix32, xxhash64)`` so long text
  values don't travel through the shuffle; map-side partial aggregation
  collapses hot values, so a skewed value (e.g. one role in 10^11 rows)
  reaches the reducer as one partial row per map task — no salting
  needed for pure counting.
* **Pass C** — allowed-value capture (``sort_array(collect_set)``), run
  ONLY for columns whose exact distinct count ≤ ``max_unique_vals`` —
  low-cardinality by construction, so the collect is tiny.

At 10^12 rows this is 3 jobs total, independent of column count.
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import DataFrame, functions as F

from ..config import MAX_UNIQUE_VALS
from ..functions.nulls import canonicalize_na, is_na_expr
from ..functions.typing import (decide_logical_type, spark_type_to_logical,
                                type_probe_aggs)

_PROBES = ["nonnull", "int_ok", "float_ok", "bool_ok", "ts_ok", "lead0"]


def _pass_a(df: DataFrame, infer_types: bool) -> dict[str, Any]:
    aggs = [F.count(F.lit(1)).alias("__total")]
    for f in df.schema.fields:
        c, name = F.col(f.name), f.name
        is_str = f.dataType.simpleString() == "string"
        s = c.cast("string")
        d = (F.trim(s)).try_cast("double")
        aggs += [
            F.count(c).alias(f"{name}__nonnull"),
            F.max(F.length(s)).alias(f"{name}__maxlen_raw"),
            # display length when the column is all whole numbers (the
            # reference casts such series to int before measuring length,
            # src/schema_validata.py:1445-1449,1462-1470)
            F.max(F.length((d).try_cast("bigint").cast("string")))
             .alias(f"{name}__maxlen_int"),
            F.min(d).alias(f"{name}__num_min"),
            F.max(d).alias(f"{name}__num_max"),
            F.min(F.when(d.isNotNull(), (d == F.floor(d)).cast("int")))
             .alias(f"{name}__allint"),
            F.approx_count_distinct(c).alias(f"{name}__approx_distinct"),
            F.max((F.lower(F.trim(s))).try_cast("boolean").cast("int"))
             .alias(f"{name}__bool_max"),
            F.min((F.lower(F.trim(s))).try_cast("boolean").cast("int"))
             .alias(f"{name}__bool_min"),
        ]
        if is_str and infer_types:
            aggs += type_probe_aggs(name, c)
    return df.agg(*aggs).collect()[0].asDict()


def _pass_b(df: DataFrame) -> dict[str, dict[str, int]]:
    """Exact distinct + duplicate-member counts for all columns in one
    shuffle via melt. Returns {col: {distinct, dup_members}}."""
    cols = df.columns
    n = len(cols)
    stack_args = ", ".join(
        f"'{c}', struct(substring(cast(`{c}` as string), 1, 32) as p, "
        f"xxhash64(cast(`{c}` as string)) as h)" for c in cols)
    melted = df.selectExpr(
        f"stack({n}, {stack_args}) as (cname, vkey)").where(
        "vkey.h is not null and vkey.p is not null")
    per_value = melted.groupBy("cname", "vkey").agg(F.count(F.lit(1)).alias("cnt"))
    per_col = per_value.groupBy("cname").agg(
        F.count(F.lit(1)).alias("distinct"),
        F.coalesce(F.sum(F.when(F.col("cnt") > 1, F.col("cnt"))), F.lit(0))
         .alias("dup_members"),
    )
    return {r["cname"]: {"distinct": r["distinct"],
                         "dup_members": r["dup_members"]}
            for r in per_col.collect()}


def _pass_c(df: DataFrame, cols: list[str]) -> dict[str, list[str]]:
    """Distinct values for known-low-cardinality columns (≤ max_unique_vals
    by the pass-B gate) — one small agg."""
    if not cols:
        return {}
    aggs = [F.sort_array(F.collect_set(F.col(c).cast("string"))).alias(c)
            for c in cols]
    row = df.agg(*aggs).collect()[0].asDict()
    return {c: list(row[c]) for c in cols}


def _downcast(v):
    """Reference downcast_ints (src/schema_validata.py:304-324): 12.0 → 12."""
    if isinstance(v, float) and not math.isnan(v) and v == int(v):
        return int(v)
    return v


def profile(df: DataFrame,
            max_unique_vals: int = MAX_UNIQUE_VALS,
            false_val="False", true_val="True", na_val=None,
            infer_types: bool | None = None,
            na_values=None, na_patterns=None) -> dict[str, dict[str, Any]]:
    """Observed schema: ``{column: column_info}`` with the exact shape and
    quirks of the reference's build_data_dictionary output
    (src/schema_validata.py:1395-1473), including:

    * all-null columns → data_type 'Null-Unknown', required=false_val,
      duplicate_count 0, stats = na_val;
    * duplicate_count counts every member of each duplicate group;
    * range_min/range_max populated only when ALL non-null values are
      numeric (pandas ``to_numeric`` raises on any bad value → na_val);
    * allowed_value_list captured only for String/Integer-like columns
      with ≤ max_unique_vals distinct values; integer lists sorted
      numerically, others lexicographically;
    * length measured on int-cast strings when the column is all whole
      numbers.
    """
    raw = df
    canon = canonicalize_na(df, na_values=na_values, na_patterns=na_patterns)

    # allow_null (observed) is measured on the RAW column with the extended
    # null vocabulary (reference series_hasNull on the unconverted column).
    null_like_aggs = [
        F.max(is_na_expr(F.col(f.name), na_values, na_patterns).cast("int"))
         .alias(f.name)
        if f.dataType.simpleString() == "string"
        else F.max(F.col(f.name).isNull().cast("int")).alias(f.name)
        for f in raw.schema.fields
    ]

    infer = infer_types if infer_types is not None else True
    a = _pass_a(canon, infer)
    nulls_row = raw.agg(*null_like_aggs).collect()[0].asDict()
    b = _pass_b(canon)

    total = a["__total"]
    out: dict[str, dict[str, Any]] = {}
    cand_allowed: list[str] = []

    for f in df.schema.fields:
        name = f.name
        nonnull = a[f"{name}__nonnull"]
        if nonnull == 0:
            out[name] = {
                "field_name": name, "data_type": "Null-Unknown",
                "allow_null": true_val, "null_count": int(total),
                "duplicate_count": 0, "length": na_val,
                "range_min": na_val, "range_max": na_val,
                "regex_pattern": na_val, "unique_value": na_val,
                "allowed_value_list": na_val, "required": false_val,
            }
            continue

        if f.dataType.simpleString() == "string" and infer:
            probes = {p: a.get(f"{name}__{p}") or 0 for p in _PROBES}
            dtype = decide_logical_type(probes)
        else:
            dtype = spark_type_to_logical(f.dataType)

        allint = a[f"{name}__allint"] == 1
        all_numeric = (dtype in ("Integer", "Float", "Boolean")
                       or (f.dataType.simpleString() != "string"))
        if f.dataType.simpleString() == "string":
            all_numeric = (a.get(f"{name}__float_ok") or 0) == nonnull
        if dtype == "Boolean" and f.dataType.simpleString() == "boolean":
            rmin, rmax = a[f"{name}__bool_min"], a[f"{name}__bool_max"]
        elif all_numeric:
            rmin = _downcast(a[f"{name}__num_min"])
            rmax = _downcast(a[f"{name}__num_max"])
        else:
            rmin = rmax = na_val
        if rmin is None:
            rmin = na_val
        if rmax is None:
            rmax = na_val

        # int-display lengths/lists apply only to genuinely numeric
        # columns (Integer/Float inference or numeric physical type) —
        # NOT to leading-zero-forced String columns (reference
        # src/schema_validata.py:957-971,1445-1449)
        int_like = dtype == "Integer" or (dtype in ("Float", "Boolean")
                                          and all_numeric and allint)
        length = (a[f"{name}__maxlen_int"]
                  if (int_like and allint and a[f"{name}__maxlen_int"] is not None)
                  else a[f"{name}__maxlen_raw"])

        dups = b.get(name, {}).get("dup_members", 0)
        distinct = b.get(name, {}).get("distinct", 0)

        info = {
            "field_name": name, "data_type": dtype,
            "allow_null": true_val if nulls_row[name] else false_val,
            "null_count": int(total - nonnull),
            "duplicate_count": int(dups),
            "length": int(length) if length is not None else na_val,
            "range_min": rmin, "range_max": rmax,
            "regex_pattern": na_val,
            "unique_value": true_val if dups == 0 else false_val,
            "allowed_value_list": na_val,
            "required": true_val,
        }
        # allowed-value capture gate (reference :1445-1460): String /
        # Integer-like (incl. whole-number numerics) with ≤ cap distinct
        if (dtype in ("String",) or int_like) and distinct <= max_unique_vals:
            cand_allowed.append(name)
            info["__int_like"] = int_like
        out[name] = info

    values = _pass_c(canon, cand_allowed)
    for name, vals in values.items():
        int_like = out[name].pop("__int_like", False)
        if int_like:
            try:
                out[name]["allowed_value_list"] = sorted(
                    int(float(v)) for v in vals)
            except ValueError:
                out[name]["allowed_value_list"] = sorted(vals)
        else:
            out[name]["allowed_value_list"] = sorted(vals)
    for info in out.values():
        info.pop("__int_like", None)
    return out


def profile_stats_df(spark, df: DataFrame, round_to: int = 4) -> DataFrame:
    """Long-format profiling stats as a (tiny) DataFrame — one row per
    column — for report sinks and the oracle-checked query surface."""
    prof = profile(df)
    rows = []
    for name, info in prof.items():
        def fnum(v):
            if v is None or isinstance(v, str):
                return None
            return round(float(v), round_to)
        rows.append((
            name, info["data_type"],
            int(info["null_count"]), int(info["duplicate_count"]),
            None if isinstance(info["length"], str) or info["length"] is None
            else int(info["length"]),
            fnum(info["range_min"]), fnum(info["range_max"]),
            info["unique_value"] if isinstance(info["unique_value"], str) else None,
        ))
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("column_name", T.StringType()),
        T.StructField("data_type", T.StringType()),
        T.StructField("null_count", T.LongType()),
        T.StructField("duplicate_count", T.LongType()),
        T.StructField("max_length", T.IntegerType()),
        T.StructField("range_min", T.DoubleType()),
        T.StructField("range_max", T.DoubleType()),
        T.StructField("unique_value", T.StringType()),
    ])
    return spark.createDataFrame(rows, schema)
