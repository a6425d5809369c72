"""Semi-structured payload validation: schema-on-read checks over JSON
string columns (event properties, tool-call arguments, API payloads).

Transcript/event tables routinely carry a free-form JSON column
(`props`, tool arguments) that the fixed-schema validator can't see
into; a pipeline needs to know (a) what fraction of payloads even parse,
(b) whether required keys are present and well-typed, and (c) the value
distribution of extracted keys — all without a pre-declared struct
schema (payload shapes drift per event_type).

SCALE DESIGN: everything here is `get_json_object` / `try_cast` Column
expressions — JVM-side SimpleJson path extraction inside the scan stage
(whole-stage codegen, no Python, no shuffle before the final
per-group combine). Extracting k keys costs k passes over each payload
string; for hot multi-key extraction prefer one `from_json` with an
explicit schema — this module is the schemaless audit path. The
per-group aggregate is a standard partial+final hash agg on the
(low-cardinality) group key.

No reference counterpart (the reference validates flat spreadsheet
columns only) — engine-level addition in the spirit of SURVEY §2's
expectations layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.colref import qcol


def json_is_valid(col: Column | str) -> Column:
    """Boolean Column: the string parses as a JSON document.
    `get_json_object(s, '$')` returns NULL exactly when the payload is
    unparseable (and NULL for NULL input) — no exceptions, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & F.get_json_object(c, "$").isNotNull()


def json_payload_stats(df: DataFrame, json_col: str, group_col: str,
                       key: str) -> DataFrame:
    """Per-group JSON payload health: row count, parseable count,
    presence count of ``$.key``, numeric-typed count of its value, and
    its mean — ONE aggregate pass.

    Output: (group, n_rows, n_valid_json, n_with_key, n_numeric,
    avg_value rounded to 6)."""
    c = F.col(json_col)
    val = F.get_json_object(c, f"$.{key}")
    num = val.try_cast("double")
    return (df.groupBy(F.col(group_col))
              .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                   F.sum(json_is_valid(c).cast("int")).cast("bigint")
                    .alias("n_valid_json"),
                   F.count(val).cast("bigint").alias("n_with_key"),
                   F.count(num).cast("bigint").alias("n_numeric"),
                   F.round(F.avg(num), 6).alias("avg_value"))
              .orderBy(group_col))


def json_payload_violations(df: DataFrame, json_col: str, id_col: str,
                            required_keys: list[str],
                            numeric_keys: list[str] | None = None
                            ) -> DataFrame:
    """Row-level JSON payload violations, one row per (row, reason):

    * ``invalid_json``      — payload present but unparseable;
    * ``missing:<key>``     — required key absent (or payload NULL);
    * ``non_numeric:<key>`` — key present but its value doesn't cast
      to double.

    Mirrors the engine's value_errors listing style (id + reason tag);
    built as an array-of-conditions → filter → explode so every reason
    is evaluated in the same single scan."""
    c = F.col(json_col)
    valid = json_is_valid(c)
    conds: list[Column] = [
        F.when(c.isNotNull() & ~valid, F.lit("invalid_json"))]
    for k in required_keys:
        conds.append(F.when(F.get_json_object(c, f"$.{k}").isNull(),
                            F.lit(f"missing:{k}")))
    for k in (numeric_keys or []):
        v = F.get_json_object(c, f"$.{k}")
        conds.append(F.when(v.isNotNull()
                            & v.try_cast("double").isNull(),
                            F.lit(f"non_numeric:{k}")))
    reasons = F.filter(F.array(*conds), lambda r: r.isNotNull())
    return (df.select(F.col(id_col), reasons.alias("__r"))
              .where(F.size("__r") > 0)
              .select(id_col, F.explode("__r").alias("reason")))


def json_key_profile(df: DataFrame, json_col: str) -> DataFrame:
    """Schema-on-read KEY-SET profile of a JSON payload column: every
    key observed at the top level of object payloads, with its
    occurrence count and share of object rows — the discovery step
    that tells you WHICH keys exist (and how consistently) before
    json_payload_stats/violations can check any specific one, and the
    frame a schema-evolution diff of semi-structured payloads runs on
    (two snapshots' key profiles full-join like schema_diff).

    Row universe: payloads that parse as a JSON OBJECT (scalars,
    arrays, malformed text, and NULLs are excluded from both numerator
    and denominator — ``json_object_keys`` returns NULL for all of
    them, the engine-portable definition). An empty object ``{}``
    counts in the denominator and contributes no keys. ``n_rows``
    counts key OCCURRENCES (a duplicated key inside one object — legal
    JSON — counts twice).

    Output: (key, n_rows, share) — share of object rows, 6dp;
    descending by count, key-tiebroken.

    SCALE: key extraction is a JVM-side expression in the scan
    (payload text never leaves the stage); ``posexplode_outer`` emits
    only the short key strings, which hash-aggregate on the bounded
    key vocabulary. The object-row denominator is recovered FROM the
    aggregated frame (Σ first-key flags + Σ empty-object flags), so
    the raw table is scanned exactly ONCE — no second counting job,
    no persist."""
    keys = F.json_object_keys(F.col(json_col))
    ex = (df.where(keys.isNotNull())
            .select(F.posexplode_outer(keys).alias("pos", "key")))
    g = (ex.groupBy("key")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum(F.when(F.col("pos") == 0, 1).otherwise(0))
                 .alias("__firsts"),
                F.sum(F.when(F.col("pos").isNull(), 1).otherwise(0))
                 .alias("__empties")))
    total = g.agg(F.sum(F.col("__firsts") + F.col("__empties"))
                   .cast("double").alias("__n_obj"))
    return (g.where(F.col("key").isNotNull())
             .crossJoin(F.broadcast(total))
             .select("key", "n_rows",
                     F.round(F.col("n_rows") / F.col("__n_obj"), 6)
                      .alias("share"))
             .orderBy(F.desc("n_rows"), "key"))


def tool_arg_conformance(df: DataFrame, tool_col: str, json_col: str,
                         required: dict[str, list[str]]) -> DataFrame:
    """Per-TOOL JSON argument conformance: each tool name carries its
    own required-key contract (``{"search": ["query"], "calc":
    ["expr", "precision"]}``) — the transcript-native generalization
    of ``json_payload_violations``'s single global key list, because a
    tool-call column's schema is keyed by WHICH tool was called.

    Per tool in ``required``, one output row:
      n_calls        rows naming the tool
      n_parse_fail   payload present but unparseable
      n_missing      parseable (or NULL) payload lacking ≥1 required
                     key — a NULL payload misses every key
      missing_share  n_missing / n_calls, 6dp

    Tools observed in the data but absent from ``required`` are
    reported with zero-contract columns NULL (they appear, so coverage
    gaps are visible, but nothing is asserted about them). Tools in
    ``required`` but absent from the data emit nothing — count
    presence with filter_funnel / expectations if required.

    SCALE: key probes are ``get_json_object`` expressions in the scan
    gated per-tool by a CASE on ``tool_col``; ONE hash aggregate on
    the (bounded) tool vocabulary. Payload text never shuffles."""
    if not required:
        raise ValueError("tool_arg_conformance needs at least one "
                         "tool contract")
    c = F.col(json_col)
    t = qcol(tool_col)
    valid = json_is_valid(c)
    parse_fail = (c.isNotNull() & ~valid).cast("int")
    # per-tool missing flag: CASE over the contract map
    missing: Column = F.lit(None).cast("int")
    for tool, keys in required.items():
        probe = F.lit(False)
        for k in keys:
            probe = probe | F.get_json_object(c, f"$.{k}").isNull()
        # unparseable payloads are counted by parse_fail, not missing
        missing = F.when(t == F.lit(tool),
                         ((c.isNull() | valid) & probe).cast("int")) \
                   .otherwise(missing)
    has_contract = t.isin(list(required))
    return (df.groupBy(t.alias("tool"))
              .agg(F.count(F.lit(1)).cast("bigint").alias("n_calls"),
                   F.when(F.max(has_contract.cast("int")) == 1,
                          F.sum(parse_fail)).cast("bigint")
                    .alias("n_parse_fail"),
                   F.sum(missing).cast("bigint").alias("n_missing"))
              .select("tool", "n_calls", "n_parse_fail",
                      "n_missing",
                      F.round(F.col("n_missing") / F.col("n_calls"), 6)
                       .alias("missing_share"))
              .orderBy("tool"))


_FLATTEN_TYPES = {"string", "bigint", "int", "double", "boolean"}


def json_flatten(df: DataFrame, json_col: str,
                 fields: dict[str, tuple[str, str]],
                 drop_payload: bool = False) -> DataFrame:
    """Materialize JSON payload keys as TYPED COLUMNS — the extraction
    step that closes the semistructured loop (json_key_profile
    discovers, json_payload_stats/violations audit, this one makes the
    keys first-class so every flat-column operator in the engine —
    profile, drift, expectations — applies to them).

    ``fields`` maps output column name → (JSONPath, type); extraction
    is ``get_json_object`` + ``try_cast``, so a missing key, a
    non-object payload, or a type mismatch yields NULL in that column
    (never an error — route rows through ``json_payload_violations``
    for the audit trail). A ``json_ok`` boolean marks payloads that
    parse at all; NULL payloads get NULL everywhere.

    SCALE: pure scan-stage Column expressions (SimpleJson path walk +
    cast inside whole-stage codegen) — map-only, no shuffle, no
    Python. k fields cost k passes over each payload string; for hot
    fixed-schema extraction switch to one ``from_json`` (this is the
    schemaless audit path, same contract as the module header)."""
    if not fields:
        raise ValueError("fields must be non-empty")
    for name, (path, typ) in fields.items():
        if typ not in _FLATTEN_TYPES:
            raise ValueError(f"unsupported type {typ!r} for {name!r} "
                             f"(use one of {sorted(_FLATTEN_TYPES)})")
    p = F.col(json_col)
    cols = list(df.columns)
    if drop_payload:
        cols.remove(json_col)
    out = [F.col(c) for c in cols]
    out.append(F.when(p.isNotNull(), json_is_valid(p)).alias("json_ok"))
    for name, (path, typ) in fields.items():
        raw = F.get_json_object(p, path)
        out.append(raw.try_cast(typ).alias(name))
    return df.select(*out)


def json_flatten_auto(df: DataFrame, json_col: str,
                      top_k: int = 16,
                      min_share: float = 0.01) -> DataFrame:
    """Discovery-driven flatten: profile the payload's top-level keys
    (``json_key_profile``), keep the ``top_k`` most frequent with
    share >= ``min_share``, and flatten them AS STRINGS (the caller
    casts once real types are known). The key-profile collect is
    key-vocabulary-sized (manifest-scale); the flatten itself is the
    same map-only scan as ``json_flatten``. Column names are the keys
    prefixed with ``j_`` to avoid colliding with table columns."""
    prof = (json_key_profile(df, json_col)
            .where(F.col("share") >= F.lit(float(min_share)))
            .limit(int(top_k)).collect())
    if not prof:
        raise ValueError("json_flatten_auto: no keys at that share")
    fields = {f"j_{r['key']}": (f"$.{r['key']}", "string")
              for r in prof}
    return json_flatten(df, json_col, fields)
