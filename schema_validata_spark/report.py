"""Report sinks — the reference's report emitters re-expressed for a
distributed engine.

* ``write_report_json`` — the full nested result dict to
  ``{out_name}_({uid}).json``, matching the reference's validate_dataset
  JSON sink naming (src/schema_validata.py:2704-2710).
* ``errors_overview`` — the 'Errors Overview' sheet of
  schema_validation_to_xlsx (:2758-2789) as a tiny DataFrame-able list:
  one row per (dataset, column, error type) with the formatted message.
* ``write_report`` — JSON + overview CSV + the (possibly huge)
  violations as parquet + the full XLSX report.
* ``schema_validation_to_xlsx`` / ``write_dataframes_to_xlsx`` — the
  reference's xlsx report sink (:2715-2816) including the Metadata
  sheet, per-dataset value-error sheets and the 1,048,575-row sheet
  chunking (:1574-1620), over the stdlib OOXML writer
  (sources/xlsx.py — openpyxl is absent in this environment). A
  10^12-row engine reports to tables; xlsx is the small human-facing
  extract (value errors are driver-capped upstream).
"""

from __future__ import annotations

import json
import os
from typing import Any

from .validate import ValidationResult


def errors_overview(report: dict[str, Any]) -> list[dict[str, Any]]:
    """Rows: Dataset / Column / Status / Required / Error Type / Error
    (reference :2758-2789)."""
    rows = []
    for uid, run in report.items():
        for ds, res in run.get("results", {}).items():
            for col, info in res.get("schema_violations", {}).items():
                for attr, err in info.items():
                    if attr in ("status", "required"):
                        continue
                    rows.append({
                        "Dataset": ds, "Column": col,
                        "Status": info.get("status"),
                        "Required": info.get("required"),
                        "Error Type": attr,
                        "Error": err.get("errors")
                        if isinstance(err, dict) else err,
                    })
    return rows


def append_run_log(result: ValidationResult, log_dir: str, spark=None,
                   extra: dict[str, Any] | None = None) -> dict[str, str]:
    """Cross-run rolling error + metadata log — the reference example's
    accumulating log tables ("schema_validata example (reports).py":
    395-400 error log with uuid/file/column/error_type/error_message
    upserted on uuid; :459-465 one metadata row per run uid) as two
    parquet tables under ``log_dir``:

    * ``error_log/``: one row per (column, error_type) schema
      violation of this run — (run_uid, dataset, column, error_type,
      error_message, ts).
    * ``run_log/``: ONE row per run — (run_uid, dataset, error_count,
      has_schema_errors, passed, extra, ts); ``extra`` carries
      caller context (the reference's state/file/review fields) as a
      JSON string.

    IDEMPOTENT BY RUN UID, the reference's upsert semantics done the
    Spark-native way: both tables are PARTITIONED on run_uid and
    written with dynamic partition overwrite — re-logging the same run
    replaces exactly that uid's partition and never rewrites other
    runs. The uid is content-derived (data × rules), so identical
    re-runs converge to identical KEYS and error/metadata content;
    the ``ts`` column is deliberately NOT part of run identity — it
    records the LAST wall-clock time the run was logged (each
    re-log rewrites the partition with a fresh stamp). Consequence
    for ``run_log_regressions``: its (ts, run_uid) ordering reflects
    logging order, so re-logging old runs out of order moves them in
    the comparison sequence — re-log in run order, or treat ts as
    "last seen", not "first run". At fleet scale this is an
    ordinary partition-pruned parquet table: per-run writes touch one
    partition, dashboard reads filter on run_uid/ts, and there is no
    read-modify-write of history (the reference's pandas upsert
    rewrites the whole CSV every run).

    Returns ``{"error_log": path, "run_log": path}``."""
    from datetime import datetime, timezone

    if spark is None:
        if result.violations is None:
            raise ValueError("pass spark= when the result carries no "
                             "violations DataFrame")
        spark = result.violations.sparkSession
    ts = datetime.now(timezone.utc).replace(tzinfo=None)

    err_rows = []
    for col, info in (result.schema_violations or {}).items():
        for attr, err in info.items():
            if attr in ("status", "required"):
                continue
            msg = err.get("errors") if isinstance(err, dict) else err
            if msg:
                err_rows.append((result.uid, result.dataset_name, col,
                                 attr, str(msg), ts))
    err_schema = ("run_uid string, dataset string, column string, "
                  "error_type string, error_message string, ts timestamp")
    meta_rows = [(result.uid, result.dataset_name, len(err_rows),
                  bool(err_rows), result.passed(),
                  json.dumps(extra or {}, sort_keys=True), ts)]
    meta_schema = ("run_uid string, dataset string, error_count int, "
                   "has_schema_errors boolean, passed boolean, "
                   "extra string, ts timestamp")

    paths = {"error_log": os.path.join(log_dir, "error_log"),
             "run_log": os.path.join(log_dir, "run_log")}
    for rows, schema, path in ((err_rows, err_schema,
                                paths["error_log"]),
                               (meta_rows, meta_schema,
                                paths["run_log"])):
        if rows:
            (spark.createDataFrame(rows, schema)
                  .coalesce(1)
                  .write.partitionBy("run_uid")
                  .option("partitionOverwriteMode", "dynamic")
                  .mode("overwrite").parquet(path))
    return paths


def run_log_regressions(error_log, run_log) -> "Any":
    """Cross-run regression diff over the ``append_run_log`` tables —
    the monitoring question the reference example's accumulating logs
    exist to answer ('did this refresh introduce NEW error kinds?'):
    per (dataset, run), the error-count delta vs the PREVIOUS run of
    that dataset and how many distinct (column, error_type) kinds
    appeared / resolved.

    Inputs are the two DataFrames ``append_run_log`` writes (read them
    back with ``spark.read.parquet``): ``error_log`` (run_uid, dataset,
    column, error_type, ...), ``run_log`` (run_uid, dataset,
    error_count, ..., ts). Runs order by (ts, run_uid) per dataset;
    the FIRST run of a dataset reports NULL prev/delta and its kinds
    as new.

    Output per run: (dataset, run_uid, ts, error_count,
    prev_error_count, delta, n_new_kinds, n_resolved_kinds).

    SCALE: the run_log frame is one row per run — tiny; kinds are
    distinct (run, column, error_type) triples — bounded by columns ×
    check types per run. One window over runs + two aggregated
    anti-joins on the kind frames; nothing row-scale moves."""
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy("dataset").orderBy(
        F.col("ts").asc_nulls_first(), F.col("run_uid").asc())
    runs = (run_log.select("dataset", "run_uid", "ts", "error_count")
                   .withColumn("__prev_uid", F.lag("run_uid").over(w))
                   .withColumn("prev_error_count",
                               F.lag("error_count").over(w)))
    kinds = (error_log.select("dataset", "run_uid", "column",
                              "error_type").distinct())
    cur = kinds.select("dataset", F.col("run_uid").alias("__u"),
                       "column", "error_type")
    prv = kinds.select("dataset", F.col("run_uid").alias("__p"),
                       F.col("column").alias("__pc"),
                       F.col("error_type").alias("__pe"))
    base = runs.select("dataset", "run_uid", "__prev_uid")
    new_k = (base.join(cur, (base["run_uid"] == cur["__u"])
                       & (base["dataset"] == cur["dataset"]))
                 .drop(cur["dataset"])
                 .join(prv, (base["__prev_uid"] == prv["__p"])
                       & (F.col("column") == prv["__pc"])
                       & (F.col("error_type") == prv["__pe"])
                       & (base["dataset"] == prv["dataset"]),
                       "left_anti")
                 .groupBy("dataset", "run_uid")
                 .agg(F.count(F.lit(1)).cast("bigint")
                       .alias("n_new_kinds")))
    res_k = (base.where(F.col("__prev_uid").isNotNull())
                 .join(prv, (base["__prev_uid"] == prv["__p"])
                       & (base["dataset"] == prv["dataset"]))
                 .drop(prv["dataset"])
                 .join(cur, (base["run_uid"] == cur["__u"])
                       & (prv["__pc"] == cur["column"])
                       & (prv["__pe"] == cur["error_type"])
                       & (base["dataset"] == cur["dataset"]),
                       "left_anti")
                 .groupBy("dataset", "run_uid")
                 .agg(F.count(F.lit(1)).cast("bigint")
                       .alias("n_resolved_kinds")))
    return (runs
            .join(new_k, ["dataset", "run_uid"], "left")
            .join(res_k, ["dataset", "run_uid"], "left")
            .select("dataset", "run_uid", "ts",
                    F.col("error_count").cast("bigint")
                     .alias("error_count"),
                    F.col("prev_error_count").cast("bigint")
                     .alias("prev_error_count"),
                    (F.col("error_count") - F.col("prev_error_count"))
                    .cast("bigint").alias("delta"),
                    F.coalesce("n_new_kinds", F.lit(0)).cast("bigint")
                     .alias("n_new_kinds"),
                    F.coalesce("n_resolved_kinds", F.lit(0))
                     .cast("bigint").alias("n_resolved_kinds")))


def write_report(result: ValidationResult, out_dir: str,
                 out_name: str = "validation",
                 max_value_errors: int | None = 100_000) -> dict[str, str]:
    """Write the three report artifacts; returns {artifact: path}."""
    os.makedirs(out_dir, exist_ok=True)
    report = result.report(max_value_errors=max_value_errors)
    paths: dict[str, str] = {}

    jpath = os.path.join(out_dir, f"{out_name}_({result.uid}).json")
    with open(jpath, "w") as f:
        json.dump(report, f, indent=2, default=str)
    paths["json"] = jpath

    rows = errors_overview(report)
    cpath = os.path.join(out_dir, f"{out_name}_errors_overview.csv")
    import csv
    with open(cpath, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["Dataset", "Column", "Status",
                                          "Required", "Error Type", "Error"])
        w.writeheader()
        w.writerows(rows)
    paths["overview_csv"] = cpath

    if result.violations is not None:
        vpath = os.path.join(out_dir, f"{out_name}_value_errors.parquet")
        result.violations.write.mode("overwrite").parquet(vpath)
        paths["violations_parquet"] = vpath

    paths["xlsx"] = schema_validation_to_xlsx(report, out_dir, out_name)
    return paths


MAX_ROWS_EXCEL = 1_048_575   # reference src/schema_validata.py:1574
MAX_COLS_EXCEL = 16_383      # reference src/schema_validata.py:1575


def write_dataframes_to_xlsx(dataframes: dict[str, list[dict]],
                             out_dir: str, out_name: str,
                             sheet_order: list[str] | None = None) -> str:
    """The reference's write_dataframes_to_xlsx (src/schema_validata.py:
    1546-1627) over the stdlib writer (sources/xlsx.py — openpyxl is
    absent here): sheets exceeding Excel's 1,048,575-row limit are split
    into numbered chunks ``{count}_{sheet}`` exactly like the reference
    (:1598-1612). ``dataframes`` maps sheet name → list of row dicts
    (uniform keys define the header)."""
    if not out_name.endswith(".xlsx"):
        out_name = f"{out_name}.xlsx"
    os.makedirs(out_dir, exist_ok=True)
    output_path = os.path.join(out_dir, out_name)
    order = sheet_order or list(dataframes)

    def _grid(recs: list[dict]) -> list[list]:
        if not recs:
            return []
        hdr: list[str] = []
        for r in recs:
            for k in r:
                if k not in hdr:
                    hdr.append(k)
        return [hdr] + [[r.get(k) for k in hdr] for r in recs]

    sheets: dict[str, list[list]] = {}
    final_order: list[str] = []
    for sheet_name in order:
        recs = dataframes[sheet_name]
        if len(recs) > MAX_ROWS_EXCEL:
            count = 1
            for i in range(0, len(recs), MAX_ROWS_EXCEL):
                nm = f"{count}_{sheet_name}"
                sheets[nm] = _grid(recs[i:i + MAX_ROWS_EXCEL])
                final_order.append(nm)
                count += 1
        else:
            sheets[sheet_name] = _grid(recs)
            final_order.append(sheet_name)

    from .sources.xlsx import write_xlsx
    return write_xlsx(output_path, sheets, final_order)


def dataset_schema_to_xlsx(observed: dict[str, dict[str, Any]],
                           out_dir: str, out_name: str,
                           sheet_name: str = "SCHEMA") -> str:
    """Data-dictionary starter workbook from a profiled table — the
    reference's dataset_schema_to_xlsx (src/schema_validata.py:
    1632-1685): one row per column in the DATA_DICT_SCHEMA layout, ready
    for a human to author into an authoritative dictionary and load back
    via Rules.from_xlsx. ``observed`` is profile()'s output."""
    from .config import DATA_DICT_SCHEMA
    cols = list(DATA_DICT_SCHEMA)
    recs = []
    for name, info in observed.items():
        rec = {}
        for c in cols:
            v = info.get(c) if c != "field_name" else name
            if isinstance(v, list):
                v = str(v)   # list cells round-trip via literal revival
            rec[c] = v
        recs.append(rec)
    return write_dataframes_to_xlsx({sheet_name: recs}, out_dir, out_name,
                                    [sheet_name])


def schema_validation_to_xlsx(validation_results: dict[str, Any],
                              out_dir: str,
                              out_name: str | None = None) -> str:
    """The reference's report renderer (src/schema_validata.py:2715-2816):
    ``Metadata`` sheet (:2742-2753), ``Errors Overview`` with columns
    Dataset/Column/Status/Required/Error Type/Error and title-cased
    status (:2758-2789), one value-errors sheet per dataset sorted by
    its row ordinal ascending (:2792-2806), file named
    ``{out_name}_({uid}).xlsx`` (:2808-2811). Renders the FIRST uid
    only, like the reference (:2740 ``list(...)[0]`` — one report per
    validation run)."""
    if not validation_results:
        raise ValueError("validation_results is empty — pass the dict "
                         "returned by ValidationResult.report()")
    uid = list(validation_results)[0]
    run = validation_results[uid]

    metadata = [{"Item": k, "Attribute": k2, "Value": v2}
                for k in ("run_metadata", "dataset_metadata",
                          "data_dict_metadata")
                for k2, v2 in (run.get(k) or {}).items()]
    rpt_sheets: dict[str, list[dict]] = {"Metadata": metadata}
    sheet_order = ["Metadata"]

    error_ov = []
    for ds, res in run.get("results", {}).items():
        for col, info in (res.get("schema_violations") or {}).items():
            if info.get("status") != "fail":
                continue
            for attr, err in info.items():
                if attr in ("status", "required"):
                    continue
                error_ov.append({
                    "Dataset": str(ds), "Column": str(col),
                    "Status": str(info.get("status")).title(),
                    "Required": str(info.get("required")).title(),
                    "Error Type": str(attr),
                    "Error": str(err.get("errors"))
                    if isinstance(err, dict) else str(err),
                })
    rpt_sheets["Errors Overview"] = error_ov
    sheet_order.append("Errors Overview")

    for ds, res in run.get("results", {}).items():
        ve = res.get("value_errors")
        if not ve:
            continue
        # columnar {col: {row_idx: val}} → records (the reference's
        # to_json round-trip shape, :2595-2602)
        cols = list(ve)
        idxs = sorted(ve[cols[0]], key=lambda s: int(s))
        recs = [{c: ve[c].get(i) for c in cols} for i in idxs]
        sort_key = next((c for c in ("Sheet Row", "sheet_row") if c in cols),
                        None)
        if sort_key:
            recs.sort(key=lambda r: (r[sort_key] is None, r[sort_key]))
        # a dataset literally named 'Metadata'/'Errors Overview' must
        # not overwrite the report sheets (divergence from the
        # reference, which silently loses its Metadata sheet here)
        sheet = str(ds)
        while sheet in rpt_sheets:
            sheet += "_data"
        rpt_sheets[sheet] = recs
        sheet_order.append(sheet)

    name = f"{uid}.xlsx" if not out_name else f"{out_name}_({uid}).xlsx"
    return write_dataframes_to_xlsx(rpt_sheets, out_dir, name, sheet_order)
