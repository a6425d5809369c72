"""Report sinks — the reference's report emitters re-expressed for a
distributed engine.

* ``write_report_json`` — the full nested result dict to
  ``{out_name}_({uid}).json``, matching the reference's validate_dataset
  JSON sink naming (src/schema_validata.py:2704-2710).
* ``errors_overview`` — the 'Errors Overview' sheet of
  schema_validation_to_xlsx (:2758-2789) as a tiny DataFrame-able list:
  one row per (dataset, column, error type) with the formatted message.
* ``write_report`` — JSON + overview CSV + the (possibly huge)
  violations as parquet. XLSX (the reference's sink, :2715-2816, with
  its 1,048,575-row sheet chunking) is gated behind an openpyxl
  import-try: a 10^12-row engine reports to tables, and renders xlsx
  only for small human-facing extracts when the library exists.
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

    try:  # optional xlsx extract (small data only)
        import openpyxl  # noqa: F401
        import pandas as pd
        xpath = os.path.join(out_dir, f"{out_name}_({result.uid}).xlsx")
        with pd.ExcelWriter(xpath) as xw:
            pd.DataFrame(rows).to_excel(xw, sheet_name="Errors Overview",
                                        index=False)
        paths["xlsx"] = xpath
    except ImportError:
        pass
    return paths
