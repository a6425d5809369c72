"""Runtime plan audit — the "would this survive 100×" review as an
API instead of a code-review habit.

Every SCALE contract in this engine is visible in the physical plan
(shuffle count, global sorts, nested-loop joins, Python row paths,
scan widths). ``plan_audit`` extracts those facts from a DataFrame's
executed plan; ``assert_scalable`` turns a budget into a hard gate a
pipeline can run in CI or at job start, the same way the test suite's
plan guards do (tests/test_plans.py) but against the caller's OWN
composed query, where operator-level guards can't see the whole.

Honesty note: this parses Spark's plan STRINGS (queryExecution
executedPlan / formatted explain). Those are a stable debugging
surface but not a versioned API — node-name drift across Spark majors
shows up as a failing audit test here, not silent nonsense: the
counters key on node names asserted by this repo's own plan-guard
tests, so a rename breaks both together.
"""

from __future__ import annotations

import io
import re
import contextlib
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanAudit:
    n_exchanges: int = 0
    n_single_partition_exchanges: int = 0
    n_range_exchanges: int = 0          # global sorts shuffle to ranges
    n_sorts: int = 0
    n_broadcast_hash_joins: int = 0
    n_shuffle_joins: int = 0            # SortMergeJoin / ShuffledHashJoin
    n_nested_loop_joins: int = 0        # BroadcastNestedLoop + Cartesian
    n_broadcast_nested_loop_joins: int = 0  # one side broadcast-bounded
    n_cartesian_products: int = 0       # unbounded both sides — the killer
    n_python_evals: int = 0             # row-at-a-time Python (slow path)
    n_arrow_evals: int = 0              # pandas UDF islands (sanctioned)
    n_scans: int = 0
    scan_widths: list = field(default_factory=list)  # columns per scan
    n_codegen_spans: int = 0

    @property
    def has_global_sort(self) -> bool:
        return self.n_range_exchanges > 0


def plan_audit(df: DataFrame, need_formatted: bool = True) -> PlanAudit:
    """Inspect a DataFrame's EXECUTED physical plan and count the
    structures that decide scale behavior. Cheap (no job runs).

    ``need_formatted=False`` skips the ``explain("formatted")`` pass —
    a SECOND full planning of the query, needed only for
    ``scan_widths`` (ReadSchema lines) and the AQE-hidden-leaf scan
    fallback. The default-on entry-point budgets don't gate on scan
    width, so they take the cheap path. CAVEAT on that path:
    ``scan_widths`` stays empty AND ``n_scans`` can read 0 for an AQE
    plan whose tree string hides its FileScan leaves — the fields the
    gated budgets actually use (exchanges, sorts, joins, Python
    evals) come from the tree and are unaffected; pass
    ``need_formatted=True`` (or a ``max_scan_width`` budget) when a
    caller consumes the scan counters."""
    tree = df._jdf.queryExecution().executedPlan().toString()
    if need_formatted:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        formatted = buf.getvalue()
    else:
        formatted = ""

    a = PlanAudit()
    a.n_exchanges = len(re.findall(r"\bExchange ", tree))
    a.n_single_partition_exchanges = tree.count("Exchange SinglePartition")
    a.n_range_exchanges = tree.count("Exchange rangepartitioning")
    a.n_sorts = len(re.findall(r"\bSort \[", tree))
    a.n_broadcast_hash_joins = tree.count("BroadcastHashJoin")
    a.n_shuffle_joins = (tree.count("SortMergeJoin")
                         + tree.count("ShuffledHashJoin"))
    a.n_broadcast_nested_loop_joins = tree.count("BroadcastNestedLoopJoin")
    a.n_cartesian_products = tree.count("CartesianProduct")
    a.n_nested_loop_joins = (a.n_broadcast_nested_loop_joins
                             + a.n_cartesian_products)
    a.n_python_evals = tree.count("BatchEvalPython")
    a.n_arrow_evals = (tree.count("ArrowEvalPython")
                       + tree.count("MapInPandas")
                       + tree.count("FlatMapGroupsInPandas")
                       + tree.count("AggregateInPandas"))
    # scans print as 'FileScan parquet'/'BatchScan' in the tree; the
    # formatted explain also names each '(N) Scan parquet' node — use
    # whichever surface matched (AQE can hide leaves in the tree string)
    a.n_scans = len(re.findall(r"\b(?:File|Batch)Scan\b", tree)) or \
        len(re.findall(r"\(\d+\) Scan ", formatted))
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted):
        body = m.group(1).strip()
        a.scan_widths.append(0 if not body else body.count(",") + 1)
    a.n_codegen_spans = len(set(re.findall(r"WholeStageCodegen \((\d+)\)",
                                           tree)))
    return a


def assert_scalable(df: DataFrame, *, max_exchanges: int | None = None,
                    allow_global_sort: bool = False,
                    allow_nested_loop: bool = False,
                    allow_broadcast_nested_loop: bool = False,
                    allow_python_rowpath: bool = False,
                    max_scan_width: int | None = None) -> PlanAudit:
    """Gate a composed query on its plan shape; raises ``ValueError``
    naming every violated budget (with the audit numbers) so the
    failure is actionable. Returns the audit on success.

    Defaults forbid the three 100×-killers outright — global sorts,
    nested-loop joins, row-at-a-time Python — and let the caller cap
    shuffle count and scan width per query.

    Two deliberate patterns need their flag relaxed: a crossJoin of a
    broadcast 1-row stats frame PRINTS as BroadcastNestedLoopJoin
    (cardinality is invisible statically — pass
    allow_broadcast_nested_loop when that is the documented shape;
    allow_nested_loop additionally tolerates CartesianProduct), and a
    final orderBy of an aggregate-sized frame for deterministic output
    is a global sort of metadata, not of data (pass
    allow_global_sort). allow_broadcast_nested_loop only admits joins
    whose one side already fit under the broadcast threshold — output
    cardinality is bounded by |big side| x |broadcast rows|, which the
    sanctioned 1-row scorer crossJoins keep at |big side|; a
    CartesianProduct (both sides distributed) stays forbidden under
    it."""
    a = plan_audit(df, need_formatted=max_scan_width is not None)
    problems = []
    if max_exchanges is not None and a.n_exchanges > max_exchanges:
        problems.append(f"{a.n_exchanges} exchanges > budget "
                        f"{max_exchanges}")
    if not allow_global_sort and a.has_global_sort:
        problems.append(f"{a.n_range_exchanges} global-sort "
                        "range exchange(s)")
    if not allow_nested_loop:
        if a.n_cartesian_products:
            problems.append(f"{a.n_cartesian_products} nested-loop/"
                            "cartesian join(s) (CartesianProduct — "
                            "both sides distributed)")
        if a.n_broadcast_nested_loop_joins \
                and not allow_broadcast_nested_loop:
            problems.append(f"{a.n_broadcast_nested_loop_joins} "
                            "nested-loop/cartesian join(s) "
                            "(BroadcastNestedLoopJoin — pass "
                            "allow_broadcast_nested_loop if this is a "
                            "sanctioned bounded-broadcast crossJoin)")
    if not allow_python_rowpath and a.n_python_evals:
        problems.append(f"{a.n_python_evals} row-at-a-time Python "
                        "eval(s)")
    if max_scan_width is not None and a.scan_widths and \
            max(a.scan_widths) > max_scan_width:
        problems.append(f"scan reads {max(a.scan_widths)} columns > "
                        f"budget {max_scan_width} (column pruning "
                        "failed?)")
    if problems:
        raise ValueError("plan fails scale budget: " +
                         "; ".join(problems))
    return a
