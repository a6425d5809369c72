"""Plan-construction helpers: the driver-side logic that turns rules +
verdicts into distributed check plans lives with its operators; this
package re-exports the planning surface for discoverability."""

from ..operators.violations import CheckSpec, violation_plan_for
from ..validate import partition_verdicts
from .audit import PlanAudit, assert_scalable, plan_audit

__all__ = ["CheckSpec", "violation_plan_for", "partition_verdicts",
           "PlanAudit", "assert_scalable", "plan_audit"]
