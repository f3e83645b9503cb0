"""Plan-audit toolkit: scale-killer flags + executed-plan SQL metrics."""

from .audit import audit, executed_metrics, plan_flags, shuffle_bytes_written

__all__ = ["audit", "executed_metrics", "plan_flags", "shuffle_bytes_written"]
