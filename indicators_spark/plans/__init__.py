"""Physical-plan inspection helpers (the 100 TB feedback loop)."""

from .inspect import exchange_count, plan_string, scan_columns, window_count

__all__ = ["plan_string", "exchange_count", "scan_columns", "window_count"]
