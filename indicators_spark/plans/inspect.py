"""Plan inspection: programmatic access to the executed physical plan so
tests can assert the properties that matter at scale — exchange (shuffle)
counts, scan column pruning, broadcast join selection — instead of hoping.

Usage:
    plan = plan_string(df)
    assert exchange_count(plan) <= 2
    assert "props" not in scan_columns(plan)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame) -> str:
    """The executed (physical, post-AQE-planning) plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def exchange_count(plan: str) -> int:
    """Number of shuffle exchanges (excludes reused exchange references and
    broadcast exchanges — broadcasts are the cheap kind we *want*)."""
    return len(
        [
            ln
            for ln in plan.splitlines()
            if "Exchange" in ln
            and "BroadcastExchange" not in ln
            and "ReusedExchange" not in ln
        ]
    )


def broadcast_join_count(plan: str) -> int:
    return plan.count("BroadcastHashJoin")


def window_count(plan: str) -> int:
    return len([ln for ln in plan.splitlines() if re.search(r"\bWindow\b", ln)])


def scan_columns(plan: str) -> set[str]:
    """Union of columns read by all FileScan nodes (column-pruning check)."""
    cols: set[str] = set()
    for m in re.finditer(r"FileScan \w+ \[([^\]]*)\]", plan):
        for c in m.group(1).split(","):
            name = c.strip().split("#")[0]
            if name:
                cols.add(name)
    return cols
