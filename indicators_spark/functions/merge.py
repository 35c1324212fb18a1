"""MERGE-style mutation emulation on immutable storage (no Delta/Iceberg
jars in this environment — emulated with anti-join + union + window, the
standard lakehouse-less pattern).

* ``merge_upsert``: latest-wins upsert of ``updates`` into ``target`` by
  key — one shuffle on the key (union + per-key top-1 window).
* ``scd2``: slowly-changing-dimension type 2 — version rows with
  ``version`` / ``is_current`` from the change sequence.

Scale: both are a single hash exchange on the business key; at 100 TB the
same pattern runs incrementally per partition-of-change (or natively via
MERGE INTO once a table format is on the classpath).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str,
    order_col: str,
) -> DataFrame:
    """Latest row per key wins (ties broken by preferring updates).

    ``order_col``: a version/timestamp column present on both sides."""
    t = target.withColumn("_src", F.lit(0))
    u = updates.withColumn("_src", F.lit(1))
    unioned = t.unionByName(u)
    w = Window.partitionBy(key).orderBy(
        F.col(order_col).desc(), F.col("_src").desc()
    )
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def scd2(
    history: DataFrame,
    key: str,
    order_col: str,
    tracked: Sequence[str],
) -> DataFrame:
    """Type-2 dimension from a change log: one row per (key, change) with
    ``version`` (1-based), ``valid_to`` (next change's order value, NULL if
    current) and ``is_current``."""
    w = Window.partitionBy(key).orderBy(order_col)
    return (
        history.withColumn("version", F.row_number().over(w))
        .withColumn("valid_to", F.lead(order_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
