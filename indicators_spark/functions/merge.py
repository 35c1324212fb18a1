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

    ``order_col``: a version/timestamp column present on both sides.
    Duplicate (key, order_col, side) rows — e.g. a micro-batch carrying
    two updates with the same version — resolve deterministically to the
    LARGEST value tuple (the full row struct is the final sort key), so
    replaying the same batch always stores the same row.

    NULL keys follow MERGE semantics: ``ON t.key = u.key`` matches no
    NULL against anything, so NULL-key rows pass through UNCHANGED from
    both sides (a window on the key would instead collapse them into one
    arbitrary survivor)."""
    t = target.withColumn("_src", F.lit(0))
    u = updates.withColumn("_src", F.lit(1))
    unioned = t.unionByName(u)
    value_cols = [c for c in unioned.columns if c not in {key, "_src"}]
    w = Window.partitionBy(key).orderBy(
        F.col(order_col).desc(),
        F.col("_src").desc(),
        F.struct(*[F.col(c) for c in value_cols]).desc_nulls_last(),
    )
    keyed = (
        unioned.filter(F.col(key).isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    nullkey = unioned.filter(F.col(key).isNull())
    return keyed.unionByName(nullkey).drop("_src")


def scd2(
    history: DataFrame,
    key: str,
    order_col: str,
    tracked: Sequence[str],
) -> DataFrame:
    """Type-2 dimension from a change log: one row per (key, TRACKED
    change) with ``version`` (1-based), ``valid_to`` (next change's order
    value, NULL if current) and ``is_current``.

    ``tracked`` drives change detection: a log row whose tracked columns
    all equal (null-safely) the key's previous row is a no-op and opens
    NO new version — the defining property of a type-2 dimension (pass
    every non-key column to version on any change).  Two window passes
    over one key-hash exchange.

    Both windows order by (order_col, tracked...) — duplicate
    (key, order_col) log rows would otherwise sort in partitioning-luck
    order, making lag()'s predecessor (hence which rows open versions,
    the version numbers, and valid_to) nondeterministic across runs."""
    order = [F.col(order_col), *[F.col(c) for c in tracked]]
    w = Window.partitionBy(key).orderBy(*order)
    changed = F.row_number().over(w) == 1
    for c in tracked:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    real = history.withColumn("_chg", changed).filter(F.col("_chg")).drop("_chg")
    return (
        real.withColumn("version", F.row_number().over(w))
        .withColumn("valid_to", F.lead(order_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
