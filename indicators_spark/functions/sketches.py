"""Mergeable sketches for approximate distinct counting at 100 TB.

Exact distinct counts (``stats_exact``) need a shuffle keyed on the value
being counted, every time the question is asked.  A DataSketches HLL
sketch (``F.hll_sketch_agg``, JVM-side Apache DataSketches) is computed
ONCE per finest-grained group, stored as bytes, and then answers every
coarser rollup by ``hll_union_agg`` over the stored sketches — re-
aggregation touches #groups rows, never the fact table.  That
compute-once / rollup-forever property is the whole point at scale: a
daily distinct-users table over a 100 TB event stream unions to weekly /
monthly / all-time in milliseconds.

Spark's sketches are deterministic for a given input multiset (no RNG —
hashing only), so estimates are stable across runs; they are NOT
portable to DuckDB's approx_count_distinct (different sketch family), so
the catalog query ships as a rows-only check with exactness bounds
pinned by unit tests instead (≤2% at lgK=12 on this data; the
`text_compression_ratio` precedent for engine-specific kernels).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_distinct_rollup(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    lgk: int = 12,
) -> DataFrame:
    """Per-day approximate distinct ``key_col`` plus an ALL row whose
    estimate comes from UNIONING the stored daily sketches — proving the
    rollup never re-reads the events.

    Returns (day, approx_distinct) with day='ALL' for the union row.
    Scale shape: one groupBy(day) pass over the facts builds the daily
    sketches (map-side partial sketch merge — shuffle carries one sketch
    per partition×day, not rows); the ALL row aggregates #days sketch
    blobs."""
    daily = events.groupBy(
        F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day")
    ).agg(F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias("sk"))
    per_day = daily.select(
        "day", F.hll_sketch_estimate("sk").alias("approx_distinct")
    )
    total = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_distinct")
    ).select(F.lit("ALL").alias("day"), "approx_distinct")
    return per_day.unionByName(total)
