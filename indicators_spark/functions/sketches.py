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


def kmv_bottom_k(
    df: DataFrame,
    value_col: str,
    key_col: str,
    k: int = 256,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Bottom-k (KMV-style) sketch of a value column: per group, keep the
    ``k`` rows whose content-hash (``md5`` of the row key) is smallest —
    a deterministic uniform sample with the property HLL has for distinct
    counts and t-digest approximates for quantiles: it is EXACTLY
    mergeable.  Bottom-k of a union of bottom-k sketches equals bottom-k
    of the union of the raw inputs (the k smallest hashes of the whole
    are each the smallest within their own part), so per-day sketches
    roll up to any date range loss-free relative to a directly-built
    sketch of that range.

    Unlike RNG sampling, the hash order is a property of the DATA — the
    same rows win on any cluster, any partitioning, any engine (md5 hex
    compares identically everywhere), which is what makes the estimator
    oracle-checkable.

    NULL keys are EXCLUDED (``md5(NULL)`` is NULL, and ascending
    nulls-first ranking would otherwise let null-key rows fill every
    sketch slot, destroying the uniform-sample property); a sketch
    samples the population of real key values.

    Scale shape: grouped, one hash-ranked window per group (the only
    shuffle); ungrouped, a global ``orderBy().limit(k)`` which Spark
    plans as TakeOrderedAndProject — per-partition bottom-k heaps merged
    on the driver, never a single-task sort of the facts.  The sketch
    table is |groups|·k skinny rows; every later rollup re-ranks sketch
    rows only, never facts."""
    from pyspark.sql import Window

    h = F.md5(F.col(key_col).cast("string"))
    # Secondary order on the value pins tie-breaks when key_col repeats
    # (identical md5); with unique keys (the intended usage) the hash
    # alone is already a total order.
    base = df.filter(F.col(key_col).isNotNull()).withColumn("_h", h)
    out_cols = [*group_cols, F.col("_h").alias("h"), F.col(value_col).alias("v")]
    if not group_cols:
        return (
            base.orderBy(F.col("_h").asc(), F.col(value_col).asc())
            .limit(k)
            .select(*out_cols)
        )
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(
        h.asc(), F.col(value_col).asc()
    )
    return (
        base.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(*out_cols)
    )


def kmv_merge(sketches: DataFrame, k: int = 256) -> DataFrame:
    """Merge bottom-k sketches (drop group columns, re-take the k
    smallest hashes).  Runs over sketch rows only — |groups|·k, not
    facts — as a TakeOrderedAndProject (no single-task window)."""
    return (
        sketches.select("h", "v")
        .orderBy(F.col("h").asc(), F.col("v").asc())
        .limit(k)
        .select("h", "v")
    )
