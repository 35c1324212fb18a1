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
    day_col=None,
) -> DataFrame:
    """Per-day approximate distinct ``key_col`` plus an ALL row whose
    estimate comes from UNIONING the stored daily sketches — proving the
    rollup never re-reads the events.

    Returns (day, approx_distinct) with day='ALL' for the union row.
    Scale shape: one groupBy(day) pass over the facts builds the daily
    sketches (map-side partial sketch merge — shuffle carries one sketch
    per partition×day, not rows); the ALL row aggregates #days sketch
    blobs.

    ``day_col`` overrides the grouping key (any string Column — e.g. the
    TZ-independent epoch-day ``floor(unix_timestamp(ts)/86400)`` cast to
    string, which renders identically in any session timezone; the
    default ``date_format`` day is session-TZ-dependent)."""
    if day_col is None:
        day_col = F.date_format(F.col(ts_col), "yyyy-MM-dd")
    daily = events.groupBy(day_col.alias("day")).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias("sk")
    )
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


# --------------------------------------------------------------------- #
# Count-min sketch (Cormode & Muthukrishnan 2005) heavy hitters
# --------------------------------------------------------------------- #

CMS_D, CMS_W = 4, 512


def _cms_bucket(j, v, w: int, seed: str):
    """Row-j counter bucket: md5('{seed}{j}|{value}') first 8 hex % w —
    the same engine-portable integer hash family as sampling.hash_bucket,
    salted per row so the d estimates are independent."""
    h = F.md5(F.concat(F.lit(seed), j.cast("string"), F.lit("|"), v))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % w


def cms_counters(
    df: DataFrame,
    value_col: str,
    d: int = CMS_D,
    w: int = CMS_W,
    seed: str = "cms",
) -> DataFrame:
    """Build the d×w count-min counter matrix over ``value_col``: the
    fixed-size frequency sketch for streams/corpora whose exact
    per-value counts don't fit anywhere.  Deterministic (hashing only,
    integer counts) — unlike HLL, the whole sketch replays exactly on
    any engine.

    Returns (j, b, cnt), at most d·w rows REGARDLESS of corpus size —
    one groupBy with map-side partials whose shuffle carries ≤ d·w rows
    per task; the sketch then broadcasts anywhere (point estimates,
    merges by cell-wise +, cross-corpus comparison)."""
    rows = df.select(
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("j"),
        F.col(value_col).alias("_v"),
    )
    return (
        rows.groupBy(
            "j", _cms_bucket(F.col("j"), F.col("_v"), w, seed).alias("b")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_topk(
    df: DataFrame,
    value_col: str,
    k: int = 20,
    d: int = CMS_D,
    w: int = CMS_W,
    seed: str = "cms",
) -> DataFrame:
    """Heavy hitters by count-min estimate: probe each candidate value's
    d counters and take the min (the classic upward-biased estimator —
    ``est >= true`` always, inflated only by collisions).  Returns the
    top-``k`` (rank, token, est, true_cnt): the exact count rides along
    as the audit column, so the value hash certifies the collision
    arithmetic itself, not just the ranking.

    Scale shape: the counter matrix is ≤ d·w rows and BROADCASTS to the
    probe; candidates here are the corpus's distinct values (fine at
    test scale, and the exact audit column needs that pass anyway) — at
    100 TB you probe a WATCHLIST (trending slice, sampled candidates)
    against the same broadcast sketch and drop the audit column; the
    sketch build itself never changes shape.  Top-k is sort+limit
    (TakeOrdered — no single-partition global sort)."""
    vals = df.select(F.col(value_col).alias("_v"))
    counters = cms_counters(vals, "_v", d, w, seed)
    cand = vals.groupBy(F.col("_v")).agg(
        F.count(F.lit(1)).alias("true_cnt")
    )
    probe = cand.select(
        "_v",
        "true_cnt",
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("j"),
    ).withColumn("b", _cms_bucket(F.col("j"), F.col("_v"), w, seed))
    est = (
        probe.join(F.broadcast(counters), ["j", "b"])
        .groupBy("_v", "true_cnt")
        .agg(F.min("cnt").alias("est"))
    )
    top = est.orderBy(F.col("est").desc(), F.col("_v")).limit(k)
    from pyspark.sql import Window

    win = Window.orderBy(F.col("est").desc(), F.col("_v"))
    return top.withColumn("rank", F.row_number().over(win)).select(
        F.col("rank").cast("long").alias("rank"),
        F.col("_v").alias("token"),
        F.col("est").cast("long").alias("est"),
        F.col("true_cnt").cast("long").alias("true_cnt"),
    )
