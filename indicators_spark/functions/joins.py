"""Join operators Spark lacks natively.

``asof_join``: for each left row, the most recent right row with
``right.ts <= left.ts`` (backward as-of), per key — the standard
time-series enrichment join.

Spark-first formulation (no UDF, no per-group pandas): union both sides
tagged, sort by (key, ts, side-order), and carry the latest right-side
values forward with ``last(ignorenulls=True)`` over an unbounded-preceding
window, then keep only left rows.  One shuffle on the key — the same
exchange a direct join would need — and it parallelizes per key, never
materializing the quadratic candidate space a range join would.

At 100 TB: partition-by-key windows scale across keys; for few-key/huge-
series inputs combine with the halo bucketing in ``scale.py`` (an as-of
carry is a degenerate rolling window).  Ties (right.ts == left.ts) match,
and among equal-ts right rows the LAST in (ts, seq) order wins — mirrored
by the oracle's ASOF semantics via explicit tie-break columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def salted_join(
    big: DataFrame,
    dim: DataFrame,
    on: str,
    n_salt: int = 8,
    how: str = "inner",
    salt_from: Sequence[str] | None = None,
) -> DataFrame:
    """Skew-resistant equi-join: identical results to ``big.join(dim, on)``
    but a hot key's rows spread over ``n_salt`` reducers.

    The big side deterministically salts each row into one of ``n_salt``
    sub-keys (hash of ``salt_from`` columns, default all — any roughly
    uniform row attribute works; correctness never depends on the salt).
    The dim side replicates each row once per salt value, and the join key
    becomes (key, salt) — so the hot key's partition splits n_salt ways at
    the cost of an n_salt× blow-up of the SMALL side only.

    Use when the dim side is too big to broadcast but far smaller than the
    fact side, and a few keys dominate (the classic null-key / power-law
    fact table).  AQE's skew-join split handles sort-merge spills
    adaptively; explicit salting additionally fixes the single-reducer
    hash-agg that follows a skewed join, and works with AQE off.  ``how``
    supports inner/left (big side preserved)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join preserves the big side: inner or left")
    salt_cols = [F.col(c) for c in (salt_from or big.columns)]
    sb = big.withColumn("_salt", F.pmod(F.hash(*salt_cols), F.lit(n_salt)))
    sd = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return sb.join(sd, [on, "_salt"], how).drop("_salt")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    by: Sequence[str] = (),
) -> DataFrame:
    """Interval-containment join: each ``points`` row pairs with every
    ``intervals`` row (same ``by`` key) whose ``[start_col, end_col]``
    contains ``point_col`` (inclusive bounds).

    Spark plans a raw non-equi join (``p.x BETWEEN i.lo AND i.hi``) as a
    broadcast-nested-loop — O(points × intervals) comparisons, a scan of
    every interval for every point.  This formulation bins instead: each
    interval explodes into the fixed-width buckets it overlaps, each point
    maps to exactly ONE bucket, and the pair space collapses to an
    equi-join on ``(by…, bucket)`` — one ordinary shuffle, AQE/skew-split
    eligible, followed by the exact containment filter.  Because a point
    lives in a single bucket, no dedup pass is needed.

    ``bucket_width`` trades replication for selectivity: each interval is
    copied ``~len/bucket_width + 1`` times, and each bucket pairs a point
    with only the intervals crossing that bucket.  Pick it near the median
    interval length (replication ≈ 2×).  Degenerate long intervals fan out
    across many buckets — at 100 TB, split or cap outliers first.

    Columns: ``by`` keys unify; all other names must be disjoint between
    the two frames.  Works on numeric columns; cast timestamps to epoch
    first (``F.col(ts).cast("long")``).
    """
    by = list(by)
    shared = (set(points.columns) & set(intervals.columns)) - set(by)
    if shared:
        raise ValueError(f"non-key columns collide: {sorted(shared)}")
    if not bucket_width > 0:
        # floor(x/0) is NULL (non-ANSI) or DIVIDE_BY_ZERO (ANSI): either
        # a silently-empty join or a runtime crash — reject up front
        raise ValueError(f"bucket_width must be > 0, got {bucket_width}")
    bw = F.lit(float(bucket_width))
    pb = points.withColumn("_bucket", F.floor(F.col(point_col) / bw))
    ib = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bw), F.floor(F.col(end_col) / bw)
            )
        ),
    )
    return (
        pb.join(ib, by + ["_bucket"])
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("_bucket")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] = (),
    value_cols: Sequence[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: latest ``right`` row with ``right.on <= left.on``
    per ``by`` group.  ``value_cols`` defaults to all right columns except
    ``on``/``by``.

    Carry semantics are ROW-WISE: the matched right row's values travel
    together, NULLs included (per-column carry would stitch values from
    DIFFERENT rows whenever a newer row holds a NULL).  Right rows with a
    NULL ``on`` never match, and equal-``(by, on)`` right duplicates
    resolve deterministically to the LARGEST value tuple (the window's
    final order key is the carried struct)."""
    by = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in set(by) | {on}]
    value_cols = list(value_cols)

    lcols = left.columns
    # tag: right rows sort BEFORE left rows at equal ts so they are visible
    # to same-ts left rows (ASOF <= semantics)
    rtype = T.StructType(
        [T.StructField(c, right.schema[c].dataType, True) for c in value_cols]
    )
    l_tagged = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols if c not in set(by) | {on}],
        F.lit(None).cast(rtype).alias("_r_row"),
    )
    r_tagged = right.filter(F.col(on).isNotNull()).select(
        *[F.col(c) for c in by],
        F.col(on).alias("_ts"),
        F.lit(0).alias("_side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in set(by) | {on}
        ],
        F.struct(*[F.col(c) for c in value_cols]).alias("_r_row"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*by)
        .orderBy("_ts", "_side", F.col("_r_row").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_carried", F.last(F.col("_r_row"), ignorenulls=True).over(w)
    )
    out_cols = (
        by
        + [F.col("_ts").alias(on)]
        + [c for c in lcols if c not in set(by) | {on}]
        + [F.col(f"_carried.{c}").alias(f"{c}{suffix}") for c in value_cols]
    )
    return carried.filter(F.col("_side") == 1).select(*out_cols)


def bloom_semi_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
) -> DataFrame:
    """Semi join with an explicit Bloom-filter pre-pass: identical result
    to ``left.join(right.select(on).distinct(), on, "left_semi")``, but
    the left side is first cut down scan-side by a broadcast bitmap of
    the right keys, so only probable matches reach the exact join's
    shuffle.

    This is the manual form of Spark's runtime row-level filtering
    (InjectRuntimeFilter — which only fires under its own heuristics):
    at 100 TB, semi-joining a fact table against a selective key set
    shuffles the whole fact side unless something prunes it first.  A
    Bloom bitmap of m_bits = 2²⁰ is 128 KiB broadcast regardless of key
    count (vs broadcasting the key set itself, which OOMs past ~10⁷
    keys) and kills ~(1−fpp) of non-matching rows before the exchange;
    the exact semi join afterwards makes false positives harmless, so
    results are EXACT for any (m_bits, n_hashes).

    Build: each right key sets ``n_hashes`` bits (xxhash64(key, i) mod
    m); bits aggregate into 64-bit words via one map-side-combined
    bit_or groupBy — the bitmap relation is ≤ m/64 rows, collected
    nowhere, broadcast as a join side.  Probe: each left row checks its
    n_hashes (word, bit) pairs against the broadcast words; a missing
    word or an unset bit rejects the row.  NULL keys hash arbitrarily
    but can never pass the exact equi-join, so they drop out as SQL
    semantics require.
    """
    m_words = m_bits >> 6

    def positions(key: str):  # (word, mask) per hash seed
        k = F.col(key)
        out = []
        for i in range(n_hashes):
            pos = F.pmod(F.xxhash64(k, F.lit(i)), F.lit(m_bits))
            out.append(
                (
                    F.shiftright(pos, 6).cast("int"),
                    # python F.shiftleft only takes a literal shift; the
                    # SQL builtin accepts a column
                    F.call_function(
                        "shiftleft",
                        F.lit(1).cast("long"),
                        pos.bitwiseAND(F.lit(63)).cast("int"),
                    ),
                )
            )
        return out

    keys = right.select(F.col(on).alias("_k")).filter(
        F.col("_k").isNotNull()
    ).distinct()
    bit_rows = None
    for word, mask in positions("_k"):
        part = keys.select(word.alias("word"), mask.alias("mask"))
        bit_rows = part if bit_rows is None else bit_rows.unionByName(part)
    assert bit_rows is not None and m_words > 0
    bitmap = bit_rows.groupBy("word").agg(F.bit_or("mask").alias("bits"))

    probe = left
    cond = F.lit(True)
    for i, (word, mask) in enumerate(positions(on)):
        bm = bitmap.select(
            F.col("word").alias(f"_w{i}"), F.col("bits").alias(f"_b{i}")
        )
        probe = probe.join(
            F.broadcast(bm), word == F.col(f"_w{i}"), "left"
        )
        cond = cond & (F.col(f"_b{i}").bitwiseAND(mask) != 0)
    drop = [c for i in range(n_hashes) for c in (f"_w{i}", f"_b{i}")]
    candidates = probe.filter(cond).drop(*drop)
    # exact semi join WITHOUT a broadcast hint: the key set being too big
    # to broadcast is the reason this operator exists — the bloom pass
    # already cut the shuffled left volume, and AQE still picks broadcast
    # when the key set happens to be small
    return candidates.join(keys.select(F.col("_k").alias(on)), on, "left_semi")
