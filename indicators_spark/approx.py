"""Size-dispatched exact → approximate/sketch swaps.

Several operators promise "at 100 TB swap the exact aggregate for the
sketch, same plan shape" in their docstrings (quantile cut-offs,
winsorization bands, equi-depth breakpoints, rolling medians, profiler
distinct counts).  This module makes those swaps CODE, not comments,
using the same dispatch contract as :func:`~.scale.rolling_multi_auto`:
below a row threshold the exact form runs (bit-identical to the oracle);
at or above it a bounded-memory estimator takes over with the SAME plan
shape and output schema.

Three estimator families:

* **t-digest** (``F.percentile_approx``) — Spark's built-in
  GK/QuantileSummaries sketch: O(accuracy) state per aggregate
  regardless of n, mergeable map-side.  Rank error ≤ n/accuracy.
* **HLL** (``F.approx_count_distinct``) — ~1.04/√(2^p) relative error
  in O(2^p) bytes, the only sane distinct count at 100 TB.
* **KMV bottom-k sample** (:func:`kmv_percentile_cutoff`) — a
  DETERMINISTIC uniform sample (k smallest md5(key) hashes), so unlike
  the two above it is exactly replayable in ANSI SQL: the driver oracle
  can verify the sketch path itself (the ``stats_kmv_quantile`` trick).

Thresholds are arguments everywhere so tests can force either path and
pin threshold-equivalence on the same input.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Below this many rows the exact aggregate is cheap and preferable;
#: deliberately lower than scale.HALO_MIN_ROWS — an exact global
#: percentile (one pass, partial aggs) stays viable longer than a
#: single-task global window, but its sort-based fallback and the exact
#: distinct-count shuffle do not survive 100 TB.
APPROX_MIN_ROWS = 4_000_000

#: percentile_approx accuracy: rank error ≤ n/accuracy, state O(accuracy).
PERCENTILE_ACCURACY = 10_000

#: approx_count_distinct relative standard deviation (HLL precision).
DISTINCT_RSD = 0.01

#: Rolling windows wider than this use the t-digest window aggregate —
#: per-frame exact percentile is O(frame·log frame) per row.
MAX_EXACT_FRAME = 4_096


def _dispatch_rows(
    df: DataFrame, n_rows: int | None, min_rows: int | None
) -> tuple[int, int]:
    """Resolve the (n_rows, min_rows) pair the size dispatch compares.

    Counting the frame purely to pick a branch costs a full scan the
    caller never asked for (ADVICE r7), so the contract is: a known
    ``n_rows`` (catalog stats, an ingest ledger, a count an earlier
    stage already paid for) dispatches for free; an EXPLICIT
    ``min_rows`` is an opt-in to one ``df.count()`` pass (or, when
    ``min_rows <= 0``, pins the sketch branch — still no count); with
    neither, the exact branch runs and nothing is scanned to decide.
    """
    explicit = min_rows is not None
    if min_rows is None:
        min_rows = APPROX_MIN_ROWS
    if n_rows is None:
        if explicit:
            n_rows = df.count() if min_rows > 0 else min_rows
        else:
            n_rows = 0
    return n_rows, min_rows


def percentile_auto(
    col: Column | str,
    q: float,
    n_rows: int,
    min_rows: int = APPROX_MIN_ROWS,
    accuracy: int = PERCENTILE_ACCURACY,
) -> Column:
    """Exact interpolated percentile below ``min_rows``, t-digest
    ``percentile_approx`` at scale.  Same aggregate position in the plan
    either way (partial-agg + merge, never a sort)."""
    c = F.col(col) if isinstance(col, str) else col
    if n_rows < min_rows:
        return F.percentile(c, F.lit(float(q)))
    return F.percentile_approx(c, F.lit(float(q)), F.lit(int(accuracy))).cast(
        "double"
    )


def count_distinct_auto(
    col: Column | str,
    n_rows: int,
    min_rows: int = APPROX_MIN_ROWS,
    rsd: float = DISTINCT_RSD,
) -> Column:
    """Exact ``count(DISTINCT)`` below ``min_rows`` (expand + two-phase
    agg), HLL ``approx_count_distinct`` at scale (one pass, O(KB) state,
    no expand)."""
    c = F.col(col) if isinstance(col, str) else col
    if n_rows < min_rows:
        return F.count_distinct(c)
    return F.approx_count_distinct(c, rsd)


def rolling_percentile_auto(
    col: Column | str,
    q: float,
    window,
    frame_rows: int,
    max_exact_frame: int = MAX_EXACT_FRAME,
    accuracy: int = PERCENTILE_ACCURACY,
) -> Column:
    """Window-aggregate percentile, dispatched on the STATIC frame width
    (known at plan time — no ``count()`` needed): exact per-frame
    percentile for normal frames, t-digest for extreme ones.  The window
    spec — and therefore the one hash exchange — is identical."""
    c = F.col(col) if isinstance(col, str) else col
    if frame_rows <= max_exact_frame:
        return F.percentile(c, F.lit(float(q))).over(window)
    return (
        F.percentile_approx(c, F.lit(float(q)), F.lit(int(accuracy)))
        .over(window)
        .cast("double")
    )


def kmv_percentile_cutoff(
    df: DataFrame,
    value_col: str,
    key_col: str,
    q: float,
    k: int = 256,
) -> DataFrame:
    """1-row frame with the ``q``-quantile of a DETERMINISTIC bottom-k
    sample of ``value_col`` (k smallest ``md5(key)`` — the KMV sketch of
    :mod:`~.functions.sketches`, collapsed to one group).

    This is the oracle-checkable flavor of the quantile swap: both
    engines pick the identical k sample rows and interpolate identical
    estimates, so a driver query can run the SKETCH path under a full
    value-hash compare (``percentile_approx`` cannot — DuckDB has no
    replay of Spark's digest).  Plan shape: TakeOrderedAndProject (per
    partition top-k, k-row merge on the driver side of the exchange) +
    a 1-row aggregate — no global sort, no wide shuffle.
    """
    from .functions.sketches import kmv_bottom_k

    sample = kmv_bottom_k(df, value_col=value_col, key_col=key_col, k=k)
    return sample.agg(
        F.percentile(F.col("v"), F.lit(float(q))).alias("_cut"),
        F.count(F.lit(1)).alias("_n_sample"),
    )


def winsorize_auto(
    df: DataFrame,
    value: str,
    group: str,
    lo: float = 0.05,
    hi: float = 0.95,
    out: str | None = None,
    n_rows: int | None = None,
    min_rows: int | None = None,
    accuracy: int = PERCENTILE_ACCURACY,
) -> DataFrame:
    """Clip ``value`` to each group's ``[lo, hi]`` percentile band —
    exact bands below ``min_rows``, t-digest bands at scale.  Either way
    the bands are one tiny per-group aggregate broadcast back; the data
    side never shuffles.  Dispatch contract (see :func:`_dispatch_rows`):
    thread a known ``n_rows`` (catalog stats, an ingest ledger) or pass
    ``min_rows`` explicitly to buy a counting pass — with neither, the
    exact branch runs without spending a scan on the decision."""
    n_rows, min_rows = _dispatch_rows(df, n_rows, min_rows)
    bands = df.groupBy(group).agg(
        percentile_auto(value, lo, n_rows, min_rows, accuracy).alias("_lo"),
        percentile_auto(value, hi, n_rows, min_rows, accuracy).alias("_hi"),
    )
    clipped = F.greatest(
        F.least(F.col(value).cast("double"), F.col("_hi")), F.col("_lo")
    )
    return (
        df.join(F.broadcast(bands), group)
        .withColumn(out or f"{value}_winsor", clipped)
        .drop("_lo", "_hi")
    )


def histogram_equidepth_auto(
    df: DataFrame,
    col: str,
    probs: Sequence[float] = (0.25, 0.5, 0.75),
    n_rows: int | None = None,
    min_rows: int | None = None,
    accuracy: int = PERCENTILE_ACCURACY,
) -> DataFrame:
    """Equi-depth histogram of ``col``: breakpoints at ``probs`` (exact
    below ``min_rows``, t-digest at scale — |probs| scalars either way,
    broadcast back), bucket = codegen'd comparison sum.  Returns
    ``(bucket, n, avg_v)``; two scans of the fact table, zero wide
    shuffles.  Same no-free-count dispatch contract as
    :func:`winsorize_auto` (:func:`_dispatch_rows`)."""
    n_rows, min_rows = _dispatch_rows(df, n_rows, min_rows)
    qs = df.agg(
        *[
            percentile_auto(col, p, n_rows, min_rows, accuracy).alias(f"_q{i}")
            for i, p in enumerate(probs)
        ]
    )
    v = F.col(col)
    bucket = None
    for i in range(len(probs)):
        term = (v > F.col(f"_q{i}")).cast("int")
        bucket = term if bucket is None else bucket + term
    return (
        df.crossJoin(F.broadcast(qs))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.avg(v).alias("avg_v"))
    )


def rolling_median_auto(
    df: DataFrame,
    col: str,
    n: int,
    order_cols: Sequence[str] = ("timestamp", "seq"),
    partition_cols: Sequence[str] = (),
    out: str | None = None,
    max_exact_frame: int = MAX_EXACT_FRAME,
    accuracy: int = PERCENTILE_ACCURACY,
) -> DataFrame:
    """``n``-row rolling median, dispatched on the frame width (static —
    no data pass): exact per-frame percentile for normal ``n``, t-digest
    window aggregate for extreme ``n`` where O(n·log n) per row stops
    being funny.  One partition-key exchange either way."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    return df.withColumn(
        out or f"{col}_median_{n}",
        rolling_percentile_auto(col, 0.5, w, n, max_exact_frame, accuracy),
    )


def profile_numeric_auto(
    df: DataFrame,
    cols: Sequence[str],
    n_rows: int | None = None,
    min_rows: int | None = None,
    rsd: float = DISTINCT_RSD,
) -> DataFrame:
    """Per-column profile (rows / nulls / distincts / min / max / mean)
    with the distinct count size-dispatched: exact ``count_distinct``
    below ``min_rows``, HLL above.  Output schema identical on both
    paths.  Same no-free-count dispatch contract as
    :func:`winsorize_auto` (:func:`_dispatch_rows`) — which for a
    profiler has one consequence worth stating: on a genuinely UNKNOWN
    drop (no catalog stats, no ledger) pass ``min_rows=0`` to pin the
    HLL branch outright, or an explicit ``min_rows`` to buy the one
    counting pass; the bare default runs the exact distinct per column
    (a full expand+shuffle each at 100 TB), because silently spending a
    corpus scan to decide otherwise is the failure mode ADVICE r7
    flagged."""
    n_rows, min_rows = _dispatch_rows(df, n_rows, min_rows)
    parts = [
        df.agg(
            F.lit(c).alias("column"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_null"),
            count_distinct_auto(c, n_rows, min_rows, rsd)
            .cast("long")
            .alias("n_distinct"),
            F.min(F.col(c)).alias("min_v"),
            F.max(F.col(c)).alias("max_v"),
            F.avg(F.col(c)).alias("avg_v"),
        )
        for c in cols
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
