"""Scale-out paths for the two operations that would otherwise serialize.

The reference computes many indicators over the WHOLE frame (no partition
key — SURVEY.md §2c.3), and Spark's window operator puts an un-partitioned
window in a single task.  Fine at sf0.1; a bottleneck at 100 TB.  Two
distributed-equivalent forms fix that:

1. **Halo rolling windows** (`halo_rolling`): bounded trailing-window aggs
   need only the previous ``n-1`` rows.  Range-bucket the series by its
   order key, ship each bucket's last ``n-1`` rows to the next bucket as a
   halo, compute the windowed agg inside each bucket independently, drop
   halo rows.  One range shuffle + one per-bucket window; no single-task
   stage.  Exact for any rows-frame agg (incl. the min-samples gate), as
   long as each bucket holds ≥ n-1 rows (pick buckets ≤ rows/(n-1)).

2. **Chunk-scan EWM** (`ewm_chunked`): the adjust=False recurrence
   ``y = (1-a)·y₁ + a·x`` composes across chunks:
   ``y_end(chunk) = (1-a)^m · y_in + L_end`` where ``L`` is the chunk-local
   zero-seeded recurrence and the global seed contributes ``(1-a)^m · x₀``.
   Pass 1 computes each chunk's ``(decay, L_end)`` in parallel; the carries
   fold on the driver (one tiny row per chunk); pass 2 finishes each chunk
   in parallel with its incoming carry.  Parallelism = chunk count, two
   shuffles total; exact up to ulp-level reassociation (verified ≤1e-12
   relative in tests).

Both generalize: ``partition_cols`` runs the same halo scheme per key
(per-symbol rolling with #keys × #buckets parallelism instead of #keys),
``halo_lag`` covers shift/diff/pct_change, and ``bounds`` lets a kernel
chain share one min/max scan (or skip it via catalog metadata).

All are verified equivalent to the single-window forms in
tests/test_scale.py.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _halo_route(
    present: DataFrame,
    partition_cols: Sequence[str],
    rows: int,
    direction: str,
) -> DataFrame:
    """Routing map for halo duplication, shared by the tail (backward)
    and head (forward) builders: for every populated (partition, bucket)
    of the skinny ``present`` table (columns ``partition_cols``,
    ``_bucket``, ``_cnt``), the destination bucket its halo rows move to
    — the NEXT populated bucket of the same partition for
    ``direction="next"``, the PREVIOUS for ``"prev"``.  Routing by
    presence (not blindly bucket±1) keeps the kernels exact under skewed
    keys that leave arithmetic buckets empty.

    The under-sized-sender precondition is enforced here from the same
    counts: a sender holding < ``rows`` rows that is NOT its partition's
    first (``next``) / last (``prev``) populated bucket raises through
    ``F.raise_error`` instead of silently emitting truncated warm-ups
    downstream.  Returns columns ``_pa_<c>...``, ``_ba``, ``_dest``.
    """
    a = present.select(
        *[F.col(c).alias(f"_pa_{c}") for c in partition_cols],
        F.col("_bucket").alias("_ba"),
        F.col("_cnt").alias("_acnt"),
    )
    b = present.select(
        *[F.col(c).alias(f"_pb_{c}") for c in partition_cols],
        F.col("_bucket").alias("_bb"),
    )
    if direction == "next":
        cond = F.col("_bb") > F.col("_ba")
        exempt_rel = F.col("_bb") < F.col("_ba")  # first populated: exempt
        pick = F.min
        what = f"window-1 = {rows}"
    else:
        cond = F.col("_bb") < F.col("_ba")
        exempt_rel = F.col("_bb") > F.col("_ba")  # last populated: exempt
        pick = F.max
        what = f"lead depth = {rows}"
    for c in partition_cols:
        same_part = F.col(f"_pa_{c}") == F.col(f"_pb_{c}")
        cond = cond & same_part
        exempt_rel = exempt_rel & same_part
    # "not the partition's first/last populated bucket" via a broadcast
    # semi-join over the skinny presence table (a global min/max(_bucket)
    # aggregate would plan a SinglePartition exchange — harmless on ≤
    # |parts|·buckets rows but it breaks the kernels' pinned
    # no-SinglePartition plan contract)
    guarded = (
        a.join(F.broadcast(b), exempt_rel, "left_semi")
        .select(*[F.col(f"_pa_{c}") for c in partition_cols], "_ba")
        .withColumn("_gd", F.lit(True))
    )
    dest = (
        a.join(F.broadcast(b), cond)
        .groupBy(*[F.col(f"_pa_{c}") for c in partition_cols], "_ba")
        .agg(pick("_bb").alias("_dest"), F.any_value("_acnt").alias("_acnt"))
        .join(
            F.broadcast(guarded),
            [*[f"_pa_{c}" for c in partition_cols], "_ba"],
            "left",
        )
    )
    ok = (F.col("_acnt") >= rows) | F.col("_gd").isNull()
    return dest.withColumn(
        "_dest",
        F.when(ok, F.col("_dest")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("halo precondition violated: a populated bucket "
                          "holds "),
                    F.col("_acnt").cast("string"),
                    F.lit(f" rows < {what}; use fewer buckets (each must "
                          "span the halo depth) or the plain window form"),
                )
            )
        ),
    ).drop("_acnt", "_gd")


def _halo_tail(
    bucketed: DataFrame,
    order_cols: Sequence[str],
    partition_cols: Sequence[str],
    rows: int,
) -> DataFrame:
    """Duplicate the last ``rows`` rows of every (partition, bucket) into
    the next POPULATED bucket of the same partition, flagged ``_halo``.

    Routing by presence (not blindly ``bucket+1``) keeps the kernel exact
    under skewed keys that leave arithmetic buckets empty — a halo landing
    in an empty bucket would be filtered away and the next populated
    bucket's warm-up would silently lose its history.  The presence table
    is one skinny (partition, bucket) aggregate (≤ |parts|·buckets rows;
    map-side combined) and the next-populated map is a broadcast min-join
    over it — no SinglePartition stage, preserving the halo plan contract.

    The halo depth is one bucket, so a SENDING bucket must hold ≥ ``rows``
    rows — and that precondition is now ENFORCED at runtime from the same
    presence counts: an under-sized sender that is not its partition's
    first populated bucket (a small first bucket is exact — the receiver's
    warm-up gate is then legitimately below the window size in the plain
    form too) raises through ``F.raise_error`` instead of silently
    emitting spurious warm-up NULLs downstream."""
    present = bucketed.groupBy(*partition_cols, "_bucket").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    nxt = _halo_route(present, partition_cols, rows, "next")
    join_cond = F.col("_ba") == F.col("_bucket")
    for c in partition_cols:
        join_cond = join_cond & (F.col(f"_pa_{c}") == F.col(c))
    wb = Window.partitionBy(*partition_cols, "_bucket").orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    tail = (
        bucketed.withColumn("_rev", F.row_number().over(wb))
        .filter(F.col("_rev") <= rows)
        .join(F.broadcast(nxt), join_cond)
        .withColumn("_bucket", F.col("_dest"))
        .drop(
            "_rev", "_ba", "_dest",
            *[f"_pa_{c}" for c in partition_cols],
        )
        .withColumn("_halo", F.lit(True))
    )
    return bucketed.withColumn("_halo", F.lit(False)).unionByName(tail)


def _halo_head_rows(
    bucketed: DataFrame,
    order_cols: Sequence[str],
    partition_cols: Sequence[str],
    rows: int,
) -> DataFrame:
    """FORWARD halo: the first ``rows`` rows of every (partition, bucket)
    duplicated into the PREVIOUS populated bucket, flagged ``_halo`` —
    the mirror of :func:`_halo_tail` for look-AHEAD functions
    (``lead`` / negative shift).  Returns only the halo rows (callers
    union them onto a frame that already carries ``_halo``).

    Same presence-routing and precondition contract as the tail: an
    under-sized sender that is not its partition's LAST populated bucket
    raises instead of silently truncating a receiver's look-ahead."""
    present = bucketed.groupBy(*partition_cols, "_bucket").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    prv = _halo_route(present, partition_cols, rows, "prev")
    join_cond = F.col("_ba") == F.col("_bucket")
    for c in partition_cols:
        join_cond = join_cond & (F.col(f"_pa_{c}") == F.col(c))
    wb = Window.partitionBy(*partition_cols, "_bucket").orderBy(
        *[F.col(c) for c in order_cols]
    )
    return (
        bucketed.withColumn("_fwd", F.row_number().over(wb))
        .filter(F.col("_fwd") <= rows)
        .join(F.broadcast(prv), join_cond)
        .withColumn("_bucket", F.col("_dest"))
        .drop(
            "_fwd", "_ba", "_dest",
            *[f"_pa_{c}" for c in partition_cols],
        )
        .withColumn("_halo", F.lit(True))
    )


def halo_frame(
    bucketed: DataFrame,
    order_cols: Sequence[str],
    partition_cols: Sequence[str] = (),
    back: int = 0,
    fwd: int = 0,
) -> DataFrame:
    """A bucketed frame extended with backward and/or forward halos —
    the generic halo SESSION primitive behind the fluent API's size
    dispatch (core.py).

    With both halos present, any per-bucket window function is exact on
    every non-halo row whose frame reaches ≤ ``back`` rows behind and
    ≤ ``fwd`` rows ahead — and, crucially for CHAINED window operators,
    the intermediates cascade: a tail-halo row's trailing-window value
    is exact whenever its full lookback lies within the halo (so a
    real row's second-stage window may consume first-stage values off
    halo rows as long as the chain's total lookback ≤ ``back``), and a
    tail-halo row's LEAD values are always exact (its true successors —
    the rest of the tail plus the bucket's real rows — are all present),
    with the symmetric statements for head-halo rows.  Callers account
    cumulative chain depth per direction and re-halo when a budget is
    exceeded (core.py ``_halo_part``).

    When both directions are requested, ONE shared ranking pass serves
    them (ascending ``row_number`` + the broadcast per-bucket counts
    give the descending rank as ``count − rn + 1``) — one full-data
    window stage instead of the two the tail/head helpers would each
    pay; pinned equal to composing them in tests/test_scale.py.

    Callers filter ``~_halo`` and drop ``_bucket``/``_halo`` when done.
    """
    if back > 0 and fwd > 0:
        present = bucketed.groupBy(*partition_cols, "_bucket").agg(
            F.count(F.lit(1)).alias("_cnt")
        )
        nxt = _halo_route(present, partition_cols, back, "next")
        prv = _halo_route(present, partition_cols, fwd, "prev")
        keys = [*partition_cols, "_bucket"]
        wb = Window.partitionBy(*keys).orderBy(
            *[F.col(c) for c in order_cols]
        )
        ranked = (
            bucketed.withColumn("_fwd", F.row_number().over(wb))
            .join(F.broadcast(present), keys)
            .withColumn("_rev", F.col("_cnt") - F.col("_fwd") + 1)
            # ONE halo branch for both directions (two branches would
            # re-plan — and re-execute — the ranking window once each):
            # a row within `back` of its bucket end AND `fwd` of its
            # start explodes into both copies
            .filter((F.col("_rev") <= back) | (F.col("_fwd") <= fwd))
        )
        nxt2 = nxt.select(
            *[F.col(f"_pa_{c}").alias(f"_pn_{c}") for c in partition_cols],
            F.col("_ba").alias("_ban"),
            F.col("_dest").alias("_dn"),
        )
        prv2 = prv.select(
            *[F.col(f"_pa_{c}").alias(f"_pp_{c}") for c in partition_cols],
            F.col("_ba").alias("_bap"),
            F.col("_dest").alias("_dp"),
        )
        cond_n = F.col("_ban") == F.col("_bucket")
        cond_p = F.col("_bap") == F.col("_bucket")
        for c in partition_cols:
            cond_n = cond_n & (F.col(f"_pn_{c}") == F.col(c))
            cond_p = cond_p & (F.col(f"_pp_{c}") == F.col(c))
        # left joins: the last (resp. first) populated bucket has no
        # destination — its would-be copies compact away, exactly the
        # inner-join semantics of the single-direction builders
        halos = (
            ranked.join(F.broadcast(nxt2), cond_n, "left")
            .join(F.broadcast(prv2), cond_p, "left")
            .withColumn(
                "_copies",
                F.array_compact(
                    F.array(
                        F.when(F.col("_rev") <= back, F.col("_dn")),
                        F.when(F.col("_fwd") <= fwd, F.col("_dp")),
                    )
                ),
            )
            .filter(F.size("_copies") > 0)
            .withColumn("_bucket", F.explode("_copies"))
            .drop(
                "_fwd", "_rev", "_cnt", "_copies",
                "_ban", "_dn", "_bap", "_dp",
                *[f"_pn_{c}" for c in partition_cols],
                *[f"_pp_{c}" for c in partition_cols],
            )
            .withColumn("_halo", F.lit(True))
        )
        return bucketed.withColumn("_halo", F.lit(False)).unionByName(halos)
    if back > 0:
        out = _halo_tail(bucketed, order_cols, partition_cols, back)
    else:
        out = bucketed.withColumn("_halo", F.lit(False))
    if fwd > 0:
        out = out.unionByName(
            _halo_head_rows(bucketed, order_cols, partition_cols, fwd)
        )
    return out


def _with_bucket(
    df: DataFrame,
    order_cols: Sequence[str],
    buckets: int,
    bucket_by: str | None = None,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Deterministic contiguous range bucketing.

    ``bucket_by``: a numeric column MONOTONE in the total order (e.g. a
    dense sequence id).  Buckets come from arithmetic ranges of its min/max
    — one cheap aggregate, NO global sort, fully parallel.  This is the
    scale path; it requires roughly uniform keys (no empty buckets, each
    bucket ≥ n-1 rows for halo use).  Pass ``bounds=(lo, hi)`` when the key
    range is already known (catalog metadata, a prior call) to skip the
    min/max scan entirely — at 100 TB that scan is the only full pass this
    kernel adds, so sharing bounds across a kernel chain halves the reads.

    Without ``bucket_by``, fall back to ``ntile`` over the total order —
    exact for any key distribution but serialized by the global sort
    (test/small-data path)."""
    if bucket_by is not None:
        if bounds is not None:
            lo, hi = float(bounds[0]), float(bounds[1])
        else:
            lo, hi = df.agg(
                F.min(bucket_by).cast("double"), F.max(bucket_by).cast("double")
            ).first()
        if lo is None or hi is None:
            raise ValueError(
                f"range bucketing: no non-null values in {bucket_by!r} "
                "(empty input?) — nothing to bucket"
            )
        span = (hi - lo) + 1.0
        b = (
            F.floor((F.col(bucket_by).cast("double") - F.lit(lo)) / F.lit(span) * buckets)
            + 1
        )
        # NULL keys route to bucket 1 — the plain-window form sorts null
        # order keys FIRST (F.least would instead skip the NULL and dump
        # them in the LAST bucket); greatest(…, 1) additionally tolerates
        # bounds slightly narrower than the data (keys below lo clamp to
        # the first bucket instead of bucket 0)
        b = F.when(F.col(bucket_by).isNull(), F.lit(1)).otherwise(
            F.least(F.greatest(b, F.lit(1)), F.lit(buckets))
        )
        return df.withColumn("_bucket", b.cast("int"))
    if bounds is not None:
        raise ValueError(
            "bounds were given without bucket_by — they would be silently "
            "ignored and the kernel would fall back to the serialized "
            "ntile path; pass bucket_by (the monotone key the bounds "
            "describe) as well"
        )
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn("_bucket", F.ntile(buckets).over(w))


def halo_rolling(
    df: DataFrame,
    agg: str,
    col: str,
    n: int,
    order_cols: Sequence[str] = ("timestamp", "seq"),
    buckets: int = 8,
    out: str = "_rolled",
    bucket_by: str | None = None,
    partition_cols: Sequence[str] = (),
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Exact trailing-window aggregate without a single-task window.

    ``agg`` ∈ {mean, sum, min, max, std}.  ``out`` carries the min-samples
    gate (NULL until the frame holds n non-null rows).  Pass ``bucket_by``
    (a monotone numeric key) to bucket arithmetically with no global sort.

    ``partition_cols`` generalizes the kernel to per-key rolling (e.g.
    per-symbol): the halo flows bucket→bucket *within* each key, turning a
    few-keys window (parallelism = #keys) into #keys × #buckets tasks.
    Precondition, as for the global form: every (key, bucket) must be
    non-empty — time-uniform keys and buckets ≤ rows/(#keys·(n-1)) satisfy
    it."""
    return halo_rolling_multi(
        df,
        [(agg, col, out)],
        n,
        order_cols=order_cols,
        buckets=buckets,
        bucket_by=bucket_by,
        partition_cols=partition_cols,
        bounds=bounds,
    )


_AGG_FNS = {
    "mean": F.avg,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "std": F.stddev_samp,
}


def _gated_cols(specs, n, w):
    """The min-samples-gated aggregate columns for ``specs`` over window
    ``w`` — ONE definition of the gate semantics, shared by the halo and
    plain-window paths so the two dispatch branches of
    ``rolling_multi_auto`` cannot drift apart."""
    cols = {}
    for agg, col, out in specs:
        gate = F.count(F.col(col)).over(w)
        cols[out] = F.when(gate >= n, _AGG_FNS[agg](F.col(col)).over(w))
    return cols


def halo_rolling_multi(
    df: DataFrame,
    specs: Sequence[tuple[str, str, str]],
    n: int,
    order_cols: Sequence[str] = ("timestamp", "seq"),
    buckets: int = 8,
    bucket_by: str | None = None,
    partition_cols: Sequence[str] = (),
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Several gated trailing-window aggregates (``specs`` of
    ``(agg, col, out)``, one shared window length ``n``) in ONE halo pass —
    one shuffle, one sort, one window stage for the whole family."""
    bucketed = _with_bucket(df, order_cols, buckets, bucket_by, bounds)
    full = _halo_tail(bucketed, order_cols, partition_cols, n - 1)
    w = (
        Window.partitionBy(*partition_cols, "_bucket")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    # Bucket 1 has no halo, so its warm-up gate is globally exact; buckets
    # ≥2 see their true n-1 preceding rows via the halo.
    rolled = full.withColumns(_gated_cols(specs, n, w))
    return rolled.filter(~F.col("_halo")).drop("_bucket", "_halo")


def parquet_footer_stats(
    path: str, column: str | None = None
) -> tuple[int, float | None, float | None]:
    """``(n_rows, lo, hi)`` for a parquet file/directory from FOOTER
    metadata only — no Spark job, no data pass.

    This is the "catalog metadata" path the halo kernels' ``bounds`` /
    ``n_rows`` parameters were designed for: at 100 TB the alternative is
    a full ``agg(min, max, count)`` scan of the fact table before any real
    work starts.  Parquet writers store exact per-row-group min/max
    statistics and row counts in the footer, so the driver reads a few KB
    per file instead (on a real cluster this same information comes from
    the table catalog / manifest, e.g. Delta or Iceberg column stats).

    ``lo``/``hi`` are cast to float; ``date32`` statistics convert to unix
    seconds at UTC midnight — identical to Spark's
    ``unix_timestamp(date_col)`` under the engine's pinned UTC session
    timezone (sources/prices.py).  If any row group lacks statistics for
    ``column``, ``lo``/``hi`` come back None and the caller must fall back
    to a scan; ``n_rows`` is always exact.
    """
    import calendar
    import datetime
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    # recursive: hive-partitioned / nested datasets keep their files under
    # key=value subdirectories — a top-level glob would silently report
    # n_rows=0 (and the size dispatch would then pick the single-task path
    # for billions of rows)
    files = (
        sorted(
            f
            for f in _glob.glob(
                os.path.join(path, "**", "*.parquet"), recursive=True
            )
            if not os.path.basename(f).startswith(("_", "."))
        )
        if os.path.isdir(path)
        else [path]
    )
    n_rows, lo, hi, stats_ok = 0, None, None, column is not None
    for f in files:
        md = pq.ParquetFile(f).metadata
        n_rows += md.num_rows
        if not stats_ok:
            continue
        try:
            ci = md.schema.names.index(column)
        except ValueError:
            stats_ok = False
            continue
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                stats_ok = False
                break
            mn, mx = st.min, st.max
            if isinstance(mn, datetime.datetime):
                # naive timestamp stats ≡ UTC under the engine's pinned
                # session timezone.  Whole seconds only (timetuple drops
                # the microsecond = floor): Spark's unix_timestamp()
                # truncates to seconds, and floor is monotone, so
                # floor(min/max stat) equals min/max of the per-row
                # truncated values — including sub-second data.
                mn = calendar.timegm(mn.timetuple())
                mx = calendar.timegm(mx.timetuple())
            elif isinstance(mn, datetime.date):
                epoch = datetime.date(1970, 1, 1)
                mn = (mn - epoch).days * 86400.0
                mx = (mx - epoch).days * 86400.0
            mn, mx = float(mn), float(mx)
            lo = mn if lo is None else min(lo, mn)
            hi = mx if hi is None else max(hi, mx)
    if not stats_ok:
        lo = hi = None
    return n_rows, lo, hi


#: Row-count threshold for the size-based kernel dispatch: below this the
#: halo kernels' fixed overhead (bucket-bounds scan, halo union, dedup
#: filter, extra shuffle) dominates and the plain window form — though it
#: plans a SinglePartition exchange for global orders — is faster.
#: Retuned r13 from an ABBA probe of the full lineitem_rsi_halo shape
#: (global halo lag + per-symbol rolling) on local[32]: 600k rows plain
#: wins (2.45 s vs 3.20 s warm); 2.4M rows halo wins 1.4× (6.0 s vs
#: 9.0 s); 7.8M rows halo wins 2.2× (10.4 s vs 24.9 s).  Crossover ≈
#: 1–1.5M rows; the gate sits at 2M with margin on the plain side —
#: mis-gating just below costs a bounded single-task stage, while the
#: old 8M gate left a 3–4× win on the table across 2–8M rows (and the
#: single-task sort grows super-linearly from there).  Override per
#: call via ``min_rows`` / ``halo=``, or fleet-wide via
#: ``SPARK_GRAFT_HALO_MIN_ROWS`` for clusters whose exchange/compute
#: balance differs from the measured host.
HALO_MIN_ROWS = int(os.environ.get("SPARK_GRAFT_HALO_MIN_ROWS", 2_000_000))

#: Engage threshold for the fluent API's PER-SYMBOL halo sessions, in
#: rows per symbol.  Higher than the global threshold because the plain
#: per-symbol form already runs #symbols tasks in parallel while the
#: halo session pays ~4 full-data exchanges to build (bucket shuffle,
#: tail/head row_number passes, union + the window shuffle).
#: Calibration-clean ABBA probe (r12, par_min 723 MB/s / 83% scaling,
#: load_ok — SCALING.md §Round 12): 3×3.3M rows plain wins ~2×
#: (12.7 s vs 25.6 s); 2×9M is a wash with the plain form bimodal on
#: sort spill (44–170 s vs halo's steady ~129 s); by 2×18M the halo
#: session is ahead (~162 s vs ~190 s) and its lead grows with data —
#: the single-symbol sort is spill-bound from there on.  Crossover ≈
#: 16–18M rows/symbol on this host → the gate sits at 16M (an absolute
#: constant since r13 — it tracks the r12 per-key measurement, not the
#: global gate, which r13 retuned independently): early engagement near
#: the wash point costs nothing measurable, while a too-late gate
#: inherits the unbounded spill regime.  `halo=True` / `False` force
#: either form where the caller knows better (e.g. a real cluster with
#: far more cores than symbols).
PER_KEY_HALO_MIN_ROWS = int(
    os.environ.get("SPARK_GRAFT_PER_KEY_HALO_MIN_ROWS", 16_000_000)
)


def rolling_multi_auto(
    df: DataFrame,
    specs: Sequence[tuple[str, str, str]],
    n: int,
    order_cols: Sequence[str] = ("timestamp", "seq"),
    buckets: int = 8,
    bucket_by: str | None = None,
    partition_cols: Sequence[str] = (),
    bounds: tuple[float, float] | None = None,
    n_rows: int | None = None,
    min_rows: int = HALO_MIN_ROWS,
) -> DataFrame:
    """Size-dispatched trailing-window aggregates: the halo kernel
    (:func:`halo_rolling_multi`) at scale, the plain single-window form
    below ``min_rows`` where the halo's fixed overhead dominates.

    ``n_rows``: caller-provided row count — catalog metadata
    (``parquet_footer_stats``), or folded into an aggregate the caller
    already runs (e.g. the ``bounds`` min/max scan).  When None, one
    ``df.count()`` decides — cheap ONLY for raw parquet scans (row-group
    metadata); on a derived frame it executes the whole upstream lineage
    once for the dispatch and again for the chosen path, so always pass
    ``n_rows`` there.  Both paths produce identical values including the
    min-samples warm-up gate."""
    if n_rows is None:
        n_rows = df.count()
    if n_rows < min_rows:
        w = (
            Window.partitionBy(*partition_cols)
            .orderBy(*[F.col(c) for c in order_cols])
            .rowsBetween(-(n - 1), Window.currentRow)
        )
        return df.withColumns(_gated_cols(specs, n, w))
    return halo_rolling_multi(
        df,
        specs,
        n,
        order_cols=order_cols,
        buckets=buckets,
        bucket_by=bucket_by,
        partition_cols=partition_cols,
        bounds=bounds,
    )


def lag_auto(
    df: DataFrame,
    col: str,
    k: int = 1,
    order_cols: Sequence[str] = ("timestamp", "seq"),
    buckets: int = 8,
    out: str = "_lagged",
    bucket_by: str | None = None,
    partition_cols: Sequence[str] = (),
    bounds: tuple[float, float] | None = None,
    n_rows: int | None = None,
    min_rows: int = HALO_MIN_ROWS,
) -> DataFrame:
    """Size-dispatched ``lag(col, k)``: :func:`halo_lag` at scale, the
    plain window form below ``min_rows`` (see :func:`rolling_multi_auto`
    for the dispatch contract)."""
    if n_rows is None:
        n_rows = df.count()
    if n_rows < min_rows:
        w = Window.partitionBy(*partition_cols).orderBy(
            *[F.col(c) for c in order_cols]
        )
        return df.withColumn(out, F.lag(col, k).over(w))
    return halo_lag(
        df,
        col,
        k,
        order_cols=order_cols,
        buckets=buckets,
        out=out,
        bucket_by=bucket_by,
        partition_cols=partition_cols,
        bounds=bounds,
    )


def halo_lag(
    df: DataFrame,
    col: str,
    k: int = 1,
    order_cols: Sequence[str] = ("timestamp", "seq"),
    buckets: int = 8,
    out: str = "_lagged",
    bucket_by: str | None = None,
    partition_cols: Sequence[str] = (),
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Exact ``lag(col, k)`` over a global (or per-key) total order without
    a single-task window — same halo scheme as :func:`halo_rolling` with a
    ``k``-row halo.  The first ``k`` rows of the frame get NULL (bucket 1
    has no halo), exactly like the plain window form."""
    bucketed = _with_bucket(df, order_cols, buckets, bucket_by, bounds)
    full = _halo_tail(bucketed, order_cols, partition_cols, k)
    w = Window.partitionBy(*partition_cols, "_bucket").orderBy(
        *[F.col(c) for c in order_cols]
    )
    lagged = full.withColumn(out, F.lag(col, k).over(w))
    return lagged.filter(~F.col("_halo")).drop("_bucket", "_halo")


_CARRY_SCHEMA = T.StructType(
    [
        T.StructField("_bucket", T.IntegerType()),
        T.StructField("decay", T.DoubleType()),
        T.StructField("l_end", T.DoubleType()),
        T.StructField("n_null", T.LongType()),
    ]
)


def ewm_chunked(
    df: DataFrame,
    col: str,
    alpha: float,
    order_cols: Sequence[str] = ("timestamp", "seq"),
    buckets: int = 8,
    out: str = "_ewm",
    bucket_by: str | None = None,
    join_back: bool = True,
) -> DataFrame:
    """Exact distributed EWM (adjust=False, y₀ = x₀) over one global series
    — two parallel passes + a driver fold of ``buckets`` carry pairs.

    Pass ``bucket_by`` (monotone numeric key) for sort-free bucketing.
    Both passes use pandas' C EWM kernel via a seed-prepend: the recurrence
    seeded with carry ``s`` equals ``ewm([s, x₁..xₘ])`` with the first
    output dropped (and zero-seed for pass 1).

    ``join_back=False`` returns just ``(order_cols…, out)`` — the
    scale-lean contract when the caller joins (or doesn't need the other
    columns); the default rejoins the full input frame on the order key,
    which costs one wide hash join (null-safe on the order columns, so a
    null order key never silently drops its row).

    ``col`` must be non-null: pandas' ``ewm(ignore_na=False)``
    renormalizes weights across NaN gaps, so the carry composition
    ``decay = (1-α)^len(chunk)`` (which counts every row as a full decay
    step) would silently diverge from the single-series form the moment a
    null appears.  Pass 1 counts nulls per chunk for free and the driver
    fold raises instead of producing bucket-boundary-dependent values."""
    # Only (order key, value, bucket) flow through the Python passes: the
    # EWM math never reads the other columns, and shipping a wide frame
    # through Arrow twice dominated the cost on wide inputs (measured ~4x
    # at 10M rows x 8 columns).  The result joins back on the order key —
    # a hash join on skinny rows — which requires the total order to be
    # unique (already a precondition: a non-unique order makes the EWM
    # nondeterministic).
    #
    # Materialize the narrow bucketed frame ONCE for the three consumers
    # (pass1 carries, x0 probe, pass2) via an eager localCheckpoint rather
    # than cache(): the caller consumes pass2 lazily so there is no safe
    # point to unpersist a cache (it would leak one cached lineage per
    # call); checkpoint blocks are reclaimed by the ContextCleaner as soon
    # as the returned frame is garbage-collected.
    order = list(order_cols)
    narrow = df.select(*order, *([col] if col not in order else []),
                       *([bucket_by] if bucket_by and bucket_by not in order
                         and bucket_by != col else []))
    bucketed = _with_bucket(narrow, order_cols, buckets, bucket_by).localCheckpoint(
        eager=True
    )

    def _seeded_ewm(xs: pd.Series, seed: float | None) -> pd.Series:
        if seed is None:
            return xs.ewm(alpha=alpha, adjust=False).mean()
        s = pd.concat([pd.Series([seed], dtype="float64"), xs], ignore_index=True)
        return s.ewm(alpha=alpha, adjust=False).mean().iloc[1:].reset_index(drop=True)

    def pass1(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order)
        l_end = float(_seeded_ewm(pdf[col].reset_index(drop=True), 0.0).iloc[-1])
        return pd.DataFrame(
            {
                "_bucket": [int(pdf["_bucket"].iloc[0])],
                "decay": [float((1 - alpha) ** len(pdf))],
                "l_end": [l_end],
                "n_null": [int(pdf[col].isna().sum())],
            }
        )

    carries = bucketed.groupBy("_bucket").applyInPandas(pass1, _CARRY_SCHEMA).collect()
    carries.sort(key=lambda r: r["_bucket"])
    bad = sum(r["n_null"] for r in carries)
    if bad:
        raise ValueError(
            f"ewm_chunked: {col!r} has {bad} null value(s) — the chunk "
            "carry composition assumes a fully non-null series (pandas "
            "renormalizes EWM weights across NaN gaps, so chunked and "
            "single-series results would diverge); fill or drop nulls "
            "first"
        )
    _first = (
        bucketed.filter(F.col("_bucket") == 1).orderBy(*order).select(col).first()
    )
    if _first is None:
        raise ValueError(
            "ewm_chunked: bucket 1 is empty — the bucketing key must "
            "cover the data range (empty input or bounds wider than the "
            "data)"
        )
    x0 = (
        _first[0]
    )

    # Driver fold: y_end(b) = decay_b · y_in(b) + L_end(b); the true seed
    # y₀ = x₀ adds decay_1 · x₀ to bucket 1's zero-seeded L_end
    # (difference (y−L) decays geometrically: y_j − L_j = (1-a)^j · x₀).
    carry_map: dict[int, float | None] = {}
    prev: float | None = None
    for r in carries:
        b, decay, l_end = r["_bucket"], r["decay"], r["l_end"]
        carry_map[b] = prev
        prev = l_end + decay * x0 if b == 1 else decay * prev + l_end

    narrow_fields = [f for f in bucketed.schema.fields if f.name != "_bucket"]
    out_schema = T.StructType(
        [next(f for f in narrow_fields if f.name == c) for c in order]
        + [T.StructField(out, T.DoubleType())]
    )

    def pass2(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order)
        b = int(pdf["_bucket"].iloc[0])
        ys = _seeded_ewm(pdf[col].reset_index(drop=True), carry_map.get(b))
        pdf[out] = ys.to_numpy()
        return pdf[order + [out]]

    res = bucketed.groupBy("_bucket").applyInPandas(pass2, out_schema)
    if not join_back:
        return res
    # eqNullSafe: a null order key must rejoin its row, not vanish (plain
    # inner equi-join never matches NULL == NULL)
    r = res
    for c in order:
        r = r.withColumnRenamed(c, f"_r_{c}")
    cond = None
    for c in order:
        term = F.col(c).eqNullSafe(F.col(f"_r_{c}"))
        cond = term if cond is None else cond & term
    return df.join(r, cond).drop(*[f"_r_{c}" for c in order])


def global_row_number(
    df: DataFrame,
    order_cols: Sequence[str] = ("timestamp", "seq"),
    buckets: int = 32,
    bucket_by: str | None = None,
    bounds: tuple[float, float] | None = None,
    out: str = "rn",
) -> DataFrame:
    """Contiguous global ``row_number()`` over a total order WITHOUT the
    single-task window Spark plans for ``Window.orderBy(...)`` — the
    classic "enumerate 100 TB" primitive (`monotonically_increasing_id`
    is non-contiguous and non-ordered; RDD ``zipWithIndex`` leaves the
    DataFrame/Catalyst world).

    Same arithmetic range-bucket scheme as the halo kernels: bucket on a
    monotone key (no global sort), per-bucket ``row_number`` in parallel,
    then add each bucket's start offset — a prefix sum over the per-bucket
    counts (≤ ``buckets`` rows, broadcast back).  Two skinny shuffles
    (bucket counts + broadcast), no stage proportional to the data in one
    task.  Exact: equal-key rows land in the same bucket, so the in-bucket
    order extends the bucket order to the global total order.
    """
    bucketed = _with_bucket(df, order_cols, buckets, bucket_by, bounds)
    counts = bucketed.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_cnt"))
    # prefix-sum runs over ≤ `buckets` rows — a deliberately tiny window
    woff = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(woff), F.lit(0))
    ).drop("_cnt")
    win = Window.partitionBy("_bucket").orderBy(*[F.col(c) for c in order_cols])
    return (
        bucketed.withColumn("_lrn", F.row_number().over(win))
        .join(F.broadcast(offsets), "_bucket")
        .withColumn(out, (F.col("_lrn") + F.col("_off")).cast("long"))
        .drop("_bucket", "_lrn", "_off")
    )


def grouped_row_number(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    buckets: int = 32,
    bucket_by: str | None = None,
    bounds: tuple[float, float] | None = None,
    out: str = "rn",
) -> DataFrame:
    """Contiguous PER-GROUP ``row_number()`` without one task per group —
    the grouped counterpart of :func:`global_row_number`.

    ``Window.partitionBy(group).orderBy(...)`` serializes each group into
    a single task, which at 100 TB with a handful of giant groups (e.g.
    5 corpus sources) is exactly the global-sort bottleneck the range-
    bucket kernels exist to avoid.  Scheme: range-bucket every row on a
    numeric key MONOTONE in the within-group order (``bucket_by``, same
    contract as :func:`global_row_number` — for a rank-by-value use the
    value column itself), count rows per (group, bucket), prefix-sum the
    counts over buckets WITHIN each group (a window over ≤ groups·buckets
    rows — broadcastable), then per-(group, bucket) ``row_number`` in
    parallel plus the bucket's in-group start offset.  Parallelism is
    groups × buckets instead of groups; exactness is the same argument as
    the global kernel (equal keys share a bucket, so in-bucket order
    extends bucket order to the group's total order).

    The counts prefix-sum window orders by ``_bucket`` only, so the tiny
    table stays tiny — no data-sized shuffle anywhere; two skinny
    exchanges (the counts aggregate + the broadcast back).  NULL group
    keys are supported (the offset join is null-safe — a plain equi-join
    would silently drop those rows).
    """
    gcols = list(group_cols)
    bucketed = _with_bucket(df, order_cols, buckets, bucket_by, bounds)
    counts = bucketed.groupBy(*gcols, "_bucket").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    woff = (
        Window.partitionBy(*gcols)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(woff), F.lit(0))
    ).drop("_cnt")
    win = Window.partitionBy(*gcols, "_bucket").orderBy(
        *[F.col(c) for c in order_cols]
    )
    roff = offsets
    for c in gcols:
        roff = roff.withColumnRenamed(c, f"_go_{c}")
    roff = roff.withColumnRenamed("_bucket", "_go_bucket")
    cond = F.col("_bucket") == F.col("_go_bucket")
    for c in gcols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"_go_{c}"))
    return (
        bucketed.withColumn("_lrn", F.row_number().over(win))
        .join(F.broadcast(roff), cond)
        .withColumn(out, (F.col("_lrn") + F.col("_off")).cast("long"))
        .drop("_bucket", "_lrn", "_off", "_go_bucket", *[f"_go_{c}" for c in gcols])
    )


def global_cum_sum(
    df: DataFrame,
    cols: Sequence[str],
    order_cols: Sequence[str] = ("timestamp", "seq"),
    buckets: int = 32,
    bucket_by: str | None = None,
    bounds: tuple[float, float] | None = None,
    prefix: str = "_cum_",
) -> DataFrame:
    """Exact global (un-partitioned) running sums for the cumulative
    operator family (vwap/obv/vpt/adi/cumulative_returns) WITHOUT the
    single-task window Spark plans for an unbounded-preceding global frame.

    Same scheme as :func:`global_row_number`, with per-bucket SUMS in the
    prefix-sum instead of counts — and all ``cols`` share one bucketing,
    one skinny aggregate, one broadcast, one per-bucket window stage.
    Null handling matches ``F.sum`` over a running frame: nulls contribute
    nothing, and rows before the first non-null still get NULL only when
    the running frame holds no values — here the bucket offset makes every
    later bucket non-null once any earlier value exists, which is exactly
    the unpartitioned-window semantics for sum (sum over empty+null frame
    = NULL, else nulls skipped).
    """
    bucketed = _with_bucket(df, order_cols, buckets, bucket_by, bounds)
    sums = bucketed.groupBy("_bucket").agg(
        *[F.sum(c).alias(f"_s_{c}") for c in cols]
    )
    woff = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sums.select(
        "_bucket",
        *[F.sum(f"_s_{c}").over(woff).alias(f"_off_{c}") for c in cols],
    )
    win = (
        Window.partitionBy("_bucket")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = bucketed.join(F.broadcast(offsets), "_bucket")
    # zero literal in the offset column's own sum dtype (long for integer
    # inputs, double for floats) so the output matches the global-window
    # F.sum result type instead of silently widening ints to double
    off_types = {f.name: f.dataType for f in offsets.schema.fields}
    for c in cols:
        local = F.sum(c).over(win)
        zero = F.lit(0).cast(off_types[f"_off_{c}"])
        # NULL offset (no earlier values) + NULL local = NULL, matching the
        # global-window result; otherwise treat the missing side as 0.
        total = F.when(
            F.col(f"_off_{c}").isNull() & local.isNull(), F.lit(None)
        ).otherwise(F.coalesce(F.col(f"_off_{c}"), zero) + F.coalesce(local, zero))
        out = out.withColumn(f"{prefix}{c}", total)
    return out.drop("_bucket", *[f"_off_{c}" for c in cols])


def profile_key_skew(
    df: DataFrame,
    key: str,
    top_k: int = 20,
) -> DataFrame:
    """Join/groupBy key-skew profile: the ``top_k`` heaviest key values
    with their row counts, corpus share, and the skew factor
    (count / mean-rows-per-key) — the diagnostic that decides whether a
    planned shuffle needs salting, AQE skew-join splitting, or a
    broadcast rewrite BEFORE the job runs at 100 TB (a key with skew
    factor 10⁴ means one reducer does 10⁴× the average work).

    Scale shape: one map-side-combined groupBy on the key, then a
    ``TakeOrdered`` top-k (never a full sort) against the broadcast
    1-row total.  Ties order by key string so the profile is
    deterministic across engines.  Output: (key_value, n_rows, share,
    skew_factor, rank).
    """
    per_key = df.groupBy(F.col(key).cast("string").alias("key_value")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = per_key.agg(
        F.sum("n_rows").alias("_total"),
        F.count(F.lit(1)).alias("_nkeys"),
    )
    # top-k via orderBy+limit = TakeOrderedAndProject (per-partition
    # heaps + driver merge of k rows); rank attaches AFTER the limit so
    # no global-sort or single-partition window ever runs over the full
    # key table (same plan discipline as corpus_vocab_stats)
    top = per_key.orderBy(
        F.col("n_rows").desc(), F.col("key_value")
    ).limit(top_k)
    ranked = top.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("n_rows").desc(), F.col("key_value"))
        ),
    ).crossJoin(F.broadcast(totals))
    return ranked.select(
        "key_value",
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("n_rows") / F.col("_total")).alias("share"),
        (F.col("n_rows") * F.col("_nkeys") / F.col("_total")).alias(
            "skew_factor"
        ),
        F.col("rank").cast("long").alias("rank"),
    )


def zorder_key(cols: list, bits: int = 8):
    """Morton (Z-order) interleave of ``len(cols)`` bucketized dimensions,
    ``bits`` low bits each — the multi-dimensional clustering sort key
    for data LAYOUT at scale.

    Sorting a 100 TB table by one column gives perfect min/max pruning on
    that column and none on any other; writing files in Z-key order bounds
    EVERY interleaved dimension's range per file (each file covers a
    Z-curve segment ≈ a small hyper-rectangle), so parquet footer min/max
    skips files for predicates on any of them — the Delta/Iceberg
    OPTIMIZE ZORDER BY layout, computed here as a pure codegen expression
    (no shuffle beyond the final range sort/partitioning that writes the
    files).

    ``cols`` are Columns already bucketized to ``[0, 2^bits)`` (caller
    picks the bucketing: modulo, ntile, epoch-month…).  Bit j of
    dimension d lands at interleaved position ``j·D + d`` — identical
    integer arithmetic is expressible in any SQL dialect, so the key is
    engine-portable and oracle-checkable.
    """
    from pyspark.sql import functions as F

    ndim = len(cols)
    key = None
    for d, c in enumerate(cols):
        for j in range(bits):
            term = F.shiftleft(
                F.shiftright(c.cast("long"), j).bitwiseAND(F.lit(1)),
                j * ndim + d,
            )
            key = term if key is None else key + term
    return key.cast("long")


def weighted_quantiles(
    df,
    group: str,
    value: str,
    weight: str,
    qs: tuple = (0.25, 0.5, 0.75),
    bucket=None,
):
    """Exact weighted quantiles per group WITHOUT sorting the data.

    The textbook form — a cumulative-weight window ordered by value — puts
    each group's entire data through one sorted reducer: at 100 TB with a
    handful of groups (the common case: quantiles per flag/status/source)
    that is a single-task sort.  This two-pass form never materializes a
    per-row global order:

    1. **Histogram pass**: map-side-combined groupBy on (group, value
       bucket) sums weights — massively parallel, output is one row per
       occupied bucket (≤ distinct-bucket count, independent of n).
    2. The tiny histogram gets per-group prefix sums (window over ~10³
       bucket rows, not data rows); for each quantile q the BOUNDARY
       bucket is the one whose cumulative weight first reaches
       ``q · total`` (``cum_before < target ≤ cum_through``).
    3. **Resolve pass**: only rows in boundary buckets (a ~1/buckets
       fraction of the data) shuffle once more; a within-bucket
       cumulative weight ordered by value, offset by the bucket's
       ``cum_before``, yields the exact quantile value — the smallest v
       with ``W(≤v) ≥ q·total``, identical to the sorted definition.

    Ties on value are deterministic without a row tie-break: the crossing
    row's value is unique regardless of intra-tie order.  NULL values or
    weights are excluded (documented; mirror in any oracle).  ``bucket``
    defaults to ``floor(value)`` — any coarser/finer monotone bucketing
    works (correctness never depends on it, only the resolve-pass size).

    Returns one row per group: ``(group, wq{int(q*100)}...)``.
    """
    from pyspark.sql import functions as F

    vals = df.filter(
        F.col(value).isNotNull() & F.col(weight).isNotNull()
    ).select(
        F.col(group).alias("_g"),
        F.col(value).alias("_v"),
        F.col(weight).cast("double").alias("_w"),
    )
    bexpr = bucket if bucket is not None else F.floor(F.col("_v"))
    vals = vals.withColumn("_b", bexpr.cast("long"))

    hist = vals.groupBy("_g", "_b").agg(F.sum("_w").alias("_bw"))
    wb = Window.partitionBy("_g").orderBy("_b")
    cum = (
        hist.withColumn(
            "_cum",
            F.sum("_bw").over(wb.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("_tot", F.sum("_bw").over(Window.partitionBy("_g")))
        # _before must equal the PREVIOUS bucket's _cum exactly, or float
        # rounding opens a gap (prev._cum < target <= this._cum - _bw) that
        # matches no boundary bucket and silently drops the quantile.
        # lag(_cum) makes the (_before, _cum] intervals partition the weight
        # axis bit-for-bit, so every target matches exactly one bucket.
        .withColumn("_before", F.lag("_cum", 1, 0.0).over(wb))
    )
    qarr = F.array(*[F.lit(float(q)) for q in qs])
    bounds = (
        cum.select("_g", "_b", "_before", "_tot", F.explode(qarr).alias("_q"))
        .withColumn("_target", F.col("_q") * F.col("_tot"))
        .filter(
            (F.col("_before") < F.col("_target"))
            & (F.col("_cum") >= F.col("_target"))
        )
        .select("_g", "_b", "_q", "_target", "_before")
    )
    # resolve: within-boundary-bucket running weight ordered by value.
    # The histogram summed the bucket's weights in arbitrary combine
    # order while _run re-sums them in value order — float rounding can
    # leave max(_run) a ulp below _target when the crossing is the
    # bucket's last row, so the hit is coalesced with the bucket max
    # (the value the exact definition picks in that case) instead of
    # silently yielding a NULL quantile.
    wv = Window.partitionBy("_g", "_q").orderBy("_v")
    resolved = (
        vals.join(bounds, ["_g", "_b"])
        .withColumn(
            "_run",
            F.col("_before")
            + F.sum("_w").over(wv.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("_g", "_q")
        .agg(
            F.min(
                F.when(F.col("_run") >= F.col("_target"), F.col("_v"))
            ).alias("_hit"),
            F.max("_v").alias("_bmax"),
        )
        .select(
            "_g", "_q", F.coalesce("_hit", "_bmax").alias("_val")
        )
    )
    aggs = [
        F.max(
            F.when(F.col("_q") == float(q), F.col("_val"))
        ).alias(f"wq{int(q * 100)}")
        for q in qs
    ]
    return resolved.groupBy(F.col("_g").alias(group)).agg(*aggs)


#: Selection-kernel residue fast path: when the resolved interval is
#: KNOWN (from the kernel's exact row bookkeeping) to hold at most this
#: many rows, the per-value counts are collected and the exact
#: cumulative walk runs on the driver — ONE job instead of the
#: agg → global-window → limit chain (three sequential AQE stages whose
#: scheduling latency dominates the residue at any scale, since by
#: construction the residue data is small).  Driver state is bounded by
#: this many (value, weight) pairs (≈1 MB at the default); larger
#: residues keep the in-Spark prefix sum.  Env-overridable for hosts
#: with tighter driver memory.
RESIDUE_DRIVER_MAX_ROWS = int(
    os.environ.get("SPARK_GRAFT_RESIDUE_DRIVER_ROWS", str(1 << 16))
)

#: Complete-value-table fast path (VERDICT r13 #7): when a selection
#: kernel KNOWS (from its exact stats pass: distinct values ≤ rows = n)
#: or SPECULATES (plan-size gate below) that the input's per-value
#: weight table fits on the driver, ONE Arrow collect of that table
#: answers every requested rank with the same exact cumulative walk the
#: residue already uses — replacing every histogram round and residue
#: pass.  Rows here are distinct (group, value) pairs; 1M pairs ≈ 24 MB
#: through Arrow.  Env-overridable for tight-driver hosts (0 disables).
DRIVER_TABLE_MAX_ROWS = int(
    os.environ.get("SPARK_GRAFT_DRIVER_TABLE_ROWS", str(1 << 20))
)

#: Speculative pre-stats gate: optimizer size estimate below which the
#: kernels try the value-table collect BEFORE their stats pass, saving
#: that job too (2 jobs → 1 for small inputs).  A miss — the capped
#: collect saturates — wastes one bounded job, so the gate is
#: deliberately small; at 100 TB the estimate is TB-sized and the
#: kernels never speculate (the classic stats-then-refine flow is
#: untouched there).
SPECULATIVE_TABLE_MAX_BYTES = int(
    os.environ.get("SPARK_GRAFT_SPECULATIVE_BYTES", str(64 << 20))
)


def _plan_size_bytes(df: DataFrame) -> int:
    """Optimizer size estimate for ``df`` — advisory only (gates a
    perf-only speculation, never a semantics choice)."""
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # pragma: no cover - py4j estimation hiccup
        return 1 << 62


def _collect_value_table(vals: DataFrame, grouped: bool, cap: int | None):
    """The per-(group,) value weight table as ONE Arrow collect:
    ``groupBy(value).agg(sum(w), count, min(w))`` — the complete,
    order-free-exact input to the driver's cumulative walk.  With
    ``cap`` set the collect is bounded (``limit(cap+1)``) and returns
    ``None`` when it saturates (speculation miss); without it the
    caller has already proven the row bound from exact stats."""
    keys = (["_g"] if grouped else []) + ["_v"]
    agg = vals.groupBy(*keys).agg(
        F.sum("_w").alias("_tw"),
        F.count(F.lit(1)).alias("_c"),
        F.min("_w").alias("_mw"),
    )
    if cap is not None and cap <= 0:
        return None
    pdf = (agg.limit(cap + 1) if cap is not None else agg).toPandas()
    if cap is not None and len(pdf) > cap:
        return None
    return pdf


def _table_walk(pdf, kk: int, err: str) -> float:
    """Driver walk over a complete (already group-sliced) value table:
    smallest value whose cumulative weight reaches ``kk`` — the numpy
    twin of :func:`_residue_walk` (same total order: NaN-free doubles,
    -0.0 normalized by the groupBy; same "first cum ≥ k" rule via
    ``searchsorted(..., side='left')``; integral weights make the
    cumulative sums exact and order-free)."""
    import numpy as np

    v = pdf["_v"].to_numpy(dtype="float64")
    order = np.argsort(v, kind="mergesort")
    cum = np.cumsum(pdf["_tw"].to_numpy(dtype="int64")[order])
    i = int(np.searchsorted(cum, kk, side="left"))
    if i >= len(cum):
        raise RuntimeError(err)
    return float(v[order][i])


def _residue_walk(pairs, kk: int, err: str) -> float:
    """Driver twin of the residue's ordered prefix sum: smallest value
    whose cumulative weight reaches ``kk`` over sorted (value, weight)
    pairs.  Bit-identical to the in-Spark form — weights are integral
    (exact, order-free sums) and values are NaN-free doubles, so
    Python's ascending sort is the same total order as ``ORDER BY _v``
    (groupBy normalizes -0.0 to 0.0 before either path sees it)."""
    cum = 0
    for v_, c_ in pairs:
        cum += c_
        if cum >= kk:
            return float(v_)
    raise RuntimeError(err)


def kth_element(
    df: DataFrame,
    value_col: str,
    k: int,
    buckets: int = 1024,
    final_rows: int = 1 << 20,
    max_iters: int = 256,
) -> float:
    """EXACT k-th smallest value (1-based, ascending, ties counted) of
    ``value_col`` by iterative range refinement — distributed selection
    without a global sort and without buffering values in any executor.

    Spark's exact ``percentile`` aggregate collects every value into one
    aggregation buffer (fine at test scale, firmly not at 100 TB), and a
    global sort materializes the full ordered dataset to select one row.
    The selection classic instead: histogram the current [lo, hi] range
    into ``buckets`` arithmetic sub-ranges (ONE filtered scan + a
    ≤ buckets-row aggregate), find the bucket containing global rank k,
    recurse into it.  Each pass shrinks the candidate interval ×buckets,
    so real-world value ranges resolve in 2–4 scans; when the surviving
    range holds ≤ ``final_rows`` rows the answer comes from one exact
    per-value count aggregate over that residue (a tiny shuffle).  The
    scans are filtered by a pushable range predicate — with sorted /
    z-ordered storage they touch a shrinking fraction of the data.

    Driver state per pass: two floats + two longs (the interval and the
    rank already accounted below it) — the standing "K driver scalars
    re-enter as literals" budget.  NULLs are excluded; k must lie in
    [1, count].  Returns the value as a Python float.

    Interval membership and the histogram agree EXACTLY:
    ``floor((v-lo)/width)`` is monotone non-decreasing in v (IEEE
    subtraction/division are correctly rounded, hence monotone), so the
    chosen bucket's rows occupy one contiguous value range and the
    refined interval is snapped to that bucket's ACTUAL ``[min, max]``
    (folded into the same histogram aggregate) rather than the
    arithmetic boundaries ``lo + b*width`` — arithmetic boundaries can
    float-drift across the floor expression and double-count boundary
    rows into both ``below`` and the next interval, shifting the final
    rank.  With data-snapped intervals the next pass's closed range
    filter selects exactly the rows the histogram counted, so
    ``below``/``in_range`` are exact inductively.

    The no-progress guard (interval stops shrinking once its width
    underflows ulp) falls through to the exact residue aggregate, which
    is bounded there by the few representable doubles left in the
    interval; ``max_iters`` is an assertion-style backstop, not a
    truncation — the result is always the exact order statistic.

    ±Infinity values make the arithmetic interval degenerate
    (width = inf), so the no-progress guard routes straight to the
    exact residue — still correct, but that residue is then sized by
    the data rather than ``final_rows``; pre-filter infinities if the
    column can contain them.
    """
    if k < 1:
        raise ValueError(f"kth_element: k must be >= 1, got {k}")
    v = F.col(value_col).cast("double")
    vals = df.filter(v.isNotNull() & ~F.isnan(v)).select(
        v.alias("_v"), F.lit(1).cast("long").alias("_w")
    )
    tbl = None
    if _plan_size_bytes(vals) <= SPECULATIVE_TABLE_MAX_BYTES:
        # speculative value-table-first: skips the stats pass outright
        # when the complete table fits (1 job total); a saturated
        # collect falls through to the classic flow
        tbl = _collect_value_table(vals, False, DRIVER_TABLE_MAX_ROWS)
    if tbl is not None:
        total = int(tbl["_tw"].sum())
        if len(tbl) == 0 or k > total:
            raise ValueError(
                f"kth_element: k={k} outside [1, {total}] non-null rows"
            )
        return _table_walk(
            tbl, k, "kth_element: value table walk exhausted — "
            "bookkeeping violated"
        )
    lo_hi = vals.agg(
        F.min("_v"), F.max("_v"), F.count(F.lit(1))
    ).first()
    lo, hi, total = lo_hi[0], lo_hi[1], lo_hi[2]
    if lo is None or k > total:
        raise ValueError(
            f"kth_element: k={k} outside [1, {total}] non-null rows"
        )
    if total <= DRIVER_TABLE_MAX_ROWS:
        # exact stats prove the complete table fits (distinct ≤ rows):
        # one unbounded collect replaces every refinement round
        tbl = _collect_value_table(vals, False, None)
        return _table_walk(
            tbl, k, "kth_element: value table walk exhausted — "
            "bookkeeping violated"
        )
    below = 0  # rows strictly left of the current interval
    in_range = total

    def _exact_residue(lo: float, hi: float, kk: int, n_rows: int) -> float:
        # per-VALUE counts (never raw rows): the residue's distinct
        # values are ≤ its row count, the aggregate is one tiny shuffle,
        # and the ordered prefix-sum runs over that value table
        err = (
            f"kth_element: residue [{lo}, {hi}] holds fewer than "
            f"{kk} rows — interval bookkeeping violated"
        )
        agg = (
            vals.filter((F.col("_v") >= lo) & (F.col("_v") <= hi))
            .groupBy("_v")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        if n_rows <= RESIDUE_DRIVER_MAX_ROWS:
            # the exact bookkeeping proves the residue tiny: collect the
            # value table and walk it on the driver (one job)
            return _residue_walk(
                sorted((r["_v"], r["_c"]) for r in agg.collect()), kk, err
            )
        cells = (
            agg.withColumn(
                "_cum",
                F.sum("_c").over(
                    Window.orderBy("_v").rowsBetween(
                        Window.unboundedPreceding, 0
                    )
                ),
            )
            .filter(F.col("_cum") >= kk)
            .orderBy("_v")
            .limit(1)
            .collect()
        )
        if not cells:
            raise RuntimeError(err)
        return float(cells[0]["_v"])

    for _ in range(max_iters):
        if lo == hi or in_range <= final_rows:
            return _exact_residue(lo, hi, k - below, in_range)
        width = (hi - lo) / buckets
        if width <= 0.0:  # span underflowed: few representable doubles left
            return _exact_residue(lo, hi, k - below, in_range)
        idx = F.least(
            F.floor((F.col("_v") - F.lit(lo)) / F.lit(width)).cast("int"),
            F.lit(buckets - 1),
        )
        hist = {
            r["_b"]: (r["_c"], r["_mn"], r["_mx"])
            for r in vals.filter(
                (F.col("_v") >= lo) & (F.col("_v") <= hi)
            )
            .groupBy(idx.alias("_b"))
            .agg(
                F.count(F.lit(1)).alias("_c"),
                F.min("_v").alias("_mn"),
                F.max("_v").alias("_mx"),
            )
            .collect()
        }
        cum = below
        for b in range(buckets):
            c, mn, mx = hist.get(b, (0, None, None))
            if c and cum + c >= k:
                # snap to the bucket's actual [min, max]: by the floor
                # expression's monotonicity this closed range contains
                # EXACTLY the c rows counted here, so the next pass's
                # filter and this pass's below/in_range agree.  Snapping
                # every pass also handles the shed-nothing case (data
                # far narrower than the interval) for free — the
                # interval collapses to the data, no extra scan.
                if (mn, mx, c) == (lo, hi, in_range):  # no progress left
                    return _exact_residue(lo, hi, k - below, in_range)
                lo, hi, below, in_range = mn, mx, cum, c
                break
            cum += c
        else:
            # unreachable with exact bookkeeping (histogram counts sum
            # to in_range and below < k <= below + in_range holds
            # inductively); kept as a correct fallback, not a truncation
            return _exact_residue(lo, hi, k - below, in_range)
    raise RuntimeError(
        f"kth_element: no convergence in {max_iters} passes (k={k})"
    )


def _integral_weight_expr(df: DataFrame, weight_col: str, label: str):
    """Weight column as a guarded ``long`` expression.

    The weighted selection kernels require non-negative INTEGRAL
    weights (integer sums are exact and accumulation-order-free on
    every engine, keeping the result bit-deterministic against a
    DuckDB-oracle replay).  Fractional-capable dtypes — float, double,
    and any ``decimal(p, s)`` with ``s > 0`` (the native TPC-H type
    for quantity-like columns; DuckDB ROUNDS on decimal→BIGINT while
    Spark truncates, so a silent cast would diverge) — get a per-row
    scan-side ``raise_error`` on non-integral values before the long
    cast.  Integer dtypes and scale-0 decimals pass through unguarded.
    """
    w = F.col(weight_col)
    wtype = dict(df.dtypes).get(weight_col, "")
    fractional = wtype in ("float", "double")
    if wtype.startswith("decimal("):
        try:
            fractional = int(wtype.rstrip(")").split(",")[1]) > 0
        except (IndexError, ValueError):
            fractional = True  # unparseable decimal spec: guard anyway
    if fractional:
        w = F.when(w == F.floor(w), w).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"{label}: non-integral weight "),
                    w.cast("string"),
                    F.lit(" — scale fractional weights to a fixed-point grid"),
                )
            )
        )
    return w.cast("long")


def kth_element_weighted(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    wk: int,
    buckets: int = 1024,
    final_rows: int = 1 << 20,
    max_iters: int = 256,
) -> float:
    """EXACT weighted order statistic by iterative range refinement: the
    smallest value ``v`` whose cumulative weight over rows with value
    ``<= v`` reaches ``wk`` — :func:`kth_element` with every count
    replaced by a weight sum (``kth_element(df, c, k)`` ≡
    ``kth_element_weighted(df, c, lit-1-weights, k)``).

    The weighted median/percentile is THE aggregation behind
    token-weighted corpus statistics ("the document quality value such
    that half the corpus's TOKENS sit below it" — a document-weighted
    median over-counts tiny documents) and quantity-weighted price
    statistics; Spark has no exact weighted percentile at all, and the
    relational form (a cumulative-weight window over globally sorted
    values — the registered ``analytic_weighted_quantiles`` shape) pays
    a SinglePartition sort.  This kernel inherits the selection
    classic's shape instead: per pass ONE pushable range-filtered scan
    + a ≤ buckets-row (weight-sum, row-count, min, max) aggregate, four
    driver scalars of state, data-snapped intervals (the r11
    boundary-exactness fix applies verbatim — the floor expression's
    monotonicity argument is weight-independent).

    **Weights must be non-negative integers** (validated eagerly, one
    extra column in the same bounds aggregate): integer weight sums are
    exact and accumulation-order-free on every engine, so the result —
    and its DuckDB-oracle replay — is bit-deterministic.  Float weights
    on a fixed-point grid are the caller's one-multiply preprocessing.
    Zero-weight rows are legal and can never be the answer unless they
    tie a weight-bearing value (the "smallest v with cum >= wk" form
    handles them without a special case).  NULL value or NULL weight
    excludes the row, as in the unweighted kernel.
    """
    if wk < 1:
        raise ValueError(f"kth_element_weighted: wk must be >= 1, got {wk}")
    v = F.col(value_col).cast("double")
    w = _integral_weight_expr(df, weight_col, "kth_element_weighted")
    vals = df.filter(
        v.isNotNull() & ~F.isnan(v) & F.col(weight_col).isNotNull()
    ).select(v.alias("_v"), w.alias("_w"))

    def _walk_table(tbl) -> float:
        min_w = int(tbl["_mw"].min()) if len(tbl) else None
        if min_w is not None and min_w < 0:
            raise ValueError(
                f"kth_element_weighted: negative weight {min_w} breaks "
                "the cumulative-weight monotonicity the selection "
                "relies on"
            )
        total_w = int(tbl["_tw"].sum()) if len(tbl) else None
        if total_w is None or wk > total_w:
            raise ValueError(
                f"kth_element_weighted: wk={wk} outside [1, {total_w}] "
                "total weight over non-null rows"
            )
        return _table_walk(
            tbl, wk, "kth_element_weighted: value table walk exhausted "
            "— bookkeeping violated"
        )

    if _plan_size_bytes(vals) <= SPECULATIVE_TABLE_MAX_BYTES:
        tbl = _collect_value_table(vals, False, DRIVER_TABLE_MAX_ROWS)
        if tbl is not None:
            return _walk_table(tbl)
    lo_hi = vals.agg(
        F.min("_v"), F.max("_v"), F.sum("_w"), F.count(F.lit(1)), F.min("_w")
    ).first()
    lo, hi, total_w, total_n, min_w = lo_hi
    if min_w is not None and min_w < 0:
        raise ValueError(
            f"kth_element_weighted: negative weight {min_w} breaks the "
            "cumulative-weight monotonicity the selection relies on"
        )
    if lo is None or total_w is None or wk > total_w:
        raise ValueError(
            f"kth_element_weighted: wk={wk} outside [1, {total_w}] total "
            "weight over non-null rows"
        )
    if total_n <= DRIVER_TABLE_MAX_ROWS:
        return _walk_table(_collect_value_table(vals, False, None))
    below_w = 0  # weight strictly left of the current interval
    in_range_n = total_n

    def _exact_residue(lo: float, hi: float, wkk: int, n_rows: int) -> float:
        err = (
            f"kth_element_weighted: residue [{lo}, {hi}] holds less "
            f"than {wkk} weight — interval bookkeeping violated"
        )
        agg = (
            vals.filter((F.col("_v") >= lo) & (F.col("_v") <= hi))
            .groupBy("_v")
            .agg(F.sum("_w").alias("_c"))
        )
        if n_rows <= RESIDUE_DRIVER_MAX_ROWS:
            return _residue_walk(
                sorted((r["_v"], r["_c"]) for r in agg.collect()), wkk, err
            )
        cells = (
            agg.withColumn(
                "_cum",
                F.sum("_c").over(
                    Window.orderBy("_v").rowsBetween(
                        Window.unboundedPreceding, 0
                    )
                ),
            )
            .filter(F.col("_cum") >= wkk)
            .orderBy("_v")
            .limit(1)
            .collect()
        )
        if not cells:
            raise RuntimeError(err)
        return float(cells[0]["_v"])

    for _ in range(max_iters):
        if lo == hi or in_range_n <= final_rows:
            return _exact_residue(lo, hi, wk - below_w, in_range_n)
        width = (hi - lo) / buckets
        if width <= 0.0:  # span underflowed: few representable doubles left
            return _exact_residue(lo, hi, wk - below_w, in_range_n)
        idx = F.least(
            F.floor((F.col("_v") - F.lit(lo)) / F.lit(width)).cast("int"),
            F.lit(buckets - 1),
        )
        hist = {
            r["_b"]: (r["_wsum"], r["_n"], r["_mn"], r["_mx"])
            for r in vals.filter(
                (F.col("_v") >= lo) & (F.col("_v") <= hi)
            )
            .groupBy(idx.alias("_b"))
            .agg(
                F.sum("_w").alias("_wsum"),
                F.count(F.lit(1)).alias("_n"),
                F.min("_v").alias("_mn"),
                F.max("_v").alias("_mx"),
            )
            .collect()
        }
        cum = below_w
        for b in range(buckets):
            ws, n, mn, mx = hist.get(b, (0, 0, None, None))
            if n and cum + ws >= wk:
                # data-snapped interval: same monotonicity argument as
                # kth_element — the floor expression never depends on
                # the weights
                if (mn, mx, n) == (lo, hi, in_range_n):  # no progress
                    return _exact_residue(lo, hi, wk - below_w, in_range_n)
                lo, hi, below_w, in_range_n = mn, mx, cum, n
                break
            cum += ws
        else:
            # unreachable with exact bookkeeping (bucket weight sums
            # total the in-range weight and below_w < wk <= below_w +
            # in-range weight holds inductively; the crossing bucket
            # always has ws > 0, hence n > 0); kept as a correct
            # fallback, not a truncation
            return _exact_residue(lo, hi, wk - below_w, in_range_n)
    raise RuntimeError(
        f"kth_element_weighted: no convergence in {max_iters} passes "
        f"(wk={wk})"
    )


def weighted_median(
    df: DataFrame, value_col: str, weight_col: str, **kw
) -> float:
    """Lower weighted median: :func:`kth_element_weighted` at
    ``wk = (W + 1) // 2`` (W = total integral weight) — reduces to the
    unweighted lower median at all-ones weights."""
    w = F.col(weight_col).cast("long")
    total = (
        df.filter(
            F.col(value_col).isNotNull()
            & ~F.isnan(F.col(value_col).cast("double"))
            & F.col(weight_col).isNotNull()
        )
        .agg(F.sum(w))
        .first()[0]
    )
    if not total:
        raise ValueError("weighted_median: zero total weight")
    return kth_element_weighted(
        df, value_col, weight_col, (int(total) + 1) // 2, **kw
    )


def kth_elements(
    df: DataFrame,
    value_col: str,
    ks: list | None = None,
    fracs: list | None = None,
    buckets: int = 1024,
    final_rows: int = 1 << 20,
    max_iters: int = 256,
) -> tuple:
    """SEVERAL exact order statistics of one column in SHARED refinement
    passes — the multi-rank form of :func:`kth_element` (VERDICT r12
    #2).  The standard corpus-statistics ask is a PAIR (median + p90) or
    triple of quantiles of the same column; running the single-rank
    kernel per rank re-scans the data once per rank per pass.  This
    kernel refines every requested rank simultaneously, the way
    :func:`_kth_by_group_impl` shares passes across groups: per pass ONE
    range-filtered scan + a ≤ ranks×buckets-row histogram aggregate
    serves ALL unresolved ranks.

    The key invariant making the sharing exact: all ranks start on the
    same interval, and each pass narrows a rank to one (data-snapped)
    bucket of its segment's partition — so at every stage the live
    intervals are pairwise IDENTICAL or DISJOINT (a laminar family
    refined in lockstep).  Ranks sharing an interval share one segment
    (and one ``below`` count, since their interval's left edge is the
    same); disjoint segments histogram side by side in one scan via a
    chained-when cell id.  Resolved segments answer several ranks in
    ONE residue aggregate (``min(v | cum >= target)`` per rank — exact
    because the cumulative count is monotone in v).

    ``fracs`` (each in (0, 1]) folds the rank computation into the
    kernel's own bounds pass — ``k = max(1, ceil(frac·N))``, the
    :func:`kth_element` caller convention — so callers need NO eager
    count job before invoking.  Returns ``(total, {key: value})`` where
    ``key`` is each requested k (``ks`` mode) or frac (``fracs`` mode).
    Bit-identical to per-rank :func:`kth_element` calls (same snap
    logic, same residue semantics), pinned in tests.
    """
    return _kth_multi_impl(
        df, value_col, None, ks, fracs, buckets, final_rows, max_iters,
        "kth_elements",
    )


def kth_elements_weighted(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    wks: list | None = None,
    fracs: list | None = None,
    buckets: int = 1024,
    final_rows: int = 1 << 20,
    max_iters: int = 256,
) -> tuple:
    """Weighted :func:`kth_elements`: several exact WEIGHTED order
    statistics (smallest v whose cumulative weight reaches each target)
    in shared passes.  Same integral non-negative weight contract as
    :func:`kth_element_weighted` (integer weight sums are exact and
    accumulation-order-free → bit-deterministic against a DuckDB-oracle
    replay); ``fracs`` targets are ``max(1, ceil(frac·W))`` with W the
    total weight from the kernel's own bounds pass — the token-weighted
    median + p90 pair costs one bounds pass, shared refinement scans,
    and per-resolved-segment residues, instead of an eager weight agg
    plus two full single-rank runs.  Returns ``(total_weight,
    {key: value})``."""
    return _kth_multi_impl(
        df, value_col, weight_col, wks, fracs, buckets, final_rows,
        max_iters, "kth_elements_weighted",
    )


def _kth_multi_impl(
    df: DataFrame,
    value_col: str,
    weight_col: str | None,
    ks: list | None,
    fracs: list | None,
    buckets: int,
    final_rows: int,
    max_iters: int,
    label: str,
) -> tuple:
    """Shared engine for multi-rank exact selection, weighted or not
    (``weight_col=None`` → unit weights, rank domain = row domain).

    Driver state: O(#ranks) interval tuples per pass (each 2 floats +
    2 longs); per pass one pushable range-filtered scan feeding a
    ≤ segments×buckets-row aggregate; residues are per-VALUE count
    aggregates bounded by ``final_rows`` rows each, answering every
    rank that resolved into that segment in one job."""
    if (ks is None) == (fracs is None):
        raise ValueError(f"{label}: pass exactly one of ks/fracs")
    v = F.col(value_col).cast("double")
    keep = v.isNotNull() & ~F.isnan(v)
    if weight_col is None:
        w = F.lit(1).cast("long")
    else:
        keep = keep & F.col(weight_col).isNotNull()
        w = _integral_weight_expr(df, weight_col, label)
    vals = df.filter(keep).select(v.alias("_v"), w.alias("_w"))
    tbl = None
    if _plan_size_bytes(vals) <= SPECULATIVE_TABLE_MAX_BYTES:
        # speculative value-table-first (see DRIVER_TABLE_MAX_ROWS):
        # the complete table IS the stats pass (min/max/sums derive
        # from it exactly) and answers every rank without refinement
        tbl = _collect_value_table(vals, False, DRIVER_TABLE_MAX_ROWS)
    if tbl is not None and len(tbl):
        lo = float(tbl["_v"].min())
        hi = float(tbl["_v"].max())
        total = int(tbl["_tw"].sum())
        n = int(tbl["_c"].sum())
        min_w = int(tbl["_mw"].min())
    else:
        lo, hi, total, n, min_w = vals.agg(
            F.min("_v"),
            F.max("_v"),
            F.sum("_w"),
            F.count(F.lit(1)),
            F.min("_w"),
        ).first()
    if min_w is not None and min_w < 0:
        raise ValueError(
            f"{label}: negative weight {min_w} breaks the cumulative "
            "monotonicity the selection relies on"
        )
    if lo is None or total is None or total < 1:
        raise ValueError(f"{label}: no weight-bearing non-null rows")
    total = int(total)
    if fracs is not None:
        from fractions import Fraction

        bad = [f for f in fracs if not (0.0 < f <= 1.0)]
        if bad:
            raise ValueError(f"{label}: fracs outside (0, 1]: {bad!r}")
        # exact ceil(frac·total) in INTEGER arithmetic: float multiply
        # drifts at boundaries (0.9·30 = 27.000000000000004 → ceil 28,
        # while the oracle's (9n+9)//10 says 27); limit_denominator
        # recovers the intended short decimal (0.9 → 9/10) exactly
        targets = {}
        for f in fracs:
            fr = Fraction(f).limit_denominator(1_000_000)
            targets[f] = max(
                1, -((-fr.numerator * total) // fr.denominator)
            )
    else:
        targets = {int(k): int(k) for k in ks}
        bad = [k for k, t in targets.items() if t < 1 or t > total]
        if bad:
            raise ValueError(f"{label}: ranks outside [1, {total}]: {bad!r}")
    if not targets:
        raise ValueError(f"{label}: no ranks requested")

    if tbl is None and n <= DRIVER_TABLE_MAX_ROWS:
        # exact stats prove the complete table fits (distinct ≤ rows)
        tbl = _collect_value_table(vals, False, None)
    if tbl is not None and len(tbl):
        results = {
            key: _table_walk(
                tbl,
                targets[key],
                f"{label}: value table walk exhausted for target "
                f"{targets[key]} — bookkeeping violated",
            )
            for key in targets
        }
        return total, results

    # segment state: (lo, hi, below_weight, n_rows); seg_of: key -> index
    segments = [(lo, hi, 0, n)]
    done = [False]
    seg_of = {key: 0 for key in targets}

    for _ in range(max_iters):
        still = []
        for i, (slo, shi, _, sn) in enumerate(segments):
            if done[i]:
                continue
            if slo == shi or sn <= final_rows or (shi - slo) / buckets <= 0:
                done[i] = True  # residue-ready (incl. width underflow)
            else:
                still.append(i)
        if not still:
            break
        glo = min(segments[i][0] for i in still)
        ghi = max(segments[i][1] for i in still)
        cell_expr = None
        for pos, i in enumerate(still):
            slo, shi, _, _ = segments[i]
            width = (shi - slo) / buckets
            b = F.least(
                F.floor((F.col("_v") - F.lit(slo)) / F.lit(width)).cast(
                    "int"
                ),
                F.lit(buckets - 1),
            )
            cond = (F.col("_v") >= slo) & (F.col("_v") <= shi)
            branch = F.lit(pos * buckets) + b
            cell_expr = (
                F.when(cond, branch)
                if cell_expr is None
                else cell_expr.when(cond, branch)
            )
        hist = {
            r["_cell"]: (r["_c"], r["_wc"], r["_mn"], r["_mx"])
            for r in vals.filter(
                (F.col("_v") >= glo) & (F.col("_v") <= ghi)
            )
            .withColumn("_cell", cell_expr)
            .filter(F.col("_cell").isNotNull())
            .groupBy("_cell")
            .agg(
                F.count(F.lit(1)).alias("_c"),
                F.sum("_w").alias("_wc"),
                F.min("_v").alias("_mn"),
                F.max("_v").alias("_mx"),
            )
            .collect()
        }
        # rebuild segments: untouched ones keep their state; each
        # refined segment splits into one new segment per chosen bucket
        nsegs, ndone, nseg_of = [], [], {}
        still_set = set(still)
        for i, s in enumerate(segments):
            if i in still_set:
                continue
            keys_i = [k for k, si in seg_of.items() if si == i]
            if keys_i:
                for k in keys_i:
                    nseg_of[k] = len(nsegs)
                nsegs.append(s)
                ndone.append(done[i])
        for pos, i in enumerate(still):
            slo, shi, sbelow, sn = segments[i]
            keys_here = sorted(
                (k for k, si in seg_of.items() if si == i),
                key=lambda k: targets[k],
            )
            cum = sbelow
            ki = 0
            for b in range(buckets):
                c, wc, mn, mx = hist.get(pos * buckets + b, (0, 0, None, None))
                if not c:
                    continue
                picked = []
                while (
                    ki < len(keys_here)
                    and cum + wc >= targets[keys_here[ki]]
                ):
                    picked.append(keys_here[ki])
                    ki += 1
                if picked:
                    # snap to the bucket's actual [min, max] — exactly
                    # the single-rank kernel's boundary-exactness rule
                    no_prog = (mn, mx, c) == (slo, shi, sn)
                    for k in picked:
                        nseg_of[k] = len(nsegs)
                    nsegs.append((mn, mx, cum, c))
                    ndone.append(no_prog)
                cum += wc
                if ki >= len(keys_here):
                    break
            if ki < len(keys_here):
                raise RuntimeError(
                    f"{label}: segment [{slo}, {shi}] holds less than "
                    f"target weight — interval bookkeeping violated"
                )
        segments, done, seg_of = nsegs, ndone, nseg_of
    else:
        raise RuntimeError(f"{label}: no convergence in {max_iters} passes")

    results = {}
    for i, (slo, shi, sbelow, sn) in enumerate(segments):
        keys_i = [k for k, si in seg_of.items() if si == i]
        if not keys_i:
            continue
        agg = (
            vals.filter((F.col("_v") >= slo) & (F.col("_v") <= shi))
            .groupBy("_v")
            .agg(F.sum("_w").alias("_c"))
        )
        if sn <= RESIDUE_DRIVER_MAX_ROWS:
            # segment row count is exact bookkeeping: collect the value
            # table once and answer every rank that resolved into this
            # segment with driver walks (one job per segment)
            pairs = sorted((r["_v"], r["_c"]) for r in agg.collect())
            for k in keys_i:
                results[k] = _residue_walk(
                    pairs,
                    targets[k] - sbelow,
                    f"{label}: residue [{slo}, {shi}] holds less than "
                    f"{targets[k] - sbelow} weight — bookkeeping violated",
                )
            continue
        cells = agg.withColumn(
            "_cum",
            F.sum("_c").over(
                Window.orderBy("_v").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        )
        row = cells.agg(
            *[
                F.min(
                    F.when(
                        F.col("_cum") >= F.lit(targets[k] - sbelow),
                        F.col("_v"),
                    )
                ).alias(f"_r{j}")
                for j, k in enumerate(keys_i)
            ]
        ).first()
        for j, k in enumerate(keys_i):
            if row[j] is None:
                raise RuntimeError(
                    f"{label}: residue [{slo}, {shi}] holds less than "
                    f"{targets[k] - sbelow} weight — bookkeeping violated"
                )
            results[k] = float(row[j])
    return total, results


def kth_element_by_group(
    df: DataFrame,
    value_col: str,
    group_col: str,
    ks: dict | None = None,
    frac: float | None = None,
    buckets: int = 1024,
    final_rows: int = 1 << 20,
    max_iters: int = 256,
    prior_stats: dict | None = None,
) -> DataFrame:
    """EXACT per-group k-th smallest value — every group refined
    SIMULTANEOUSLY, one histogram pass per round for all groups at once
    (the grouped counterpart of :func:`kth_element`; same selection
    classic, same guarantees).

    Rank per group: ``ks[group]`` (1-based) when given, else the
    ``frac`` order statistic ``k_g = max(1, ceil(frac·n_g))`` — e.g.
    ``frac=0.5`` is the lower median, the "exact median per source"
    question.  Returns a DataFrame ``(group_col, n, k, value)`` built
    from the driver's per-group scalars (groups × 4 values — the
    standing K-driver-literals budget).

    Each round: one scan computes a (group, bucket) histogram for every
    UNRESOLVED group against its own interval (a broadcast ≤groups-row
    interval table, bucket arithmetic per group); the driver advances
    each group's interval independently.  Groups whose surviving range
    holds ≤ ``final_rows`` rows resolve in ONE shared residue pass —
    per-(group, value) counts, never raw rows.  Rounds needed =
    max over groups of the per-group pass count (2–4 on real ranges),
    NOT the sum — a thousand sources cost the same number of scans as
    one.

    Shares :func:`_kth_by_group_impl` with the weighted form (an
    all-ones weight column makes them identical — counts ARE unit
    weight sums, exactly).

    ``prior_stats`` (``{group: (lo, hi, total_w, n, min_w)}``) skips the
    kernel's own bounds pass when the caller already knows the numbers —
    catalog/manifest column statistics at 100 TB, or a preceding kernel
    run over the SAME rows (``robust_scale_by_group``'s MAD pass).
    ``lo``/``hi`` may be any SUPERSET interval (refinement filters and
    residue walks stay exact under loose bounds — they only require
    lo ≤ v ≤ hi for every group row); ``total_w``/``n`` must be EXACT
    (they drive the rank target, the residue gate and the no-progress
    detection).
    """
    return _kth_by_group_impl(
        df,
        value_col,
        group_col,
        weight_col=None,
        ks=ks,
        frac=frac,
        buckets=buckets,
        final_rows=final_rows,
        max_iters=max_iters,
        label="kth_element_by_group",
        out_fields=("n", "k"),
        prior_stats=prior_stats,
    )


def kth_element_by_group_weighted(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_col: str,
    wks: dict | None = None,
    frac: float | None = None,
    buckets: int = 1024,
    final_rows: int = 1 << 20,
    max_iters: int = 256,
) -> DataFrame:
    """EXACT per-group WEIGHTED order statistic, all groups refined
    simultaneously: for each group, the smallest value whose cumulative
    weight (over that group's rows with value ``<= v``) reaches
    ``wks[group]`` — or the ``frac`` weight rank
    ``max(1, ceil(frac·W_g))``.  ``frac=0.5`` is the token-weighted
    per-source median, the corpus-statistics question "the value below
    which half of each source's TOKENS sit" (a row-weighted median
    over-counts tiny documents).

    The grouped composition of :func:`kth_element_weighted`: same
    integral non-negative weight contract (weight sums exact and
    accumulation-order-free → the result and its oracle replay are
    bit-deterministic), same per-round shape as
    :func:`kth_element_by_group` — ONE (group, bucket) weighted
    histogram scan per round for every unresolved group, a thousand
    sources cost the same passes as one.  Returns
    ``(group_col, total_w, wk, value)``.
    """
    return _kth_by_group_impl(
        df,
        value_col,
        group_col,
        weight_col=weight_col,
        ks=wks,
        frac=frac,
        buckets=buckets,
        final_rows=final_rows,
        max_iters=max_iters,
        label="kth_element_by_group_weighted",
        out_fields=("total_w", "wk"),
    )


def _kth_by_group_impl(
    df: DataFrame,
    value_col: str,
    group_col: str,
    weight_col: str | None,
    ks: dict | None,
    frac: float | None,
    buckets: int,
    final_rows: int,
    max_iters: int,
    label: str,
    out_fields: tuple,
    prior_stats: dict | None = None,
) -> DataFrame:
    """Shared engine for grouped exact selection, weighted or not.

    Rank bookkeeping (below / the k target) runs in the WEIGHT domain;
    the ``final_rows`` residue gate and the no-progress check run in
    the ROW domain (residue cost is rows, whatever the weights) — with
    ``weight_col=None`` both domains coincide (unit weights) and this
    is exactly the historical unweighted kernel."""
    if (ks is None) == (frac is None):
        raise ValueError(f"{label}: pass exactly one of ks/frac")
    v = F.col(value_col).cast("double")
    keep = v.isNotNull() & ~F.isnan(v) & F.col(group_col).isNotNull()
    if weight_col is None:
        w = F.lit(1).cast("long")
    else:
        keep = keep & F.col(weight_col).isNotNull()
        w = _integral_weight_expr(df, weight_col, label)
    vals = df.filter(keep).select(
        F.col(group_col).alias("_g"), v.alias("_v"), w.alias("_w")
    )
    tbl = None
    if _plan_size_bytes(vals) <= SPECULATIVE_TABLE_MAX_BYTES:
        # speculative value-table-first (see DRIVER_TABLE_MAX_ROWS):
        # the complete (group, value) table IS the stats pass — exact
        # per-group bounds/weights derive from it — and answers every
        # group without refinement rounds or a residue pass
        tbl = _collect_value_table(vals, True, DRIVER_TABLE_MAX_ROWS)
    if tbl is not None and len(tbl):
        derived = {
            g: (
                float(sub["_v"].min()),
                float(sub["_v"].max()),
                int(sub["_tw"].sum()),
                int(sub["_c"].sum()),
                int(sub["_mw"].min()),
            )
            for g, sub in tbl.groupby("_g", sort=False)
        }
        if prior_stats is not None:
            # the prior's group set stays authoritative (groups it
            # omits stay omitted, exactly as on the classic path); the
            # table's exact numbers replace the prior's
            stats = {g: derived[g] for g in prior_stats if g in derived}
        else:
            stats = derived
    elif prior_stats is not None:
        # caller-supplied bounds (see kth_element_by_group): loose
        # lo/hi are fine, total_w/n must be exact
        tbl = None
        stats = {g: tuple(s) for g, s in prior_stats.items()}
    else:
        tbl = None
        stats = {
            r["_g"]: (r["lo"], r["hi"], r["tw"], r["n"], r["mw"])
            for r in vals.groupBy("_g")
            .agg(
                F.min("_v").alias("lo"),
                F.max("_v").alias("hi"),
                F.sum("_w").alias("tw"),
                F.count(F.lit(1)).alias("n"),
                F.min("_w").alias("mw"),
            )
            .collect()
        }
    neg = {g: s[4] for g, s in stats.items() if s[4] is not None and s[4] < 0}
    if neg:
        raise ValueError(
            f"{label}: negative weight breaks cumulative-weight "
            f"monotonicity (groups {sorted(neg)!r})"
        )
    import math

    if ks is not None:
        unknown = sorted(set(ks) - set(stats))
        if unknown:
            raise ValueError(
                f"{label}: ks names groups with no non-null "
                f"rows: {unknown!r}"
            )
    want: dict = {}
    for g, (lo, hi, tw, n, _mw) in stats.items():
        if ks is not None:
            if g not in ks:
                continue
            k = int(ks[g])
        else:
            k = max(1, math.ceil(frac * tw - 1e-9))
        if not 1 <= k <= tw:
            raise ValueError(
                f"{label}: k={k} outside [1, {tw}] for group {g!r}"
            )
        want[g] = k
    # state per group: lo, hi, below (weight), in_range (ROWS)
    state = {g: [stats[g][0], stats[g][1], 0, stats[g][3]] for g in want}
    resolved: dict = {}
    spark = df.sparkSession
    if (
        tbl is None
        and want
        and sum(stats[g][3] for g in want) <= DRIVER_TABLE_MAX_ROWS
    ):
        # exact stats (agg or prior contract) prove the wanted groups'
        # complete table fits: one collect replaces every round
        need_filter = prior_stats is not None or len(want) < len(stats)
        if not need_filter:
            tbl = _collect_value_table(vals, True, None)
        elif len(want) <= 64:
            tbl = _collect_value_table(
                vals.filter(F.col("_g").isin(list(want))), True, None
            )
    if tbl is not None and want:
        by_g = {g: sub for g, sub in tbl.groupby("_g", sort=False)}
        for g in want:
            sub = by_g.get(g)
            if sub is None or not len(sub):
                raise RuntimeError(
                    f"{label}: value table holds no rows for group "
                    f"{g!r} — interval bookkeeping violated"
                )
            resolved[g] = _table_walk(
                sub,
                want[g],
                f"{label}: value table walk exhausted for group {g!r} "
                "— bookkeeping violated",
            )

    def _interval_df(groups):
        # carry hi explicitly: filtering on lo + w*buckets could float-
        # drift below the true hi and silently drop boundary rows
        rows = [
            (
                g,
                state[g][0],
                state[g][1],
                (state[g][1] - state[g][0]) / buckets,
            )
            for g in groups
        ]
        return spark.createDataFrame(rows, ["_g", "_lo", "_hi", "_w2"])

    for _ in range(max_iters):
        active = [
            g
            for g in state
            if g not in resolved
            and not (
                state[g][0] == state[g][1]
                or state[g][3] <= final_rows
                or (state[g][1] - state[g][0]) / buckets <= 0.0
            )
        ]
        if not active:
            break
        iv = _interval_df(active)
        idx = F.least(
            F.floor((F.col("_v") - F.col("_lo")) / F.col("_w2")).cast("int"),
            F.lit(buckets - 1),
        )
        hist: dict = {}
        for r in (
            vals.join(F.broadcast(iv), "_g")
            .filter(
                (F.col("_v") >= F.col("_lo")) & (F.col("_v") <= F.col("_hi"))
            )
            .groupBy("_g", idx.alias("_b"))
            .agg(
                F.sum("_w").alias("_cw"),
                F.count(F.lit(1)).alias("_n"),
                F.min("_v").alias("_mn"),
                F.max("_v").alias("_mx"),
            )
            .collect()
        ):
            hist.setdefault(r["_g"], {})[r["_b"]] = (
                r["_cw"],
                r["_n"],
                r["_mn"],
                r["_mx"],
            )
        for g in active:
            lo, hi, below, in_range = state[g]
            k = want[g]
            cum = below
            hg = hist.get(g, {})
            chosen = None
            for b in range(buckets):
                cw, n, mn, mx = hg.get(b, (0, 0, None, None))
                if n and cum + cw >= k:
                    chosen = (cw, n, mn, mx, cum)
                    break
                cum += cw
            if chosen is None:
                # unreachable with exact bookkeeping (weight sums total
                # the in-range weight, below < k <= below + in-range
                # weight inductively, and the crossing bucket has
                # cw > 0 hence n > 0); defensively route to the exact
                # residue over the full current interval — always
                # correct
                state[g][3] = 0
                continue
            cw, n, mn, mx, cum = chosen
            # snap to the bucket's actual [min, max] — the same
            # monotone-floor argument as kth_element (the floor
            # expression never depends on the weights): this closed
            # range holds exactly the n counted rows / cw counted
            # weight, so per-group below / in_range stay exact and no
            # boundary row is double-counted
            if (mn, mx, n) == (lo, hi, in_range):  # no progress left
                state[g][3] = 0  # force the exact residue next round
                continue
            state[g] = [mn, mx, cum, n]
    else:
        raise RuntimeError(
            f"{label}: no convergence in {max_iters} rounds"
        )
    # ONE shared residue pass for everything still unresolved
    pending = [g for g in state if g not in resolved]
    if pending:
        iv3 = spark.createDataFrame(
            [(g, state[g][0], state[g][1], want[g] - state[g][2]) for g in pending],
            ["_g", "_lo", "_hi", "_kk"],
        )
        base = vals.join(F.broadcast(iv3), "_g").filter(
            (F.col("_v") >= F.col("_lo")) & (F.col("_v") <= F.col("_hi"))
        )
        # state[g][3] is the exact in-range row count EXCEPT on the
        # defensive routes, which zero it as a force-residue sentinel —
        # a zero therefore means "row count unknown", not "empty"
        known = all(state[g][3] > 0 for g in pending)
        if known and sum(state[g][3] for g in pending) <= RESIDUE_DRIVER_MAX_ROWS:
            by_g: dict = {}
            for r in (
                base.groupBy("_g", "_v").agg(F.sum("_w").alias("_c")).collect()
            ):
                by_g.setdefault(r["_g"], []).append((r["_v"], r["_c"]))
            for g in pending:
                resolved[g] = _residue_walk(
                    sorted(by_g.get(g, [])),
                    want[g] - state[g][2],
                    f"{label}: residue pass produced no value for "
                    f"group {g!r} — interval bookkeeping violated",
                )
        else:
            cells = (
                base.groupBy("_g", "_v", "_kk")
                .agg(F.sum("_w").alias("_c"))
                .withColumn(
                    "_cum",
                    F.sum("_c").over(
                        Window.partitionBy("_g")
                        .orderBy("_v")
                        .rowsBetween(Window.unboundedPreceding, 0)
                    ),
                )
                .filter(F.col("_cum") >= F.col("_kk"))
                .groupBy("_g")
                .agg(F.min("_v").alias("_ans"))
                .collect()
            )
            for r in cells:
                resolved[r["_g"]] = float(r["_ans"])
    unresolved = [g for g in want if g not in resolved]
    if unresolved:
        raise RuntimeError(
            f"{label}: residue pass produced no value for "
            f"groups {unresolved!r} (intervals "
            f"{ {g: state[g][:3] for g in unresolved} !r}) — interval "
            "bookkeeping violated"
        )
    rows = [
        (g, int(stats[g][2]), int(want[g]), resolved[g]) for g in sorted(want)
    ]
    # group dtype inherited from the input (a hardcoded string type would
    # mangle integer group keys)
    gtype = df.schema[group_col].dataType
    schema = T.StructType(
        [
            T.StructField(group_col, gtype),
            T.StructField(out_fields[0], T.LongType()),
            T.StructField(out_fields[1], T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    return spark.createDataFrame(rows, schema)
