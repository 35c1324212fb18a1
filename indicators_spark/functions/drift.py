"""Distribution-drift monitoring over corpus slices.

The question every multi-source ingest pipeline asks nightly: "does
source X's feature distribution still look like the corpus?"  KL
divergence over token histograms exists in :mod:`.text`
(``source_kl_divergence``); this module adds the numeric-column
counterpart — the two-sample Kolmogorov–Smirnov statistic per group
against the pooled corpus — which is the standard drift alarm for
lengths, quality scores, timestamps-per-doc, etc. (scipy's ``ks_2samp``
decision, computed distributed and exactly).

Reference parity note: the reference engine has no drift family; this
extends the corpus-QA surface (SURVEY.md §2's "beyond the reference"
training-data ops) the same way the audit queries do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _q4(c: Column) -> Column:
    return F.floor(c * 1e4 + 0.500000001) / 1e4


#: Kolmogorov distribution coefficient for α = 0.05: the two-sample
#: critical value is ``c(α)·sqrt((n+m)/(n·m))`` (Smirnov's asymptotic
#: approximation — the rule every drift monitor implements).
KS_C_ALPHA_05 = 1.358


def ks_drift_by_group(
    df: DataFrame,
    value_col: str,
    group_col: str,
    threshold: float | None = None,
) -> DataFrame:
    """Per-group two-sample KS statistic against the POOLED corpus:
    ``D_g = sup_v |F_g(v) − F(v)|`` over empirical CDFs, evaluated on
    the full grid of observed values (the sup of a difference of step
    functions is attained at a step of EITHER side, so evaluating only
    at the group's own values would understate D for sparse groups).
    Returns one row per group: ``(group, n, ks_d, drifted)`` with
    ``ks_d`` 4dp-quantized.  ``drifted`` defaults to the real KS test
    at α = 0.05 — ``ks_d > 1.358·sqrt((n+N)/(n·N))`` with ``N`` the
    pool size, so small slices need a proportionally larger gap before
    they alarm (a fixed threshold flags every 25-doc source as drifted
    on pure sampling noise); pass ``threshold`` for a fixed cut
    instead.  Either way the verdict derives from the EXACT (pre-
    quantization) statistic — only the emitted ``ks_d`` is rounded —
    so the flag matches the textbook KS decision at the boundary
    (ADVICE r9: quantization's upward rounding over-alarmed within
    ~5e-5 of the critical value).  Cross-engine parity still holds
    bit-for-bit: the statistic is IEEE arithmetic over exact integer
    counts in the same expression order on both engines.

    NULL values and NULL group keys are excluded (a NULL length is an
    extraction failure, not a distribution sample); the pooled CDF is
    over the surviving rows, and each group is compared against the
    whole pool INCLUDING itself — the monitoring convention (a 5%%
    slice drifting shows up fine; a 50%% slice dilutes its own alarm,
    which is what you want when the "reference" is just the corpus).

    Scale shape: ONE wide-data pass — the ``(group, value)`` cell
    aggregate with map-side partials — then everything downstream is
    cell-table sized: the value grid is one skinny groupBy of the
    cells, the grid×groups expansion is a broadcast cross of two TINY
    tables (#distinct values × #groups rows), and the CDFs are window
    cumsums partitioned by group over that grid.  For a high-cardinality
    continuous column at 100 TB, pre-bucket the value (``F.round`` /
    width-bucketing) — the statistic becomes the binned KS every
    monitoring system actually runs, and the cell table stays bounded
    by #bins × #groups."""
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("_g"),
        F.col(value_col).cast("double").alias("_v"),
    )
    cell = base.groupBy("_g", "_v").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    # pooled step function: cum count ≤ v, and the grand total
    val = (
        cell.groupBy("_v")
        .agg(F.sum("_c").alias("_cv"))
        .withColumn(
            "_cum_all",
            F.sum("_cv").over(
                Window.orderBy("_v").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        )
    )
    groups = cell.groupBy("_g").agg(F.sum("_c").alias("_n"))
    # pooled total N once, as a 1-row broadcast (ADVICE r9: a
    # partitionBy(_g) window sum recomputed the same constant per group)
    totdf = val.agg(F.sum("_cv").alias("_tot"))
    # full evaluation grid; both sides are tiny (≤ #values × #groups)
    grid = val.crossJoin(F.broadcast(groups)).crossJoin(F.broadcast(totdf))
    wg = (
        Window.partitionBy("_g")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = (
        grid.join(cell, ["_g", "_v"], "left")
        .withColumn(
            "_cum_g", F.sum(F.coalesce(F.col("_c"), F.lit(0))).over(wg)
        )
        .withColumn(
            "_diff",
            F.abs(
                F.col("_cum_g") / F.col("_n")
                - F.col("_cum_all") / F.col("_tot")
            ),
        )
    )
    out = joined.groupBy("_g", "_n", "_tot").agg(
        F.max("_diff").alias("_d_raw")
    )
    if threshold is None:
        # casts BEFORE the product: n·N in long overflows at corpus scale
        crit = F.lit(KS_C_ALPHA_05) * F.sqrt(
            (F.col("_n") + F.col("_tot")).cast("double")
            / (F.col("_n").cast("double") * F.col("_tot").cast("double"))
        )
    else:
        crit = F.lit(float(threshold))
    return out.select(
        F.col("_g").alias(group_col),
        F.col("_n").alias("n"),
        _q4(F.col("_d_raw")).alias("ks_d"),
        (F.col("_d_raw") > crit).alias("drifted"),
    )
