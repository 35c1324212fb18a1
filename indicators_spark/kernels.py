"""Window kernels — the primitive layer every indicator is built from.

The reference engine (GandhiParth/Indicators, ``indicators.py``) is a Polars
expression library; its primitives are ``rolling_*`` / ``shift`` / ``cum_*``
expressions with ``.over("symbol")``.  Here each primitive is re-expressed as
a Spark ``Window`` expression so the whole operator surface stays inside
Catalyst/whole-stage-codegen (no Python in the hot path).

Scale notes (100 TB design):

* Every kernel takes explicit ``partition_cols`` — per-symbol windows hash-
  partition on ``symbol`` (one exchange, reused by Catalyst for every window
  expression sharing the same (partitionBy, orderBy) spec).
* "Global" windows (``partition_cols=()``) replicate the reference's
  un-partitioned semantics (reference computes many ops across the whole
  frame — see SURVEY.md §2c.3).  They serialize into a single task; at scale
  prefer per-symbol mode or the halo-repartition path in ``scale.py``.
* The min-samples gate adds a ``count`` over the *same* window frame, so it
  collapses into the same physical Window operator — no extra exchange.

Correctness-critical semantics (SURVEY.md §2c):

* Polars ``rolling_*`` default ``min_samples=window_size`` → first ``n-1``
  rows are null.  Spark happily aggregates partial frames, so every rolling
  kernel is gated: ``F.when(F.count(col).over(w) >= n, agg)``.
  ``F.count`` counts non-null values, which is exactly Polars' definition.
* Division by zero: Polars floats yield ±inf/NaN; Spark yields NULL.  The
  engine standardizes on NULL (``safe_div``), and every DuckDB oracle query
  encodes the same choice with ``NULLIF`` (SURVEY.md §2c.4).
* Null condition in when/then/otherwise: Polars propagates null; Spark/SQL
  take the otherwise branch.  ``when_nullsafe`` replicates propagation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F

ColumnOrName = Column | str

DEFAULT_ORDER: tuple[str, ...] = ("timestamp",)
DEFAULT_PARTITION: tuple[str, ...] = ("symbol",)


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def w_rows(
    n: int,
    partition_cols: Sequence[str] = DEFAULT_PARTITION,
    order_cols: Sequence[str] = DEFAULT_ORDER,
) -> WindowSpec:
    """Bounded rolling frame: the trailing ``n`` rows (inclusive).

    Mirrors Polars ``rolling_*(window_size=n)`` over a time-sorted frame.
    """
    return (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(-(n - 1), Window.currentRow)
    )


def w_cum(
    partition_cols: Sequence[str] = DEFAULT_PARTITION,
    order_cols: Sequence[str] = DEFAULT_ORDER,
) -> WindowSpec:
    """Cumulative frame: unbounded preceding → current row (``cum_sum`` etc.)."""
    return (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )


def w_ord(
    partition_cols: Sequence[str] = DEFAULT_PARTITION,
    order_cols: Sequence[str] = DEFAULT_ORDER,
) -> WindowSpec:
    """Ordered window without a frame — for ``lag``/``lead``/``row_number``."""
    return Window.partitionBy(*partition_cols).orderBy(*order_cols)


def w_following(
    partition_cols: Sequence[str] = DEFAULT_PARTITION,
    order_cols: Sequence[str] = DEFAULT_ORDER,
) -> WindowSpec:
    """Current row → unbounded following (for backward fill)."""
    return (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )


def gated(agg: Column, gate_on: ColumnOrName, n: int, w: WindowSpec) -> Column:
    """Apply ``agg`` over ``w`` only when the frame holds ``n`` non-null values.

    Replicates Polars' ``min_samples = window_size`` warm-up-null contract
    (reference default for every ``rolling_*`` call, e.g. indicators.py:94).
    The gate count runs over the same window spec, so Catalyst folds it into
    the same physical Window operator — zero extra shuffles.
    """
    return F.when(F.count(_col(gate_on)).over(w) >= F.lit(n), agg.over(w))


def rolling_mean(c: ColumnOrName, n: int, w: WindowSpec) -> Column:
    return gated(F.avg(_col(c)), c, n, w)


def rolling_sum(c: ColumnOrName, n: int, w: WindowSpec) -> Column:
    return gated(F.sum(_col(c)), c, n, w)


def rolling_min(c: ColumnOrName, n: int, w: WindowSpec) -> Column:
    return gated(F.min(_col(c)), c, n, w)


def rolling_max(c: ColumnOrName, n: int, w: WindowSpec) -> Column:
    return gated(F.max(_col(c)), c, n, w)


def rolling_std(c: ColumnOrName, n: int, w: WindowSpec) -> Column:
    """Sample std (ddof=1), matching Polars ``rolling_std`` (indicators.py:268)."""
    return gated(F.stddev_samp(_col(c)), c, n, w)


def safe_div(num: Column, den: Column) -> Column:
    """Division with ÷0 → NULL on both engine and oracle sides (§2c.4)."""
    return num / F.nullif(den, F.lit(0))


def when_nullsafe(cond: Column, then: Column, otherwise: Column) -> Column:
    """Polars when/then/otherwise: a NULL condition yields NULL (not otherwise)."""
    return F.when(cond.isNull(), F.lit(None)).when(cond, then).otherwise(otherwise)


def diff(c: ColumnOrName, w: WindowSpec, n: int = 1) -> Column:
    """Polars ``.diff()`` — current minus lag."""
    c = _col(c)
    return c - F.lag(c, n).over(w)


def pct_change(c: ColumnOrName, w: WindowSpec, n: int = 1) -> Column:
    """Polars ``.pct_change(n)`` with the engine's ÷0→NULL policy."""
    c = _col(c)
    prev = F.lag(c, n).over(w)
    return safe_div(c - prev, prev)


def cum_sum(c: ColumnOrName, w: WindowSpec) -> Column:
    """Cumulative sum; ``w`` must be a ``w_cum`` frame.  Skips nulls (SQL)."""
    return F.sum(_col(c)).over(w)


def cum_prod(c: ColumnOrName, w: WindowSpec) -> Column:
    """Cumulative product via ``F.product`` (Spark ≥3.2); ``w`` = cumulative frame."""
    return F.product(_col(c)).over(w)


def nullsafe_sum_horizontal(*cols: Column) -> Column:
    """Polars ``sum_horizontal``: nulls count as 0 (all-null row → 0)."""
    total = F.lit(0.0)
    for c in cols:
        total = total + F.coalesce(c, F.lit(0.0))
    return total
