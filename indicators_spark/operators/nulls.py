"""Null-handling operators.

Re-expression of the reference's ``fill_null`` (indicators.py:137-167):
exactly one of ``value``/``method`` (ValueError otherwise); strategies are
applied per symbol (``.over("symbol")``), a literal value is applied
globally.  All strategies are pure window/aggregate expressions — no UDFs:

* forward  → ``last(c, ignorenulls=True)`` over unbounded-preceding frame
* backward → ``last(c, ignorenulls=True)`` over the reversed-order running
  frame (row-for-row equal to ``first`` over the unbounded-following frame,
  which Spark evaluates O(n²) per partition)
* min/max/mean → coalesce with the whole-partition aggregate
* zero/one → coalesce with the literal
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


class NullOps:
    """Mixin: null handling."""

    _FILL_METHODS = ("forward", "backward", "min", "max", "mean", "zero", "one")

    def fill_null(self, columns, value=None, method: str | None = None):
        if value is not None and method is not None:
            raise ValueError("Either Value or Method can be given")
        if value is None and method is None:
            raise ValueError("Either Value or Method needs to be given")
        if method is not None and method not in self._FILL_METHODS:
            raise ValueError(f"Unknown fill method: {method!r}")

        cols = self._resolve_and_validate(columns)

        if value is not None:
            self._with({c: F.coalesce(F.col(c), F.lit(value)) for c in cols})
            return self

        # these frames are unbounded (full-prefix fills, whole-partition
        # mean/median) — no bounded halo serves them, and the duplicated
        # halo rows would bias mean/median, so the session collapses first
        self._halo_collapse()
        part = Window.partitionBy("symbol")
        order = [F.col(c) for c in self._order]
        w_prev = (
            part.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # Backward fill is evaluated over the REVERSED ordering with a
        # running [unbounded preceding, current row] frame: Spark's
        # unbounded-FOLLOWING frame re-aggregates the whole remaining
        # partition for every row (O(n²) per symbol), while the running
        # frame is a single O(n) scan.  first-non-null at-or-after row i
        # ascending ≡ last-non-null at-or-before row i descending, row for
        # row, because the (timestamp, seq) order key is total.
        w_next_rev = (
            part.orderBy(*[c.desc() for c in order])
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_all = part.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )

        def fill(c: str):
            col = F.col(c)
            if method == "forward":
                return F.last(col, ignorenulls=True).over(w_prev)
            if method == "backward":
                return F.last(col, ignorenulls=True).over(w_next_rev)
            if method == "min":
                return F.coalesce(col, F.min(col).over(w_all))
            if method == "max":
                return F.coalesce(col, F.max(col).over(w_all))
            if method == "mean":
                return F.coalesce(col, F.avg(col).over(w_all))
            if method == "zero":
                return F.coalesce(col, F.lit(0))
            return F.coalesce(col, F.lit(1))  # "one"

        self._with({c: fill(c) for c in cols})
        return self
