"""Return operators (per symbol).

Re-expressions of SURVEY.md §2a "Returns": daily_return
(indicators.py:525-541), daily_log_return (:543-558), cumulative_returns
(:560-576 — keeps the as-written percent-units quirk: the compounded factor
is ``1 + daily_return_in_percent``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import kernels as K


class ReturnsOps:
    """Mixin: return calculations."""

    def daily_return(self, columns, _suffix: str = ""):
        """Per-symbol percent return: ``(c - c1)/c1 * 100``."""
        cols = self._resolve_and_validate(columns)
        w = self._word(global_op=False)
        self._with(
            {
                f"{_suffix}{c}_daily_return": K.pct_change(c, w) * 100
                for c in cols
            }
        )
        return self

    def daily_log_return(self, columns):
        """Per-symbol log return: ``ln(c/c1)``.  Non-positive ratios → NULL
        (Spark ``F.log`` convention; the oracle encodes the same guard)."""
        cols = self._resolve_and_validate(columns)
        w = self._word(global_op=False)
        self._with(
            {
                f"{c}_daily_log_return": F.log(
                    K.safe_div(F.col(c), F.lag(F.col(c)).over(w))
                )
                for c in cols
            }
        )
        return self

    def cumulative_returns(self, columns):
        """Per-symbol ``cum_prod(1 + daily_return)`` with daily_return in
        *percent* — the reference quirk (indicators.py:567-574): this is
        ``∏(1 + 100·r)``, not the textbook ``∏(1+r)``.  Uses ``F.product``
        over a cumulative frame (Spark ≥3.2, JVM-side)."""
        cols = self._resolve_and_validate(columns)
        w = self._word(global_op=False)
        wc = self._wcum(global_op=False)
        for c in cols:
            self._with({f"_{c}_dr": K.pct_change(c, w) * 100})
            self._with(
                {
                    f"{c}_cumulative_return": K.cum_prod(
                        F.col(f"_{c}_dr") + 1, wc
                    )
                }
            )
            self._drop(f"_{c}_dr")
        return self
