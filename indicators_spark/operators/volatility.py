"""Volatility / channel operators.

Re-expressions of SURVEY.md §2a "Volatility": bollinger_bands
(indicators.py:251-298), atr (:344-368), keltner_channel (:1249-1278),
donchian_channel (:980-1003), ichimoku (:785-823), mass_index (:877-898),
unlcer_index (broken as written, :1061-1084 — implemented as the intended
formula), psar (stub :900-907, parity raise).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import kernels as K
from ..ewm import ExprStep, ewm_span


class VolatilityOps:
    """Mixin: volatility indicators."""

    def bollinger_bands(
        self, columns, window_size: int = 20, num_std_dev: float = 2, _suffix: str = ""
    ):
        """Bollinger bands per symbol: sma ± k·stddev_samp (ddof=1).

        Output names keep the reference's ``upprsier_band`` typo verbatim
        (indicators.py:277) — hash-parity depends on it."""
        cols = self._resolve_and_validate(columns)
        w = self._w(window_size, global_op=False)
        out = {}
        for c in cols:
            sma = K.rolling_mean(c, window_size, w)
            std = K.rolling_std(c, window_size, w)
            out[f"{_suffix}{c}_upprsier_band_{window_size}_{num_std_dev}"] = (
                sma + num_std_dev * std
            )
            out[f"{_suffix}{c}_lower_band_{window_size}_{num_std_dev}"] = (
                sma - num_std_dev * std
            )
        self._with(out)
        return self

    def atr(self, period: int = 14, _suffix: str = ""):
        """Average true range (global): rolling mean of
        ``max(h-l, |h-c1|, |l-c1|)`` → ``atr`` (indicators.py:344-368)."""
        self._validate(["high", "low", "close"])
        wg = self._word(global_op=True)
        w = self._w(period, global_op=True)
        c1 = F.lag(F.col("close")).over(wg)
        self._with(
            {
                "_atr_tr": F.greatest(
                    F.col("high") - F.col("low"),
                    F.abs(F.col("high") - c1),
                    F.abs(F.col("low") - c1),
                )
            }
        )
        self._with({f"{_suffix}atr": K.rolling_mean("_atr_tr", period, w)})
        self._drop("_atr_tr")
        return self

    def keltner_channel(
        self, ema_period: int = 20, atr_period: int = 14, multiplyer: float = 2
    ):
        """Keltner channel (global): span-EWM middle band ± k·ATR where
        ``tr = max(h,c1) - min(l,c1)`` (indicators.py:1249-1278; param typo
        ``multiplyer`` kept for signature parity)."""
        self._validate(["high", "low", "close"])
        wg = self._word(global_op=True)
        w = self._w(atr_period, global_op=True)
        c1 = F.lag(F.col("close")).over(wg)
        self._with(
            {
                "_kc_tr": F.greatest(F.col("high"), c1)
                - F.least(F.col("low"), c1)
            }
        )
        self._ewm([ewm_span("close", "_kc_mid", ema_period)], global_op=True)
        atr = K.rolling_mean("_kc_tr", atr_period, w)
        self._with(
            {
                f"KC_Upper_Band_{ema_period}_{atr_period}_{multiplyer}": F.col("_kc_mid")
                + atr * multiplyer,
                f"KC_Lower_Band_{ema_period}_{atr_period}_{multiplyer}": F.col("_kc_mid")
                - atr * multiplyer,
            }
        )
        self._drop("_kc_tr", "_kc_mid")
        return self

    def donchian_channel(self, look_back: int = 20):
        """Donchian channel (global): rolling max/min/midpoint →
        ``donchian_{upper,lower,mid}_{n}`` (indicators.py:980-1003).

        Plain (non-halo) FAITHFUL-GLOBAL sessions — where the window
        runs as a single task — evaluate the sliding extrema via the
        van Herk / Gil–Werman block decomposition: Spark's bounded sliding
        frame re-aggregates all ``look_back`` rows per row (O(n·k) — the
        dominant cost of this operator at 600k rows in one faithful-mode
        task), while max/min over a k-aligned block split is exactly
        ``combine(suffix_max(window start), prefix_max(window end))`` —
        two O(1)-per-row running extrema inside each block plus one lag.
        The k-row window spans at most two adjacent blocks, and the block
        partitioning additionally PARALLELIZES the heavy pass that the
        single-task global window serializes.  Identical values: same
        frame rows (total order is already a system invariant — every
        ROWS-frame operator needs it for oracle parity), extrema ignore
        NULLs on both paths (greatest/least skip NULLs), and the non-null
        gate count over the frame is the running count minus its lag.
        Halo sessions keep the classic expression — the halo already
        splits the window and its budget accounting owns the specs."""
        self._validate(["high", "low"])
        w = self._w(look_back, global_op=True)  # decides the halo dispatch
        if (
            not self._halo_on
            and look_back >= 2
            and not self._partition(True)
        ):
            # blocked path ONLY where the plain frame would run as ONE
            # task (faithful global, symbol-less) — that is the case it
            # was measured on.  per_symbol mode's sliding frame is
            # already #symbols-parallel and fuses into the chain's
            # single exchange; the block decomposition there trades a
            # cheap O(n·k) frame for 3 extra sorts + 6 window stages
            # (the r13 pipeline_per_symbol regression).
            self._donchian_blocked(look_back)
            return self
        up = K.rolling_max("high", look_back, w)
        lo = K.rolling_min("low", look_back, w)
        self._with(
            {
                f"donchian_upper_{look_back}": up,
                f"donchian_lower_{look_back}": lo,
            }
        )
        self._with(
            {
                f"donchian_mid_{look_back}": (
                    F.col(f"donchian_upper_{look_back}")
                    + F.col(f"donchian_lower_{look_back}")
                )
                / 2
            }
        )
        return self

    def _donchian_blocked(self, n: int) -> None:
        """Van Herk / Gil–Werman sliding extrema for the plain (non-halo)
        path; see :meth:`donchian_channel`.  Window [i−n+1, i] spans at
        most two adjacent n-aligned blocks, so
        ``extreme = combine(block_suffix(i−n+1), block_prefix(i))``; the
        suffix is the running extreme over the REVERSED in-block order
        (exact because the session order key is total), and the warm-up
        gate's frame count is the running non-null count minus its lag-n."""
        from pyspark.sql import Window

        part = self._partition(True)
        order = [F.col(c) for c in self._order]
        order_d = [F.col(c).desc() for c in self._order]
        w_ord = Window.partitionBy(*part).orderBy(*order)
        w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        self._with(
            {
                "_dc_blk": F.floor((F.row_number().over(w_ord) - 1) / n),
                "_dc_rch": F.count("high").over(w_cum),
                "_dc_rcl": F.count("low").over(w_cum),
            }
        )
        bpart = (*part, "_dc_blk")
        w_asc = (
            Window.partitionBy(*bpart)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_desc = (
            Window.partitionBy(*bpart)
            .orderBy(*order_d)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        self._with(
            {
                "_dc_pfh": F.max("high").over(w_asc),
                "_dc_sfh": F.max("high").over(w_desc),
                "_dc_pfl": F.min("low").over(w_asc),
                "_dc_sfl": F.min("low").over(w_desc),
            }
        )
        gate_h = (F.col("_dc_rch") - F.lag("_dc_rch", n, 0).over(w_ord)) >= n
        gate_l = (F.col("_dc_rcl") - F.lag("_dc_rcl", n, 0).over(w_ord)) >= n
        self._with(
            {
                f"donchian_upper_{n}": F.when(
                    gate_h,
                    F.greatest(
                        F.lag("_dc_sfh", n - 1).over(w_ord), F.col("_dc_pfh")
                    ),
                ),
                f"donchian_lower_{n}": F.when(
                    gate_l,
                    F.least(
                        F.lag("_dc_sfl", n - 1).over(w_ord), F.col("_dc_pfl")
                    ),
                ),
            }
        )
        self._with(
            {
                f"donchian_mid_{n}": (
                    F.col(f"donchian_upper_{n}") + F.col(f"donchian_lower_{n}")
                )
                / 2
            }
        )
        self._drop(
            "_dc_blk", "_dc_rch", "_dc_rcl", "_dc_pfh", "_dc_sfh", "_dc_pfl", "_dc_sfl"
        )

    def ichimoku(self, window_one: int = 9, window_two: int = 26, window_three: int = 52):
        """Ichimoku cloud (global), quirks preserved (indicators.py:785-823):
        senkou_span_b shifts by a *literal* 26 regardless of ``window_two``;
        chikou_span is ``close.shift(-window_two)`` — a genuine look-ahead
        (``F.lead``)."""
        self._validate(["high", "low", "close"])
        wg = self._word(
            global_op=True, back=max(26, window_two), fwd=window_two
        )

        def midline(n: int) -> F.Column:
            w = self._w(n, global_op=True)
            return (K.rolling_max("high", n, w) + K.rolling_min("low", n, w)) / 2

        self._with(
            {
                "tenkan_sen": midline(window_one),
                "kijun_sen": midline(window_two),
                "senkou_span_b": F.lag(midline(window_three), 26).over(wg),
                "chikou_span": F.lead(F.col("close"), window_two).over(wg),
            }
        )
        self._with(
            {
                "senkou_span_a": F.lag(
                    (F.col("tenkan_sen") + F.col("kijun_sen")) / 2, window_two
                ).over(wg)
            }
        )
        return self

    def mass_index(self, ema_period: int = 9, mi_period: int = 26):
        """Mass index (global): double span-EWM of (h-l), rolling sum of the
        ratio → ``mass_index_{e}_{m}`` (indicators.py:877-898)."""
        self._validate(["high", "low"])
        steps = [
            ExprStep("_mi_hl", lambda pdf: pdf["high"] - pdf["low"]),
            ewm_span("_mi_hl", "_mi_e1", ema_period),
            ewm_span("_mi_e1", "_mi_e2", ema_period),
            ExprStep(
                "_mi_ratio",
                lambda pdf: pdf["_mi_e1"] / pdf["_mi_e2"].where(pdf["_mi_e2"] != 0),
            ),
        ]
        self._ewm(steps, global_op=True, keep=["_mi_ratio"])
        w = self._w(mi_period, global_op=True)
        self._with(
            {
                f"mass_index_{ema_period}_{mi_period}": K.rolling_sum(
                    "_mi_ratio", mi_period, w
                )
            }
        )
        self._drop("_mi_ratio")
        return self

    def unlcer_index(self, columns, look_back: int = 14):
        """Ulcer index [sic] — the reference body is broken as written
        (``pl.col(col / ...)``, indicators.py:1074 → TypeError).  Implemented
        as the *intended* formula: ``sqrt(rolling_mean(((c/rolling_max(c,n))
        - 1)², n))`` (global), documented as fixed-vs-reference."""
        cols = self._resolve_and_validate(columns)
        w = self._w(look_back, global_op=True)
        for c in cols:
            dd = K.safe_div(F.col(c), K.rolling_max(c, look_back, w)) - 1
            self._with({f"_ui_dd2_{c}": dd * dd})
            self._with(
                {
                    f"{c}_ulcer_index_{look_back}": F.sqrt(
                        K.rolling_mean(f"_ui_dd2_{c}", look_back, w)
                    )
                }
            )
            self._drop(f"_ui_dd2_{c}")
        return self

    def psar(
        self, af_start: float = 0.02, af_increment: float = 0.02, af_max: float = 0.02
    ):
        """Parity stub — reference raises (indicators.py:900-907)."""
        raise NotImplementedError


class VolatilityExtOps:
    """Extension variants of reference stubs (psar, indicators.py:900-907)."""

    def psar_ext(
        self,
        af_start: float = 0.02,
        af_increment: float = 0.02,
        af_max: float = 0.2,
    ):
        """Parabolic SAR (textbook state machine), per symbol.

        Inherently sequential (trend flips depend on the running extreme
        point), so it runs as one Arrow-batched scan per symbol — the same
        physical shape as the EWM programs.  Output column ``psar``.
        Genuinely non-SQL-expressible → rows-only oracle check.
        """
        import pandas as pd

        from ..ewm import ExprStep

        self._validate(["high", "low"])

        def scan(pdf: pd.DataFrame) -> pd.Series:
            highs = pdf["high"].to_numpy()
            lows = pdf["low"].to_numpy()
            n = len(highs)
            out = [float("nan")] * n
            if n < 2:
                return pd.Series(out, index=pdf.index)
            rising = highs[1] + lows[1] >= highs[0] + lows[0]
            sar = lows[0] if rising else highs[0]
            ep = highs[0] if rising else lows[0]
            af = af_start
            for i in range(1, n):
                sar = sar + af * (ep - sar)
                if rising:
                    sar = min(sar, lows[i - 1])
                    if lows[i] < sar:  # flip to falling
                        rising, sar, ep, af = False, ep, lows[i], af_start
                    elif highs[i] > ep:
                        ep, af = highs[i], min(af + af_increment, af_max)
                else:
                    sar = max(sar, highs[i - 1])
                    if highs[i] > sar:  # flip to rising
                        rising, sar, ep, af = True, ep, highs[i], af_start
                    elif lows[i] < ep:
                        ep, af = lows[i], min(af + af_increment, af_max)
                out[i] = sar
            return pd.Series(out, index=pdf.index)

        self._ewm([ExprStep("psar", scan)], global_op=False)
        return self
