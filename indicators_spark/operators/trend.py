"""Trend / moving-average operators.

Re-expressions of the reference surface (SURVEY.md §2a "Trend"):
``sma`` (indicators.py:78-100), ``ema`` (:169-185), ``macd`` (:300-342),
``trix`` (:856-875), ``dpo`` (:1086-1104), ``wma`` (dead-code spec
:965-978), ``kama`` (stub :1382, kept as NotImplementedError for parity).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import kernels as K
from ..ewm import ExprStep, ema_alpha


class TrendOps:
    """Mixin: trend indicators.  Host class provides ``_df``/window helpers."""

    def sma(self, columns, window_size: int, _suffix: str = ""):
        """Simple moving average per symbol → ``{col}_sma_{n}``.

        Reference: indicators.py:78-100 (rolling_mean over symbol).
        """
        cols = self._resolve_and_validate(columns)
        w = self._w(window_size, global_op=False)
        self._with(
            {
                f"{_suffix}{c}_sma_{window_size}": K.rolling_mean(c, window_size, w)
                for c in cols
            }
        )
        return self

    def ema(self, columns, span: int, _suffix: str = ""):
        """Exponential moving average per symbol → ``{col}_ema_{span}``.

        Reference: indicators.py:169-185 — ``ewm_mean(alpha=2/(span+1),
        adjust=False)``.  One applyInPandas pass for all requested columns.
        """
        cols = self._resolve_and_validate(columns)
        steps = [ema_alpha(c, f"{_suffix}{c}_ema_{span}", span) for c in cols]
        self._ewm(steps, global_op=False)
        return self

    def macd(
        self,
        columns,
        short_span: int = 12,
        long_span: int = 26,
        signal_span: int = 9,
        _suffix: str = "",
    ):
        """MACD — but, as written in the reference (indicators.py:300-342),
        only the *signal line* survives: output is ``{col}_signal_line``.

        One EWM program per call: ema(short), ema(long), macd = diff,
        signal = ema(macd, signal_span) — a single shuffle for 3 EWM stages.
        """
        cols = self._resolve_and_validate(columns)
        steps = []
        keep = []
        for c in cols:
            s, lg, m = f"_{c}_ema_s", f"_{c}_ema_l", f"_{c}_macd"
            out = f"{_suffix}{c}_signal_line"
            steps += [
                ema_alpha(c, s, short_span),
                ema_alpha(c, lg, long_span),
                ExprStep(m, lambda pdf, s=s, lg=lg: pdf[s] - pdf[lg]),
                ema_alpha(m, out, signal_span),
            ]
            keep.append(out)
        self._ewm(steps, global_op=False, keep=keep)
        return self

    def trix(self, period: int = 15):
        """TRIX: triple EMA of close, then pct_change → ``trix_{period}``.

        Reference: indicators.py:856-875.  EMAs are per-symbol (via ema());
        the final pct_change is *global* (no ``.over``) — replicated.
        """
        self._validate(["close"])
        steps = [
            ema_alpha("close", "_trix_e1", period),
            ema_alpha("_trix_e1", "_trix_e2", period),
            ema_alpha("_trix_e2", "_trix_e3", period),
        ]
        self._ewm(steps, global_op=False, keep=["_trix_e3"])
        wg = self._word(global_op=True)
        self._with({f"trix_{period}": K.pct_change("_trix_e3", wg)})
        self._drop("_trix_e3")
        return self

    def dpo(self, columns, look_back: int = 20):
        """Detrended price oscillator (global): ``c - sma(c,n).shift(n//2+1)``.

        Reference: indicators.py:1086-1104.
        """
        cols = self._resolve_and_validate(columns)
        offset = (look_back // 2) + 1
        w = self._w(look_back, global_op=True)
        word = self._word(global_op=True, back=offset)
        self._with(
            {
                f"{c}_dpo_{look_back}": F.col(c)
                - F.lag(K.rolling_mean(c, look_back, w), offset).over(word)
                for c in cols
            }
        )
        return self

    def wma(self, columns, window_size: int):
        """Weighted moving average — implemented from the reference's
        dead-code spec (indicators.py:965-978): weights ``1..n`` with the
        newest row weighted ``n``; null until the window is full.

        JVM-side formulation: an explicit lag-dot-product (stays inside
        whole-stage codegen; no collect_list materialization).  Any null in
        the window propagates → null, matching min_samples gating.
        """
        cols = self._resolve_and_validate(columns)
        n = window_size
        word = self._word(global_op=False, back=n - 1)
        denom = float(n * (n + 1) / 2)
        out = {}
        for c in cols:
            acc = F.lit(0.0)
            for k in range(n):  # lag k ago gets weight n-k
                acc = acc + F.lag(F.col(c), k).over(word) * F.lit(float(n - k))
            out[f"{c}_wma_{n}"] = acc / F.lit(denom)
        self._with(out)
        return self

    def kama(self):
        """Parity stub — reference raises (indicators.py:1382-1414)."""
        raise NotImplementedError


class TrendExtOps:
    """Extension variants of reference stubs whose dead code is too
    incomplete to count as a spec (kama, indicators.py:1382-1414)."""

    def kama_ext(
        self,
        columns,
        er_period: int = 10,
        fast: int = 2,
        slow: int = 30,
    ):
        """Kaufman adaptive moving average (textbook), per symbol.

        ER and the squared smoothing constant are pure window expressions
        (JVM); only the final variable-alpha scan runs in the per-symbol
        EWM program.  Output ``{col}_kama_{n}`` is NULL for the first
        ``er_period`` rows and seeds with the price at row ``er_period+1``.
        """
        import pandas as pd

        from ..ewm import ExprStep

        cols = self._resolve_and_validate(columns)
        word = self._word(global_op=False, back=er_period)
        w = self._w(er_period, global_op=False)
        fast_sc = 2.0 / (fast + 1)
        slow_sc = 2.0 / (slow + 1)
        steps = []
        keep = []
        for c in cols:
            change = F.abs(F.col(c) - F.lag(F.col(c), er_period).over(word))
            vol = K.rolling_sum(
                f"_kama_ad_{c}", er_period, w
            )  # Σ|diff| over n rows
            self._with({f"_kama_ad_{c}": F.abs(K.diff(c, word))})
            er = K.safe_div(change, vol)
            # explicit square (pow() is not guaranteed bit-equal to x*x
            # across engines; the oracle squares the same way)
            base = er * (fast_sc - slow_sc) + slow_sc
            self._with({f"_kama_sc_{c}": base * base})
            out = f"{c}_kama_{er_period}"

            def scan(pdf: pd.DataFrame, c=c, out=out) -> pd.Series:
                y = None
                ys = []
                for x, s in zip(pdf[c], pdf[f"_kama_sc_{c}"]):
                    if s != s or s is None:  # SC null/NaN → warm-up
                        y = None
                        ys.append(float("nan"))
                        continue
                    y = x if y is None else y + s * (x - y)
                    ys.append(y)
                return pd.Series(ys, index=pdf.index)

            steps.append(ExprStep(out, scan))
            keep.append(out)
        self._ewm(steps, global_op=False, keep=keep)
        self._drop(*[f"_kama_{s}_{c}" for c in cols for s in ("ad", "sc")])
        return self
