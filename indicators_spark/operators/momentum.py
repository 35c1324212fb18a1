"""Momentum / oscillator operators.

Re-expressions of SURVEY.md §2a "Momentum": rsi (indicators.py:187-249),
stochastic_oscillator (:370-393), stochastic_rsi (:488-523), roc (:472-486),
williams_ri (:909-926), awesome_oscillator (:102-135), ppo/pvo (:395-470),
ultimate_oscillator (:1191-1247), true_strength_index (:1143-1189),
cci (:672-703), adx (:602-663), vortex (:825-854), aroon (dead-code spec
:1012-1039), kst (dead-code spec :1293-1328), stc (dead-code spec
:1345-1380), kst_oscillator (stub :1106, parity raise).

As-written quirks preserved (SURVEY.md §2c.5): stochastic's numerator is
``rolling_min(close - low)``; stochastic_rsi's denominator is ``max - max``
(≡ 0 → NULL under the engine's ÷0 policy); adx's TR first term is ``high -
close``; ultimate_oscillator's TR is ``max(h,c1) - max(l,c1)``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import kernels as K
from ..ewm import ExprStep, ema_alpha, ewm_span


class MomentumOps:
    """Mixin: momentum indicators."""

    def rsi(self, columns, period: int = 14, _suffix: str = ""):
        """Cutler's RSI (SMA smoothing): 100 - 100/(1 + avg_gain/avg_loss).

        Reference: indicators.py:187-249.  Mixed partitioning replicated:
        the delta is *global* (no ``.over``, :197) while the rolling means
        are per-symbol (:214-227).  avg_loss = 0 → NULL (÷0 policy).
        """
        cols = self._resolve_and_validate(columns)
        wg = self._word(global_op=True)
        ws = self._w(period, global_op=False)
        out = {}
        for c in cols:
            delta = K.diff(c, wg)
            gain = K.when_nullsafe(delta > 0, delta, F.lit(0.0))
            loss = K.when_nullsafe(delta < 0, F.abs(delta), F.lit(0.0))
            self._with({f"_{c}_gain": gain, f"_{c}_loss": loss})
            avg_gain = K.rolling_mean(f"_{c}_gain", period, ws)
            avg_loss = K.rolling_mean(f"_{c}_loss", period, ws)
            out[f"{_suffix}{c}_rsi_{period}"] = 100 - K.safe_div(
                F.lit(100.0), 1 + K.safe_div(avg_gain, avg_loss)
            )
        self._with(out)
        self._drop(*[f"_{c}_{s}" for c in cols for s in ("gain", "loss")])
        return self

    def stochastic_oscillator(self, period: int = 14, _suffix: str = ""):
        """As-written quirk (indicators.py:370-393): numerator is
        ``rolling_min(close - low, n)`` — not ``close - rolling_min(low)``.
        Global windows."""
        self._validate(["high", "low", "close"])
        w = self._w(period, global_op=True)
        self._with({"_so_cl": F.col("close") - F.col("low")})
        num = K.rolling_min("_so_cl", period, w)
        den = K.rolling_max("high", period, w) - K.rolling_min("low", period, w)
        self._with(
            {f"{_suffix}stochastic_oscillator_{period}": K.safe_div(num, den) * 100}
        )
        self._drop("_so_cl")
        return self

    def stochastic_rsi(self, columns, rsi_period: int = 14, stoch_period: int = 14):
        """Faithful to the as-written bug (indicators.py:509-518): the
        denominator is ``rolling_max - rolling_max`` ≡ 0, so the output is
        all-NULL under the ÷0→NULL policy (Polars emitted ±inf/NaN).
        See :meth:`stochastic_rsi_fixed` for the corrected variant."""
        cols = self._resolve_and_validate(columns)
        self.rsi(columns=cols, period=rsi_period, _suffix="_")
        w = self._w(stoch_period, global_op=True)
        out = {}
        for c in cols:
            r = f"_{c}_rsi_{rsi_period}"
            num = F.col(r) - K.rolling_min(r, stoch_period, w)
            den = K.rolling_max(r, stoch_period, w) - K.rolling_max(r, stoch_period, w)
            out[f"{c}_stoch_rsi_{rsi_period}_{stoch_period}"] = K.safe_div(num, den)
        self._with(out)
        self._drop(*[f"_{c}_rsi_{rsi_period}" for c in cols])
        return self

    def stochastic_rsi_fixed(self, columns, rsi_period: int = 14, stoch_period: int = 14):
        """Extension: textbook StochRSI = (rsi - min)/(max - min) over n."""
        cols = self._resolve_and_validate(columns)
        self.rsi(columns=cols, period=rsi_period, _suffix="_")
        w = self._w(stoch_period, global_op=True)
        out = {}
        for c in cols:
            r = f"_{c}_rsi_{rsi_period}"
            num = F.col(r) - K.rolling_min(r, stoch_period, w)
            den = K.rolling_max(r, stoch_period, w) - K.rolling_min(r, stoch_period, w)
            out[f"{c}_stoch_rsi_fixed_{rsi_period}_{stoch_period}"] = K.safe_div(num, den)
        self._with(out)
        self._drop(*[f"_{c}_rsi_{rsi_period}" for c in cols])
        return self

    def roc(self, columns, period: int = 10):
        """Rate of change (global): ``(c - c.shift(n))/c.shift(n) * 100``.

        Reference: indicators.py:472-486 (list-of-str only, no ``.over``).
        """
        cols = self._resolve_and_validate(columns)
        wg = self._word(global_op=True, back=period)
        self._with(
            {f"{c}_roc_{period}": K.pct_change(c, wg, period) * 100 for c in cols}
        )
        return self

    def williams_ri(self, lookback: int = 14):
        """Williams %R (global) → ``williams_%r_{n}`` (name kept verbatim,
        indicators.py:924)."""
        self._validate(["high", "low", "close"])
        w = self._w(lookback, global_op=True)
        hh = K.rolling_max("high", lookback, w)
        ll = K.rolling_min("low", lookback, w)
        self._with(
            {f"williams_%r_{lookback}": K.safe_div(hh - F.col("close"), hh - ll) * -100}
        )
        return self

    def awesome_oscillator(
        self, short_window: int = 5, long_window: int = 34, _suffix: str = ""
    ):
        """AO = sma(midpoint, short) - sma(midpoint, long), per symbol.

        Reference: indicators.py:102-135 (composes sma on ``(h+l)/2``).
        """
        self._validate(["high", "low"])
        mid = "_ao_midpoint"
        self._with({mid: (F.col("high") + F.col("low")) / 2})
        ws = self._w(short_window, global_op=False)
        wl = self._w(long_window, global_op=False)
        self._with(
            {
                f"{_suffix}ao_{short_window}_{long_window}": K.rolling_mean(
                    mid, short_window, ws
                )
                - K.rolling_mean(mid, long_window, wl)
            }
        )
        self._drop(mid)
        return self

    def _helper_pvo_ppo(
        self, col: str, short_window: int, long_window: int, signal_window: int
    ):
        """Shared PPO/PVO body (reference indicators.py:395-447): percentage
        EMA oscillator + signal EMA + histogram — 3 outputs, one EWM pass."""
        self._validate([col])
        name = "ppo" if col == "close" else "pvo"
        line = f"{name}_{short_window}_{long_window}"
        signal = f"{name}_signal_{short_window}_{long_window}"
        hist = f"{name}_histogram_{short_window}_{long_window}"
        es, el = f"_{col}_es", f"_{col}_el"
        steps = [
            ema_alpha(col, es, short_window),
            ema_alpha(col, el, long_window),
            ExprStep(
                line,
                lambda pdf, es=es, el=el: (pdf[es] - pdf[el])
                / pdf[el].where(pdf[el] != 0)
                * 100,
            ),
            ema_alpha(line, signal, signal_window),
            ExprStep(hist, lambda pdf, line=line, signal=signal: pdf[line] - pdf[signal]),
        ]
        self._ewm(steps, global_op=False, keep=[line, signal, hist])
        return self

    def ppo(self, short_window: int = 12, long_window: int = 26, signal_window: int = 9):
        """Percentage price oscillator (reference indicators.py:449-460)."""
        return self._helper_pvo_ppo("close", short_window, long_window, signal_window)

    def pvo(self, short_window: int = 12, long_window: int = 26, signal_window: int = 9):
        """Percentage volume oscillator (reference indicators.py:462-470)."""
        return self._helper_pvo_ppo("volume", short_window, long_window, signal_window)

    def ultimate_oscillator(
        self,
        short: int = 7,
        medium: int = 14,
        long: int = 28,
        short_wt: int = 4,
        medium_wt: int = 2,
        long_wt: int = 2,
    ):
        """Ultimate oscillator (global), as-written TR quirk preserved:
        ``tr = max(high, c1) - max(low, c1)`` (indicators.py:1210-1213; the
        textbook second term is min).  Null ratios contribute 0 to the
        weighted sum (Polars sum_horizontal semantics)."""
        self._validate(["high", "low", "close"])
        wg = self._word(global_op=True)
        c1 = F.lag(F.col("close")).over(wg)
        self._with(
            {
                "_uo_bp": F.col("close") - F.least(F.col("low"), c1),
                "_uo_tr": F.greatest(F.col("high"), c1) - F.greatest(F.col("low"), c1),
            }
        )
        parts = []
        for n, wt in ((short, short_wt), (medium, medium_wt), (long, long_wt)):
            w = self._w(n, global_op=True)
            ratio = K.safe_div(
                K.rolling_mean("_uo_bp", n, w), K.rolling_mean("_uo_tr", n, w)
            )
            parts.append(ratio * wt)
        total_wt = short_wt + medium_wt + long_wt
        name = f"UO_{short}_{medium}_{long}_{short_wt}_{medium_wt}_{long_wt}"
        self._with({name: K.nullsafe_sum_horizontal(*parts) * 100 / total_wt})
        self._drop("_uo_bp", "_uo_tr")
        return self

    def true_strength_index(self, columns, short_period: int, long_preiod: int):
        """TSI (global): double span-EWM (adjust=True) of delta and |delta|.

        Reference: indicators.py:1143-1189 (param typo ``long_preiod`` kept
        for signature parity).  One global EWM pass for all four scans."""
        cols = self._resolve_and_validate(columns)
        wg = self._word(global_op=True)
        self._with({f"_{c}_dp": K.diff(c, wg) for c in cols})
        steps = []
        keep = []
        for c in cols:
            steps += [
                ExprStep(f"_{c}_adp", lambda pdf, c=c: pdf[f"_{c}_dp"].abs()),
                ewm_span(f"_{c}_dp", f"_{c}_s1", short_period),
                ewm_span(f"_{c}_s1", f"_{c}_s2", long_preiod),
                ewm_span(f"_{c}_adp", f"_{c}_a1", short_period),
                ewm_span(f"_{c}_a1", f"_{c}_a2", long_preiod),
            ]
            keep += [f"_{c}_s2", f"_{c}_a2"]
        self._ewm(steps, global_op=True, keep=keep)
        self._with(
            {
                f"{c}_tsi_{short_period}_{long_preiod}": K.safe_div(
                    100 * F.col(f"_{c}_s2"), F.col(f"_{c}_a2")
                )
                for c in cols
            }
        )
        self._drop(*[f"_{c}_{s}" for c in cols for s in ("dp", "s2", "a2")])
        return self

    def cci(self, period: int = 14):
        """Commodity Channel Index (global) → ``CCI`` (uppercase kept).

        Reference: indicators.py:672-703 — mean deviation is the rolling
        mean of ``|tp - sma_tp|`` (itself null during sma warm-up, so the
        output goes non-null only after ``2(n-1)`` rows)."""
        self._validate(["high", "low", "close"])
        w = self._w(period, global_op=True)
        self._with({"_cci_tp": (F.col("high") + F.col("low") + F.col("close")) / 3})
        self._with({"_cci_sma": K.rolling_mean("_cci_tp", period, w)})
        self._with({"_cci_dev": F.abs(F.col("_cci_tp") - F.col("_cci_sma"))})
        md = K.rolling_mean("_cci_dev", period, w)
        self._with(
            {"CCI": K.safe_div(F.col("_cci_tp") - F.col("_cci_sma"), 0.015 * md)}
        )
        self._drop("_cci_tp", "_cci_sma", "_cci_dev")
        return self

    def adx(self, period: int = 14):
        """ADX (global), as-written quirks preserved (indicators.py:602-663):
        TR first term is ``high - close`` (not high - low); all smoothing is
        rolling_mean (Cutler-style, not Wilder)."""
        self._validate(["high", "low", "close"])
        wg = self._word(global_op=True)
        w = self._w(period, global_op=True)
        c1 = F.lag(F.col("close")).over(wg)
        self._with(
            {
                "_adx_tr": F.greatest(
                    F.col("high") - F.col("close"),
                    F.abs(F.col("high") - c1),
                    F.abs(F.col("low") - c1),
                ),
                "_adx_up": F.col("high") - F.lag(F.col("high")).over(wg),
                "_adx_dn": F.lag(F.col("low")).over(wg) - F.col("low"),
            }
        )
        self._with(
            {
                "_adx_pdm": K.when_nullsafe(
                    F.col("_adx_up") > 0, F.col("_adx_up"), F.lit(0.0)
                ),
                "_adx_ndm": K.when_nullsafe(
                    F.col("_adx_dn") > 0, F.col("_adx_dn"), F.lit(0.0)
                ),
            }
        )
        self._with(
            {
                "_adx_str": K.rolling_mean("_adx_tr", period, w),
                "_adx_spdm": K.rolling_mean("_adx_pdm", period, w),
                "_adx_sndm": K.rolling_mean("_adx_ndm", period, w),
            }
        )
        self._with(
            {
                "_adx_pdi": K.safe_div(F.col("_adx_spdm"), F.col("_adx_str")) * 100,
                "_adx_ndi": K.safe_div(F.col("_adx_sndm"), F.col("_adx_str")) * 100,
            }
        )
        self._with(
            {
                "_adx_dx": K.safe_div(
                    F.abs(F.col("_adx_pdi") - F.col("_adx_ndi")),
                    F.col("_adx_pdi") + F.col("_adx_ndi"),
                )
                * 100
            }
        )
        self._with({"adx": K.rolling_mean("_adx_dx", period, w)})
        self._drop(
            "_adx_tr", "_adx_up", "_adx_dn", "_adx_pdm", "_adx_ndm",
            "_adx_str", "_adx_spdm", "_adx_sndm", "_adx_pdi", "_adx_ndi", "_adx_dx",
        )
        return self

    def vortex(self, period: int = 14):
        """Vortex indicator (global) → ``+VI`` / ``-VI`` (names verbatim,
        indicators.py:846-847)."""
        self._validate(["high", "low", "close"])
        wg = self._word(global_op=True)
        w = self._w(period, global_op=True)
        c1 = F.lag(F.col("close")).over(wg)
        self._with(
            {
                "_vx_tr": F.greatest(
                    F.col("high") - F.col("low"),
                    F.abs(F.col("high") - c1),
                    F.abs(F.col("low") - c1),
                ),
                "_vx_vmp": F.abs(F.col("high") - F.lag(F.col("low")).over(wg)),
                "_vx_vmn": F.abs(F.col("low") - F.lag(F.col("high")).over(wg)),
            }
        )
        tr_sum = K.rolling_sum("_vx_tr", period, w)
        self._with(
            {
                "+VI": K.safe_div(K.rolling_sum("_vx_vmp", period, w), tr_sum),
                "-VI": K.safe_div(K.rolling_sum("_vx_vmn", period, w), tr_sum),
            }
        )
        self._drop("_vx_tr", "_vx_vmp", "_vx_vmn")
        return self

    def aroon(self, look_back: int = 14):
        """Aroon up/down from the reference's dead-code spec
        (indicators.py:1012-1039): ``100*(n - (len - argmax))/n`` with
        first-occurrence argmax (ties broken toward the oldest row).

        JVM-side: per-row position via ``row_number``, then the windowed max
        of ``struct(value, -rn)`` recovers the first-occurrence arg-extreme
        without materializing lists."""
        self._validate(["high", "low"])
        word = self._word(global_op=True)
        w = self._w(look_back, global_op=True)
        rn = F.row_number().over(word)
        self._with({"_ar_rn": rn})
        out = {}
        for col, agg, name in (
            ("high", "max", f"aroon_up_{look_back}"),
            ("low", "min", f"aroon_down_{look_back}"),
        ):
            v = F.col(col) if agg == "max" else -F.col(col)
            best = F.max(F.struct(v.alias("v"), (-F.col("_ar_rn")).alias("nr")))
            best_rn = -K.gated(best, col, look_back, w).getField("nr")
            # len(x) - argmax = rn_current - rn_best + 1
            steps_since = F.col("_ar_rn") - best_rn + 1
            out[name] = 100 * (look_back - steps_since) / F.lit(look_back)
        self._with(out)
        self._drop("_ar_rn")
        return self

    def kst(
        self,
        columns,
        roc_periods: tuple = (10, 15, 20, 30),
        sma_periods: tuple = (10, 10, 10, 15),
        weights: tuple = (1, 2, 3, 4),
    ):
        """KST from the reference's dead-code spec (indicators.py:1293-1328):
        weighted sum of SMA-smoothed ROCs → ``KST`` (global)."""
        cols = self._resolve_and_validate(columns)
        assert len(roc_periods) == len(sma_periods) == len(weights)
        wg = self._word(global_op=True, back=max(roc_periods))
        for c in cols:
            total = F.lit(0.0)
            tmp = []
            for i, (rp, sp, wt) in enumerate(
                zip(roc_periods, sma_periods, weights), start=1
            ):
                rc = f"_kst_roc_{i}"
                self._with({rc: K.pct_change(c, wg, rp) * 100})
                tmp.append(rc)
                w = self._w(sp, global_op=True)
                total = total + K.rolling_mean(rc, sp, w) * F.lit(float(wt))
            self._with({"KST": total})
            self._drop(*tmp)
        return self

    def kst_oscillator(self, columns):
        """Parity stub — reference raises (indicators.py:1106-1122)."""
        self._resolve_and_validate(columns)
        raise NotImplementedError

    def stc(
        self,
        columns,
        fast_period: int = 12,
        slow_period: int = 26,
        signal_period: int = 9,
        stoch_period: int = 10,
    ):
        """Schaff trend cycle from the dead-code spec (indicators.py:1345-80):
        span-EWM macd line, stoch-normalized over ``stoch_period``.  The dead
        code's ``select(exclude([]))`` keeps the ``_macd_line``/``_signal
        _line`` intermediates in the frame — replicated."""
        cols = self._resolve_and_validate(columns)
        steps = []
        keep = []
        for c in cols:
            m, s = f"_{c}_macd_line", f"_{c}_signal_line"
            steps += [
                ewm_span(c, f"_{c}_ef", fast_period),
                ewm_span(c, f"_{c}_es", slow_period),
                ExprStep(m, lambda pdf, c=c: pdf[f"_{c}_ef"] - pdf[f"_{c}_es"]),
                ewm_span(m, s, signal_period),
            ]
            keep += [m, s]
        self._ewm(steps, global_op=True, keep=keep)
        w = self._w(stoch_period, global_op=True)
        out = {}
        for c in cols:
            m = f"_{c}_macd_line"
            num = F.col(m) - K.rolling_min(m, stoch_period, w)
            den = K.rolling_max(m, stoch_period, w) - K.rolling_min(m, stoch_period, w)
            out[f"{c}_stc_{fast_period}_{slow_period}_{stoch_period}"] = (
                K.safe_div(num, den) * 100
            )
        self._with(out)
        return self
