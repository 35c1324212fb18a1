"""Volume / flow operators.

Re-expressions of SURVEY.md §2a "Volume": vwap (indicators.py:705-735),
vpt (:737-751), obv (:753-772), force_index (:928-941),
negative_volume_index (:943-956), nvi (stub :774-783, parity raise),
chaikin_money_flow (:1041-1059), ease_of_movement (:1124-1141),
adi (dead-code spec :1419-1439), mfi (dead-code spec :1444-1488).

All are global (no ``.over`` in the reference) — SURVEY.md §2c.3.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import kernels as K


class VolumeOps:
    """Mixin: volume/flow indicators."""

    def vwap(self):
        """VWAP (global, cumulative — no daily/symbol reset, indicators.py:721):
        ``cum_sum(tp*vol) / cum_sum(vol)`` → ``vwap``."""
        self._validate(["high", "low", "close", "volume"])
        wc = self._wcum(global_op=True)
        tp = (F.col("high") + F.col("low") + F.col("close")) / 3
        self._with({"_vwap_tpv": tp * F.col("volume")})
        self._with(
            {
                "vwap": K.safe_div(
                    K.cum_sum("_vwap_tpv", wc), K.cum_sum("volume", wc)
                )
            }
        )
        self._drop("_vwap_tpv")
        return self

    def vpt(self):
        """Volume-price trend (global): cum_sum(pct_change(close)·volume)
        → ``vpt`` (indicators.py:737-751)."""
        self._validate(["close", "volume"])
        wg = self._word(global_op=True)
        wc = self._wcum(global_op=True)
        self._with({"_vpt_chg": K.pct_change("close", wg) * F.col("volume")})
        self._with({"vpt": K.cum_sum("_vpt_chg", wc)})
        self._drop("_vpt_chg")
        return self

    def obv(self):
        """On-balance volume (global): cum_sum(sign(diff(close))·volume)
        → ``obv`` (indicators.py:753-772).  First-row direction is NULL
        (null diff propagates, Polars when-semantics)."""
        self._validate(["close", "volume"])
        wg = self._word(global_op=True)
        wc = self._wcum(global_op=True)
        d = K.diff("close", wg)
        direction = (
            F.when(d.isNull(), F.lit(None))
            .when(d > 0, F.lit(1.0))
            .when(d < 0, F.lit(-1.0))
            .otherwise(F.lit(0.0))
        )
        self._with({"_obv_chg": direction * F.col("volume")})
        self._with({"obv": K.cum_sum("_obv_chg", wc)})
        self._drop("_obv_chg")
        return self

    def force_index(self):
        """Force index (global): ``(c - c1) * volume`` (indicators.py:928-941)."""
        self._validate(["close", "volume"])
        wg = self._word(global_op=True)
        self._with({"force_index": K.diff("close", wg) * F.col("volume")})
        return self

    def negative_volume_index(self):
        """NVI, non-recursive as-written variant (indicators.py:943-956):
        ``when(vol < vol1) then cum_sum(c/c1 - 1) otherwise 0`` — the cumsum
        runs over *all* rows, the condition gates per row."""
        self._validate(["close", "volume"])
        wg = self._word(global_op=True)
        wc = self._wcum(global_op=True)
        self._with(
            {
                "_nvi_ret": K.safe_div(
                    F.col("close"), F.lag(F.col("close")).over(wg)
                )
                - 1
            }
        )
        cum = K.cum_sum("_nvi_ret", wc)
        vol1 = F.lag(F.col("volume")).over(wg)
        self._with({"nvi": K.when_nullsafe(F.col("volume") < vol1, cum, F.lit(0.0))})
        self._drop("_nvi_ret")
        return self

    def nvi(self):
        """Parity stub — reference raises (indicators.py:774-783)."""
        raise NotImplementedError

    def chaikin_money_flow(self, look_back: int = 14):
        """CMF (global): rolling_sum(MFM·vol, n) / rolling_sum(vol, n) where
        ``MFM = ((c-l)-(h-c))/(h-l)`` → ``cmf_{n}`` (indicators.py:1041-1059)."""
        self._validate(["high", "low", "close", "volume"])
        w = self._w(look_back, global_op=True)
        mfm = K.safe_div(
            (F.col("close") - F.col("low")) - (F.col("high") - F.col("close")),
            F.col("high") - F.col("low"),
        )
        self._with({"_cmf_mfv": mfm * F.col("volume")})
        self._with(
            {
                f"cmf_{look_back}": K.safe_div(
                    K.rolling_sum("_cmf_mfv", look_back, w),
                    K.rolling_sum("volume", look_back, w),
                )
            }
        )
        self._drop("_cmf_mfv")
        return self

    def ease_of_movement(self):
        """EOM, simplified as-written form (indicators.py:1124-1141):
        ``(h + l - h1 - l1) / volume``."""
        self._validate(["high", "low", "volume"])
        wg = self._word(global_op=True)
        self._with(
            {
                "ease_of_movement": K.safe_div(
                    F.col("high")
                    + F.col("low")
                    - F.lag(F.col("high")).over(wg)
                    - F.lag(F.col("low")).over(wg),
                    F.col("volume"),
                )
            }
        )
        return self

    def adi(self):
        """Accumulation/distribution index from the dead-code spec
        (indicators.py:1419-1439): ``ADI = cum_sum(MFM · volume)`` (global).
        The dead code's ``fill_nan(0)`` on the denominator is subsumed by
        the engine's ÷0→NULL policy."""
        self._validate(["high", "low", "close", "volume"])
        wc = self._wcum(global_op=True)
        mfm = K.safe_div(
            (F.col("close") - F.col("low")) - (F.col("high") - F.col("close")),
            F.col("high") - F.col("low"),
        )
        self._with({"_adi_mfv": mfm * F.col("volume")})
        self._with({"ADI": K.cum_sum("_adi_mfv", wc)})
        self._drop("_adi_mfv")
        return self

    def mfi(self, window: int = 14):
        """Money flow index from the dead-code spec (indicators.py:1444-88):
        ``100 - 100/(1 + pos_mf/neg_mf)`` over rolling sums (global)."""
        self._validate(["high", "low", "close", "volume"])
        wg = self._word(global_op=True)
        w = self._w(window, global_op=True)
        tp = (F.col("high") + F.col("low") + F.col("close")) / 3
        self._with({"_mfi_tp": tp})
        tp1 = F.lag(F.col("_mfi_tp")).over(wg)
        rmf = F.col("_mfi_tp") * F.col("volume")
        self._with(
            {
                "_mfi_pos": K.when_nullsafe(F.col("_mfi_tp") > tp1, rmf, F.lit(0.0)),
                "_mfi_neg": K.when_nullsafe(F.col("_mfi_tp") <= tp1, rmf, F.lit(0.0)),
            }
        )
        pos = K.rolling_sum("_mfi_pos", window, w)
        neg = K.rolling_sum("_mfi_neg", window, w)
        self._with({"MFI": 100 - 100 / (1 + K.safe_div(pos, neg))})
        self._drop("_mfi_tp", "_mfi_pos", "_mfi_neg")
        return self
