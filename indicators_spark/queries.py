"""Driver-facing query catalog: one named query per implemented operator
(SURVEY.md §2), each paired with an ANSI-SQL oracle DuckDB can run on the
same parquet tables.

Conventions shared by BOTH sides (the correctness contract):

* Input is the deterministic ``prices`` derivation from ``events``
  (sources/prices.py) — bit-identical doubles on both engines.
* Output rows are keyed by ``(symbol, seq)`` — exact string/int64 values —
  never by timestamps (events.ts is nanosecond-precision; Spark timestamps
  are µs, so timestamps never appear in hashed output).
* Every float output is ``ROUND(x, 4)`` on both sides.  Identical input
  doubles + identical IEEE expression order ⇒ identical doubles; rounding
  only guards the handful of places where aggregation order may differ
  (windowed sums/avgs computed by different runtimes).
* ÷0 → NULL on both sides (Spark ``nullif`` / SQL ``NULLIF``), null
  condition in CASE → NULL (explicit ``delta IS NULL`` arms).

EWM-family oracles use exact recursive CTEs (the recurrences
``y=(1-a)y₁+ax`` and ``num/den`` for adjust=True) — see ``_SQL_EMA`` etc.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import Indicators
from .sources.prices import PRICES_SQL_EVENTS, prices_from_events

ROUND = 4
ORDER = '"timestamp", seq'


@dataclass(frozen=True)
class Query:
    spark: Callable[[SparkSession, str], DataFrame]
    # str, or a zero-arg callable resolved at access time (for
    # registrations whose SQL generator lives in another queries_r*
    # module — calling it at registration time would re-enter a
    # partially-initialized module when THAT module is the import entry
    # point); None → driver records a rows-only check
    sql: str | Callable[[], str] | None

    @property
    def sql_text(self) -> str | None:
        return self.sql() if callable(self.sql) else self.sql


# --------------------------------------------------------------------- #
# Spark-side scaffolding
# --------------------------------------------------------------------- #


def _ind_query(
    op: Callable[[Indicators], object],
    outs: list[str],
    log_outs: tuple[str, ...] = (),
    pre: Callable[[DataFrame], DataFrame] | None = None,
):
    """Build a (spark, sf_dir) → DataFrame callable: prices → op → select
    (symbol, seq, rounded outputs).  Columns in ``log_outs`` are compared in
    the signed-log domain (see :func:`slog`); ``pre`` filters/transforms the
    prices input (mirrored in the oracle's prices CTE)."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        p = prices_from_events(spark, sf_dir)
        if pre is not None:
            p = pre(p)
        ind = Indicators(p, order_by=("timestamp", "seq"))
        op(ind)
        df = ind.collect()
        sel = [df["symbol"], df["seq"]] + [
            round4(slog(df[c]) if c in log_outs else df[c]).alias(c) for c in outs
        ]
        return df.select(*sel)

    return fn


def round4(c):
    """Quantize a double identically to the oracle's ``_r`` helper.

    Plain ROUND differs between engines at exact .xxxx5 boundaries (Spark
    rounds the shortest decimal repr HALF_UP; DuckDB rounds the binary
    value), and the test data's 2-decimal inputs hit those boundaries
    constantly.  ``floor(x*10⁴ + 0.5)/10⁴`` is the same IEEE op sequence on
    both engines ⇒ bit-identical results.  The extra 1e-9 bias breaks exact
    half-boundary ties consistently when the engines' window aggregates
    differ by an ulp (different summation order).  NaN → NULL (both sides
    emit no NaNs by the ÷0→NULL policy, this is a belt-and-braces guard)."""
    c = F.when(~F.isnan(c), c)
    return F.floor(c * 10000 + F.lit(0.500000001)).cast("double") / 10000


def slog(c):
    """Signed-log compression for large-magnitude cumulative outputs:
    ``sign(x) * ln(1+|x|)``.  Cumulative sums of non-integer doubles pick up
    summation-order differences between engines that grow with magnitude;
    comparing in the log domain makes the check scale-relative (~1e-15)
    instead of absolute.  The oracle applies the same transform."""
    return F.signum(c) * F.log1p(F.abs(c))


# --------------------------------------------------------------------- #
# SQL-side scaffolding (DuckDB dialect, shared ANSI core)
# --------------------------------------------------------------------- #


def _ws(n: int, part: bool = True, order: str | None = None) -> str:
    """Rolling window frame text (trailing n rows)."""
    p = "PARTITION BY symbol " if part else ""
    return (
        f"({p}ORDER BY {order or ORDER} "
        f"ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW)"
    )


def _word(part: bool = True, order: str | None = None) -> str:
    p = "PARTITION BY symbol " if part else ""
    return f"({p}ORDER BY {order or ORDER})"


def _wcum(part: bool = True, order: str | None = None) -> str:
    p = "PARTITION BY symbol " if part else ""
    return (
        f"({p}ORDER BY {order or ORDER} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )


def _gated(agg: str, gate_col: str, n: int, w: str) -> str:
    """Min-samples gate: NULL until the frame holds n non-null values."""
    return f"CASE WHEN count({gate_col}) OVER {w} >= {n} THEN {agg} OVER {w} END"


def _sql(body: str, recursive: bool = False) -> str:
    kw = "WITH RECURSIVE" if recursive else "WITH"
    return f"{kw} {PRICES_SQL_EVENTS.strip()}, {body}"


def _r(expr: str, alias: str) -> str:
    """Quantizer matching the Spark side's :func:`round4` bit-for-bit."""
    return (
        f'CAST(floor(({expr}) * 10000 + 0.500000001) AS DOUBLE) / 10000 AS "{alias}"'
    )


# --------------------------------------------------------------------- #
# Query catalog
# --------------------------------------------------------------------- #

QUERIES: dict[str, Query] = {}


def _register(name: str, q: Query) -> None:
    assert name not in QUERIES, name
    QUERIES[name] = q


# ---- sma ------------------------------------------------------------- #
_register(
    "sma",
    Query(
        spark=_ind_query(lambda i: i.sma(["close"], 20), ["close_sma_20"]),
        sql=_sql(
            f"""out AS (
  SELECT symbol, seq, {_gated('avg(close)', 'close', 20, _ws(20))} AS v
  FROM prices
)
SELECT symbol, seq, {_r('v', 'close_sma_20')} FROM out"""
        ),
    ),
)

# ---- rsi (global delta, per-symbol means — faithful mix) -------------- #
_register(
    "rsi",
    Query(
        spark=_ind_query(lambda i: i.rsi(["close"], 14), ["close_rsi_14"]),
        sql=_sql(
            f"""d AS (
  SELECT *, close - lag(close) OVER {_word(False)} AS delta FROM prices
),
g AS (
  SELECT symbol, seq, "timestamp",
    CASE WHEN delta IS NULL THEN NULL WHEN delta > 0 THEN delta ELSE 0 END AS gain,
    CASE WHEN delta IS NULL THEN NULL WHEN delta < 0 THEN abs(delta) ELSE 0 END AS loss
  FROM d
),
a AS (
  SELECT symbol, seq,
    {_gated('avg(gain)', 'gain', 14, _ws(14))} AS ag,
    {_gated('avg(loss)', 'loss', 14, _ws(14))} AS al
  FROM g
)
SELECT symbol, seq, {_r('100 - 100/(1 + ag/NULLIF(al, 0))', 'close_rsi_14')} FROM a"""
        ),
    ),
)

# ---- roc (global) ------------------------------------------------------ #
_register(
    "roc",
    Query(
        spark=_ind_query(lambda i: i.roc(["close"], 10), ["close_roc_10"]),
        sql=_sql(
            f"""d AS (
  SELECT symbol, seq,
    (close - lag(close, 10) OVER {_word(False)})
      / NULLIF(lag(close, 10) OVER {_word(False)}, 0) * 100 AS v
  FROM prices
)
SELECT symbol, seq, {_r('v', 'close_roc_10')} FROM d"""
        ),
    ),
)

# ---- daily_return / daily_log_return (per symbol) ---------------------- #
_register(
    "daily_return",
    Query(
        spark=_ind_query(lambda i: i.daily_return(["close"]), ["close_daily_return"]),
        sql=_sql(
            f"""d AS (
  SELECT symbol, seq,
    (close - lag(close) OVER {_word()}) / NULLIF(lag(close) OVER {_word()}, 0) * 100 AS v
  FROM prices
)
SELECT symbol, seq, {_r('v', 'close_daily_return')} FROM d"""
        ),
    ),
)

_register(
    "daily_log_return",
    Query(
        spark=_ind_query(
            lambda i: i.daily_log_return(["close"]), ["close_daily_log_return"]
        ),
        sql=_sql(
            f"""d AS (
  SELECT symbol, seq, close / NULLIF(lag(close) OVER {_word()}, 0) AS ratio
  FROM prices
)
SELECT symbol, seq,
  {_r('CASE WHEN ratio > 0 THEN ln(ratio) END', 'close_daily_log_return')} FROM d"""
        ),
    ),
)

# ---- bollinger bands (per symbol; name typo preserved) ----------------- #
_register(
    "bollinger_bands",
    Query(
        spark=_ind_query(
            lambda i: i.bollinger_bands(["close"], 20, 2),
            ["close_upprsier_band_20_2", "close_lower_band_20_2"],
        ),
        sql=_sql(
            f"""b AS (
  SELECT symbol, seq,
    {_gated('avg(close)', 'close', 20, _ws(20))} AS m,
    {_gated('stddev_samp(close)', 'close', 20, _ws(20))} AS s
  FROM prices
)
SELECT symbol, seq,
  {_r('m + 2 * s', 'close_upprsier_band_20_2')},
  {_r('m - 2 * s', 'close_lower_band_20_2')}
FROM b"""
        ),
    ),
)

# ---- atr (global) ------------------------------------------------------ #
_SQL_TR_ATR = f"""t AS (
  SELECT symbol, seq, "timestamp",
    greatest(high - low,
             abs(high - lag(close) OVER {_word(False)}),
             abs(low  - lag(close) OVER {_word(False)})) AS tr
  FROM prices
)"""

_register(
    "atr",
    Query(
        spark=_ind_query(lambda i: i.atr(14), ["atr"]),
        sql=_sql(
            f"""{_SQL_TR_ATR}
SELECT symbol, seq, {_r(_gated('avg(tr)', 'tr', 14, _ws(14, False)), 'atr')} FROM t"""
        ),
    ),
)

# ---- stochastic oscillator (global, as-written numerator) -------------- #
_register(
    "stochastic_oscillator",
    Query(
        spark=_ind_query(
            lambda i: i.stochastic_oscillator(14), ["stochastic_oscillator_14"]
        ),
        sql=_sql(
            f"""s AS (
  SELECT symbol, seq, "timestamp", high, low, close, close - low AS cl FROM prices
),
t AS (
  SELECT symbol, seq,
    {_gated('min(cl)', 'cl', 14, _ws(14, False))} AS num,
    {_gated('max(high)', 'high', 14, _ws(14, False))}
      - {_gated('min(low)', 'low', 14, _ws(14, False))} AS den
  FROM s
)
SELECT symbol, seq,
  {_r('num / NULLIF(den, 0) * 100', 'stochastic_oscillator_14')} FROM t"""
        ),
    ),
)

# ---- williams %R (global; verbatim name) -------------------------------- #
_register(
    "williams_ri",
    Query(
        spark=_ind_query(lambda i: i.williams_ri(14), ["williams_%r_14"]),
        sql=_sql(
            f"""t AS (
  SELECT symbol, seq, close,
    {_gated('max(high)', 'high', 14, _ws(14, False))} AS hh,
    {_gated('min(low)', 'low', 14, _ws(14, False))} AS ll
  FROM prices
)
SELECT symbol, seq,
  {_r('(hh - close) / NULLIF(hh - ll, 0) * -100', 'williams_%r_14')} FROM t"""
        ),
    ),
)

# ---- donchian channel (global) ------------------------------------------ #
_register(
    "donchian_channel",
    Query(
        spark=_ind_query(
            lambda i: i.donchian_channel(20),
            ["donchian_upper_20", "donchian_lower_20", "donchian_mid_20"],
        ),
        sql=_sql(
            f"""t AS (
  SELECT symbol, seq,
    {_gated('max(high)', 'high', 20, _ws(20, False))} AS up,
    {_gated('min(low)', 'low', 20, _ws(20, False))} AS lo
  FROM prices
)
SELECT symbol, seq,
  {_r('up', 'donchian_upper_20')},
  {_r('lo', 'donchian_lower_20')},
  {_r('(up + lo)/2', 'donchian_mid_20')}
FROM t"""
        ),
    ),
)

# ---- awesome oscillator (per symbol) ------------------------------------- #
_register(
    "awesome_oscillator",
    Query(
        spark=_ind_query(lambda i: i.awesome_oscillator(5, 34), ["ao_5_34"]),
        sql=_sql(
            f"""m AS (
  SELECT symbol, seq, "timestamp", (high + low)/2 AS mid FROM prices
),
t AS (
  SELECT symbol, seq,
    {_gated('avg(mid)', 'mid', 5, _ws(5))} AS s5,
    {_gated('avg(mid)', 'mid', 34, _ws(34))} AS s34
  FROM m
)
SELECT symbol, seq, {_r('s5 - s34', 'ao_5_34')} FROM t"""
        ),
    ),
)

# ---- vwap / vpt / obv (global cumulative) --------------------------------- #
_register(
    "vwap",
    Query(
        spark=_ind_query(lambda i: i.vwap(), ["vwap"]),
        sql=_sql(
            f"""t AS (
  SELECT symbol, seq,
    sum((high + low + close)/3 * volume) OVER {_wcum(False)} AS num,
    sum(volume) OVER {_wcum(False)} AS den
  FROM prices
)
SELECT symbol, seq, {_r('num / NULLIF(den, 0)', 'vwap')} FROM t"""
        ),
    ),
)

_register(
    "vpt",
    Query(
        # vpt grows to ~1e6: compare in signed-log domain (see slog()).
        spark=_ind_query(lambda i: i.vpt(), ["vpt"], log_outs=("vpt",)),
        sql=_sql(
            f"""d AS (
  SELECT symbol, seq, "timestamp",
    (close - lag(close) OVER {_word(False)})
      / NULLIF(lag(close) OVER {_word(False)}, 0) * volume AS chg
  FROM prices
),
c AS (
  SELECT symbol, seq, sum(chg) OVER {_wcum(False)} AS v FROM d
)
SELECT symbol, seq, {_r('sign(v) * ln(1 + abs(v))', 'vpt')} FROM c"""
        ),
    ),
)

_register(
    "obv",
    Query(
        spark=_ind_query(lambda i: i.obv(), ["obv"]),
        sql=_sql(
            f"""d AS (
  SELECT symbol, seq, "timestamp", volume,
    close - lag(close) OVER {_word(False)} AS df
  FROM prices
),
o AS (
  SELECT symbol, seq, "timestamp",
    (CASE WHEN df IS NULL THEN NULL
          WHEN df > 0 THEN 1.0 WHEN df < 0 THEN -1.0 ELSE 0.0 END) * volume AS chg
  FROM d
)
SELECT symbol, seq, {_r(f'sum(chg) OVER {_wcum(False)}', 'obv')} FROM o"""
        ),
    ),
)

# ---- force index / ease of movement / nvi (global lags) ------------------- #
_register(
    "force_index",
    Query(
        spark=_ind_query(lambda i: i.force_index(), ["force_index"]),
        sql=_sql(
            f"""d AS (
  SELECT symbol, seq,
    (close - lag(close) OVER {_word(False)}) * volume AS v
  FROM prices
)
SELECT symbol, seq, {_r('v', 'force_index')} FROM d"""
        ),
    ),
)

_register(
    "ease_of_movement",
    Query(
        spark=_ind_query(lambda i: i.ease_of_movement(), ["ease_of_movement"]),
        sql=_sql(
            f"""d AS (
  SELECT symbol, seq,
    (high + low - lag(high) OVER {_word(False)} - lag(low) OVER {_word(False)})
      / NULLIF(volume, 0) AS v
  FROM prices
)
SELECT symbol, seq, {_r('v', 'ease_of_movement')} FROM d"""
        ),
    ),
)

_register(
    "negative_volume_index",
    Query(
        spark=_ind_query(lambda i: i.negative_volume_index(), ["nvi"]),
        sql=_sql(
            f"""d AS (
  SELECT symbol, seq, "timestamp", volume,
    close / NULLIF(lag(close) OVER {_word(False)}, 0) - 1 AS ret,
    lag(volume) OVER {_word(False)} AS vol1
  FROM prices
),
c AS (
  SELECT symbol, seq, volume, vol1,
    sum(ret) OVER {_wcum(False)} AS cumret
  FROM d
)
SELECT symbol, seq,
  {_r('CASE WHEN volume < vol1 THEN cumret WHEN volume IS NULL OR vol1 IS NULL THEN NULL ELSE 0.0 END', 'nvi')}
FROM c"""
        ),
    ),
)

# ---- chaikin money flow (global) ------------------------------------------ #
_register(
    "chaikin_money_flow",
    Query(
        spark=_ind_query(lambda i: i.chaikin_money_flow(14), ["cmf_14"]),
        sql=_sql(
            f"""d AS (
  SELECT symbol, seq, "timestamp", volume,
    ((close - low) - (high - close)) / NULLIF(high - low, 0) * volume AS mfv
  FROM prices
),
t AS (
  SELECT symbol, seq,
    {_gated('sum(mfv)', 'mfv', 14, _ws(14, False))} AS num,
    {_gated('sum(volume)', 'volume', 14, _ws(14, False))} AS den
  FROM d
)
SELECT symbol, seq, {_r('num / NULLIF(den, 0)', 'cmf_14')} FROM t"""
        ),
    ),
)

# ---- cci (global; two-stage mean deviation) -------------------------------- #
_register(
    "cci",
    Query(
        spark=_ind_query(lambda i: i.cci(14), ["CCI"]),
        sql=_sql(
            f"""tp AS (
  SELECT symbol, seq, "timestamp", (high + low + close)/3 AS tp FROM prices
),
s1 AS (
  SELECT symbol, seq, "timestamp", tp,
    {_gated('avg(tp)', 'tp', 14, _ws(14, False))} AS sma_tp
  FROM tp
),
s2 AS (
  SELECT symbol, seq, "timestamp", tp, sma_tp, abs(tp - sma_tp) AS dev FROM s1
),
s3 AS (
  SELECT symbol, seq, tp, sma_tp,
    {_gated('avg(dev)', 'dev', 14, _ws(14, False))} AS md
  FROM s2
)
SELECT symbol, seq, {_r('(tp - sma_tp) / NULLIF(0.015 * md, 0)', 'CCI')} FROM s3"""
        ),
    ),
)

# ---- dpo (global) ----------------------------------------------------------- #
_register(
    "dpo",
    Query(
        spark=_ind_query(lambda i: i.dpo(["close"], 20), ["close_dpo_20"]),
        sql=_sql(
            f"""s AS (
  SELECT symbol, seq, "timestamp", close,
    {_gated('avg(close)', 'close', 20, _ws(20, False))} AS sma
  FROM prices
),
t AS (
  SELECT symbol, seq, close - lag(sma, 11) OVER {_word(False)} AS v FROM s
)
SELECT symbol, seq, {_r('v', 'close_dpo_20')} FROM t"""
        ),
    ),
)

# ---- adx (global; as-written TR) --------------------------------------------- #
_register(
    "adx",
    Query(
        spark=_ind_query(lambda i: i.adx(14), ["adx"]),
        sql=_sql(
            f"""d AS (
  SELECT symbol, seq, "timestamp",
    greatest(high - close,
             abs(high - lag(close) OVER {_word(False)}),
             abs(low  - lag(close) OVER {_word(False)})) AS tr,
    high - lag(high) OVER {_word(False)} AS up,
    lag(low) OVER {_word(False)} - low AS dn
  FROM prices
),
m AS (
  SELECT symbol, seq, "timestamp", tr,
    CASE WHEN up IS NULL THEN NULL WHEN up > 0 THEN up ELSE 0 END AS pdm,
    CASE WHEN dn IS NULL THEN NULL WHEN dn > 0 THEN dn ELSE 0 END AS ndm
  FROM d
),
s AS (
  SELECT symbol, seq, "timestamp",
    {_gated('avg(tr)', 'tr', 14, _ws(14, False))} AS str,
    {_gated('avg(pdm)', 'pdm', 14, _ws(14, False))} AS spdm,
    {_gated('avg(ndm)', 'ndm', 14, _ws(14, False))} AS sndm
  FROM m
),
di AS (
  SELECT symbol, seq, "timestamp",
    spdm / NULLIF(str, 0) * 100 AS pdi,
    sndm / NULLIF(str, 0) * 100 AS ndi
  FROM s
),
dx AS (
  SELECT symbol, seq, "timestamp",
    abs(pdi - ndi) / NULLIF(pdi + ndi, 0) * 100 AS dx
  FROM di
)
SELECT symbol, seq, {_r(_gated('avg(dx)', 'dx', 14, _ws(14, False)), 'adx')} FROM dx"""
        ),
    ),
)

# ---- vortex (global; verbatim +VI/-VI names) ----------------------------------- #
_register(
    "vortex",
    Query(
        spark=_ind_query(lambda i: i.vortex(14), ["+VI", "-VI"]),
        sql=_sql(
            f"""d AS (
  SELECT symbol, seq, "timestamp",
    greatest(high - low,
             abs(high - lag(close) OVER {_word(False)}),
             abs(low  - lag(close) OVER {_word(False)})) AS tr,
    abs(high - lag(low)  OVER {_word(False)}) AS vmp,
    abs(low  - lag(high) OVER {_word(False)}) AS vmn
  FROM prices
),
s AS (
  SELECT symbol, seq,
    {_gated('sum(tr)', 'tr', 14, _ws(14, False))} AS trs,
    {_gated('sum(vmp)', 'vmp', 14, _ws(14, False))} AS vmps,
    {_gated('sum(vmn)', 'vmn', 14, _ws(14, False))} AS vmns
  FROM d
)
SELECT symbol, seq,
  {_r('vmps / NULLIF(trs, 0)', '+VI')},
  {_r('vmns / NULLIF(trs, 0)', '-VI')}
FROM s"""
        ),
    ),
)

# ---- ultimate oscillator (global; as-written TR; null-as-0 sum) ----------------- #
_register(
    "ultimate_oscillator",
    Query(
        spark=_ind_query(
            lambda i: i.ultimate_oscillator(7, 14, 28, 4, 2, 2),
            ["UO_7_14_28_4_2_2"],
        ),
        sql=_sql(
            f"""d AS (
  SELECT symbol, seq, "timestamp",
    close - least(low, lag(close) OVER {_word(False)}) AS bp,
    greatest(high, lag(close) OVER {_word(False)})
      - greatest(low, lag(close) OVER {_word(False)}) AS tr
  FROM prices
),
s AS (
  SELECT symbol, seq,
    {_gated('avg(bp)', 'bp', 7, _ws(7, False))}
      / NULLIF({_gated('avg(tr)', 'tr', 7, _ws(7, False))}, 0) * 4 AS u1,
    {_gated('avg(bp)', 'bp', 14, _ws(14, False))}
      / NULLIF({_gated('avg(tr)', 'tr', 14, _ws(14, False))}, 0) * 2 AS u2,
    {_gated('avg(bp)', 'bp', 28, _ws(28, False))}
      / NULLIF({_gated('avg(tr)', 'tr', 28, _ws(28, False))}, 0) * 2 AS u3
  FROM d
)
SELECT symbol, seq,
  {_r('(COALESCE(u1,0) + COALESCE(u2,0) + COALESCE(u3,0)) * 100 / 8', 'UO_7_14_28_4_2_2')}
FROM s"""
        ),
    ),
)

# ---- ichimoku (global; literal-26 + look-ahead quirks) --------------------------- #
_register(
    "ichimoku",
    Query(
        spark=_ind_query(
            lambda i: i.ichimoku(9, 26, 52),
            ["tenkan_sen", "kijun_sen", "senkou_span_b", "chikou_span", "senkou_span_a"],
        ),
        sql=_sql(
            f"""m AS (
  SELECT symbol, seq, "timestamp", close,
    ({_gated('max(high)', 'high', 9, _ws(9, False))}
     + {_gated('min(low)', 'low', 9, _ws(9, False))})/2 AS tenkan,
    ({_gated('max(high)', 'high', 26, _ws(26, False))}
     + {_gated('min(low)', 'low', 26, _ws(26, False))})/2 AS kijun,
    ({_gated('max(high)', 'high', 52, _ws(52, False))}
     + {_gated('min(low)', 'low', 52, _ws(52, False))})/2 AS mid52
  FROM prices
),
t AS (
  SELECT symbol, seq, tenkan, kijun,
    lag(mid52, 26) OVER {_word(False)} AS senkou_b,
    lead(close, 26) OVER {_word(False)} AS chikou,
    lag((tenkan + kijun)/2, 26) OVER {_word(False)} AS senkou_a
  FROM m
)
SELECT symbol, seq,
  {_r('tenkan', 'tenkan_sen')},
  {_r('kijun', 'kijun_sen')},
  {_r('senkou_b', 'senkou_span_b')},
  {_r('chikou', 'chikou_span')},
  {_r('senkou_a', 'senkou_span_a')}
FROM t"""
        ),
    ),
)

# ---- mfi / adi (global; dead-code specs) ------------------------------------------ #
_register(
    "mfi",
    Query(
        spark=_ind_query(lambda i: i.mfi(14), ["MFI"]),
        sql=_sql(
            f"""tp AS (
  SELECT symbol, seq, "timestamp", volume, (high + low + close)/3 AS tp FROM prices
),
d AS (
  SELECT symbol, seq, "timestamp", tp * volume AS rmf,
    tp - lag(tp) OVER {_word(False)} AS dtp
  FROM tp
),
m AS (
  SELECT symbol, seq, "timestamp",
    CASE WHEN dtp IS NULL THEN NULL WHEN dtp > 0 THEN rmf ELSE 0 END AS pos,
    CASE WHEN dtp IS NULL THEN NULL WHEN dtp <= 0 THEN rmf ELSE 0 END AS neg
  FROM d
),
s AS (
  SELECT symbol, seq,
    {_gated('sum(pos)', 'pos', 14, _ws(14, False))} AS p,
    {_gated('sum(neg)', 'neg', 14, _ws(14, False))} AS n
  FROM m
)
SELECT symbol, seq, {_r('100 - 100/(1 + p/NULLIF(n, 0))', 'MFI')} FROM s"""
        ),
    ),
)

_register(
    "adi",
    Query(
        # cumulative money-flow sum grows large: signed-log comparison.
        spark=_ind_query(lambda i: i.adi(), ["ADI"], log_outs=("ADI",)),
        sql=_sql(
            f"""d AS (
  SELECT symbol, seq, "timestamp",
    ((close - low) - (high - close)) / NULLIF(high - low, 0) * volume AS mfv
  FROM prices
),
c AS (
  SELECT symbol, seq, sum(mfv) OVER {_wcum(False)} AS v FROM d
)
SELECT symbol, seq, {_r('sign(v) * ln(1 + abs(v))', 'ADI')} FROM c"""
        ),
    ),
)

# ---- ulcer index (global; fixed-vs-reference) -------------------------------------- #
_register(
    "unlcer_index",
    Query(
        spark=_ind_query(
            lambda i: i.unlcer_index(["close"], 14), ["close_ulcer_index_14"]
        ),
        sql=_sql(
            f"""s AS (
  SELECT symbol, seq, "timestamp", close,
    {_gated('max(close)', 'close', 14, _ws(14, False))} AS mx
  FROM prices
),
d AS (
  SELECT symbol, seq, "timestamp",
    (close / NULLIF(mx, 0) - 1) * (close / NULLIF(mx, 0) - 1) AS dd2
  FROM s
)
SELECT symbol, seq,
  {_r(f"sqrt({_gated('avg(dd2)', 'dd2', 14, _ws(14, False))})", 'close_ulcer_index_14')}
FROM d"""
        ),
    ),
)

# ---- wma (per symbol; dead-code spec weights 1..n) ---------------------------------- #
_register(
    "wma",
    Query(
        spark=_ind_query(lambda i: i.wma(["close"], 10), ["close_wma_10"]),
        sql=_sql(
            f"""t AS (
  SELECT symbol, seq,
    ({' + '.join(f'lag(close, {k}) OVER {_word()} * {10 - k}' for k in range(10))})
      / 55.0 AS v
  FROM prices
)
SELECT symbol, seq, {_r('v', 'close_wma_10')} FROM t"""
        ),
    ),
)

# ---- aroon (global; dead-code spec, first-occurrence argmax) ------------------------- #
_register(
    "aroon",
    Query(
        spark=_ind_query(
            lambda i: i.aroon(14), ["aroon_up_14", "aroon_down_14"]
        ),
        sql=_sql(
            f"""rn AS (
  SELECT symbol, seq, "timestamp", high, low,
    row_number() OVER {_word(False)} AS rn
  FROM prices
),
t AS (
  SELECT symbol, seq, rn,
    {_gated("max({'v': high, 'nr': -rn})", 'high', 14, _ws(14, False))} AS bh,
    {_gated("max({'v': -low, 'nr': -rn})", 'low', 14, _ws(14, False))} AS bl
  FROM rn
)
SELECT symbol, seq,
  {_r('100 * (14 - (rn - (-(bh.nr)) + 1)) / 14', 'aroon_up_14')},
  {_r('100 * (14 - (rn - (-(bl.nr)) + 1)) / 14', 'aroon_down_14')}
FROM t"""
        ),
    ),
)

# ---- kst (global; dead-code spec) ----------------------------------------------------- #
_KST_TERMS = []
for _i, (_rp, _sp, _wt) in enumerate(
    zip((10, 15, 20, 30), (10, 10, 10, 15), (1, 2, 3, 4)), start=1
):
    _KST_TERMS.append((_i, _rp, _sp, _wt))

_register(
    "kst",
    Query(
        spark=_ind_query(lambda i: i.kst(["close"]), ["KST"]),
        sql=_sql(
            f"""r AS (
  SELECT symbol, seq, "timestamp",
    {', '.join(f'''(close - lag(close, {rp}) OVER {_word(False)})
      / NULLIF(lag(close, {rp}) OVER {_word(False)}, 0) * 100 AS roc{i}''' for i, rp, sp, wt in _KST_TERMS)}
  FROM prices
),
s AS (
  SELECT symbol, seq,
    {' + '.join(f"{_gated(f'avg(roc{i})', f'roc{i}', sp, _ws(sp, False))} * {wt}" for i, rp, sp, wt in _KST_TERMS)} AS v
  FROM r
)
SELECT symbol, seq, {_r('v', 'KST')} FROM s"""
        ),
    ),
)

# ---- stochastic_rsi (faithful: max-max denominator ⇒ all-NULL output) ------------------ #
_register(
    "stochastic_rsi",
    Query(
        spark=_ind_query(
            lambda i: i.stochastic_rsi(["close"], 14, 14),
            ["close_stoch_rsi_14_14"],
        ),
        sql=_sql(
            """out AS (
  SELECT symbol, seq, CAST(NULL AS DOUBLE) AS close_stoch_rsi_14_14 FROM prices
)
SELECT * FROM out"""
        ),
    ),
)

# ---- stochastic_rsi_fixed (extension; full pipeline oracle) ----------------------------- #
_register(
    "stochastic_rsi_fixed",
    Query(
        spark=_ind_query(
            lambda i: i.stochastic_rsi_fixed(["close"], 14, 14),
            ["close_stoch_rsi_fixed_14_14"],
        ),
        sql=_sql(
            f"""d AS (
  SELECT *, close - lag(close) OVER {_word(False)} AS delta FROM prices
),
g AS (
  SELECT symbol, seq, "timestamp",
    CASE WHEN delta IS NULL THEN NULL WHEN delta > 0 THEN delta ELSE 0 END AS gain,
    CASE WHEN delta IS NULL THEN NULL WHEN delta < 0 THEN abs(delta) ELSE 0 END AS loss
  FROM d
),
a AS (
  SELECT symbol, seq, "timestamp",
    100 - 100/(1 + ({_gated('avg(gain)', 'gain', 14, _ws(14))})
                   / NULLIF({_gated('avg(loss)', 'loss', 14, _ws(14))}, 0)) AS rsi
  FROM g
),
t AS (
  SELECT symbol, seq,
    rsi - {_gated('min(rsi)', 'rsi', 14, _ws(14, False))} AS num,
    {_gated('max(rsi)', 'rsi', 14, _ws(14, False))}
      - {_gated('min(rsi)', 'rsi', 14, _ws(14, False))} AS den
  FROM a
)
SELECT symbol, seq,
  {_r('num / NULLIF(den, 0)', 'close_stoch_rsi_fixed_14_14')} FROM t"""
        ),
    ),
)

# ---- fill_null (forward fill on a column with synthesized nulls) ------------------------- #


def _fill_null_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = prices_from_events(spark, sf_dir).withColumn(
        "gappy", F.when(F.col("seq") % 7 != 0, F.col("close"))
    )
    ind = Indicators(p, order_by=("timestamp", "seq"))
    ind.fill_null(["gappy"], method="forward")
    df = ind.collect()
    return df.select("symbol", "seq", round4(df["gappy"]).alias("gappy"))


_register(
    "fill_null_forward",
    Query(
        spark=_fill_null_spark,
        sql=_sql(
            f"""g AS (
  SELECT symbol, seq, "timestamp",
    CASE WHEN seq % 7 != 0 THEN close END AS gappy
  FROM prices
)
SELECT symbol, seq,
  {_r(f'last_value(gappy IGNORE NULLS) OVER {_wcum()}', 'gappy')}
FROM g"""
        ),
    ),
)


# EWM-family queries (recursive-CTE oracles) register themselves on import.
from . import queries_ewm  # noqa: E402,F401  (registration side-effect)
from . import queries_ext  # noqa: E402,F401  (registration side-effect)
from . import queries_rel  # noqa: E402,F401  (registration side-effect)
from . import queries_rel2  # noqa: E402,F401  (registration side-effect)
from . import queries_analytic  # noqa: E402,F401  (registration side-effect)
from . import queries_pipeline  # noqa: E402,F401  (registration side-effect)
from . import queries_corpus  # noqa: E402,F401  (registration side-effect)
from . import queries_ml  # noqa: E402,F401  (registration side-effect)
from . import queries_r5  # noqa: E402,F401  (registration side-effect)
from . import queries_r7  # noqa: E402,F401  (registration side-effect)
from . import queries_r8  # noqa: E402,F401  (registration side-effect)
from . import queries_r9  # noqa: E402,F401  (registration side-effect)
from . import queries_r10  # noqa: E402,F401  (registration side-effect)
from . import queries_r11  # noqa: E402,F401  (registration side-effect)
from . import queries_r12  # noqa: E402,F401  (registration side-effect)
from . import queries_r13  # noqa: E402,F401  (registration side-effect)
