"""EWM-family queries with *exact* recursive-CTE oracles.

EWMs are first-order linear recurrences, so DuckDB can replay them exactly:

* adjust=False (the ``ema()`` flavor):  ``e' = (1-a)·e + a·x``
* adjust=True  (Polars-default span):   ``e = num/den``,
  ``num' = x + (1-a)·num``, ``den' = 1 + (1-a)·den``

Verified against pandas to ≤2e-15 relative; the shared quantizer's 1e-9
bias absorbs the residual ulps.  Chained smoothings (macd signal, trix's
triple EMA, tsi's double smoothing) carry several accumulators through ONE
recursion — same shape as the engine's single-shuffle EWM programs.

Cost control: a recursive CTE steps once per row rank, so the reference's
*global* (un-partitioned) EWM ops — mass_index / keltner / tsi / stc —
are checked on a deterministic ``seq < 2500`` subset (mirrored on both
sides); per-symbol ops recurse in parallel across symbols and use the full
table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries import (
    ORDER,
    Query,
    _gated,
    _ind_query,
    _r,
    _register,
    _sql,
    _wcum,
    _word,
    _ws,
)

# MATERIALIZED: DuckDB re-evaluates plain CTEs on every recursive-CTE
# iteration, so each EWM replay level re-ran the window-over-scan
# (~22-27s per oracle); materializing turns the per-level join into a
# lookup (~3s). Results are identical — purely an oracle-cost fix.
_BASE_SYM = f"""base AS MATERIALIZED (
  SELECT symbol, seq, "timestamp", close, volume, high, low,
         row_number() OVER (PARTITION BY symbol ORDER BY {ORDER}) AS rn
  FROM prices
)"""

#: Global-op subset (recursion cost ∝ max row rank).
_CUT = 2500
_BASE_GLOB = f"""sub AS MATERIALIZED (
  SELECT * FROM prices WHERE seq < {_CUT}
),
base AS MATERIALIZED (
  SELECT symbol, seq, "timestamp", close, volume, high, low,
         row_number() OVER (ORDER BY {ORDER}) AS rn
  FROM sub
)"""


def _a(span: int) -> str:
    """SQL literal for alpha=2/(span+1) — same IEEE divide as Python/pandas."""
    return f"(2.0/{span + 1})"


def _glob_pre(df):
    return df.filter(F.col("seq") < _CUT)


# ---- ema (per symbol, adjust=False) ------------------------------------- #
_register(
    "ema",
    Query(
        spark=_ind_query(lambda i: i.ema(["close"], 20), ["close_ema_20"]),
        sql=_sql(
            f"""{_BASE_SYM},
rec AS (
  SELECT symbol, seq, rn, close AS x, close AS e FROM base WHERE rn = 1
  UNION ALL
  SELECT b.symbol, b.seq, b.rn, b.close,
         (1 - {_a(20)})*r.e + {_a(20)}*b.close
  FROM base b JOIN rec r ON b.symbol = r.symbol AND b.rn = r.rn + 1
)
SELECT symbol, seq, {_r('e', 'close_ema_20')} FROM rec""",
            recursive=True,
        ),
    ),
)

# ---- macd (per symbol; only the signal line survives) --------------------- #
_ES, _EL, _SG = _a(12), _a(26), _a(9)
_ES_STEP = f"(1 - {_ES})*r.es + {_ES}*b.close"
_EL_STEP = f"(1 - {_EL})*r.el + {_EL}*b.close"
_register(
    "macd",
    Query(
        spark=_ind_query(lambda i: i.macd(["close"]), ["close_signal_line"]),
        sql=_sql(
            f"""{_BASE_SYM},
rec AS (
  SELECT symbol, seq, rn, close, close AS es, close AS el,
         CAST(0.0 AS DOUBLE) AS sig
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.symbol, b.seq, b.rn, b.close,
         {_ES_STEP},
         {_EL_STEP},
         (1 - {_SG})*r.sig + {_SG}*(({_ES_STEP}) - ({_EL_STEP}))
  FROM base b JOIN rec r ON b.symbol = r.symbol AND b.rn = r.rn + 1
)
SELECT symbol, seq, {_r('sig', 'close_signal_line')} FROM rec""",
            recursive=True,
        ),
    ),
)


# ---- ppo / pvo (per symbol; line + signal + histogram) --------------------- #
def _ppo_sql(col: str, name: str) -> str:
    es, el, sg = _a(12), _a(26), _a(9)
    es_step = f"(1 - {es})*r.es + {es}*b.{col}"
    el_step = f"(1 - {el})*r.el + {el}*b.{col}"
    line_step = f"(({es_step}) - ({el_step})) / NULLIF(({el_step}), 0) * 100"
    return _sql(
        f"""{_BASE_SYM},
rec AS (
  SELECT symbol, seq, rn, {col} AS x, {col} AS es, {col} AS el,
         CAST(0.0 AS DOUBLE) AS line, CAST(0.0 AS DOUBLE) AS sig
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.symbol, b.seq, b.rn, b.{col},
         {es_step},
         {el_step},
         {line_step},
         (1 - {sg})*r.sig + {sg}*({line_step})
  FROM base b JOIN rec r ON b.symbol = r.symbol AND b.rn = r.rn + 1
)
SELECT symbol, seq,
  {_r('line', f'{name}_12_26')},
  {_r('sig', f'{name}_signal_12_26')},
  {_r('line - sig', f'{name}_histogram_12_26')}
FROM rec""",
        recursive=True,
    )


_register(
    "ppo",
    Query(
        spark=_ind_query(
            lambda i: i.ppo(),
            ["ppo_12_26", "ppo_signal_12_26", "ppo_histogram_12_26"],
        ),
        sql=_ppo_sql("close", "ppo"),
    ),
)

_register(
    "pvo",
    Query(
        spark=_ind_query(
            lambda i: i.pvo(),
            ["pvo_12_26", "pvo_signal_12_26", "pvo_histogram_12_26"],
        ),
        sql=_ppo_sql("volume", "pvo"),
    ),
)

# ---- trix (per-symbol triple EMA, global pct_change) ------------------------ #
_AT = _a(15)
_E1 = f"(1 - {_AT})*r.e1 + {_AT}*b.close"
_E2 = f"(1 - {_AT})*r.e2 + {_AT}*({_E1})"
_E3 = f"(1 - {_AT})*r.e3 + {_AT}*({_E2})"
_register(
    "trix",
    Query(
        spark=_ind_query(lambda i: i.trix(15), ["trix_15"]),
        sql=_sql(
            f"""{_BASE_SYM},
rec AS (
  SELECT symbol, seq, "timestamp", rn, close,
         close AS e1, close AS e2, close AS e3
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.symbol, b.seq, b."timestamp", b.rn, b.close,
         {_E1}, {_E2}, {_E3}
  FROM base b JOIN rec r ON b.symbol = r.symbol AND b.rn = r.rn + 1
),
t AS (
  SELECT symbol, seq,
    (e3 - lag(e3) OVER {_word(False)}) / NULLIF(lag(e3) OVER {_word(False)}, 0) AS v
  FROM rec
)
SELECT symbol, seq, {_r('v', 'trix_15')} FROM t""",
            recursive=True,
        ),
    ),
)

# ---- mass_index (GLOBAL span-EWM ×2; seq<2500 subset) ------------------------ #
_A9 = _a(9)
_N1 = f"(b.high - b.low) + (1 - {_A9})*r.n1"
_D1 = f"1 + (1 - {_A9})*r.d1"
_N2 = f"(({_N1})/({_D1})) + (1 - {_A9})*r.n2"
_D2 = f"1 + (1 - {_A9})*r.d2"
_register(
    "mass_index",
    Query(
        spark=_ind_query(
            lambda i: i.mass_index(9, 26), ["mass_index_9_26"], pre=_glob_pre
        ),
        sql=_sql(
            f"""{_BASE_GLOB},
rec AS (
  SELECT symbol, seq, "timestamp", rn, high, low,
         high - low AS n1, CAST(1.0 AS DOUBLE) AS d1,
         high - low AS n2, CAST(1.0 AS DOUBLE) AS d2
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.symbol, b.seq, b."timestamp", b.rn, b.high, b.low,
         {_N1}, {_D1}, {_N2}, {_D2}
  FROM base b JOIN rec r ON b.rn = r.rn + 1
),
ratio AS (
  SELECT symbol, seq, "timestamp",
    (n1/d1) / NULLIF(n2/d2, 0) AS er
  FROM rec
)
SELECT symbol, seq,
  {_r(_gated('sum(er)', 'er', 26, _ws(26, False)), 'mass_index_9_26')}
FROM ratio""",
            recursive=True,
        ),
    ),
)

# ---- keltner channel (GLOBAL span-EWM middle band; seq<2500 subset) ----------- #
_A20 = _a(20)
_register(
    "keltner_channel",
    Query(
        spark=_ind_query(
            lambda i: i.keltner_channel(20, 14, 2),
            ["KC_Upper_Band_20_14_2", "KC_Lower_Band_20_14_2"],
            pre=_glob_pre,
        ),
        sql=_sql(
            f"""{_BASE_GLOB},
rec AS (
  SELECT symbol, seq, "timestamp", rn, close,
         close AS n, CAST(1.0 AS DOUBLE) AS d
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.symbol, b.seq, b."timestamp", b.rn, b.close,
         b.close + (1 - {_A20})*r.n,
         1 + (1 - {_A20})*r.d
  FROM base b JOIN rec r ON b.rn = r.rn + 1
),
tr AS (
  SELECT s.symbol, s.seq, s."timestamp", rec.n/rec.d AS mid,
    greatest(s.high, lag(s.close) OVER (ORDER BY s."timestamp", s.seq))
      - least(s.low, lag(s.close) OVER (ORDER BY s."timestamp", s.seq)) AS tr
  FROM sub s JOIN rec ON s.seq = rec.seq
),
atr AS (
  SELECT symbol, seq, mid,
    {_gated('avg(tr)', 'tr', 14, _ws(14, False))} AS atr
  FROM tr
)
SELECT symbol, seq,
  {_r('mid + atr * 2', 'KC_Upper_Band_20_14_2')},
  {_r('mid - atr * 2', 'KC_Lower_Band_20_14_2')}
FROM atr""",
            recursive=True,
        ),
    ),
)

# ---- true_strength_index (GLOBAL double span-EWM of delta & |delta|) ----------- #
_AS13, _AL25 = _a(13), _a(25)
_TN1 = f"b.delta + (1 - {_AS13})*r.n1"
_TD1 = f"1 + (1 - {_AS13})*r.d1"
_TN2 = f"(({_TN1})/({_TD1})) + (1 - {_AL25})*r.n2"
_TD2 = f"1 + (1 - {_AL25})*r.d2"
_TA1 = f"abs(b.delta) + (1 - {_AS13})*r.a1"
_TB1 = f"1 + (1 - {_AS13})*r.b1"
_TA2 = f"(({_TA1})/({_TB1})) + (1 - {_AL25})*r.a2"
_TB2 = f"1 + (1 - {_AL25})*r.b2"
_register(
    "true_strength_index",
    Query(
        spark=_ind_query(
            lambda i: i.true_strength_index(["close"], 13, 25),
            ["close_tsi_13_25"],
            pre=_glob_pre,
        ),
        sql=_sql(
            f"""{_BASE_GLOB},
d AS (
  SELECT symbol, seq, "timestamp", rn,
    close - lag(close) OVER (ORDER BY rn) AS delta
  FROM base
),
rec AS (
  -- recursion starts at rn=2: the leading NULL delta is skipped, matching
  -- pandas ewm over a leading-NaN series
  SELECT symbol, seq, rn, delta,
         delta AS n1, CAST(1.0 AS DOUBLE) AS d1,
         delta AS n2, CAST(1.0 AS DOUBLE) AS d2,
         abs(delta) AS a1, CAST(1.0 AS DOUBLE) AS b1,
         abs(delta) AS a2, CAST(1.0 AS DOUBLE) AS b2
  FROM d WHERE rn = 2
  UNION ALL
  SELECT b.symbol, b.seq, b.rn, b.delta,
         {_TN1}, {_TD1}, {_TN2}, {_TD2},
         {_TA1}, {_TB1}, {_TA2}, {_TB2}
  FROM d b JOIN rec r ON b.rn = r.rn + 1
),
out AS (
  SELECT symbol, seq, 100 * (n2/d2) / NULLIF(a2/b2, 0) AS v FROM rec
  UNION ALL
  SELECT symbol, seq, CAST(NULL AS DOUBLE) FROM d WHERE rn = 1
)
SELECT symbol, seq, {_r('v', 'close_tsi_13_25')} FROM out""",
            recursive=True,
        ),
    ),
)

# ---- stc (GLOBAL; dead-code spec; intermediates stay in frame) ------------------ #
_AF, _ASL, _ASG = _a(12), _a(26), _a(9)
_SNF = f"b.close + (1 - {_AF})*r.nf"
_SDF = f"1 + (1 - {_AF})*r.df"
_SNS = f"b.close + (1 - {_ASL})*r.ns"
_SDS = f"1 + (1 - {_ASL})*r.ds"
_SM = f"(({_SNF})/({_SDF})) - (({_SNS})/({_SDS}))"
_SNG = f"({_SM}) + (1 - {_ASG})*r.ng"
_SDG = f"1 + (1 - {_ASG})*r.dg"
_register(
    "stc",
    Query(
        spark=_ind_query(
            lambda i: i.stc(["close"], 12, 26, 9, 10),
            ["_close_macd_line", "_close_signal_line", "close_stc_12_26_10"],
            pre=_glob_pre,
        ),
        sql=_sql(
            f"""{_BASE_GLOB},
rec AS (
  SELECT symbol, seq, "timestamp", rn, close,
         close AS nf, CAST(1.0 AS DOUBLE) AS df,
         close AS ns, CAST(1.0 AS DOUBLE) AS ds,
         CAST(0.0 AS DOUBLE) AS ng, CAST(1.0 AS DOUBLE) AS dg
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.symbol, b.seq, b."timestamp", b.rn, b.close,
         {_SNF}, {_SDF}, {_SNS}, {_SDS}, {_SNG}, {_SDG}
  FROM base b JOIN rec r ON b.rn = r.rn + 1
),
m AS (
  SELECT symbol, seq, "timestamp",
    (nf/df) - (ns/ds) AS macd, ng/dg AS sig
  FROM rec
),
t AS (
  SELECT symbol, seq, macd, sig,
    macd - {_gated('min(macd)', 'macd', 10, _ws(10, False))} AS num,
    {_gated('max(macd)', 'macd', 10, _ws(10, False))}
      - {_gated('min(macd)', 'macd', 10, _ws(10, False))} AS den
  FROM m
)
SELECT symbol, seq,
  {_r('macd', '_close_macd_line')},
  {_r('sig', '_close_signal_line')},
  {_r('num / NULLIF(den, 0) * 100', 'close_stc_12_26_10')}
FROM t""",
            recursive=True,
        ),
    ),
)

# ---- cumulative_returns (per symbol, first 40 rows; log-domain compare) ---------- #
# The as-written percent-units quirk (∏(1+100·r), SURVEY §2c) overflows a
# double beyond ~150 factors on this data, so the check runs on the first 100
# rows per symbol; DuckDB emulates cum_prod via exp/ln + sign/zero handling.


def _cumret_pre(df):
    from pyspark.sql import Window

    w = Window.partitionBy("symbol").orderBy("timestamp", "seq")
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 100)
        .drop("_rn")
    )


_register(
    "cumulative_returns",
    Query(
        spark=_ind_query(
            lambda i: i.cumulative_returns(["close"]),
            ["close_cumulative_return"],
            log_outs=("close_cumulative_return",),
            pre=_cumret_pre,
        ),
        sql=_sql(
            f"""sub AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY symbol ORDER BY {ORDER}) AS _rn
    FROM prices
  ) WHERE _rn <= 100
),
f AS (
  SELECT symbol, seq, "timestamp",
    1 + (close - lag(close) OVER {_word()}) / NULLIF(lag(close) OVER {_word()}, 0) * 100 AS fac
  FROM sub
),
parts AS (
  SELECT symbol, seq, "timestamp", fac,
    CASE WHEN fac IS NULL THEN NULL WHEN fac = 0 THEN NULL ELSE ln(abs(fac)) END AS lf,
    CASE WHEN fac = 0 THEN 1 WHEN fac IS NOT NULL THEN 0 END AS isz,
    CASE WHEN fac < 0 THEN 1 WHEN fac IS NOT NULL THEN 0 END AS isn
  FROM f
),
agg AS (
  SELECT symbol, seq,
    count(fac) OVER {_wcum()} AS cnt,
    sum(isz) OVER {_wcum()} AS nz,
    sum(isn) OVER {_wcum()} AS nneg,
    sum(lf)  OVER {_wcum()} AS s
  FROM parts
),
v AS (
  SELECT symbol, seq,
    CASE WHEN cnt = 0 THEN NULL
         WHEN nz > 0 THEN 0.0
         ELSE exp(s) * (CASE WHEN nneg % 2 = 1 THEN -1.0 ELSE 1.0 END)
    END AS v
  FROM agg
)
SELECT symbol, seq, {_r('sign(v) * ln(1 + abs(v))', 'close_cumulative_return')} FROM v"""
        ),
    ),
)
