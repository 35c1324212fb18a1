"""Unit tests for the primitive kernel layer (SURVEY.md §5 item 1):
min-samples gating, shift/diff/pct_change, cumulative frames, null policy."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from indicators_spark import kernels as K


def _by_seq(df, col, symbol="A"):
    rows = df.filter(F.col("symbol") == symbol).orderBy("seq").select(col).collect()
    return [r[0] for r in rows]


def test_rolling_mean_warmup_nulls(spark, ohlcv):
    w = K.w_rows(3, ("symbol",), ("timestamp",))
    out = ohlcv.withColumn("m", K.rolling_mean("close", 3, w))
    vals = _by_seq(out, "m")
    # first n-1 rows null
    assert vals[0] is None and vals[1] is None
    assert vals[2] == (10.0 + 11.0 + 9.5) / 3


def test_rolling_gate_counts_non_null(spark, ohlcv):
    # symbol A has a null close at seq 3 → windows containing it stay null
    w = K.w_rows(3, ("symbol",), ("timestamp",))
    out = ohlcv.withColumn("m", K.rolling_mean("close", 3, w))
    vals = _by_seq(out, "m")
    assert vals[3] is None and vals[4] is None and vals[5] is None
    assert vals[6] == (12.0 + 12.5 + 11.8) / 3


def test_safe_div_null_on_zero(spark):
    df = spark.createDataFrame([(1.0, 0.0), (4.0, 2.0)], "a double, b double")
    out = df.select(K.safe_div(F.col("a"), F.col("b")).alias("d")).collect()
    assert out[0][0] is None
    assert out[1][0] == 2.0


def test_when_nullsafe_propagates_null(spark):
    df = spark.createDataFrame([(None,), (1.0,), (-1.0,)], "x double")
    out = df.select(
        K.when_nullsafe(F.col("x") > 0, F.col("x"), F.lit(0.0)).alias("y")
    ).collect()
    assert [r[0] for r in out] == [None, 1.0, 0.0]


def test_diff_and_pct_change(spark, ohlcv):
    w = K.w_ord(("symbol",), ("timestamp",))
    out = ohlcv.withColumn("d", K.diff("close", w)).withColumn(
        "p", K.pct_change("close", w)
    )
    d = _by_seq(out, "d")
    p = _by_seq(out, "p")
    assert d[0] is None and d[1] == 1.0
    assert math.isclose(p[1], 0.1)


def test_cum_sum_skips_nulls(spark, ohlcv):
    w = K.w_cum(("symbol",), ("timestamp",))
    out = ohlcv.withColumn("cs", K.cum_sum("close", w))
    cs = _by_seq(out, "cs")
    assert cs[2] == 30.5
    assert cs[3] == 30.5  # null close contributes nothing


def test_cum_prod(spark):
    df = spark.createDataFrame(
        [("A", 1, 2.0), ("A", 2, 3.0), ("A", 3, 0.5)], "symbol string, seq int, x double"
    )
    w = K.w_cum(("symbol",), ("seq",))
    out = df.withColumn("cp", K.cum_prod("x", w)).orderBy("seq").collect()
    assert [r["cp"] for r in out] == [2.0, 6.0, 3.0]


def test_nullsafe_sum_horizontal(spark):
    df = spark.createDataFrame([(1.0, None, 2.0)], "a double, b double, c double")
    out = df.select(
        K.nullsafe_sum_horizontal(F.col("a"), F.col("b"), F.col("c")).alias("s")
    ).collect()
    assert out[0][0] == 3.0
