"""API-surface tests for the Indicators class: symbol injection, fluent
chaining, validation errors, parity stubs, fill_null strategies."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from indicators_spark import Indicators


def test_symbol_injection_and_collect_drop(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 11.0)], "seq int, close double"
    ).withColumn("timestamp", F.timestamp_micros(F.col("seq") * 1000000))
    ind = Indicators(df)
    assert "symbol" in ind.get_dataframe().columns
    out = ind.sma(["close"], 2).collect()
    assert "symbol" not in out.columns
    # non-mutating: second collect identical
    out2 = ind.collect()
    assert "symbol" not in out2.columns


def test_missing_column_raises(spark, ohlcv):
    with pytest.raises(ValueError, match="Missing required columns"):
        Indicators(ohlcv).sma(["nope"], 5)


def test_parity_stubs_raise(spark, ohlcv):
    for call in (
        lambda i: i.kama(),
        lambda i: i.psar(),
        lambda i: i.nvi(),
        lambda i: i.kst_oscillator(["close"]),
    ):
        with pytest.raises(NotImplementedError):
            call(Indicators(ohlcv))


def test_fill_null_value_and_methods(spark, ohlcv):
    # value fill
    out = Indicators(ohlcv).fill_null(["close"], value=-1.0).collect()
    closes = [r[0] for r in out.select("close").collect()]
    assert -1.0 in closes and None not in closes
    # exactly-one-of validation
    with pytest.raises(ValueError):
        Indicators(ohlcv).fill_null(["close"])
    with pytest.raises(ValueError):
        Indicators(ohlcv).fill_null(["close"], value=1, method="forward")
    # forward fill per symbol: A's null at seq 3 takes seq 2's value
    out = Indicators(ohlcv).fill_null(["close"], method="forward").collect()
    a = (
        out.filter(F.col("symbol") == "A")
        .orderBy("seq")
        .select("close")
        .collect()
    )
    assert a[3][0] == 9.5
    # mean fill: nulls replaced by per-symbol mean
    out = Indicators(ohlcv).fill_null(["close"], method="mean").collect()
    a = out.filter(F.col("symbol") == "A").orderBy("seq").select("close").collect()
    vals = [10.0, 11.0, 9.5, 12.0, 12.5, 11.8, 13.0, 12.2, 14.0]
    assert a[3][0] == pytest.approx(sum(vals) / len(vals))


def test_macd_emits_only_signal_line(spark, ohlcv):
    out = Indicators(ohlcv).macd(["close"]).collect()
    added = set(out.columns) - set(ohlcv.columns)
    assert added == {"close_signal_line"}


def test_bollinger_name_typo_preserved(spark, ohlcv):
    out = Indicators(ohlcv).bollinger_bands(["close"], 5, 2).collect()
    assert "close_upprsier_band_5_2" in out.columns
    assert "close_lower_band_5_2" in out.columns


def test_chaining_returns_self(spark, ohlcv):
    ind = Indicators(ohlcv)
    assert ind.sma(["close"], 3) is ind
    assert ind.atr(5) is ind
