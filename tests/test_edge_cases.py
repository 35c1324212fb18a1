"""Edge cases: empty frames, single rows, all-null columns, Column
selectors as the `columns` argument (the reference accepts pl.Expr)."""

from __future__ import annotations

from pyspark.sql import functions as F

from indicators_spark import Indicators


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "symbol string, timestamp timestamp, seq long, high double, "
        "low double, close double, volume double"
    )


def test_empty_frame(spark):
    df = _frame(spark, [])
    out = (
        Indicators(df, order_by=("timestamp", "seq"))
        .sma(["close"], 5)
        .rsi(["close"], 5)
        .atr(5)
        .collect()
    )
    assert out.count() == 0
    assert "close_sma_5" in out.columns


def test_single_row(spark):
    import datetime as dt

    df = _frame(spark, [("A", dt.datetime(2024, 1, 1), 0, 10.2, 9.8, 10.0, 5.0)])
    out = (
        Indicators(df, order_by=("timestamp", "seq"))
        .sma(["close"], 5)
        .vwap()
        .force_index()
        .collect()
        .collect()
    )
    assert len(out) == 1
    r = out[0]
    assert r["close_sma_5"] is None  # warm-up
    assert r["vwap"] == (10.2 + 9.8 + 10.0) / 3  # cumsum of one row
    assert r["force_index"] is None  # no predecessor


def test_all_null_column(spark):
    import datetime as dt

    rows = [
        ("A", dt.datetime(2024, 1, 1, 0, i), i, None, None, None, 1.0)
        for i in range(5)
    ]
    df = _frame(spark, rows)
    out = Indicators(df, order_by=("timestamp", "seq")).sma(["close"], 2).collect()
    assert all(r["close_sma_2"] is None for r in out.collect())


def test_column_selector_input(spark, ohlcv):
    """The reference accepts pl.Expr selectors; we accept Column lists."""
    out = Indicators(ohlcv).sma([F.col("close")], 3).collect()
    assert "close_sma_3" in out.columns
    out2 = Indicators(ohlcv).sma("close", 3).collect()  # bare string too
    assert "close_sma_3" in out2.columns


def test_ewm_empty_and_single_group(spark):
    import datetime as dt

    df = _frame(spark, [("A", dt.datetime(2024, 1, 1), 0, 10.2, 9.8, 10.0, 5.0)])
    out = Indicators(df, order_by=("timestamp", "seq")).ema(["close"], 5).collect()
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["close_ema_5"] == 10.0
    empty = _frame(spark, [])
    out2 = Indicators(empty, order_by=("timestamp", "seq")).ema(["close"], 5).collect()
    assert out2.count() == 0
