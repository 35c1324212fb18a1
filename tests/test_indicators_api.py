"""API-surface tests for the Indicators class: symbol injection, fluent
chaining, validation errors, parity stubs, fill_null strategies."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import _ts

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


def test_fill_null_backward_reversed_frame(spark):
    """Backward fill runs over the REVERSED ordering with a running frame
    (the O(n) plan); pin it row-for-row against the brute-force next-non-null,
    including interior null runs, trailing nulls (stay null), and an
    all-null symbol."""
    vals = {
        "A": [None, 1.0, None, None, 4.0, None, None],  # leading run + trailing run
        "B": [None, None, None, None, None, None, None],  # all null
        "C": [7.0, None, 8.0, None, None, 9.0, 10.0],
    }
    rows = [
        (sym, _ts(i), i, v, 1.0)
        for sym, seq in vals.items()
        for i, v in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows, "symbol string, timestamp timestamp, seq long, close double, volume double"
    )
    out = (
        Indicators(df, order_by=("timestamp", "seq"))
        .fill_null(["close"], method="backward")
        .collect()
    )
    got = {
        (r["symbol"], r["seq"]): r["close"]
        for r in out.select("symbol", "seq", "close").collect()
    }

    def next_non_null(seq, i):
        for v in seq[i:]:
            if v is not None:
                return v
        return None

    for sym, seq in vals.items():
        for i in range(len(seq)):
            assert got[(sym, i)] == next_non_null(seq, i), (sym, i)


def test_donchian_blocked_equals_classic_sliding(spark):
    """The plain-mode donchian path evaluates sliding max/min via the
    van Herk block decomposition; pin it row-for-row against the classic
    sliding-frame expressions across window sizes, null runs, and both
    n <= and n > the frame length (total order key, as the system
    requires of every ROWS-frame operator)."""
    import random

    from indicators_spark import kernels as K

    random.seed(7)
    rows = []
    j = 0
    for sym in ("A", "B"):
        for _ in range(120):
            hi = None if random.random() < 0.2 else round(random.uniform(1, 100), 3)
            lo = None if random.random() < 0.2 else round(random.uniform(1, 100), 3)
            rows.append((sym, _ts(j), j, hi, lo, 1.0, 1.0))
            j += 1
    df = spark.createDataFrame(
        rows,
        "symbol string, timestamp timestamp, seq long, high double, "
        "low double, close double, volume double",
    )
    for n in (2, 7, 50, 300):
        fast = Indicators(df, order_by=("timestamp", "seq")).donchian_channel(n).collect()
        w = K.w_rows(n, (), ("timestamp", "seq"))
        classic = df.withColumns(
            {
                f"donchian_upper_{n}": K.rolling_max("high", n, w),
                f"donchian_lower_{n}": K.rolling_min("low", n, w),
            }
        ).withColumn(
            f"donchian_mid_{n}",
            (F.col(f"donchian_upper_{n}") + F.col(f"donchian_lower_{n}")) / 2,
        )
        assert fast.exceptAll(classic).count() == 0, n
        assert classic.exceptAll(fast).count() == 0, n
        assert fast.columns == classic.columns, n


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


def test_existing_capitalized_symbol_not_clobbered(spark):
    """Spark resolves withColumn('symbol', ...) case-insensitively: a frame
    with a 'Symbol' column must keep its data (per-symbol grouping), not be
    overwritten by the injected literal."""
    import datetime as dt

    rows = [
        (s, dt.datetime(2024, 1, 1, 0, i), i, 10.0 + i)
        for i, s in enumerate(["A", "A", "B", "B"])
    ]
    df = spark.createDataFrame(rows, "Symbol string, timestamp timestamp, seq long, close double")
    out = Indicators(df, order_by=("timestamp", "seq")).sma(["close"], 2).collect()
    got = {r["Symbol"] for r in out.collect()}
    assert got == {"A", "B"}


def test_order_by_bare_string(spark, ohlcv):
    out = Indicators(ohlcv, order_by="timestamp").sma(["close"], 3).collect()
    assert "close_sma_3" in out.columns


def test_ewm_duplicate_columns_dedupe(spark, ohlcv):
    """ema(['close','close']) must behave like sma(['close','close']):
    one output column, not two identical schema fields."""
    out = Indicators(ohlcv, order_by=("timestamp",)).ema(["close", "close"], 12).collect()
    assert out.columns.count("close_ema_12") == 1
    assert out.count() > 0


def test_ewm_intermediate_collision_preserves_input_column(spark):
    """A frame that already has a column named like an operator's DROPPED
    intermediate must keep its own values (and type) — the fused program
    computes intermediates in a working copy."""
    import datetime as dt

    rows = [
        ("A", dt.datetime(2024, 1, 1, 0, i), i, 10.0 + i, 9.0 + i, float(i), "u")
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows,
        "symbol string, timestamp timestamp, seq long, high double, "
        "low double, close double, _mi_e1 string",
    )
    out = Indicators(df, order_by=("timestamp", "seq")).mass_index(9, 25).collect()
    assert dict(out.dtypes)["_mi_e1"] == "string"
    assert {r["_mi_e1"] for r in out.collect()} == {"u"}


def test_ewm_column_expression_validation_keeps_fusion(spark, ohlcv):
    """Validating a Column-expression argument must not flush the pending
    EWM program: ema + macd with F.col inputs still fuse into ONE
    FlatMapGroupsInPandas pass."""
    from indicators_spark.plans import plan_string

    out = (
        Indicators(ohlcv, order_by=("timestamp",))
        .ema([F.col("close")], 20)
        .macd([F.col("close")])
        .collect()
    )
    assert plan_string(out).count("FlatMapGroupsInPandas") == 1
