"""Property sweep for the fluent halo session (core.py, r11): RANDOM
operator chains, forced-halo vs plain, exact value equality.  The
hand-picked chains in test_core_halo.py pin the known transition paths
(re-halo, demote, EWM flush, cumulative collapse); this sweeps arbitrary
interleavings of those paths — the state machine must be invisible for
EVERY composition, not just the ones we thought of."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from indicators_spark import Indicators

_settings = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# each entry exercises a distinct session path: rolling (_w), lag/lead
# (_word incl. deep shifts), EWM flush, cumulative collapse, fill
# collapse, rank (aroon), and chains over window outputs
OPS = {
    "sma": lambda i: i.sma(["close"], 5),
    "rsi": lambda i: i.rsi(["close"], 6),
    "roc": lambda i: i.roc(["close"], 7),
    "dpo": lambda i: i.dpo(["close"], 6),
    "wma": lambda i: i.wma(["close"], 3),
    "ema": lambda i: i.ema(["close"], 8),
    "macd": lambda i: i.macd(["close"]),
    "obv": lambda i: i.obv(),
    "cumret": lambda i: i.cumulative_returns(["volume"]),
    "fill": lambda i: i.fill_null(["open"], method="mean"),
    "ichimoku": lambda i: i.ichimoku(5, 6, 8),
    "atr": lambda i: i.atr(5),
    "aroon": lambda i: i.aroon(5),
    "dret": lambda i: i.daily_return(["close"]),
    # spec REUSE across bindings (the ADVICE r11 sticky-charge class):
    # kst shares one lag spec over four rc bindings; ultimate_oscillator
    # binds three loop-created rolling specs in one final expression
    "kst": lambda i: i.kst(
        ["close"], roc_periods=(6, 10), sma_periods=(5, 5), weights=(1, 2)
    ),
    "uo": lambda i: i.ultimate_oscillator(5, 8, 12),
}


def _frame(spark, n=240):
    import datetime

    base = datetime.datetime(2024, 3, 1)
    rows = []
    for i in range(n):
        c = 50.0 + 20.0 * ((i * 29) % 97) / 97
        rows.append(
            (
                base + datetime.timedelta(minutes=i),
                c - 0.5 if i % 11 else None,  # nulls for the fill path
                c + 1.0 + (i % 7) / 7,
                c - 1.0 - (i % 5) / 5,
                float(c),
                100.0 + (i * 13) % 401,
            )
        )
    return spark.createDataFrame(
        rows,
        "timestamp timestamp, open double, high double, low double,"
        " close double, volume double",
    )


@given(
    names=st.lists(st.sampled_from(sorted(OPS)), min_size=2, max_size=5),
    depth=st.sampled_from([24, 48, 96]),
    buckets=st.sampled_from([2, 3]),
)
@_settings
def test_random_chain_halo_equals_plain(spark, names, depth, buckets):
    src = _frame(spark)

    def build(**kw):
        ind = Indicators(src, **kw)
        for nm in names:
            # duplicate output names across repeated ops are fine — the
            # engine overwrites like the reference; equality must hold
            OPS[nm](ind)
        return ind.collect()

    plain = build(halo=False)
    halo = build(halo=True, halo_buckets=buckets, halo_depth=depth)
    cols = sorted(plain.columns)
    assert cols == sorted(halo.columns)

    def rows(df):
        return [
            tuple(
                round(v, 9) if isinstance(v, float) else v for v in r
            )
            for r in df.select(*cols).orderBy("timestamp").collect()
        ]

    assert rows(plain) == rows(halo)
