"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The catalog itself lives in ``indicators_spark.queries`` (one entry per
implemented operator from SURVEY.md §2, each with its ANSI-SQL oracle);
this module is a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: OHLCV bars derived from
    ``events``, then a chained indicator pipeline (sma + bollinger + rsi +
    macd over per-symbol windows) — one exchange for all window ops."""
    from indicators_spark import Indicators
    from indicators_spark.sources import prices_from_events

    prices = prices_from_events(spark, "/root/testdata/sf0.001")
    ind = (
        Indicators(prices, order_by=("timestamp", "seq"))
        .sma(["close"], 20)
        .bollinger_bands(["close"], 20, 2)
        .rsi(["close"], 14)
        .daily_return(["close"])
    )
    return ind.collect()


def _evidenced() -> set[str]:
    """Query names with a green driver CORRECTNESS row from any prior round.

    The driver verifies queries in dict-insertion order under a budget
    (round 1 covered the first 50 of 125), so ``queries()`` orders
    never-green queries first — each round the budget then lands on the
    least-evidenced part of the catalog instead of re-checking stable rows.
    """
    import json

    green: set[str] = set()
    for p in sorted(_REPO.glob("CORRECTNESS_r*.json")):
        try:
            rows = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for name, r in rows.items():
            if not isinstance(r, dict) or r.get("err"):
                continue
            if r.get("rows_match") and r.get("schema_match") is not False and r.get(
                "hash_match", True
            ):
                green.add(name)
    return green


def _ordered_names(green: set[str] | None = None) -> list[str]:
    """Driver-facing catalog order: never-green first, registration order
    within each group.

    Only oracle-bearing queries are exposed: the driver has NO rows-only
    mode — a ``queries()`` entry without a matching ``oracle_sql()`` entry
    is recorded as ``err: "no_oracle"`` (observed in CORRECTNESS_r03), so a
    ``sql=None`` catalog entry would burn a verification slot and produce a
    red row every round.  Those operators (``text_compression_ratio``,
    ``stats_hll_rollup``) keep their local evidence in
    tests/test_functions.py + tests/test_oracle_parity.py instead.
    """
    from indicators_spark.queries import QUERIES

    if green is None:
        green = _evidenced()
    idx = {n: i for i, n in enumerate(QUERIES)}
    return sorted(
        (n for n in QUERIES if QUERIES[n].sql is not None),
        key=lambda n: (n in green, idx[n]),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    never-driver-verified queries first (see :func:`_evidenced`)."""
    from indicators_spark.queries import QUERIES

    return {name: QUERIES[name].spark for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query — exactly one entry per
    :func:`queries` key (sql=None operators are excluded from both)."""
    from indicators_spark.queries import QUERIES

    return {n: QUERIES[n].sql for n in _ordered_names()}
