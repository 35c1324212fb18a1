"""Capture ``explain("formatted")`` for headline/bench queries.

Writes ``plans/r13/<name>_<tag>.txt`` for each query (default: every
headline query in bench.py's suite).  Usage:

    python scripts/capture_plans.py <tag> [name ...]

Planning only — no jobs run (except where a query body itself runs
eager driver-side steps, e.g. iterative kernels; those still only plan
their FINAL frame here).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))


def headline_names() -> list[str]:
    """The bench.py headline suite's catalog names (excludes the four
    flagship closures, which are captured via their own builders)."""
    import ast

    src = (_REPO / "bench.py").read_text()
    tree = ast.parse(src)
    names: list[str] = []
    for node in ast.walk(tree):
        # the big `for name in (...)` tuple inside main()
        if isinstance(node, ast.For) and isinstance(node.iter, ast.Tuple):
            elts = [
                e.value
                for e in node.iter.elts
                if isinstance(e, ast.Constant) and isinstance(e.value, str)
            ]
            if "tpch_q1" in elts:
                names = elts
    return names


def flagship_builders():
    """The four bench.py flagship closures (not catalog entries), mirrored
    so their plans can be dumped under the same names bench times."""
    from indicators_spark import Indicators
    from indicators_spark.sources import prices_from_events
    from pyspark.sql import functions as F

    def pipeline(s, d):
        return (
            Indicators(prices_from_events(s, d), order_by=("timestamp", "seq"))
            .sma(["close"], 20)
            .bollinger_bands(["close"], 20, 2)
            .rsi(["close"], 14)
            .daily_return(["close"])
            .collect()
        )

    def pipeline_per_symbol(s, d):
        return (
            Indicators(
                prices_from_events(s, d),
                order_by=("timestamp", "seq"),
                partition_mode="per_symbol",
            )
            .sma(["close"], 20)
            .bollinger_bands(["close"], 20, 2)
            .rsi(["close"], 14)
            .atr(14)
            .donchian_channel(20)
            .daily_return(["close"])
            .collect()
        )

    def pipeline_many_symbols(s, d):
        p = prices_from_events(s, d).withColumn(
            "symbol",
            F.concat_ws("_", "symbol", (F.col("seq") % 16).cast("string")),
        )
        return (
            Indicators(p, order_by=("timestamp", "seq"), partition_mode="per_symbol")
            .sma(["close"], 20)
            .bollinger_bands(["close"], 20, 2)
            .rsi(["close"], 14)
            .atr(14)
            .daily_return(["close"])
            .collect()
        )

    def pipeline_ewm_chain(s, d):
        return (
            Indicators(prices_from_events(s, d), order_by=("timestamp", "seq"))
            .ema(["close"], 20)
            .macd(["close"])
            .ppo()
            .pvo()
            .collect()
        )

    return {
        "pipeline": pipeline,
        "pipeline_per_symbol": pipeline_per_symbol,
        "pipeline_many_symbols": pipeline_many_symbols,
        "pipeline_ewm_chain": pipeline_ewm_chain,
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = _REPO / "plans" / os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14")
    out_dir.mkdir(parents=True, exist_ok=True)

    from indicators_spark import get_spark
    from indicators_spark.queries import QUERIES

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark("plans", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    flagships = flagship_builders()
    names = only or headline_names()
    for name in names:
        builder = flagships.get(name) or (
            QUERIES[name].spark if name in QUERIES else None
        )
        if builder is None:
            print(f"skip {name}: not in catalog", flush=True)
            continue
        try:
            df = builder(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR during planning: {type(e).__name__}: {e}"
        (out_dir / f"{name}_{tag}.txt").write_text(txt)
        print(f"wrote {name}_{tag}.txt", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
