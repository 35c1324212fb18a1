"""Per-query time breakdown: builder (incl. eager driver-side jobs),
Catalyst planning (executedPlan materialization), and execution (noop
write) — separates driver/plan overhead from actual compute, which at
bench SF are easily confused.  Usage:

    python scripts/profile_query.py name [name ...] [--repeat N]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    repeat = 2
    for a in sys.argv[1:]:
        if a.startswith("--repeat"):
            repeat = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from indicators_spark import get_spark
    from indicators_spark.queries import QUERIES

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark("profile", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    # warm: parquet footers + python worker pool (mirrors bench.py)
    from indicators_spark.sources import prices_from_events
    from pyspark.sql import functions as F

    prices_from_events(spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    spark.range(64).withColumn("g", F.col("id") % 4).groupBy("g").applyInPandas(
        lambda p: p, "id long, g long"
    ).write.mode("overwrite").format("noop").save()

    for name in args:
        for r in range(repeat):
            sc = spark.sparkContext
            t0 = time.time()
            df = QUERIES[name].spark(spark, sf_dir)
            t1 = time.time()
            _ = df._jdf.queryExecution().executedPlan().toString()
            t2 = time.time()
            df.write.mode("overwrite").format("noop").save()
            t3 = time.time()
            print(
                f"{name} run{r}: build={t1 - t0:.2f}s plan={t2 - t1:.2f}s "
                f"exec={t3 - t2:.2f}s total={t3 - t0:.2f}s",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
