"""Paired-A/B subset runner for bench.py (VERDICT r11 #4).

Times a comma-separated list of catalog queries from an ARBITRARY repo
checkout (the previous round's worktree, or the current tree) in its
own process and SparkSession, so the two sides of the A/B are
code-isolated but share the host window.  Prints exactly one JSON line
{name: sec} on stdout.

Usage: python bench_ab_worker.py <repo_root> <sf_dir> <q1,q2,...> <cores>
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    repo, sf_dir, names_csv, cores = sys.argv[1:5]
    names = [n for n in names_csv.split(",") if n]
    here = os.path.dirname(os.path.abspath(__file__))
    # the target checkout must shadow this script's own repo on sys.path
    sys.path = [repo] + [
        p for p in sys.path if os.path.abspath(p or ".") != here
    ]
    from indicators_spark import get_spark
    from indicators_spark.queries import QUERIES
    from indicators_spark.sources import prices_from_events

    spark = get_spark("bench-ab", cores=int(cores))
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    # same warmup as bench.py: JVM + parquet footers + Python worker pool
    force(prices_from_events(spark, sf_dir))
    from pyspark.sql import functions as F

    force(
        spark.range(64)
        .withColumn("g", F.col("id") % 4)
        .groupBy("g")
        .applyInPandas(lambda p: p, "id long, g long")
    )

    out = {}
    for n in names:
        q = QUERIES.get(n)
        if q is None:
            continue
        t0 = time.time()
        force(q.spark(spark, sf_dir))
        out[n] = round(time.time() - t0, 3)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
