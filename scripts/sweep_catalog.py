"""Full-catalog local oracle sweep (driver replica).

Runs every oracle-bearing catalog query on Spark and compares against its
DuckDB oracle at the given SF dir; prints one line per failure and a
summary.  Usage: python scripts/sweep_catalog.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from indicators_spark import get_spark
    from indicators_spark.queries import QUERIES
    from indicators_spark.testing import check_query, duck_connect

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark("sweep", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connect(sf_dir)

    names = [n for n in QUERIES if QUERIES[n].sql is not None]
    if only:
        names = [n for n in names if n in only]
    fails = []
    t_start = time.time()
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            res = check_query(spark, con, name, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"[ERR ] {name}: {type(e).__name__}: {e}", flush=True)
            fails.append(name)
            continue
        dt = time.time() - t0
        if not res.ok:
            print(f"{res} [{dt:.1f}s]", flush=True)
            fails.append(name)
        elif os.environ.get("SWEEP_VERBOSE"):
            print(f"{res} [{dt:.1f}s]", flush=True)
        if (i + 1) % 25 == 0:
            print(
                f"... {i + 1}/{len(names)} checked, {len(fails)} failing, "
                f"{time.time() - t_start:.0f}s",
                flush=True,
            )
    print(
        f"SWEEP DONE: {len(names) - len(fails)}/{len(names)} ok "
        f"({time.time() - t_start:.0f}s)"
        + (f"; FAILING: {sorted(fails)}" if fails else "")
    )
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
