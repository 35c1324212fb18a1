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


#: Queries added in round 3 — still never-green, but the round-2 backlog
#: (50 queries awaiting their first driver row) must spend the budget
#: first, so these sort after that backlog within the never-green group.
_ROUND3_NEW = {
    "tpch_q21_bucketed",
    "dedup_minhash_lsh_capped",
    "dedup_lsh_bucket_overflow",
    "tfidf_cosine_pairs_pruned",
    "semantic_dedup_capped",
    "text_redact_pii",
    "chunk_dedup_stats",
    "pq_encode",
    "similarity_knn_pq",
    "corpus_vocab_stats",
    "source_overlap_matrix",
    "similarity_knn_ivfpq",
    "stats_hll_rollup",
    "analytic_seasonal_decompose",
    "text_entropy",
    "source_kl_divergence",
    "sample_weighted_aes",
    "analytic_histogram_equidepth",
    "analytic_chi_square",
    "similarity_hard_negatives",
    "embedding_centroid_classify",
    "embedding_covariance",
    "text_bpe_pairs",
    "mixture_temperature",
    "events_attribution_last_touch",
    "analytic_key_skew",
    "graph_pagerank_nations",
    "graph_communities_nations",
    "profile_lineitem",
    "events_anomaly_mad",
    "grouping_sets_lineitem",
    "stats_kmv_quantile",
    "dedup_minhash_estimate",
    "reconcile_snapshots",
    "unpivot_lineitem",
    "pysource_ticks_agg",
    "rolling_median",
    "events_attribution_linear",
    "analytic_ols_trend",
    "events_path_trigrams",
    "incremental_agg_maintenance",
    "dq_expectations",
    "risk_metrics_per_symbol",
    "heikin_ashi",
    "range_window_trailing_1h",
    "events_session_window_native",
    "forecast_seasonal_naive_eval",
    "analytic_acf",
    "embedding_pca_power",
    "text_langid_confusion",
    "graph_shortest_paths",
    "events_active_users",
    "dedup_lsh_recall",
    "multimodal_phash_dedup",
    "ml_training_table",
    "hypertable_rollup",
    "dedup_family_histogram",
    "customers_rfm",
    "supplier_pareto",
}


def _ordered_names() -> list[str]:
    from indicators_spark.queries import QUERIES

    green = _evidenced()
    return sorted(
        QUERIES,
        key=lambda n: (n in green, n in _ROUND3_NEW, list(QUERIES).index(n)),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    never-driver-verified queries first (see :func:`_evidenced`),
    this round's additions last within that group."""
    from indicators_spark.queries import QUERIES

    return {name: QUERIES[name].spark for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query (omitted → rows-only check).
    Pair by NAME only: sql=None entries are omitted here, so positions
    shift relative to :func:`queries` after the first omitted key."""
    from indicators_spark.queries import QUERIES

    return {
        n: QUERIES[n].sql
        for n in _ordered_names()
        if QUERIES[n].sql is not None
    }
