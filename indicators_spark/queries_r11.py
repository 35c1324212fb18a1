"""Round-11 catalog registrations.

Two jobs this round (VERDICT r10 #1/#3):

1. **Register the r11 queue** — the three build-complete, parity-pinned
   preps waiting on driver slots: ``similarity_kcenter_carry``
   (queries_r10), ``dedup_lines_within_doc`` and ``text_bpe_merges``
   (queries_r9).  One ``_register`` line each; the spark/sql callables
   live next to their documentation in the prep modules.

2. **Close the last sql=None hole** — ``stats_hll_rollup`` (Spark
   DataSketches HLL; not portable to DuckDB, so it has never had a
   driver row).  ``stats_hll_rollup_audit`` below applies the
   per-engine-verdict contract that closed ``text_compression_ratio``
   in r10 (queries_r9 ``audit_compression_ratio``) and the sketch
   estimators in r8 (``stats_hll_audit``/``stats_tdigest_audit``):
   each engine derives a tolerance-band verdict from its OWN sketch in
   the same query; the exact counts and the verdicts hash-match even
   though the raw estimates differ.

The remaining prep queue (r12+: ``stats_psi_drift``, ``text_bpe_encode``,
``dedup_jaccard_prefix``, ``quality_quantile_normalize``,
``decontaminate_neardup``, ``analytic_median_selection``,
``analytic_group_median_selection``, ``analytic_robust_scale``) stays in
queries_r10.py, unregistered — r11's ~50 driver slots are committed to
4 new rows + the stalest rotations (the r6-era §2a block, the oldest
evidence in the catalog per VERDICT r10 #6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import Query, _register
from .sources.prices import load_table

# --------------------------------------------------------------------- #
# r11 queue registrations (preps + oracles in queries_r9 / queries_r10;
# dual-SF driver-style parity pinned in tests/test_oracle_parity_r9.py
# and tests/test_oracle_parity_r10.py).
#
# Every cross-module reference is DEFERRED to call time: this module
# runs from queries.py's registration tail, which executes while any
# directly-imported queries_r* module (a solo `import queries_r9` in a
# test) is still partially initialized — a module-level `from
# .queries_r9 import ...` here would crash that entry point.  The sql
# fields use the Query-callable form (resolved at access time) for the
# same reason.
# --------------------------------------------------------------------- #


def _kc_carry_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .queries_r10 import _kcenter_carry_spark

    return _kcenter_carry_spark(spark, sf_dir)


def _kc_carry_sql() -> str:
    from .queries_r10 import _kcenter_carry_sql

    return _kcenter_carry_sql()


def _lines_within_doc_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .queries_r9 import _line_selfdedup_spark

    return _line_selfdedup_spark(spark, sf_dir)


def _lines_within_doc_sql() -> str:
    from .queries_r9 import _line_selfdedup_sql

    return _line_selfdedup_sql()


def _bpe_merges_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .queries_r9 import _bpe_merges_spark as _impl

    return _impl(spark, sf_dir)


def _bpe_merges_sql() -> str:
    from .queries_r9 import _bpe_merges_sql as _impl

    return _impl()


_register(
    "similarity_kcenter_carry",
    Query(spark=_kc_carry_spark, sql=_kc_carry_sql),
)
_register(
    "dedup_lines_within_doc",
    Query(spark=_lines_within_doc_spark, sql=_lines_within_doc_sql),
)
_register(
    "text_bpe_merges",
    Query(spark=_bpe_merges_spark, sql=_bpe_merges_sql),
)


# --------------------------------------------------------------------- #
# HLL rollup audit — the per-engine-verdict twin of `stats_hll_rollup`.
#
# What the verdict certifies that `stats_hll_audit` (flat per-group HLL)
# does not: the UNION path.  The ALL row's estimate comes from
# `hll_union_agg` over the 30 stored daily sketch blobs — the
# compute-once/rollup-forever property that is the whole point of the
# sketch table at 100 TB — and the audit asserts that unioned estimate
# lands within band of the exact global distinct, alongside each daily
# sketch vs its exact count.  DuckDB derives its verdicts from its own
# approx_count_distinct (a direct sketch of the same union of inputs —
# the estimate target is identical even though the sketch family
# isn't); the exact counts hash-match literally, the verdicts must both
# be `true`.
#
# Day key: TZ-independent epoch-day rendered as a string (the driver's
# session may not be UTC — the `_utc_cutoff` precedent, queries_ext.py)
# so the 'ALL' union row shares the column type.  NULL-ts rows are
# excluded on BOTH sides: a NULL day group would survive DuckDB's GROUP
# BY but drop out of Spark's null-rejecting equijoin against the exact
# side, a silent row-count mismatch (no NULL ts in the synthetic data —
# the filter is belt-and-braces for real feeds).
#
# Band: lgk=12 → rsd ≈ 1.04/√4096 ≈ 1.6%, so 0.10 is ~6σ; DuckDB's
# default-precision standard error is also ~1.6%.  A flipped verdict is
# a broken estimator or a broken union, not noise.  The exact side
# re-reads the facts — that is what makes it an AUDIT: run periodically
# or on a sampled slice at scale while production rolls up sketch blobs
# alone (the contract stated on stats_hll_audit, queries_r8.py).
# --------------------------------------------------------------------- #

HLL_ROLLUP_TOL = 0.10


def _hll_rollup_audit_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.sketches import hll_distinct_rollup

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    day = (
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").cast("string")
    )
    rolled = hll_distinct_rollup(ev, day_col=day)
    exact_day = ev.groupBy(day.alias("day")).agg(
        F.count_distinct("user_id").cast("long").alias("n_exact")
    )
    exact_all = ev.agg(
        F.count_distinct("user_id").cast("long").alias("n_exact")
    ).select(F.lit("ALL").alias("day"), "n_exact")
    exact = exact_day.unionByName(exact_all)
    return rolled.join(exact, "day").select(
        "day",
        "n_exact",
        (
            F.abs(
                F.col("approx_distinct").cast("double")
                - F.col("n_exact").cast("double")
            )
            <= F.lit(HLL_ROLLUP_TOL) * F.col("n_exact").cast("double")
        ).alias("hll_ok"),
    )


_HLL_ROLLUP_AUDIT_SQL = f"""
WITH ev AS (
  SELECT CAST(CAST(floor(epoch(ts) / 86400) AS BIGINT) AS VARCHAR) AS day,
    user_id
  FROM events WHERE ts IS NOT NULL
),
per AS (
  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
    CAST(approx_count_distinct(user_id) AS DOUBLE) AS est
  FROM ev GROUP BY day
  UNION ALL
  SELECT 'ALL', CAST(count(DISTINCT user_id) AS BIGINT),
    CAST(approx_count_distinct(user_id) AS DOUBLE)
  FROM ev
)
SELECT day, n_exact,
  abs(est - CAST(n_exact AS DOUBLE))
    <= {HLL_ROLLUP_TOL} * CAST(n_exact AS DOUBLE) AS hll_ok
FROM per"""


_register(
    "stats_hll_rollup_audit",
    Query(spark=_hll_rollup_audit_spark, sql=_HLL_ROLLUP_AUDIT_SQL),
)
