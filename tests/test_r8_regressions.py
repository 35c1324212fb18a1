"""Regression tests for the round-8 ADVICE fixes (ADVICE r7).  Each test
pins one fixed failure mode:

1. The approx-module size dispatch never spends a ``df.count()`` pass
   unless the caller opted in (explicit positive ``min_rows``) — with
   neither ``n_rows`` nor ``min_rows`` the exact branch runs for free.
2. ``winnow_fingerprints`` ENFORCES the 2^20 gram-position packing cap:
   a position at the cap raises (with the doc id in the message) instead
   of silently corrupting the packed argmin key.
3. ``mmr_rerank`` and ``mmr_rerank_grouped`` agree on DIRTY inputs too:
   zero-norm embeddings are excluded from both sides of both paths, so
   a degenerate candidate can no longer diverge the fast path from the
   relational spec (and from the SQL oracle, which filters ``norm > 0``).
4. ``lsh_dedup_keep_best`` raises eagerly on a non-numeric id column
   (Spark's implicit string→double cast would otherwise turn the
   ``-id`` tie-break into silent NULLs).
5. The shared-subtree materializations in mmr/winnow/query bodies no
   longer leave SQL-cache entries behind for the life of the session
   (persist → eager localCheckpoint; blocks free with the result).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from indicators_spark import approx
from indicators_spark.functions import dedup, similarity


# --------------------------------------------------------------------- #
# 1. no-free-count dispatch
# --------------------------------------------------------------------- #


class _NoCount:
    """DataFrame stand-in that fails the test if the dispatch counts."""

    def count(self):  # pragma: no cover - the assertion IS the failure
        raise AssertionError(
            "size dispatch ran df.count() without an explicit opt-in"
        )


def test_dispatch_rows_never_counts_by_default():
    # neither n_rows nor min_rows: exact branch, zero scans
    n, m = approx._dispatch_rows(_NoCount(), None, None)
    assert n == 0 and m == approx.APPROX_MIN_ROWS and n < m


def test_dispatch_rows_sentinel_min_rows_pins_sketch_without_count():
    # explicit min_rows <= 0 pins the sketch branch — still no count
    n, m = approx._dispatch_rows(_NoCount(), None, 0)
    assert n == 0 and m == 0 and n >= m


def test_dispatch_rows_known_n_rows_skips_count():
    n, m = approx._dispatch_rows(_NoCount(), 42, 7)
    assert (n, m) == (42, 7)


def test_dispatch_rows_explicit_min_rows_buys_the_count(spark):
    df = spark.range(5)
    n, m = approx._dispatch_rows(df, None, 3)
    assert (n, m) == (5, 3)


def test_quality_quantile_no_count_job_by_default(spark):
    """filter_by_quality_quantile with default args must not run the
    branch-picking count job (ADVICE r7: the rewire added a full scan
    to the previous single/two-pass forms)."""
    from indicators_spark.functions import text

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"some words here number {i} the of and to")
         for i in range(20)]
    )
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    out = text.filter_by_quality_quantile(docs, q=0.2)
    # building the plan must not have launched any job; the single
    # consuming action below is the only work
    mid = len(tracker.getJobIdsForGroup(None) or [])
    assert mid == before
    assert out.count() > 0


# --------------------------------------------------------------------- #
# 2. winnowing pos-cap enforcement
# --------------------------------------------------------------------- #


def test_winnow_pos_cap_raises(spark, monkeypatch):
    monkeypatch.setattr(dedup, "WINNOW_POS_SPACE", 64)
    long_doc = " ".join(f"w{i}" for i in range(120))  # 117 grams > 63
    df = spark.createDataFrame([Row(doc_id=1, text=long_doc)])
    with pytest.raises(Exception, match="packing cap"):
        dedup.winnow_fingerprints(df).collect()


def test_winnow_pos_under_cap_unchanged(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a b c d e f g h i j k l m n o p")]
    )
    fps = dedup.winnow_fingerprints(df).collect()
    assert fps, "in-cap doc must still fingerprint"
    assert all(1 <= r.pos < dedup.WINNOW_POS_SPACE for r in fps)


# --------------------------------------------------------------------- #
# 3. mmr paths agree on degenerate inputs
# --------------------------------------------------------------------- #


def test_mmr_grouped_equals_relational_with_zero_norm_rows(spark):
    rng = random.Random(8)
    rows = [
        Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(8)])
        for i in range(12)
    ]
    rows.append(Row(vec_id=12, embedding=[0.0] * 8))  # zero-norm corpus row
    df = spark.createDataFrame(rows)
    q = df.filter(F.col("vec_id") < 3)
    rel = {
        (r.qid, r.mmr_rank): (r.nid, r.score)
        for r in similarity.mmr_rerank(df, q, k=3, n_candidates=6).collect()
    }
    grp = {
        (r.qid, r.mmr_rank): (r.nid, r.score)
        for r in similarity.mmr_rerank_grouped(
            df, q, k=3, n_candidates=6
        ).collect()
    }
    assert rel == grp and rel
    assert all(nid != 12 for nid, _ in rel.values()), (
        "zero-norm row must be excluded from every selection"
    )


def test_mmr_zero_norm_query_dropped_everywhere(spark):
    rng = random.Random(9)
    rows = [
        Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(8)])
        for i in range(10)
    ]
    df = spark.createDataFrame(rows)
    zq = spark.createDataFrame([Row(vec_id=99, embedding=[0.0] * 8)])
    assert similarity.mmr_rerank(df, zq, k=3).count() == 0
    assert similarity.mmr_rerank_grouped(df, zq, k=3).count() == 0


# --------------------------------------------------------------------- #
# 4. keep_best numeric-id guard
# --------------------------------------------------------------------- #


def test_keep_best_rejects_string_ids(spark):
    docs = spark.createDataFrame(
        [Row(doc_id="a", text="x y z"), Row(doc_id="b", text="x y z")]
    )
    q = spark.createDataFrame(
        [Row(doc_id="a", quality=1.0), Row(doc_id="b", quality=2.0)]
    )
    with pytest.raises(TypeError, match="must be numeric"):
        dedup.lsh_dedup_keep_best(docs, q)


# --------------------------------------------------------------------- #
# 5. no SQL-cache residue from the materialization sites
# --------------------------------------------------------------------- #


def _sql_cache_empty(spark) -> bool:
    return bool(
        spark._jsparkSession.sharedState().cacheManager().isEmpty()
    )


def test_mmr_and_winnow_leave_no_sql_cache(spark):
    spark.catalog.clearCache()
    assert _sql_cache_empty(spark)
    rng = random.Random(10)
    emb = spark.createDataFrame(
        [
            Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(8)])
            for i in range(10)
        ]
    )
    similarity.mmr_rerank(emb, emb.filter(F.col("vec_id") < 2), k=2).collect()
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text="the quick brown fox jumps over the lazy dog")
            for i in range(6)
        ]
    )
    dedup.winnow_pairs(docs).collect()
    assert _sql_cache_empty(spark), (
        "materialization must not leave session-lifetime cache entries"
    )
