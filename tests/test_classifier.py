"""Tests for the fastText-style hashed-feature logistic quality
classifier (functions/classifier.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from indicators_spark.functions import classifier

SF_SMOKE = "/root/testdata/sf0.001"


def _two_vocab_df(spark):
    # y=1 docs draw from one vocabulary, y=0 from a disjoint one — a
    # linear model over hashed unigrams separates them easily
    pos_words = ["alpha", "beta", "gamma", "delta"]
    neg_words = ["omega", "sigma", "theta", "kappa"]
    rows = []
    for i in range(12):
        w = [pos_words[(i + j) % 4] for j in range(6)]
        rows.append((i, " ".join(w), "en"))
    for i in range(12, 24):
        w = [neg_words[(i + j) % 4] for j in range(6)]
        rows.append((i, " ".join(w), "de"))
    rows.append((99, None, "en"))  # NULL text: excluded from train+score
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_logreg_learns_separable_vocab(spark):
    df = _two_vocab_df(spark)
    out = classifier.logreg_quality(
        df, label=(F.col("lang") == "en"), buckets=64, iters=3, lr=50.0
    ).collect()
    assert len(out) == 24  # NULL-text row excluded
    assert all(r.doc_id != 99 for r in out)
    acc = sum(1 for r in out if r.pred == r.y) / len(out)
    assert acc == 1.0, [(r.doc_id, r.y, r.prob) for r in out]
    # probabilities actually moved off the 0.5 start
    assert all(
        (r.prob > 0.5) == (r.y == 1) and abs(r.prob - 0.5) > 0.01
        for r in out
    )


def test_logreg_zero_iters_is_base_rate(spark):
    # with w=0 every margin is exactly 0 → prob 0.5, pred true everywhere
    df = _two_vocab_df(spark)
    out = classifier.logreg_quality(
        df, label=(F.col("lang") == "en"), buckets=64, iters=0
    ).collect()
    assert all(r.logit == 0.0 and r.prob == 0.5 and r.pred == 1 for r in out)


def test_logreg_sql_matches_spark_shape(spark):
    # iteration unrolling produces one m/g/w triple per step
    sql = classifier.logreg_sql("lang = 'en'", buckets=8, iters=2)
    for cte in ("w0", "m1", "g1", "w1", "m2", "g2", "w2", "mf"):
        assert f"{cte} AS (" in sql, sql
    assert "w3" not in sql


def test_logreg_plan_has_no_window_or_weight_join(spark):
    from indicators_spark.plans import plan_string
    from indicators_spark.queries import QUERIES

    df = QUERIES["classifier_quality_logreg"].spark(spark, SF_SMOKE)
    plan = plan_string(df)
    # weights enter as literals (element_at over an array literal), so
    # scoring is map-side: no window, no nested-loop, no weights join
    assert "Window" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
