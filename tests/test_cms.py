"""Tests for the count-min sketch heavy hitters (functions/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from indicators_spark.functions import sketches

SF_SMOKE = "/root/testdata/sf0.001"


def _tokens(spark, words):
    return spark.createDataFrame([(w,) for w in words], "v string")


def test_cms_estimate_never_undercounts(spark):
    words = ["a"] * 50 + ["b"] * 20 + [f"w{i}" for i in range(200)]
    out = sketches.cms_topk(_tokens(spark, words), "v", k=250).collect()
    assert all(r.est >= r.true_cnt for r in out)
    # the clear heavy hitters survive collisions at d=4, w=512
    assert out[0].token == "a" and out[0].true_cnt == 50
    assert out[1].token == "b" and out[1].true_cnt == 20
    assert [r.rank for r in out[:3]] == [1, 2, 3]


def test_cms_counter_matrix_is_bounded(spark):
    words = [f"w{i}" for i in range(3000)]
    counters = sketches.cms_counters(_tokens(spark, words), "v").collect()
    assert len(counters) <= sketches.CMS_D * sketches.CMS_W
    # every row's counters sum to the full stream length
    by_j = {}
    for r in counters:
        by_j[r.j] = by_j.get(r.j, 0) + r.cnt
    assert set(by_j) == set(range(sketches.CMS_D))
    assert all(v == 3000 for v in by_j.values())


def test_cms_sketches_merge_cellwise(spark):
    a = _tokens(spark, ["x"] * 5 + ["y"] * 3)
    b = _tokens(spark, ["x"] * 2 + ["z"] * 4)
    both = a.unionAll(b)
    merged = (
        sketches.cms_counters(a, "v")
        .unionAll(sketches.cms_counters(b, "v"))
        .groupBy("j", "b")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = sketches.cms_counters(both, "v")
    ml = {(r.j, r.b): r.cnt for r in merged.collect()}
    dl = {(r.j, r.b): r.cnt for r in direct.collect()}
    assert ml == dl


def test_cms_plan_broadcasts_sketch_no_global_sort(spark):
    from indicators_spark.plans import plan_string
    from indicators_spark.queries import QUERIES

    plan = plan_string(QUERIES["stats_cms_topk"].spark(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
