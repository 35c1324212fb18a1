"""Tests for PMI collocations and DoReMi-style domain reweighting."""

from __future__ import annotations

from indicators_spark.functions.text import pmi_bigrams
from indicators_spark.queries import QUERIES

SF_SMOKE = "/root/testdata/sf0.001"


def test_pmi_surfaces_exclusive_collocation(spark):
    # "san francisco" co-occur only with each other (c1=c2=c12=10);
    # every other word pairs with several neighbors, inflating its
    # marginals → strictly lower PMI
    docs = [(i, "san francisco the cat the mat") for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = pmi_bigrams(df, top_k=5, min_count=5).collect()
    assert out[0].w1 == "san" and out[0].w2 == "francisco"
    assert out[0].rank == 1
    # exclusive pair beats every shared-word pair
    assert all(out[0].pmi > r.pmi for r in out[1:])


def test_pmi_min_count_prunes_rare_pairs(spark):
    df = spark.createDataFrame(
        [(1, "rare pair only once"), (2, "common words common words common words common words common words")],
        "doc_id long, text string",
    )
    out = pmi_bigrams(df, top_k=10, min_count=5).collect()
    pairs = {(r.w1, r.w2) for r in out}
    assert ("rare", "pair") not in pairs
    assert ("words", "common") in pairs or ("common", "words") in pairs


def test_doremi_weights_are_a_distribution_ordered_by_excess(spark):
    rows = QUERIES["mixture_doremi_weights"].spark(spark, SF_SMOKE).collect()
    assert rows
    total = sum(r.weight for r in rows)
    assert abs(total - 1.0) < 1e-2, total  # 4dp-quantized per-domain
    # smoothing floor: every domain keeps at least ~c/K
    k = len(rows)
    assert all(r.weight >= 0.1 / k - 1e-4 for r in rows)
    # monotone in excess: the max-excess domain is the max-weight domain
    by_ex = max(rows, key=lambda r: (r.excess, r.source))
    by_w = max(rows, key=lambda r: (r.weight, r.source))
    assert by_ex.source == by_w.source
    # zero-excess domains sit at the uniform/smoothing baseline, below
    # any positive-excess domain
    zero = [r.weight for r in rows if r.excess == 0.0]
    pos = [r.weight for r in rows if r.excess > 0.0]
    if zero and pos:
        assert max(zero) <= min(pos)


def test_quality_ensemble_votes(spark):
    rows = QUERIES["filter_quality_ensemble"].spark(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_votes == r.v_gopher + r.v_quality + r.v_ppl + r.v_rep
        assert r.keep == (1 if r.n_votes >= 3 else 0)
    # the vote must actually discriminate: some kept, some dropped
    kept = sum(r.keep for r in rows)
    assert 0 < kept < len(rows)


def test_waterfill_caps_and_conserves_budget(spark):
    from indicators_spark.functions.sampling import token_budget_waterfill

    rows = [("tiny", 10.0, 1.0), ("mid", 100.0, 1.0), ("big", 10000.0, 1.0)]
    df = spark.createDataFrame(rows, "source string, supply double, w double")
    out = {r.source: r for r in
           token_budget_waterfill(df, budget=300.0).collect()}
    # equal weights want 100 each; 'tiny' caps at 10, shortfall
    # redistributes to the uncapped pair: (300-10)/2 = 145 each,
    # 'mid' then caps at 100 → big gets 190
    assert out["tiny"].capped == 1 and out["tiny"].alloc == 10.0
    assert out["mid"].capped == 1 and out["mid"].alloc == 100.0
    assert out["big"].capped == 0 and abs(out["big"].alloc - 190.0) < 0.01
    assert abs(sum(r.alloc for r in out.values()) - 300.0) < 0.01
    assert abs(out["big"].sample_rate - 0.019) < 0.001


def test_waterfill_budget_exceeds_supply(spark):
    from indicators_spark.functions.sampling import token_budget_waterfill

    df = spark.createDataFrame(
        [("a", 50.0, 2.0), ("b", 70.0, 1.0)],
        "source string, supply double, w double",
    )
    out = {r.source: r for r in
           token_budget_waterfill(df, budget=1000.0).collect()}
    assert all(r.capped == 1 and r.alloc == r.supply for r in out.values())
    assert all(r.sample_rate == 1.0 for r in out.values())


def test_waterfill_zero_weight_gets_nothing(spark):
    from indicators_spark.functions.sampling import token_budget_waterfill

    df = spark.createDataFrame(
        [("a", 100.0, 0.0), ("b", 100.0, 1.0), ("c", 50.0, 1.0)],
        "source string, supply double, w double",
    )
    out = {r.source: r for r in
           token_budget_waterfill(df, budget=120.0).collect()}
    # zero weight: no allocation, no crash (ANSI ÷0), no full-supply grab
    assert out["a"].alloc == 0.0 and out["a"].sample_rate == 0.0
    assert out["a"].capped == 0
    # budget distributes among the positive-weight sources only
    assert abs(out["b"].alloc + out["c"].alloc - 120.0) < 0.01
    # all-zero weights: plan allocates nothing, never divides
    allz = spark.createDataFrame(
        [("x", 10.0, 0.0)], "source string, supply double, w double"
    )
    got = token_budget_waterfill(allz, budget=5.0).collect()
    assert len(got) == 1 and got[0].alloc == 0.0


def test_mixture_plan_execute_contract(spark):
    rows = QUERIES["mixture_plan_execute"].spark(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.sampled_docs <= r.total_docs
        assert 0.0 <= r.planned_rate <= 1.0
        # a fully-planned source (rate 1.0) keeps every document
        if r.planned_rate == 1.0:
            assert r.sampled_docs == r.total_docs
        assert (r.sampled_tokens > 0) == (r.sampled_docs > 0)


def test_waterfill_null_weight_routes_to_zero_branch(spark):
    from indicators_spark.functions.sampling import token_budget_waterfill

    df = spark.createDataFrame(
        [("a", 100.0, None), ("b", 100.0, 1.0)],
        "source string, supply double, w double",
    )
    out = {r.source: r for r in
           token_budget_waterfill(df, budget=50.0).collect()}
    # NULL weight: present in the plan with zero allocation, not dropped
    assert set(out) == {"a", "b"}
    assert out["a"].alloc == 0.0 and out["a"].sample_rate == 0.0
    assert abs(out["b"].alloc - 50.0) < 0.01
