"""Plan sweep over the round-7b catalog additions: no cartesian
products anywhere, and BroadcastNestedLoopJoin only as the 1-row scalar
broadcast pattern (vocab counts, cutoffs) — never a data×data cross.

The sweep runs with ``materialize.EAGER`` off: the r8 shared-subtree
checkpoints would otherwise truncate the inspected plans to an opaque
LogicalRDD (hiding everything beneath the cut from the cartesian check)
AND execute the subtree at plan-construction time.  With EAGER off the
sweep sees the FULL lazy plan — strictly more surface than production,
where the cut can only hide operators this sweep already approved."""

from __future__ import annotations

import pytest

from indicators_spark.functions import materialize
from indicators_spark.plans import plan_string
from indicators_spark.queries import QUERIES

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _see_through_checkpoints(monkeypatch):
    monkeypatch.setattr(materialize, "EAGER", False)

R7B = [
    "dedup_lines_global",
    "filter_c4_rules",
    "filter_ssl_prototypes",
    "filter_ccnet_buckets",
    "classifier_quality_logreg",
    "stats_cms_topk",
    "text_pmi_bigrams",
    "mixture_doremi_weights",
    "pipeline_corpus_r7",
    "dedup_winnowing_pairs",
    "similarity_ivf_recall",
    "dedup_minhash_incremental",
    "filter_quality_ensemble",
    "chunk_cdc_dedup",
    "mixture_token_budget",
    "similarity_mmr_topk",
    "sample_quality_curriculum",
    "dedup_cc_keep_best",
    "split_leakage_safe",
]


@pytest.mark.parametrize("name", R7B)
def test_r7b_no_cartesian_product(spark, name):
    plan = plan_string(QUERIES[name].spark(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan, (name, plan)
